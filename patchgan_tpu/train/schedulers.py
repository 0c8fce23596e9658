"""Host-side learning-rate schedules.

The reference drives LR with torch's ExponentialLR stepped every
``decay_freq`` epochs or ReduceLROnPlateau stepped on mean epoch losses
(/root/reference/patchgan/trainer.py:175-188,266-273). Both are epoch-
granularity host decisions, so they live outside the jitted step; the new
LR is written into the optimizer's injected hyperparams without
retracing.
"""


class ExponentialDecay:
    """lr <- lr * gamma, applied every ``decay_freq`` epochs (matching
    ExponentialLR.step() gated on epoch % decay_freq == 0,
    reference trainer.py:267-270)."""

    def __init__(self, initial_lr, gamma, decay_freq=5):
        self.lr = initial_lr
        self.gamma = gamma
        self.decay_freq = decay_freq

    def epoch_end(self, epoch, metric=None):
        if epoch % self.decay_freq == 0:
            self.lr = self.lr * self.gamma
        return self.lr


class ReduceLROnPlateau:
    """Reimplementation of torch.optim.lr_scheduler.ReduceLROnPlateau
    defaults (mode='min', factor=0.1, patience=10, threshold=1e-4
    relative, cooldown=0, min_lr=0), stepped once per epoch on the mean
    epoch loss (reference trainer.py:176-177,271-273)."""

    def __init__(self, initial_lr, factor=0.1, patience=10, threshold=1e-4,
                 min_lr=0.0, cooldown=0):
        self.lr = initial_lr
        self.factor = factor
        self.patience = patience
        self.threshold = threshold
        self.min_lr = min_lr
        self.cooldown = cooldown
        self.cooldown_counter = 0
        self.best = float('inf')
        self.num_bad_epochs = 0

    def epoch_end(self, epoch, metric=None):
        if metric is None:
            return self.lr
        if metric < self.best * (1.0 - self.threshold):
            self.best = metric
            self.num_bad_epochs = 0
        else:
            self.num_bad_epochs += 1
        if self.cooldown_counter > 0:
            self.cooldown_counter -= 1
            self.num_bad_epochs = 0
        if self.num_bad_epochs > self.patience:
            self.lr = max(self.lr * self.factor, self.min_lr)
            self.cooldown_counter = self.cooldown
            self.num_bad_epochs = 0
        return self.lr


class ConstantLR:
    def __init__(self, initial_lr):
        self.lr = initial_lr

    def epoch_end(self, epoch, metric=None):
        return self.lr


def resume_fast_forward(lr, lr_decay, start_epoch, decay_freq):
    """LR fast-forward applied on checkpoint resume: lr * decay**((start-1)
    / decay_freq) with float division (reference trainer.py:155-157)."""
    if lr_decay is None:
        return lr
    return lr * lr_decay ** ((start_epoch - 1) / decay_freq)
