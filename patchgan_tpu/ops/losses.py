"""Segmentation and adversarial losses (pure jnp, fp32 accumulation).

Numerics match the PyTorch reference exactly
(/root/reference/patchgan/losses.py:5-39 and trainer.py:75-85):

- ``tversky``: per-sample Tversky index summed over all non-batch axes,
  loss = 1 - tp / (tp + beta*fn + (1-beta)*fp), then batch-meaned.
- ``fc_tversky``: focal Tversky with smooth=1 in numerator and denominator;
  the gamma power is applied AFTER the batch mean (losses.py:29) -- the
  order matters and is preserved here.
- ``bce_loss``: binary cross-entropy on probabilities (not logits), with
  torch's log-clamp at -100 (torch.nn.BCELoss semantics).
- ``weighted_bce_loss``: elementwise-weighted BCE matching
  torch.nn.functional.binary_cross_entropy(..., weight=w).

All reductions are computed in float32 regardless of input dtype, which is
required for stable bf16 training on TPU (sums over 256*256 spatial grids
overflow bf16's 8-bit mantissa).
"""

import jax.numpy as jnp


def _sum_nonbatch(x):
    """Sum over every axis except the leading batch axis (fp32)."""
    x = x.astype(jnp.float32)
    return jnp.sum(x, axis=tuple(range(1, x.ndim)))


def tversky(y_true, y_pred, beta, batch_mean=True):
    """Tversky loss (reference losses.py:5-15). Defined but unused by the
    Trainer in the reference; provided for API completeness."""
    y_true = y_true.astype(jnp.float32)
    y_pred = y_pred.astype(jnp.float32)
    tp = _sum_nonbatch(y_true * y_pred)
    fn = _sum_nonbatch((1.0 - y_pred) * y_true)
    fp = _sum_nonbatch(y_pred * (1.0 - y_true))
    index = tp / (tp + beta * fn + (1.0 - beta) * fp)
    loss = 1.0 - index
    if batch_mean:
        return jnp.mean(loss)
    return loss


def fc_tversky(y_true, y_pred, beta, gamma=0.75, batch_mean=True):
    """Focal Tversky loss (reference losses.py:18-31).

    smooth=1 in both numerator and denominator; gamma power applied after
    the batch mean (pow(mean(1 - tversky), gamma)) when batch_mean=True.
    """
    smooth = 1.0
    y_true = y_true.astype(jnp.float32)
    y_pred = y_pred.astype(jnp.float32)
    tp = _sum_nonbatch(y_true * y_pred)
    fn = _sum_nonbatch((1.0 - y_pred) * y_true)
    fp = _sum_nonbatch(y_pred * (1.0 - y_true))
    index = (tp + smooth) / (tp + beta * fn + (1.0 - beta) * fp + smooth)
    focal = 1.0 - index
    if batch_mean:
        return jnp.power(jnp.mean(focal), gamma)
    return jnp.power(focal, gamma)


def mae_loss(y_true, y_pred):
    """Mean absolute error (reference losses.py:34-35)."""
    y_true = y_true.astype(jnp.float32)
    y_pred = y_pred.astype(jnp.float32)
    return jnp.mean(jnp.abs(y_true - y_pred))


def _clamped_log(p):
    """log(p) clamped at -100, matching torch.nn.BCELoss.

    Written so the gradient is SAFE at p == 0: a naive
    ``maximum(log(p), -100)`` backpropagates 0 * (1/0) = NaN there (the
    saturated-discriminator case that torch sidesteps internally). Here
    the where() selects the constant branch at p == 0, giving zero
    gradient; elsewhere the log argument is bounded away from zero so
    1/p stays finite.
    """
    safe = jnp.log(jnp.maximum(p, 1e-35))
    return jnp.where(p > 0, jnp.maximum(safe, -100.0), -100.0)


def bce_loss(y_pred, y_true):
    """Binary cross entropy on probabilities, torch.nn.BCELoss semantics
    (reference losses.py:39; used for adversarial losses trainer.py:84,101-102).

    Argument order follows torch: (input=predicted probs, target=labels).
    """
    p = y_pred.astype(jnp.float32)
    t = y_true.astype(jnp.float32)
    loss = -(t * _clamped_log(p) + (1.0 - t) * _clamped_log(1.0 - p))
    return jnp.mean(loss)


def weighted_bce_loss(y_pred, y_true, weight):
    """Elementwise-weighted BCE matching
    torch.nn.functional.binary_cross_entropy(input, target, weight=w)
    as used for loss_type='weighted_bce' (reference trainer.py:75-80)."""
    p = y_pred.astype(jnp.float32)
    t = y_true.astype(jnp.float32)
    w = jnp.broadcast_to(weight.astype(jnp.float32), p.shape)
    loss = -w * (t * _clamped_log(p) + (1.0 - t) * _clamped_log(1.0 - p))
    return jnp.mean(loss)
