from .trainer import Trainer
from .steps import make_train_step, make_eval_step, TrainState

__all__ = ['Trainer', 'make_train_step', 'make_eval_step', 'TrainState']
