"""Training layer: scheduler, state, steps, loss registry."""
from .losses import LOSS_LIST, loss_weights, anneal_epochs, \
    module_active_epochs
from .scheduler import LossScheduler, MetricLogger
from .state import TrainState, make_optimizer, make_update_mask, \
    create_train_state, set_learning_rate, reset_optimizer
from .step import make_train_step, make_eval_step, make_generate_step, \
    total_loss

__all__ = [
    "LOSS_LIST", "loss_weights", "anneal_epochs", "module_active_epochs",
    "LossScheduler", "MetricLogger", "TrainState", "make_optimizer",
    "make_update_mask", "create_train_state", "set_learning_rate",
    "reset_optimizer",
    "make_train_step", "make_eval_step", "make_generate_step", "total_loss",
]
