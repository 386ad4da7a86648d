from .schedules import cosine_schedule, linear_schedule, exp_decay
from .state import TrainState, create_train_state
from .steps import (
    make_pretrain_step, make_pretrain_eval_step,
    make_downstream_step, make_downstream_eval_step,
)
from .checkpoint import (
    save_checkpoint, load_checkpoint, latest_path, best_path, epoch_path,
    partial_load, ensemble_params, remove_checkpoint_epochs,
)
from .learner import PretrainLearner, DownstreamLearner, EarlyStopping, smooth_data

__all__ = [
    "cosine_schedule", "linear_schedule", "exp_decay",
    "TrainState", "create_train_state",
    "make_pretrain_step", "make_pretrain_eval_step",
    "make_downstream_step", "make_downstream_eval_step",
    "save_checkpoint", "load_checkpoint", "latest_path", "best_path",
    "epoch_path", "partial_load", "ensemble_params", "remove_checkpoint_epochs",
    "PretrainLearner", "DownstreamLearner", "EarlyStopping", "smooth_data",
]
