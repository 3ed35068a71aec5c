from .schedules import (warmup_cosine_lr, warmup_exp_lr,
    warmup_multistep_lr, clip_lr)
from .optim import adamw, sgd_nesterov, hybrid_pmf_optimizer, adamw_amsgrad
from .state import TrainState
from .steps import (
    LossConfig, pmf_losses, salsanext_losses,
    make_pmf_train_step, make_pmf_eval_step,
    make_salsanext_train_step, make_salsanext_eval_step,
)
from .checkpoint import CheckpointManager, partial_load
from .recorder import Recorder
from .trainer import Trainer, kitti_focal_alpha

__all__ = [
    "warmup_cosine_lr", "warmup_exp_lr", "warmup_multistep_lr",
    "clip_lr",
    "adamw", "sgd_nesterov", "hybrid_pmf_optimizer", "adamw_amsgrad",
    "TrainState", "LossConfig", "pmf_losses", "salsanext_losses",
    "make_pmf_train_step", "make_pmf_eval_step",
    "make_salsanext_train_step", "make_salsanext_eval_step",
    "CheckpointManager", "partial_load", "Recorder", "Trainer",
    "kitti_focal_alpha",
]
