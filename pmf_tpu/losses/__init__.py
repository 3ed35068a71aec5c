from .focal import focal_softmax_loss, FocalSoftmaxLoss
from .lovasz import (lovasz_softmax_loss, lovasz_softmax_loss_points,
                     lovasz_softmax_loss_points_pair)
from .kl import kl_div
from .perception_aware import (perception_aware_loss,
    perception_aware_losses, normalized_entropy)
from .dice import dice_loss, explog_dice_loss
from .multi_task import MultiTaskLossParams, multi_task_loss, init_multi_task_params
from .weighted_smoothl1 import weighted_smooth_l1
from .smoothness import smoothness_loss, grad_guide_loss

__all__ = [
    "focal_softmax_loss",
    "FocalSoftmaxLoss",
    "lovasz_softmax_loss",
    "lovasz_softmax_loss_points",
    "lovasz_softmax_loss_points_pair",
    "kl_div",
    "perception_aware_loss",
    "perception_aware_losses",
    "normalized_entropy",
    "dice_loss",
    "explog_dice_loss",
    "MultiTaskLossParams",
    "multi_task_loss",
    "init_multi_task_params",
    "weighted_smooth_l1",
    "smoothness_loss",
    "grad_guide_loss",
]
