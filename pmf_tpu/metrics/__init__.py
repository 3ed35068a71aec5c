from .iou import IOUEval, confusion_matrix, iou_from_confusion
from .acc import AccEval, topk_accuracy

__all__ = [
    "IOUEval",
    "confusion_matrix",
    "iou_from_confusion",
    "AccEval",
    "topk_accuracy",
]
