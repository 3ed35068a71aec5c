from .meters import AverageMeter, RunningAvgMeter, RemainTime
from .logger import make_logger, is_main_process
from .compiler import configure_compiler

__all__ = [
    "AverageMeter",
    "RunningAvgMeter",
    "RemainTime",
    "make_logger",
    "is_main_process",
    "configure_compiler",
]
