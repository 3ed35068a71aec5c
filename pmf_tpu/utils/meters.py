"""Progress meters and ETA estimation.

Parity: pc_processor/utils/avgmeter.py and remain_time.py.
"""
from __future__ import annotations

import time


class AverageMeter:
    """Running average of a scalar, weighted by sample count."""

    def __init__(self):
        self.reset()

    def reset(self):
        self.val = 0.0
        self.sum = 0.0
        self.count = 0
        self.avg = 0.0

    def update(self, val: float, n: int = 1):
        self.val = float(val)
        self.sum += float(val) * n
        self.count += n
        self.avg = self.sum / max(self.count, 1)


class RunningAvgMeter:
    """Exponential moving average meter (ref: avgmeter.py RunningAvgMeter)."""

    def __init__(self, alpha: float = 0.95):
        self.alpha = alpha
        self.reset()

    def reset(self):
        self.val = 0.0
        self.avg = 0.0
        self._initialized = False

    def update(self, val: float):
        self.val = float(val)
        if not self._initialized:
            self.avg = self.val
            self._initialized = True
        else:
            self.avg = self.alpha * self.avg + (1.0 - self.alpha) * self.val


class RemainTime:
    """Multi-mode ETA estimator (ref: remain_time.py:3-35).

    Tracks the EMA of per-iteration cost per mode (Train/Validation) and
    projects the remaining wall time across the remaining epochs.
    """

    def __init__(self, n_epochs: int):
        self.n_epochs = n_epochs
        self.cost_time = {}

    def update(self, cost_time: float, mode: str = "Train"):
        meter = self.cost_time.get(mode)
        if meter is None:
            meter = RunningAvgMeter(alpha=0.95)
            self.cost_time[mode] = meter
        meter.update(cost_time)

    def getRemainTime(self, epoch: int, iters: int, total_iter: int, mode: str = "Train") -> float:
        remain = 0.0
        for m, meter in self.cost_time.items():
            if m == mode:
                rest = total_iter - iters - 1 + (self.n_epochs - epoch - 1) * total_iter
            else:
                rest = (self.n_epochs - epoch - 1) * total_iter
            remain += meter.avg * max(rest, 0)
        return remain


class Timer:
    """Simple context-manager stopwatch for DT/PT-style iteration timing."""

    def __init__(self):
        self.elapsed = 0.0

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.elapsed = time.perf_counter() - self._t0
        return False
