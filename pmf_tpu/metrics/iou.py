"""IoU / accuracy / recall from a confusion matrix.

Parity: pc_processor/metrics/iou_eval.py (IOUEval). Semantics preserved:
  * conf[pred, gt] accumulated over batches (rows = pred, cols = gt).
  * ignore classes are zeroed on both rows and cols before stats
    (iou_eval.py:67-68).
  * IoU = tp / (tp + fp + fn + 1e-15); Acc = precision = tp/(tp+fp);
    Recall = tp/(tp+fn); means over the `include` classes.

TPU-native design: the per-batch confusion matrix is a pure jittable
function (one-hot matmul onto the MXU — no scatter), so it can live
*inside* the jitted train step and be reduced across the data-parallel
mesh by global-batch semantics (replacing the reference's
torch.distributed.all_reduce at iou_eval.py:62-66).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from functools import partial


@partial(jax.jit, static_argnums=(2,))
def confusion_matrix(pred: jax.Array, target: jax.Array, n_classes: int,
                     valid: jax.Array | None = None) -> jax.Array:
    """Confusion matrix conf[pred, gt] of two integer arrays.

    Computed as an MXU dot of two [C, P] one-hots instead of a
    serialized scatter-add (reference used index_put_(accumulate=True),
    iou_eval.py:52-53). The one-hots are laid out class-major so the
    contraction runs over the minor (lane) dimension — a [C, P]·[C, P]ᵀ
    dot — and the materialized one-hots don't pay the C→128 lane padding
    a [P, C] layout would. bf16 operand values are exactly 0/1 and the
    accumulation is f32, so counts are exact up to 2^24 per cell.

    Args:
      pred, target: integer arrays of identical shape.
      n_classes: static number of classes C.
      valid: optional boolean mask; invalid entries contribute nothing.

    Returns:
      [C, C] float32 matrix with rows=pred, cols=gt.
    """
    # f32 accumulation is exact up to 2^24 per cell (2^24 itself is
    # representable); fail loudly if a batch could round a cell count.
    # <= so the flagship 8-chip global batch (64·256·1024 = 2^24) passes.
    # ValueError (not assert): `python -O` must not silently disable
    # this invariant and return subtly rounded counts.
    if pred.size > 2 ** 24:
        raise ValueError(
            f"confusion_matrix: {pred.size} elements/call can overflow "
            "exact f32 cell counts (> 2^24); split the batch across calls")
    pred = pred.reshape(1, -1)
    target = target.reshape(1, -1)
    iota = jnp.arange(n_classes, dtype=jnp.int32)[:, None]
    oh_pred = (pred.astype(jnp.int32) == iota).astype(jnp.bfloat16)  # [C, P]
    oh_tgt = (target.astype(jnp.int32) == iota).astype(jnp.bfloat16)
    if valid is not None:
        oh_pred = oh_pred * valid.reshape(1, -1).astype(jnp.bfloat16)
    return jax.lax.dot_general(oh_pred, oh_tgt, (((1,), (1,)), ((), ())),
                               preferred_element_type=jnp.float32)


def iou_from_confusion(conf: np.ndarray, ignore=()):
    """(mean_iou, per_class_iou) with ignore rows/cols zeroed."""
    conf = np.asarray(conf, dtype=np.float64).copy()
    ignore = list(ignore)
    include = [c for c in range(conf.shape[0]) if c not in ignore]
    if ignore:
        conf[ignore, :] = 0
        conf[:, ignore] = 0
    tp = np.diag(conf)
    fp = conf.sum(axis=1) - tp
    fn = conf.sum(axis=0) - tp
    iou = tp / (tp + fp + fn + 1e-15)
    return iou[include].mean(), iou


class IOUEval:
    """Stateful accumulator mirroring the reference IOUEval API.

    Accumulates float64 confusion on host (numpy). `addBatch` accepts
    numpy or jax arrays; heavy work (the one-hot matmul) runs on device.
    In a multi-host setting call `addBatchConf` with an already-psum'd
    matrix — per-process matrices computed under jit with a sharded batch
    are already global.
    """

    def __init__(self, n_classes: int, ignore=()):
        self.n_classes = n_classes
        self.ignore = [ignore] if isinstance(ignore, int) else list(ignore)
        self.include = [c for c in range(n_classes) if c not in self.ignore]
        self.reset()

    def reset(self):
        self.conf = np.zeros((self.n_classes, self.n_classes), dtype=np.float64)

    def addBatch(self, pred, target, valid=None):
        conf = confusion_matrix(jnp.asarray(pred), jnp.asarray(target),
                                self.n_classes,
                                None if valid is None else jnp.asarray(valid))
        self.conf += np.asarray(conf, dtype=np.float64)

    def addBatchConf(self, conf):
        self.conf += np.asarray(conf, dtype=np.float64)

    def _stats(self):
        conf = self.conf.copy()
        if self.ignore:
            conf[self.ignore, :] = 0
            conf[:, self.ignore] = 0
        tp = np.diag(conf)
        fp = conf.sum(axis=1) - tp
        fn = conf.sum(axis=0) - tp
        return tp, fp, fn

    def getIoU(self):
        tp, fp, fn = self._stats()
        iou = tp / (tp + fp + fn + 1e-15)
        return iou[self.include].mean(), iou

    def getAcc(self):
        tp, fp, fn = self._stats()
        acc = tp / (tp + fp + 1e-15)
        return acc[self.include].mean(), acc

    def getRecall(self):
        tp, fp, fn = self._stats()
        recall = tp / (tp + fn + 1e-15)
        return recall[self.include].mean(), recall

    def getFwIoU(self):
        """Frequency-weighted IoU (ref: tasks/pmf_eval_semantickitti/infer.py)."""
        tp, fp, fn = self._stats()
        iou = tp / (tp + fp + fn + 1e-15)
        freq = (tp + fn) / max((tp + fn).sum(), 1e-15)
        return (freq[self.include] * iou[self.include]).sum()
