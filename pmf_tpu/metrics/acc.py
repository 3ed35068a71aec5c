"""Top-k accuracy. Parity: pc_processor/metrics/acc_eval.py (AccEval)."""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from functools import partial


@partial(jax.jit, static_argnums=(2,))
def topk_accuracy(logits: jax.Array, target: jax.Array, k: int = 1) -> jax.Array:
    """Fraction of rows whose target is within the top-k logits."""
    logits = logits.reshape(-1, logits.shape[-1])
    target = target.reshape(-1)
    _, topk = jax.lax.top_k(logits, k)
    hit = (topk == target[:, None]).any(axis=1)
    return hit.mean()


class AccEval:
    """Streaming top-k accuracy over batches."""

    def __init__(self, topk: int = 1):
        self.topk = topk
        self.reset()

    def reset(self):
        self._correct = 0.0
        self._total = 0

    def addBatch(self, logits, target):
        n = int(np.prod(np.asarray(target).shape))
        acc = float(topk_accuracy(jnp.asarray(logits), jnp.asarray(target), self.topk))
        self._correct += acc * n
        self._total += n

    def getAcc(self):
        return self._correct / max(self._total, 1)
