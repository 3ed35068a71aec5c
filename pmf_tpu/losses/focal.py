"""Focal softmax loss.

Parity: pc_processor/loss/focal_softmax.py:7-63 (FocalSoftmaxLoss).
Semantics:
  p_t   = softmax(x)[target]        (or x[target] when already softmaxed)
  loss  = -(1 - p_t)^gamma * log(clamp(p_t, 1e-6)) * alpha[target]
  reduction: mean, or masked sum / mask.sum() when a pixel mask is given.

TPU-native notes: gather of the target probability is a one-hot reduce
(fuses on the VPU); probabilities stay in the channel-last layout.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def focal_softmax_loss(probs_or_logits: jax.Array, target: jax.Array,
                       alpha: jax.Array, gamma: float = 2.0,
                       mask: jax.Array | None = None,
                       from_logits: bool = False) -> jax.Array:
    """Focal loss over channel-last predictions.

    Args:
      probs_or_logits: [..., C] class probabilities (or logits with
        from_logits=True — ref `softmax=True` mode).
      target: [...] integer labels.
      alpha: [C] per-class weights.
      gamma: focusing exponent (ref uses 2 in tasks/pmf/trainer.py:203).
      mask: optional [...] weights; loss = sum(l*m)/sum(m).
    """
    n_classes = probs_or_logits.shape[-1]
    p = jax.nn.softmax(probs_or_logits, axis=-1) if from_logits else probs_or_logits
    p = p.reshape(-1, n_classes)
    target = target.reshape(-1)
    oh = jax.nn.one_hot(target, n_classes, dtype=p.dtype)
    pt = (p * oh).sum(axis=-1)
    log_pt = jnp.log(jnp.clip(pt, 1e-6))
    a = jnp.asarray(alpha, dtype=p.dtype)[target]
    loss = -((1.0 - pt) ** gamma) * log_pt * a
    if mask is not None:
        m = mask.reshape(-1).astype(loss.dtype)
        return (loss * m).sum() / jnp.maximum(m.sum(), 1e-12)
    return loss.mean()


class FocalSoftmaxLoss:
    """Convenience wrapper mirroring the reference constructor.

    Accepts scalar / list / ndarray alpha like focal_softmax.py:13-25:
    a scalar a in (0,1) becomes alpha=[a, 1-a, 1-a, ...].
    """

    def __init__(self, n_classes: int, gamma: float = 2.0, alpha=0.8,
                 from_logits: bool = False):
        if isinstance(alpha, (list, tuple, np.ndarray, jnp.ndarray)):
            alpha = np.asarray(alpha, dtype=np.float32)
            assert alpha.shape[0] == n_classes
        else:
            assert 0 < alpha < 1, f"invalid alpha: {alpha}"
            a = np.full((n_classes,), 1.0 - alpha, dtype=np.float32)
            a[0] = alpha
            alpha = a
        self.alpha = jnp.asarray(alpha)
        self.gamma = gamma
        self.n_classes = n_classes
        self.from_logits = from_logits

    def __call__(self, x, target, mask=None):
        return focal_softmax_loss(x, target, self.alpha, self.gamma, mask,
                                  self.from_logits)
