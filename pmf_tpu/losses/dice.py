"""Dice losses. Parity: pc_processor/loss/dice_loss.py.

Note the reference quirks, preserved here:
  * `DiceLoss.forward` returns the *dice coefficient* (not 1-dice).
  * `ExpLogDiceLoss` = (-log(clamp(dice, 1e-6)))^gamma with gamma=0.3,
    used on SensatUrban (tasks/sensat_urban/pmf/trainer.py:189).
  * per-class reduction sums over ALL pixels of the batch (axis 0 of the
    flattened [P, C] view), then means over classes.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-6


def dice_loss(probs: jax.Array, target: jax.Array,
              mask: jax.Array | None = None) -> jax.Array:
    """Soft dice coefficient over channel-last predictions.

    probs: [..., C]; target: [...] ints; mask: optional [...] in {0,1}.
    """
    C = probs.shape[-1]
    p = probs.reshape(-1, C)
    t = target.reshape(-1)
    if mask is not None:
        m = mask.reshape(-1).astype(p.dtype)
        t = (t * m).astype(t.dtype)
        p = p * m[:, None]
    oh = jax.nn.one_hot(t, C, dtype=p.dtype)
    intersect = 2.0 * (p * oh).sum(axis=0) + _EPS
    denom = (p + oh).sum(axis=0) + _EPS
    return (intersect / denom).mean()


def explog_dice_loss(probs: jax.Array, target: jax.Array,
                     mask: jax.Array | None = None,
                     gamma: float = 0.3) -> jax.Array:
    d = dice_loss(probs, target, mask)
    return (-jnp.log(jnp.clip(d, 1e-6))) ** gamma
