"""Weighted smooth-L1 (Huber) loss.

Parity: pc_processor/loss/weighted_smoothl1.py:4-21 — beta = 1/sigma^2,
quadratic inside |d| < beta, linear outside; optional weight and mask
(masked mean normalizes by mask.sum()).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def weighted_smooth_l1(x: jax.Array, target: jax.Array, sigma: float = 3.0,
                       weight: jax.Array | None = None,
                       mask: jax.Array | None = None) -> jax.Array:
    diff = jnp.abs(x - target)
    beta = 1.0 / (sigma ** 2)
    loss = jnp.where(diff < beta, 0.5 * diff ** 2 / beta, diff - 0.5 * beta)
    if weight is not None:
        loss = loss * weight
    if mask is not None:
        m = jnp.broadcast_to(mask, loss.shape).astype(loss.dtype)
        return (loss * m).sum() / jnp.maximum(m.sum(), 1e-12)
    return loss.mean()
