"""Pointwise KL divergence matching torch.nn.KLDivLoss(reduction='none').

Parity: used by the perception-aware loss (tasks/pmf/trainer.py:192,
247-250): kl(input=log_pred, target) = target * (log(target) - log_pred),
with the convention 0*log(0) = 0.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def kl_div(log_pred: jax.Array, target: jax.Array) -> jax.Array:
    """Elementwise KL divergence; no reduction."""
    t_log_t = jnp.where(target > 0, target * jnp.log(jnp.clip(target, 1e-12)), 0.0)
    return t_log_t - target * log_pred
