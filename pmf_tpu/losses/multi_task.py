"""Learned uncertainty multi-task weighting.

Parity: pc_processor/loss/multi_task_loss.py:5-19 —
  total = sum_i loss_i / (2 sigma_i^2) + log(sigma_i^2 + 1)
with sigma a learned vector initialized to ones(n)/n.

TPU-native: sigma lives in the same parameter pytree as the model, so it
is synchronized across data-parallel replicas for free (the reference had
to wrap it in its own DDP, tasks/epmf/trainer.py:47-49).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def init_multi_task_params(n_losses: int, sigma=None) -> jax.Array:
    if sigma is not None:
        return jnp.asarray(sigma, dtype=jnp.float32)
    return jnp.ones((n_losses,), dtype=jnp.float32) / n_losses


class MultiTaskLossParams:
    """Marker container for the sigma parameter (kept for API parity)."""

    def __init__(self, n_losses: int, sigma=None):
        self.sigma = init_multi_task_params(n_losses, sigma)


def multi_task_loss(sigma: jax.Array, losses) -> jax.Array:
    losses = jnp.stack([jnp.asarray(l) for l in losses])
    s2 = sigma ** 2
    return (losses / (2.0 * s2) + jnp.log(s2 + 1.0)).sum()
