"""Learning-rate schedules.

Parity: pc_processor/utils/warmup_lr.py —
  * WarmupCosineLR (:54-97): linear 0→lr over `warmup_steps` (CyclicLR
    ramp), then CosineAnnealing lr→0 over `max_steps`, stepped per
    iteration;
  * WarmupLR (:6-50): linear warmup then exponential decay
    lr · decay^(t - warmup).
Implemented as optax-compatible schedules (step → lr).
"""
from __future__ import annotations

import jax.numpy as jnp


def warmup_cosine_lr(lr: float, warmup_steps: int, max_steps: int):
    """Linear warmup to `lr`, then cosine anneal to 0 over `max_steps`."""
    warmup_steps = max(warmup_steps, 1)

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        warm = lr * step / warmup_steps
        t = jnp.clip(step - warmup_steps, 0, max_steps)
        cos = lr * 0.5 * (1.0 + jnp.cos(jnp.pi * t / max(max_steps, 1)))
        return jnp.where(step < warmup_steps, warm, cos)

    return schedule


def warmup_exp_lr(lr: float, warmup_steps: int, decay: float):
    warmup_steps = max(warmup_steps, 1)

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        warm = lr * step / warmup_steps
        exp = lr * decay ** (step - warmup_steps)
        return jnp.where(step < warmup_steps, warm, exp)

    return schedule


def warmup_multistep_lr(lr: float, warmup_steps: int, milestones,
                        gamma: float = 0.1):
    """Linear warmup then step decay at `milestones`
    (pc_processor/utils/lr_scheduler.py WarmupMultiStepLR parity)."""
    warmup_steps = max(warmup_steps, 1)
    milestones = tuple(sorted(milestones))

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        warm = lr * step / warmup_steps
        n_passed = sum(jnp.asarray(step >= m, jnp.float32)
                       for m in milestones)
        decayed = lr * gamma ** n_passed
        return jnp.where(step < warmup_steps, warm, decayed)

    return schedule


def clip_lr(schedule, min_lr: float):
    """Floor an existing schedule (lr_scheduler.py ClipLR parity)."""

    def clipped(step):
        return jnp.maximum(schedule(step), min_lr)

    return clipped
