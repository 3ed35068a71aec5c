"""TPU-fast reductions.

`jnp.argmax` over the minor (channel/lane) dimension lowers to a
variadic (max, index) reduce which XLA schedules as a scalar kLoop
fusion — measured ~16 ms for a [8,256,1024,20] bf16 tensor on v5e
(`iota_reduce_fusion` in traces), dominating the metrics cost of a
train step. Two plain single-output reduces (max, then min of an
index masked on equality) vectorize fully and fuse with their
producers instead.

Tie-breaking matches `jnp.argmax` exactly (first occurrence wins).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def argmax_last(x: jax.Array) -> jax.Array:
    """Exact `jnp.argmax(x, axis=-1)` as two vectorized reduces.

    NaN handling differs from jnp.argmax: a row containing NaN has
    max=NaN which compares unequal everywhere, so the masked min would
    be the sentinel C — the result is clamped to C-1 so downstream
    class/label LUT indexing stays in range (jnp.argmax would return
    the NaN position instead). Identical for all non-NaN inputs.
    """
    c = x.shape[-1]
    m = jnp.max(x, axis=-1, keepdims=True)
    iota = jax.lax.broadcasted_iota(jnp.int32, x.shape, x.ndim - 1)
    out = jnp.min(jnp.where(x == m, iota, c), axis=-1)
    return jnp.minimum(out, c - 1).astype(jnp.int32)
