"""Pallas TPU z-buffer kernel (reference implementation).

A single-pass sequential z-buffer: points stream through SMEM (scalar
prefetch — VMEM refs cannot be scalar-indexed on TPU), each point
read-modify-writes one 128-lane row of the VMEM key image with a lane
mask. Exactly matches `ops.scatter.zbuffer_scatter_packed`.

Status: correct but NOT the production path. Measured on v5e: ~360
cycles/point (~12.5 ms for a 32k-point scan) — the sequential scalar
loop cannot beat XLA's packed-key scatter-min (~4 ms). Kept as the
worked example of the Pallas alternative and as a base for future
vectorized variants; `zbuffer_scatter_packed` remains the default.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANES = 128
_IMAX = 2147483647


def _kernel(pix_ref, key_ref, out_ref):
    out_ref[:] = jnp.full_like(out_ref, _IMAX)
    n = pix_ref.shape[0]

    def body(i, _):
        p = pix_ref[i]                    # SMEM scalar read
        k = key_ref[i]
        r = p // _LANES
        c = p % _LANES
        row = out_ref[pl.ds(r, 1), :]     # [1, 128] VMEM RMW
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, _LANES), 1)
        out_ref[pl.ds(r, 1), :] = jnp.where((lane == c) & (k < row), k, row)
        return 0

    jax.lax.fori_loop(0, n, body, 0)


@functools.partial(jax.jit, static_argnames=("H", "W", "interpret"))
def zbuffer_pallas(pix: jax.Array, key: jax.Array, H: int, W: int,
                   interpret: bool = False):
    """Scatter-min of packed keys into an [H, W] image.

    pix: [N] int32 flat pixel ids (>= H*W routes to a dropped sentinel
    row); key: [N] int32 packed (depth | index) keys, INT32_MAX invalid.
    Returns (winner_key_img [H, W] int32 with INT32_MAX at empty pixels).
    """
    L = H * W
    rows = -(-(L + 1) // _LANES) + 1  # + sentinel space, lane-padded
    pix = jnp.minimum(pix, rows * _LANES - 1)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(1,),
        in_specs=[],
        out_specs=pl.BlockSpec((rows, _LANES), lambda i, *_: (0, 0),
                               memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct((rows, _LANES), jnp.int32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(pix, key)
    return out.reshape(-1)[:L].reshape(H, W)
