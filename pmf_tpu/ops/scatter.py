"""Deterministic z-buffer scatter of points onto an image grid.

Replaces two reference mechanisms with one deterministic primitive:
  * RangeProjection's far-to-near sort + overwrite (projection.py:64-82):
    nearest point wins each pixel;
  * PerspectiveViewLoader's unsorted numpy fancy-assignment scatter
    (perspective_view_loader.py:99-117), whose winner is whichever point
    happens to come last in file order.

TPU-native design: no data-dependent sort of the whole cloud. We run two
scatter-min passes (XLA lowers `.at[].min` efficiently):
  pass 1: per-pixel min depth (the z-buffer),
  pass 2: among points matching the winning depth, min point index
          (deterministic tie-break).
All shapes static; invalid points are routed to a sentinel pixel H*W.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

_BIG = jnp.float32(3.4e38)
_IMAX = jnp.int32(2**31 - 1)


def zbuffer_scatter_packed(rows: jax.Array, cols: jax.Array, depth: jax.Array,
                           keep: jax.Array, H: int, W: int,
                           depth_quant: float = 1.0 / 64.0):
    """One-scatter z-buffer: pack (quantized depth, point index) into a
    single int32 key and scatter-min it — the winning key *contains* the
    winner's index, so no second pass and no gathers.

    TPU rationale: random-index gathers are an order of magnitude slower
    than scatters on TPU; this variant runs one scatter-min of N keys
    instead of two scatter passes. Depth is quantized to `depth_quant`
    meters for the z-test (ties broken by min point index) — the stored
    feature values remain exact; only which point wins can differ within
    one quantum, which is noise relative to the reference's unsorted
    last-write-wins scatter (perspective_view_loader.py:101).

    Returns (winner_idx [H, W] int32 with -1 empty, mask [H, W] bool).
    """
    N = depth.shape[0]
    nbits = max(int(np.ceil(np.log2(max(N, 2)))), 1)
    depth_bits = 31 - nbits
    assert depth_bits >= 10, f"too many points for packed z-buffer: {N}"
    max_q = (1 << depth_bits) - 1

    r = jnp.clip(rows.astype(jnp.int32), 0, H - 1)
    c = jnp.clip(cols.astype(jnp.int32), 0, W - 1)
    pix = jnp.where(keep, r * W + c, H * W)

    dq = jnp.clip((depth.astype(jnp.float32) / depth_quant), 0, max_q)
    dq = dq.astype(jnp.int32)
    idx = jax.lax.broadcasted_iota(jnp.int32, (N, 1), 0).squeeze(-1)
    key = jnp.where(keep, (dq << nbits) | idx, _IMAX)

    key_img = jnp.full((H * W + 1,), _IMAX, jnp.int32).at[pix].min(key)
    key_img = key_img[: H * W].reshape(H, W)
    mask = key_img != _IMAX
    winner = jnp.where(mask, key_img & ((1 << nbits) - 1), -1)
    return winner, mask


def zbuffer_scatter(rows: jax.Array, cols: jax.Array, depth: jax.Array,
                    keep: jax.Array, H: int, W: int):
    """Resolve per-pixel winning point indices with a depth z-buffer.

    Args:
      rows, cols: [N] integer (or float, floored) pixel coordinates.
      depth: [N] float32 depth used for the z-test (smaller wins).
      keep: [N] bool validity.
      H, W: image size.

    Returns:
      winner_idx: [H, W] int32 index into the point buffer, -1 for empty.
      mask: [H, W] bool occupancy.
    """
    N = depth.shape[0]
    r = jnp.clip(rows.astype(jnp.int32), 0, H - 1)
    c = jnp.clip(cols.astype(jnp.int32), 0, W - 1)
    pix = jnp.where(keep, r * W + c, H * W)  # sentinel bucket for invalid

    d = jnp.where(keep, depth.astype(jnp.float32), _BIG)
    zbuf = jnp.full((H * W + 1,), _BIG, dtype=jnp.float32).at[pix].min(d)

    # exact float equality is safe: zbuf holds one of the scattered values
    is_winner = keep & (d <= zbuf[pix])
    idx = jax.lax.broadcasted_iota(jnp.int32, (N, 1), 0).squeeze(-1)
    cand = jnp.where(is_winner, idx, N)
    winner = jnp.full((H * W + 1,), N, dtype=jnp.int32).at[pix].min(cand)

    winner = winner[: H * W].reshape(H, W)
    mask = winner < N
    return jnp.where(mask, winner, -1), mask


def fill_canvas(values: jax.Array, rows: jax.Array, cols: jax.Array,
                keep: jax.Array, winner_idx: jax.Array, mask: jax.Array,
                fill: float = 0.0) -> jax.Array:
    """Write each winning point's feature row into its pixel, one flat
    [N]→[H·W] scatter-add PER CHANNEL (plus one small gather to test
    winnership).

    TPU rationale: the obvious `values[winner_idx]` is a H*W-row random
    gather (~8.7 ms/scan measured at 32k pts / 384×1232 / bs8); a single
    [N, F]-row scatter serializes on the row payload (~3.9 ms); XLA's
    fastest lowering is the flat scalar-per-update scatter, so F
    independent flat scatters win (~2.0 ms) — winners are unique per
    pixel so add is exact.

    values: [N, F]; rows/cols/keep: [N]; winner_idx/mask: [H, W].
    Returns [H, W, F] with `fill` at empty pixels.
    """
    H, W = winner_idx.shape
    N = values.shape[0]
    r = jnp.clip(rows.astype(jnp.int32), 0, H - 1)
    c = jnp.clip(cols.astype(jnp.int32), 0, W - 1)
    pix = jnp.where(keep, r * W + c, H * W)
    idx = jax.lax.broadcasted_iota(jnp.int32, (N, 1), 0).squeeze(-1)
    won = keep & (winner_idx.reshape(-1)[jnp.minimum(pix, H * W - 1)] == idx)
    planes = []
    for f in range(values.shape[-1]):
        upd = jnp.where(won, values[:, f], 0).astype(values.dtype)
        img = jnp.zeros((H * W + 1,), values.dtype).at[pix].add(upd)
        planes.append(img[: H * W].reshape(H, W))
    img = jnp.stack(planes, axis=-1)
    if fill != 0.0:
        img = jnp.where(mask[..., None], img, jnp.asarray(fill, values.dtype))
    return img


def scatter_to_image(values: jax.Array, winner_idx: jax.Array,
                     mask: jax.Array, fill: float = 0.0) -> jax.Array:
    """Gather per-point values into the image using z-buffer winners.

    values: [N, F] (or [N]); winner_idx/mask: [H, W] from zbuffer_scatter.
    Returns [H, W, F] (or [H, W]) with `fill` in empty pixels.
    """
    squeeze = values.ndim == 1
    if squeeze:
        values = values[:, None]
    safe = jnp.maximum(winner_idx, 0)
    img = values[safe.reshape(-1)].reshape(*winner_idx.shape, values.shape[-1])
    img = jnp.where(mask[..., None], img, jnp.asarray(fill, values.dtype))
    return img[..., 0] if squeeze else img
