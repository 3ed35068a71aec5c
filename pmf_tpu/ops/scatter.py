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

# numpy scalars (module-level jnp would init the backend at import)
_BIG = np.float32(3.4e38)
_IMAX = np.int32(2**31 - 1)


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


def point_winner_flags(rows: jax.Array, cols: jax.Array, depth: jax.Array,
                       keep: jax.Array, H: int, W: int,
                       depth_quant: float = 1.0 / 64.0):
    """Per-point (flat pixel index, did-this-point-win) flags.

    Same packed-key z-test as `zbuffer_scatter_packed` (quantized depth,
    lowest-index tie-break), so `won` is consistent with the canvas both
    fill paths produce: the set {points with won & label != ignore}
    maps 1:1 onto the canvas pixels with label != ignore.

    Returns (pix [N] int32 in [0, H*W] — H*W = invalid sentinel,
    won [N] bool).
    """
    N = depth.shape[0]
    nbits = max(int(np.ceil(np.log2(max(N, 2)))), 1)
    depth_bits = 31 - nbits
    assert depth_bits >= 10, f"too many points for packed z-buffer: {N}"
    max_q = (1 << depth_bits) - 1

    r = jnp.clip(rows.astype(jnp.int32), 0, H - 1)
    c = jnp.clip(cols.astype(jnp.int32), 0, W - 1)
    pix = jnp.where(keep, r * W + c, H * W)

    dq = jnp.clip(depth.astype(jnp.float32) / depth_quant, 0, max_q)
    dq = dq.astype(jnp.int32)
    idx = jax.lax.broadcasted_iota(jnp.int32, (N, 1), 0).squeeze(-1)
    key = jnp.where(keep, (dq << nbits) | idx, _IMAX)

    key_img = jnp.full((H * W + 1,), _IMAX, jnp.int32).at[pix].min(key)
    won = keep & (key_img[pix] == key)
    return pix, won


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


def rasterize_zbuffer(rows: jax.Array, cols: jax.Array, depth: jax.Array,
                      keep: jax.Array, values: jax.Array, H: int, W: int,
                      depth_quant: float = 1.0 / 64.0, tile: int = 128):
    """Sort-based z-buffer rasterization: one pass from points to a dense
    [H, W, F] canvas + occupancy mask. Output-equivalent to
    `zbuffer_scatter_packed` + `fill_canvas` (same 1/`depth_quant`
    z-test quantization, same lowest-point-index tie-break via stable
    sort), but built from TPU-fast primitives.

    TPU rationale (measured at 32k pts, 384×1232, bs8 on v5e):
    every XLA scatter costs ~0.3-0.4 ms/scan regardless of flags
    (updates serialize), so the scatter-min z-buffer + F flat fill
    scatters floor at ~2 ms/scan. A 32k-element multi-operand sort is
    0.26 ms — so instead:
      1. stable-sort points by (pixel, quantized depth); the first
         element of each pixel run is that pixel's winner;
      2. stable-sort winners to the front by pixel (one more sort) —
         winners are unique per pixel, so any 128-wide column tile of
         the image owns ≤128 consecutive entries of this array;
      3. per-tile segment starts: ONE small scatter-min + suffix-min;
      4. gather each tile's ≤128 candidate rows with a static-size
         dynamic slice (contiguous, DMA-friendly);
      5. place candidates at their column with a per-tile one-hot
         matmul (each output pixel has ≤1 contributor, so the f32
         accumulation is exact) — MXU work, ~1 GFLOP per scan.

    Args: rows/cols [N] int, depth [N] f32, keep [N] bool,
          values [N, F] f32 (the per-point feature rows to place).
    Returns: (canvas [H, W, F] f32 — zeros at empty pixels,
              mask [H, W] bool).
    """
    N, F = values.shape
    ntw = -(-W // tile)  # ceil
    T = H * ntw
    i32max = jnp.int32(2**31 - 1)

    r = jnp.clip(rows.astype(jnp.int32), 0, H - 1)
    c = jnp.clip(cols.astype(jnp.int32), 0, W - 1)
    pix = jnp.where(keep, r * W + c, H * W)
    dq = jnp.clip(depth.astype(jnp.float32) / depth_quant,
                  0, 2**16 - 1).astype(jnp.int32)

    # 1. winner resolution: stable two-key sort (pixel, quantized depth);
    # stability = lowest original index wins ties, matching
    # zbuffer_scatter_packed's packed-key tie-break.
    colf = c.astype(jnp.float32)
    ops = jax.lax.sort(
        [pix, dq, colf] + [values[:, f] for f in range(F)], num_keys=2)
    spix, _, scol = ops[0], ops[1], ops[2]
    svals = ops[3:]
    valid = spix < H * W
    prev = jnp.concatenate([jnp.full((1,), -1, jnp.int32), spix[:-1]])
    won = valid & (spix != prev)

    # 2. compact winners to the front, ordered by pixel
    key2 = jnp.where(won, spix, i32max)
    ops2 = jax.lax.sort([key2, scol] + list(svals), num_keys=1)
    return _place_pixel_sorted(ops2[0], ops2[1], ops2[2:], H, W, tile)


def _place_pixel_sorted(wpix, wcol, wvals, H: int, W: int, tile: int):
    """Steps 3-5 of the sorted-winner tile rasterizer: given winner rows
    sorted by flat pixel (unique pixels; tail = int32-max sentinels),
    place them on the [H, W] canvas via per-tile one-hot matmuls."""
    N = wpix.shape[0]
    F = len(wvals)
    ntw = -(-W // tile)  # ceil
    T = H * ntw

    # 3. per-tile start positions (winners are pixel-sorted, and tile id
    # is monotone in pixel, so each tile owns one contiguous segment)
    tile_id = jnp.where(wpix < H * W,
                        (wpix // W) * ntw + (wpix % W) // tile, T)
    pos = jax.lax.broadcasted_iota(jnp.int32, (N, 1), 0).squeeze(-1)
    tile_start = jnp.full((T + 1,), N, jnp.int32).at[tile_id].min(pos)
    tile_start = jax.lax.associative_scan(jnp.minimum, tile_start,
                                          reverse=True)

    # 4. gather each tile's candidate block (static size, contiguous)
    data = jnp.stack([wcol, jnp.ones((N,), jnp.float32)] + list(wvals),
                     axis=1)  # [N, 2+F]: col, occupancy, features
    data = jnp.pad(data, ((0, tile), (0, 0)),
                   constant_values=-1.0)  # col -1 never matches a lane
    starts = tile_start[:T]
    dense = jax.vmap(
        lambda s: jax.lax.dynamic_slice(data, (s, 0), (tile, 2 + F)))(starts)

    # 5. one-hot placement: output pixel j of tile t takes the candidate
    # whose column lands there (≤1 by uniqueness)
    toff = (jax.lax.broadcasted_iota(jnp.int32, (T, 1), 0).squeeze(-1)
            % ntw) * tile
    ci = dense[..., 0].astype(jnp.int32) - toff[:, None]
    k_valid = (starts[:, None] + jax.lax.broadcasted_iota(
        jnp.int32, (1, tile), 1)) < tile_start[1:, None]
    lanes = jax.lax.broadcasted_iota(jnp.int32, (1, 1, tile), 2)
    onehot = ((ci[:, :, None] == lanes) & k_valid[:, :, None]
              ).astype(jnp.bfloat16)
    # HIGHEST precision: TPU's default f32 dot truncates operands to
    # bf16; the multi-pass decomposition keeps 1.0 × v exact, so the
    # canvas carries bit-exact f32 point features (≤1 term per pixel).
    tiles_out = jnp.einsum("tkj,tkf->tjf", onehot,
                           dense[..., 1:].astype(jnp.float32),
                           preferred_element_type=jnp.float32,
                           precision=jax.lax.Precision.HIGHEST)
    canvas = tiles_out.reshape(H, ntw * tile, 1 + F)[:, :W]
    mask = canvas[..., 0] > 0.5
    return canvas[..., 1:], mask


def rasterize_unique(pix: jax.Array, ok: jax.Array, values: jax.Array,
                     H: int, W: int, tile: int = 128):
    """Rasterize rows whose `ok` pixels are already unique (pre-resolved
    z-buffer winners, e.g. from `point_winner_flags`): one pixel sort +
    tile placement — skips `rasterize_zbuffer`'s winner-resolution sort.

    Args: pix [N] flat pixel ids (H*W sentinel allowed), ok [N] bool,
          values [N, F] f32.
    Returns: (canvas [H, W, F] f32, mask [H, W] bool).
    """
    N, F = values.shape
    i32max = jnp.int32(2**31 - 1)
    key = jnp.where(ok, pix, i32max)
    colf = (pix % W).astype(jnp.float32)
    ops = jax.lax.sort([key, colf] + [values[:, f] for f in range(F)],
                       num_keys=1)
    return _place_pixel_sorted(ops[0], ops[1], ops[2:], H, W, tile)


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
