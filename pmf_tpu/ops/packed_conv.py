"""Exact space-to-depth convolution transform for low-channel full-res
stages.

TPU rationale: XLA lays NHWC activations out with the channel dim padded
to the 128-lane register width, so a full-resolution conv with C=32
costs the same memory traffic and MXU occupancy as C=128 — measured
~1.4 ms per 3×3 conv at 384×1232 on v5e regardless of C∈{32, 64}. The
same arithmetic expressed at half resolution with 4C channels runs ~2×
faster. This module rewrites any stride-1 2D conv **exactly** in the
space-to-depth domain:

    conv(x, w)  ==  depth_to_space(packed_conv(space_to_depth(x), w))

The packed kernel is built from the original [kh, kw, ci, co] weights at
apply time (a tiny compile-time-foldable scatter), so parameter shapes,
checkpoints and torchvision weight conversion are untouched.

Channel packing convention: full-res pixel (2Y+py, 2X+px) channel c maps
to packed channel  (py*2 + px)*C + c  — the same ordering as
`pixel_shuffle` in reverse, so s2d∘pixel_shuffle(2) is a pure reshape.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def space_to_depth(x: jax.Array, r: int = 2) -> jax.Array:
    """[N, H, W, C] → [N, H/r, W/r, r*r*C]; phase-major channel order."""
    N, H, W, C = x.shape
    x = x.reshape(N, H // r, r, W // r, r, C)
    x = x.transpose(0, 1, 3, 2, 4, 5)  # N, H/r, W/r, py, px, C
    return x.reshape(N, H // r, W // r, r * r * C)


def depth_to_space(x: jax.Array, r: int = 2) -> jax.Array:
    """Inverse of space_to_depth (== pixel_shuffle with phase-major order)."""
    N, Hp, Wp, Crr = x.shape
    C = Crr // (r * r)
    x = x.reshape(N, Hp, Wp, r, r, C)
    x = x.transpose(0, 1, 3, 2, 4, 5)  # N, Hp, py, Wp, px, C
    return x.reshape(N, Hp * r, Wp * r, C)


@functools.lru_cache(maxsize=64)
def _pack_plan(kh: int, kw: int, dil: int, pad_h: int, pad_w: int):
    """Static scatter plan: full-res taps → packed-kernel positions.

    Returns (khp, kwp, pad_hp, pad_wp, entries) with entries =
    [(dyp, dxp, phase_in(py,px), phase_out(py,px), dy, dx)].
    """
    entries = []
    dyps, dxps = set(), set()
    for py in (0, 1):
        for px in (0, 1):
            for dy in range(kh):
                for dx in range(kw):
                    oy = py + dy * dil - pad_h
                    ox = px + dx * dil - pad_w
                    dyp, qy = oy >> 1, oy & 1
                    dxp, qx = ox >> 1, ox & 1
                    entries.append((dyp, dxp, (qy, qx), (py, px), dy, dx))
                    dyps.add(dyp)
                    dxps.add(dxp)
    dy_min, dy_max = min(dyps), max(dyps)
    dx_min, dx_max = min(dxps), max(dxps)
    khp = dy_max - dy_min + 1
    kwp = dx_max - dx_min + 1
    # packed conv out position Y reads packed rows Y + dyp; with kernel
    # index kyp = dyp - dy_min the needed left pad is -dy_min
    pad_hp = -dy_min
    pad_wp = -dx_min
    shifted = [(dyp - dy_min, dxp - dx_min, qin, qout, dy, dx)
               for dyp, dxp, qin, qout, dy, dx in entries]
    return khp, kwp, pad_hp, pad_wp, tuple(shifted)


@functools.lru_cache(maxsize=256)
def _fold_entries(entries: tuple, khp: int, kwp: int, n_qi: int,
                  n_qo: int, kw: int):
    """Fold a plan's entry list into constant (tap-index, mask) arrays.

    entries: ((kyp, kxp, qi, qo, dy, dx), ...) — for any fixed
    (kyp, kxp, qi, qo) the source tap (dy, dx) is unique by construction
    of the phase decomposition, so the packed kernel is a masked GATHER
    of the original taps, not a scatter.

    Returns numpy (idx [khp, kwp, n_qi, n_qo] into kh·kw flat taps,
    mask [khp, kwp, n_qi, n_qo] float).
    """
    idx = np.zeros((khp, kwp, n_qi, n_qo), np.int32)
    msk = np.zeros((khp, kwp, n_qi, n_qo), np.float32)
    for kyp, kxp, qi, qo, dy, dx in entries:
        assert msk[kyp, kxp, qi, qo] == 0.0, "non-unique tap in pack plan"
        idx[kyp, kxp, qi, qo] = dy * kw + dx
        msk[kyp, kxp, qi, qo] = 1.0
    return idx, msk


def _gather_pack(w_seg: jax.Array, idx: np.ndarray, msk: np.ndarray,
                 kind: str) -> jax.Array:
    """Assemble one input segment's packed kernel block from the original
    taps with a constant-index gather (runtime cost: one tiny gather +
    multiply + reshape — this runs on live parameter values every step,
    so it must not be a scatter loop: 4k serialized scatter updates
    measured ~2.7 ms/step before this formulation).

    w_seg [kh, kw, cs, co] → [khp, kwp, n_qi·cs, n_qo·co] with input
    channel order (qi, c) for kind "p" (phase-major) or (c, qi) for
    kind "c" (channel-major / PixelShuffle layout).
    """
    kh, kw, cs, co = w_seg.shape
    khp, kwp, n_qi, n_qo = idx.shape
    wf = w_seg.reshape(kh * kw, cs, co)
    sel = wf[jnp.asarray(idx.reshape(-1))].reshape(
        khp, kwp, n_qi, n_qo, cs, co)
    sel = sel * jnp.asarray(msk, w_seg.dtype)[..., None, None]
    if kind == "p":
        out = sel.transpose(0, 1, 2, 4, 3, 5)   # (qi, cs) input-major
    else:
        out = sel.transpose(0, 1, 4, 2, 3, 5)   # (cs, qi) channel-major
    return out.reshape(khp, kwp, n_qi * cs, n_qo * co)


def pack_conv_weights(w: jax.Array, dil: int = 1,
                      padding: tuple[int, int] = (1, 1),
                      in_segments: tuple | None = None) -> tuple:
    """Build the packed kernel [khp, kwp, 4ci, 4co] from [kh, kw, ci, co].

    `in_segments` describes the packed-channel layout of the INPUT as a
    tuple of (kind, channels) segments laid out back to back, where kind
    "p" is phase-major (packed channel = phase·C + c, the space_to_depth
    convention) and kind "c" is channel-major (packed channel = c·4 +
    phase, the raw conv-output-feeding-PixelShuffle convention). This
    lets callers feed plain jnp.concatenate results — or pixel-shuffle
    inputs with NO data movement at all — because any input channel
    permutation is absorbed into this compile-side weight gather.

    Returns (w_packed, ((pad_top, pad_bottom), (pad_left, pad_right))).
    """
    kh, kw, ci, co = w.shape
    if in_segments is None:
        in_segments = (("p", ci),)
    assert sum(c for _, c in in_segments) == ci, (in_segments, ci)
    khp, kwp, pad_hp, pad_wp, entries = _pack_plan(kh, kw, dil,
                                                   padding[0], padding[1])
    folded = tuple((kyp, kxp, qy * 2 + qx, py * 2 + px, dy, dx)
                   for kyp, kxp, (qy, qx), (py, px), dy, dx in entries)
    idx, msk = _fold_entries(folded, khp, kwp, 4, 4, kw)
    parts = []
    c0 = 0
    for kind, cs in in_segments:
        parts.append(_gather_pack(w[:, :, c0:c0 + cs, :], idx, msk, kind))
        c0 += cs
    wp = jnp.concatenate(parts, axis=2) if len(parts) > 1 else parts[0]
    # packed SAME-equivalent padding: kernel spans rows [ -pad_hp,
    # khp-1-pad_hp ] around each output position
    pads = ((pad_hp, khp - 1 - pad_hp), (pad_wp, kwp - 1 - pad_wp))
    return wp, pads


def _pair_plan(kh, kw, dil, padding, ci, co, py):
    """Plan one pair conv producing output phases (py,0)+(py,1).

    Returns (khq, kwq, pads, entries, in_phases) where entries =
    [(kyq, kxq, qin(py,px), out_px, dy, dx)] and in_phases is the sorted
    set of input phases the pair reads.
    """
    _, _, pad_hp, pad_wp, all_entries = _pack_plan(kh, kw, dil,
                                                   padding[0], padding[1])
    # _pack_plan entries are shifted to kernel indices; recover raw
    # packed-row offsets before re-deriving this pair's tighter span
    sub = [(kyp - pad_hp, kxp - pad_wp, qin, qout[1], dy, dx)
           for kyp, kxp, qin, qout, dy, dx in all_entries if qout[0] == py]
    dy_min = min(e[0] for e in sub)
    dy_max = max(e[0] for e in sub)
    dx_min = min(e[1] for e in sub)
    dx_max = max(e[1] for e in sub)
    khq, kwq = dy_max - dy_min + 1, dx_max - dx_min + 1
    pads = ((-dy_min, khq - 1 + dy_min), (-dx_min, kwq - 1 + dx_min))
    entries = [(dyp - dy_min, dxp - dx_min, qin, px, dy, dx)
               for dyp, dxp, qin, px, dy, dx in sub]
    in_phases = sorted({q[0] * 2 + q[1] for _, _, q, _, _, _ in entries})
    return khq, kwq, pads, entries, in_phases


def _packed_conv_pairs(xp, w, dil, padding, precision, in_segments,
                       bias=None, post_fn=None):
    """Pair-phase formulation: two convs, each producing output phases
    (py,0)+(py,1) at 2·co lanes. Executed-FLOP cost vs. the full-res op:
    2× for phase-diagonal kernels (dilation 2, 1×1 — the pair's input
    slims to the 2 phase blocks it reads), 8/3× for dense 3×3 — both
    beat the 4× blockfull kernel once 2co fills the 128 MXU lanes.
    """
    kh, kw, ci, co = w.shape
    outs = []
    for py in (0, 1):
        khq, kwq, pads, entries, in_phases = _pair_plan(
            kh, kw, dil, padding, ci, co, py)
        x_in = xp
        segs = in_segments or (("p", ci),)
        # slice to a contiguous input phase-block range when possible
        phase_off = 0
        sliced = False
        if (len(segs) == 1 and segs[0][0] == "p"
                and in_phases == list(range(in_phases[0],
                                            in_phases[0] + len(in_phases)))
                and len(in_phases) < 4):
            phase_off = in_phases[0]
            sliced = True
            x_in = xp[..., phase_off * ci:(in_phases[-1] + 1) * ci]
        n_qi = len(in_phases) if sliced else 4
        folded = tuple((kyq, kxq, (qy * 2 + qx) - phase_off, px, dy, dx)
                       for kyq, kxq, (qy, qx), px, dy, dx in entries)
        idx, msk = _fold_entries(folded, khq, kwq, n_qi, 2, kw)
        parts = []
        c0 = 0
        for kind, cs in segs:
            parts.append(_gather_pack(w[:, :, c0:c0 + cs, :], idx, msk,
                                      kind))
            c0 += cs
        wq = jnp.concatenate(parts, axis=2) if len(parts) > 1 else parts[0]
        y = jax.lax.conv_general_dilated(
            x_in, wq, (1, 1), pads,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            precision=precision)
        # bias + activation applied per pair conv so they fuse into the
        # conv epilogue (applied after the concat they form a standalone
        # full-tensor elementwise pass — measured ~0.36 ms per op at
        # [8,192,616,256] bf16)
        if bias is not None:
            y = y + jnp.tile(bias, 2)
        if post_fn is not None:
            y = post_fn(y)
        outs.append(y)
    return jnp.concatenate(outs, axis=-1)


def packed_conv(xp: jax.Array, w: jax.Array, dil: int = 1,
                padding: tuple[int, int] | None = None,
                precision=None, in_segments: tuple | None = None,
                pair_min_co: int | None = None, bias=None,
                post_fn=None) -> jax.Array:
    """Stride-1 conv on a space-to-depth tensor, exact vs. the full-res op.

    xp: [N, H/2, W/2, 4·ci]; w: ORIGINAL full-res kernel [kh, kw, ci, co]
    with torch-style integer `padding` (default (k-1)·dil/2 'same').
    `in_segments`: packed-channel layout of xp (see pack_conv_weights).
    Returns [N, H/2, W/2, 4·co] phase-major.

    Formulation: the single blockfull kernel executes 4× the original
    FLOPs but its 4·co output fills the 128 MXU lanes and measures
    fastest end-to-end. The pair-phase decomposition (_packed_conv_pairs,
    lower executed FLOPs at 2·co lanes) won isolated microbenchmarks by
    ~14% (scripts/conv_microbench.py) but was neutral-to-slightly-worse
    inside the full model (12.62 vs 12.53 ms/scan bs8) — XLA fuses
    BN/activation epilogues better around one wide conv than two narrow
    ones. Kept available via pair_min_co for future autotuning.
    """
    kh, kw, ci, co = w.shape
    if padding is None:
        padding = (((kh - 1) * dil) // 2, ((kw - 1) * dil) // 2)
    force_pairs = pair_min_co is not None and co >= pair_min_co
    # Auto-pair the phase-diagonal kernels (dilation-2 / parity-preserving
    # taps): each pair then reads only 2 adjacent input phase blocks, so
    # the executed FLOPs drop to 2× the original at 2co MXU lanes — a
    # clear win over blockfull's 4× once 2co ≥ 128.
    auto_pairs = (co >= 64
                  and (in_segments is None
                       or (len(in_segments) == 1
                           and in_segments[0][0] == "p"))
                  and all(len(_pair_plan(kh, kw, dil, padding, ci, co,
                                         py)[4]) <= 2 for py in (0, 1)))
    if force_pairs or auto_pairs:
        return _packed_conv_pairs(xp, w, dil, padding, precision,
                                  in_segments, bias, post_fn)
    wp, pads = pack_conv_weights(w, dil, padding, in_segments)
    y = jax.lax.conv_general_dilated(
        xp, wp, (1, 1), pads,
        dimension_numbers=("NHWC", "HWIO", "NHWC"), precision=precision)
    if bias is not None:
        y = y + jnp.tile(bias, 4)
    if post_fn is not None:
        y = post_fn(y)
    return y


def packed_avg_pool_3x3_s2(xp: jax.Array, C: int) -> jax.Array:
    """AvgPool2d(3, stride 2, pad 1, count_include_pad) on a packed
    tensor → UNPACKED half-res output [N, H/2, W/2, C].

    The stride-2 full-res output grid coincides with phase (0, 0) of the
    packed grid, so this is one packed conv whose kernel averages the
    3×3 full-res window, keeping only the (0,0) output phase.
    """
    w = jnp.zeros((3, 3, C, C), xp.dtype)
    eye = jnp.eye(C, dtype=xp.dtype) / 9.0
    for dy in range(3):
        for dx in range(3):
            w = w.at[dy, dx].set(eye)
    out = packed_conv(xp, w, dil=1, padding=(1, 1))
    return out[..., :C]  # phase (0,0) block


def packed_max_pool_3x3_s2(xp: jax.Array, C: int) -> jax.Array:
    """MaxPool2d(3, stride 2, pad 1) on a packed tensor → unpacked
    half-res [N, H/2, W/2, C] (full-res output phase (0, 0)).

    Separable two-pass max: the stride-2 window rows {2Y-1, 2Y, 2Y+1}
    are the even-row phase at Y plus the odd-row phase at Y and Y-1, so
    a vertical 3-max costs one read of the input (vs 9 tap reads of the
    full tensor, which measured 3.3 ms/batch at the stem shape); the
    horizontal pass repeats the trick on the column phases of the
    half-height intermediate.
    """
    N, Hp, Wp, _ = xp.shape
    neg = -jnp.inf
    a = xp[..., :2 * C]          # row phase 0 (full-res rows 2Y)
    b = xp[..., 2 * C:]          # row phase 1 (rows 2Y+1)
    b_up = jnp.pad(b, ((0, 0), (1, 0), (0, 0), (0, 0)),
                   constant_values=neg)[:, :Hp]          # rows 2Y-1
    v = jnp.maximum(jnp.maximum(a, b), b_up)  # [N, Hp, Wp, 2C] col phases
    q0 = v[..., :C]              # cols 2X
    q1 = v[..., C:]              # cols 2X+1
    q1_left = jnp.pad(q1, ((0, 0), (0, 0), (1, 0), (0, 0)),
                      constant_values=neg)[:, :, :Wp]    # cols 2X-1
    return jnp.maximum(jnp.maximum(q0, q1), q1_left)


def pixel_shuffle_to_packed(x: jax.Array) -> jax.Array:
    """space_to_depth(pixel_shuffle(x, 2)) as a pure channel reorder.

    x: [N, Hp, Wp, C*4] with torch PixelShuffle channel order
    (c, py, px); returns the phase-major packed layout [N, Hp, Wp, 4*C]
    at the SAME spatial resolution — upsample stages stay packed for
    free.
    """
    N, Hp, Wp, Crr = x.shape
    C = Crr // 4
    x = x.reshape(N, Hp, Wp, C, 4)       # (c, phase)
    x = x.transpose(0, 1, 2, 4, 3)       # (phase, c)
    return x.reshape(N, Hp, Wp, 4 * C)


def packed_concat(tensors) -> jax.Array:
    """Channel-concat packed tensors so phase blocks stay contiguous:
    concat_packed([4·C1], [4·C2]) == s2d(concat(full_res...))."""
    parts = []
    for t in tensors:
        N, Hp, Wp, Crr = t.shape
        parts.append(t.reshape(N, Hp, Wp, 4, Crr // 4))
    out = jnp.concatenate(parts, axis=-1)
    N, Hp, Wp, _, C = out.shape
    return out.reshape(N, Hp, Wp, 4 * C)
