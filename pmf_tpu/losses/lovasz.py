"""Lovász-softmax loss, exact masked formulation for static shapes.

Parity: pc_processor/loss/lovasz_softmax.py (Berman's Lovász extension,
`classes='present'`, `ignore` filtering).

TPU-native design: the reference *removes* ignored pixels (dynamic
shapes). XLA needs static shapes, so we use an exact masked equivalent:
for ignored pixels set fg=0 and error=0. Zero-error entries sort to the
tail and contribute error*grad = 0 to the dot product, and — because
fg=0 — they do not perturb the intersection/union prefix sums of any
entry ranked before them. 'present' class averaging becomes a weighted
mean over classes with fg.sum() > 0. Sorting runs as one batched
[C, P] descending sort on device.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def _lovasz_grad_batched(fg_sorted: jax.Array) -> jax.Array:
    """Gradient of the Lovász extension w.r.t. sorted errors, per class.

    fg_sorted: [C, P] {0,1} foreground indicators in sorted-error order.
    Returns [C, P] jaccard-difference weights (Alg. 1 of Berman et al.).
    """
    gts = fg_sorted.sum(axis=1, keepdims=True)
    intersection = gts - jnp.cumsum(fg_sorted, axis=1)
    union = gts + jnp.cumsum(1.0 - fg_sorted, axis=1)
    jaccard = 1.0 - intersection / jnp.maximum(union, 1e-12)
    return jnp.concatenate(
        [jaccard[:, :1], jaccard[:, 1:] - jaccard[:, :-1]], axis=1)


def lovasz_softmax_loss(probs: jax.Array, labels: jax.Array,
                        ignore: int | None = 0,
                        valid: jax.Array | None = None) -> jax.Array:
    """Multi-class Lovász-softmax loss.

    Args:
      probs: [..., C] class probabilities in [0, 1] (post-softmax).
      labels: [...] integer ground truth.
      ignore: label id excluded from the loss (ref default ignore=0 via
        tasks/pmf/trainer.py:190); None disables.
      valid: optional extra [...] boolean mask.

    Returns: scalar loss, mean over classes present in the labels.
    """
    C = probs.shape[-1]
    p = probs.reshape(-1, C).astype(jnp.float32)
    y = labels.reshape(-1)
    P = p.shape[0]

    ok = jnp.ones(y.shape, dtype=bool)
    if ignore is not None:
        ok &= y != ignore
    if valid is not None:
        ok &= valid.reshape(-1)

    # [C, P]: per-class foreground and |fg - p_c| errors, masked-exact.
    fg = (jax.nn.one_hot(y, C, dtype=jnp.float32) * ok[:, None].astype(jnp.float32)).T
    err = jnp.abs(fg - p.T) * ok[None, :].astype(jnp.float32)

    # TPU-native gradient construction: differentiating through the sort
    # would emit a huge scatter in the backward pass (sort VJP), ~10×
    # the forward cost. The reference itself detaches the Jaccard
    # weights (lovasz_softmax.py:119 wraps them in Variable), so the
    # exact gradient is d loss/d err_i = jaccard[rank_i]. We compute the
    # rank-ordered weights under stop_gradient and UNSORT them with a
    # second sort keyed by the permutation (sorts are fast on TPU,
    # scatters are not); the loss is then an elementwise dot.
    def weights(err):
        # fg is {0,1}: pack (position, fg) into ONE int32 payload so the
        # big sort carries 2 operands instead of 3 (sort cost scales with
        # operand bytes; P*2 < 2^31 always holds for our canvases).
        # Both sorts run is_stable=False: XLA implements stable sorts by
        # appending a hidden iota operand (+50% sort traffic). The loss
        # value is tie-order invariant (equal-error blocks telescope,
        # module docstring) and the unsort keys are unique positions, so
        # instability only permutes gradient attribution inside exact-tie
        # blocks — arbitrary in the reference too (CUDA torch.sort).
        idx = jnp.broadcast_to(
            jax.lax.broadcasted_iota(jnp.int32, (1, P), 1), err.shape)
        packed = idx * 2 + fg.astype(jnp.int32)
        _, packed_s = jax.lax.sort((-err, packed), num_keys=1, is_stable=False)
        grad = _lovasz_grad_batched((packed_s & 1).astype(jnp.float32))
        _, g_unsorted = jax.lax.sort((packed_s >> 1, grad), num_keys=1, is_stable=False)
        return g_unsorted

    g = jax.lax.stop_gradient(weights(err))
    per_class = (err * g).sum(axis=1)

    present = (fg.sum(axis=1) > 0).astype(jnp.float32)
    return (per_class * present).sum() / jnp.maximum(present.sum(), 1.0)


def lovasz_softmax_loss_points_pair(
        probs_a: jax.Array, probs_b: jax.Array, labels_img: jax.Array,
        pt_pix: jax.Array, pt_label: jax.Array, pt_won: jax.Array,
        ignore: int | None = 0) -> tuple[jax.Array, jax.Array]:
    """Two-stream `lovasz_softmax_loss_points` (lidar + camera predictions
    over the SAME rasterized labels, tasks/pmf/trainer.py:330-332) fused
    into one sort pipeline: the masks, fg one-hots and pixel keys are
    shared, the [C, P] weight sorts run stacked as [2C, P], and a single
    2C-channel raster places both streams' Jaccard weights. Returns
    (loss_a, loss_b), each identical to the single-stream call.
    """
    from ..ops.scatter import rasterize_unique

    B, H, W, C = probs_a.shape
    HW = H * W
    N = pt_pix.shape[1]

    ok = pt_won
    if ignore is not None:
        ok &= pt_label != ignore
    okf = ok.astype(jnp.float32)
    fg = jax.nn.one_hot(pt_label, C, dtype=jnp.float32) * okf[..., None]

    idx_gather = jnp.minimum(pt_pix, HW - 1)[..., None]
    errs = []
    for probs in (probs_a, probs_b):
        # gather in the model's compute dtype and cast AFTER: gathered
        # bytes halve at bf16 and the cast commutes bit-exactly
        p_pts = jnp.take_along_axis(
            jax.lax.stop_gradient(probs).reshape(B, HW, C),
            idx_gather, axis=1).astype(jnp.float32)          # [B, N, C]
        errs.append(jnp.abs(fg - p_pts) * okf[..., None])

    P = B * N
    errT = jnp.concatenate(
        [e.reshape(P, C).T for e in errs], axis=0)           # [2C, P]
    fgT = jnp.tile(fg.reshape(P, C).T, (2, 1))
    idx = jnp.broadcast_to(
        jax.lax.broadcasted_iota(jnp.int32, (1, P), 1), errT.shape)
    packed = idx * 2 + fgT.astype(jnp.int32)
    _, packed_s = jax.lax.sort((-errT, packed), num_keys=1, is_stable=False)
    grad = _lovasz_grad_batched((packed_s & 1).astype(jnp.float32))
    _, g_unsorted = jax.lax.sort((packed_s >> 1, grad), num_keys=1, is_stable=False)
    w_pts = jax.lax.stop_gradient(
        jnp.concatenate([g_unsorted[:C].T.reshape(B, N, C),
                         g_unsorted[C:].T.reshape(B, N, C)], axis=-1)
        * okf[..., None])                                    # [B, N, 2C]

    w_img, _ = jax.vmap(
        lambda pix, k, v: rasterize_unique(pix, k, v, H, W)
    )(pt_pix, ok, w_pts)
    w_img = jax.lax.stop_gradient(w_img)                     # [B, H, W, 2C]

    ok_img = labels_img != ignore if ignore is not None \
        else jnp.ones(labels_img.shape, bool)
    okimgf = ok_img.astype(jnp.float32)
    fg_img = (jax.nn.one_hot(labels_img, C, dtype=jnp.float32)
              * okimgf[..., None])
    present = (fg.sum(axis=(0, 1)) > 0).astype(jnp.float32)
    npresent = jnp.maximum(present.sum(), 1.0)

    losses = []
    for s, probs in enumerate((probs_a, probs_b)):
        err_img = (jnp.abs(fg_img - probs.astype(jnp.float32))
                   * okimgf[..., None])
        per_class = (err_img * w_img[..., s * C:(s + 1) * C]).sum(
            axis=(0, 1, 2))
        losses.append((per_class * present).sum() / npresent)
    return losses[0], losses[1]


def lovasz_softmax_loss_points(probs: jax.Array, labels_img: jax.Array,
                               pt_pix: jax.Array, pt_label: jax.Array,
                               pt_won: jax.Array,
                               ignore: int | None = 0) -> jax.Array:
    """`lovasz_softmax_loss` for z-buffer-rasterized canvas labels,
    computed from the winner points instead of the full image. Exact.

    Every non-ignored canvas pixel is exactly one point's winning pixel
    (empty pixels carry label 0 = ignore), so the per-class descending-
    error ranking over pixels equals the ranking over winner points: the
    sort shrinks from [C, B·H·W] to [C, B·N] (~8× fewer rows at the
    flagship train config, and TPU sort cost is superlinear). Zero-error
    masked entries cannot perturb the Jaccard prefix sums (module
    docstring), and within equal-error tie blocks the err·Δjaccard dot
    telescopes, so the loss value matches the full-image version
    bit-for-bit up to tie-block gradient attribution.

    The detached Jaccard weights are computed in the point domain,
    rasterized back to the image (winners are unique per pixel:
    ops/scatter.rasterize_zbuffer with constant depth), and the loss
    becomes an elementwise masked dot in the image domain — the backward
    pass is elementwise, with no gather/scatter VJP.

    Args:
      probs: [B, H, W, C] class probabilities.
      labels_img: [B, H, W] canvas labels (the rasterized winner labels).
      pt_pix: [B, N] flat pixel index per point, H·W sentinel when
        invalid (ops/scatter.point_winner_flags).
      pt_label: [B, N] per-point labels.
      pt_won: [B, N] winner flags.
      ignore: label id excluded (None disables).
    """
    from ..ops.scatter import rasterize_unique

    B, H, W, C = probs.shape
    HW = H * W
    N = pt_pix.shape[1]

    # --- detached point-domain Jaccard weights (gather in the model's
    # compute dtype, cast after — bit-exact, half the gathered bytes)
    p_pts = jnp.take_along_axis(
        jax.lax.stop_gradient(probs).reshape(B, HW, C),
        jnp.minimum(pt_pix, HW - 1)[..., None],
        axis=1).astype(jnp.float32)                         # [B, N, C]
    ok = pt_won
    if ignore is not None:
        ok &= pt_label != ignore
    okf = ok.astype(jnp.float32)
    fg = jax.nn.one_hot(pt_label, C, dtype=jnp.float32) * okf[..., None]
    err = jnp.abs(fg - p_pts) * okf[..., None]

    P = B * N
    errT = err.reshape(P, C).T                               # [C, P]
    fgT = fg.reshape(P, C).T
    # pack (position, fg) into one int32 payload — 2 sort operands, not 3
    idx = jnp.broadcast_to(
        jax.lax.broadcasted_iota(jnp.int32, (1, P), 1), errT.shape)
    packed = idx * 2 + fgT.astype(jnp.int32)
    _, packed_s = jax.lax.sort((-errT, packed), num_keys=1, is_stable=False)
    grad = _lovasz_grad_batched((packed_s & 1).astype(jnp.float32))
    _, g_unsorted = jax.lax.sort((packed_s >> 1, grad), num_keys=1, is_stable=False)
    w_pts = jax.lax.stop_gradient(
        g_unsorted.T.reshape(B, N, C) * okf[..., None])      # [B, N, C]

    # --- rasterize weights back to the image (unique winner per pixel,
    # so the single-sort unique rasterizer applies)
    w_img, _ = jax.vmap(
        lambda pix, k, v: rasterize_unique(pix, k, v, H, W)
    )(pt_pix, ok, w_pts)
    w_img = jax.lax.stop_gradient(w_img)                     # [B, H, W, C]

    # --- elementwise image-domain dot (autodiff surface)
    ok_img = labels_img != ignore if ignore is not None \
        else jnp.ones(labels_img.shape, bool)
    okimgf = ok_img.astype(jnp.float32)
    fg_img = (jax.nn.one_hot(labels_img, C, dtype=jnp.float32)
              * okimgf[..., None])
    err_img = jnp.abs(fg_img - probs.astype(jnp.float32)) * okimgf[..., None]
    per_class = (err_img * w_img).sum(axis=(0, 1, 2))        # [C]

    present = (fg.sum(axis=(0, 1)) > 0).astype(jnp.float32)
    return (per_class * present).sum() / jnp.maximum(present.sum(), 1.0)
