"""EPMF perspective pipeline (V2): yaw-FOV crop + dynamic tight bbox.

Parity: pc_processor/dataset/perspective_view_loader_v2.py
(PerspectiveViewLoaderV2):
  * random image scale 1.0-1.2 at train (:51-57), point pixel coords
    scaled to match (:75);
  * yaw-FOV crop projection (mapLidar2CameraCropYaw) with no image-bound
    filtering (:72-74);
  * tight bounding box around the projected points, RGB re-registered
    into the box (:81-128);
  * pad to at least (proj_ht, proj_wt) — bottom pad, centered width —
    then flip/rotate/random-crop (train) or center-crop (eval).

TPU-native design: the reference materializes a *dynamic* bbox image.
XLA needs static shapes, so all the bbox/pad/crop/flip/rotate steps are
composed into per-point coordinate arithmetic and the points are
scattered DIRECTLY into the static output window (proj_ht×proj_wt train
/ proj_h×proj_w eval) with the packed z-buffer; RGB is one inverse-
affine bilinear sample of the original image canvas. No dynamic
intermediate exists, and the 2D augmentation costs one gather.
(Resampling differs from the reference's nearest-rotate of a scattered
image by at most one pixel per point — noise next to its unsorted
scatter order.)
"""
from __future__ import annotations

import functools
from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.projection import yaw_crop_project
from ..ops.scatter import fill_canvas, zbuffer_scatter_packed
from .augment import AugmentConfig, augment_pointcloud

# numpy scalar (module-level jnp would init the backend at import)
_INF = np.float32(1e30)


@dataclass(frozen=True)
class V2Config:
    canvas_h: int = 384       # RGB image canvas (unscaled)
    canvas_w: int = 1248
    proj_h: int = 384         # eval output (must suit EPMF's /64)
    proj_w: int = 1280
    proj_ht: int = 320        # train output
    proj_wt: int = 1024
    n_points: int = 131072
    scale_min: float = 1.0    # train random image scale (loader :52)
    scale_max: float = 1.2
    rot_deg: float = 15.0
    p_hflip: float = 0.5
    fov_left: float = -np.pi / 4
    fov_right: float = np.pi / 4
    img_mean: tuple = (12.12, 10.88, 0.23, -1.04, 0.21)
    img_stds: tuple = (12.32, 11.47, 6.91, 0.86, 0.16)
    pcd_aug: bool = False
    cam_frame: bool = False    # NuscenesV2: points already in the camera
                               # frame; yaw about (z, x), depth test on z
                               # (dataset_nuscenes_v2.py:344-356)
    min_depth_cam: float = 0.1
    img_jitter: tuple | None = None  # train-time RGB ColorJitter
    # (tasks/epmf/trainer.py:198 → loader img_aug=True)
    fill: str = "auto"  # z-buffer fill: "pallas" | "scatter" | "auto"
    # (same dispatch as PVConfig.fill — the batched Pallas sorted-winner
    # rasterizer measured 370 → ~60 ms/batch over the per-sample
    # scatter at the EPMF eval config)
    augment: AugmentConfig = field(default_factory=AugmentConfig)


def _bbox(vals, keep, fallback=0):
    lo = jnp.where(keep, vals, _INF).min()
    hi = jnp.where(keep, vals, -_INF).max()
    any_keep = keep.any()
    lo = jnp.where(any_keep, lo, fallback).astype(jnp.int32)
    hi = jnp.where(any_keep, hi, fallback).astype(jnp.int32)
    return lo, hi


def _v2_geometry(key, points, labels, valid, proj_matrix, image,
                 img_h, img_w, cfg: V2Config, train: bool,
                 fov=None, pix=None):
    """Projection + bbox/pad/aug coordinate composition WITHOUT the
    z-buffer fill: returns (rows_o, cols_o, keep_out, depth,
    vals [N, 6], rgb [out_h, out_w, 3]) so callers can pick the
    per-sample scatter fill or the batched Pallas tile rasterizer.

    `fov`: optional traced (fov_left, fov_right) radians pair overriding
    the static config (NuscenesV2 per-camera FOV table,
    dataset_nuscenes_v2.py:137-144).

    `pix`: optional precomputed per-point (rows, cols) pixel coordinates
    — the A2D2 path, where the adapter ships point→pixel indices and no
    projection happens (dataset_a2d2.py:271-278: mapLidar2CameraCropYaw
    returns the stored row/col with keep=all).
    """
    out_h, out_w = (cfg.proj_ht, cfg.proj_wt) if train else (cfg.proj_h, cfg.proj_w)
    k_aug, k_scale, k_flip, k_rot, k_top, k_left = jax.random.split(key, 6)

    if train and cfg.pcd_aug:
        points = augment_pointcloud(k_aug, points, cfg.augment)

    fov_l = cfg.fov_left if fov is None else fov[0]
    fov_r = cfg.fov_right if fov is None else fov[1]
    if pix is not None:
        rows_f = pix[0].astype(jnp.float32)
        cols_f = pix[1].astype(jnp.float32)
        keep = valid
    elif cfg.cam_frame:
        # camera-frame crop: yaw about (z, x), depth test on z (v2 ref)
        xyz = points[:, :3]
        keep = (xyz[:, 2] > cfg.min_depth_cam) & valid
        yaw = -jnp.arctan2(xyz[:, 2], xyz[:, 0])
        half_pi = jnp.pi / 2.0
        keep &= (yaw >= fov_l - half_pi) & (yaw <= fov_r - half_pi)
        uvw = (xyz[:, :, None] * proj_matrix.T[None, :3, :]).sum(1) \
            + proj_matrix.T[3]
        w = jnp.where(jnp.abs(uvw[:, 2]) > 1e-9, uvw[:, 2], 1e-9)
        rows_f, cols_f = uvw[:, 1] / w, uvw[:, 0] / w
    else:
        rows_f, cols_f, keep = yaw_crop_project(
            points[:, :3], proj_matrix, fov_l, fov_r, valid)
    scale = jax.random.uniform(k_scale, minval=cfg.scale_min,
                               maxval=cfg.scale_max) if train else jnp.float32(1.0)
    rows_f = rows_f * scale
    cols_f = cols_f * scale
    # truncation to int like the reference's astype(np.int32) (:79-80)
    x = rows_f.astype(jnp.int32)
    y = cols_f.astype(jnp.int32)

    x_min, x_max = _bbox(x, keep)
    y_min, y_max = _bbox(y, keep)
    h = x_max - x_min + 1
    w = y_max - y_min + 1
    max_h = jnp.maximum(h, out_h)
    max_w = jnp.maximum(w, out_w)
    left_pad = (max_w - w) // 2  # loader :148 (width centered, height top)

    # point coords in the padded frame
    xp = (x - x_min).astype(jnp.float32)
    yp = (y - y_min + left_pad).astype(jnp.float32)

    if train:
        flip = jax.random.uniform(k_flip) < cfg.p_hflip
        theta = jax.random.uniform(k_rot, minval=-cfg.rot_deg,
                                   maxval=cfg.rot_deg) * jnp.pi / 180.0
        top = jax.random.randint(k_top, (), 0, jnp.maximum(max_h - out_h, 0) + 1)
        left = jax.random.randint(k_left, (), 0, jnp.maximum(max_w - out_w, 0) + 1)
    else:
        flip = jnp.bool_(False)
        theta = jnp.float32(0.0)
        top = jnp.maximum(max_h - out_h, 0) // 2
        left = jnp.maximum(max_w - out_w, 0) // 2

    cy = (max_h.astype(jnp.float32) - 1.0) / 2.0
    cx = (max_w.astype(jnp.float32) - 1.0) / 2.0
    ct, st = jnp.cos(theta), jnp.sin(theta)

    # forward map for points: flip → rotate → crop
    yp_f = jnp.where(flip, max_w.astype(jnp.float32) - 1.0 - yp, yp)
    dxs, dys = yp_f - cx, xp - cy
    xo = cy + (-st * dxs + ct * dys) - top
    yo = cx + (ct * dxs + st * dys) - left
    keep_out = keep & (xo >= -0.5) & (xo < out_h - 0.5) & \
        (yo >= -0.5) & (yo < out_w - 0.5)
    rows_o = jnp.round(xo).astype(jnp.int32)
    cols_o = jnp.round(yo).astype(jnp.int32)

    depth = jnp.linalg.norm(points[:, :3], axis=-1)
    vals = jnp.concatenate(
        [depth[:, None], points[:, :4], labels[:, None].astype(jnp.float32)],
        axis=-1)

    # RGB: inverse map output pixels → original image coords, bilinear
    yg = jax.lax.broadcasted_iota(jnp.float32, (out_h, out_w), 0)
    xg = jax.lax.broadcasted_iota(jnp.float32, (out_h, out_w), 1)
    dyo, dxo = (yg + top) - cy, (xg + left) - cx
    src_x = cx + (ct * dxo - st * dyo)          # padded-frame col
    src_y = cy + (st * dxo + ct * dyo)          # padded-frame row
    src_x = jnp.where(flip, max_w.astype(jnp.float32) - 1.0 - src_x, src_x)
    img_col = (src_x - left_pad + y_min) / scale
    img_row = (src_y + x_min) / scale
    if train and cfg.img_jitter is not None:
        from .jitter import color_jitter
        image = color_jitter(jax.random.fold_in(key, 7), image, img_h,
                             img_w, cfg.img_jitter)
    if train:
        rgb = _bilinear_sample(image, img_row, img_col, img_h, img_w)
    else:
        # eval fast path: flip=False, θ=0, scale=1 make the inverse map
        # an integer translation, so the source grid is SEPARABLE
        # (row depends only on output row, col only on output col) and
        # the bilinear weights are exactly {0,1}. A row-gather followed
        # by a col-gather replaces the 4-tap random 2D gather, which
        # alone cost 356 of the 370 ms/batch V2 preprocessing time at
        # the EPMF eval config (bilinear output is bit-identical here).
        rgb = _translated_view(image, img_row[:, 0], img_col[0, :],
                               img_h, img_w)
    return rows_o, cols_o, keep_out, depth, vals, rgb


def _v2_normalize(canvas, rgb, mask, cfg: V2Config):
    """Compose the 8-ch feature from the filled canvas + RGB view and
    apply the (x−μ)/σ·mask normalization on the lidar channels."""
    feature = jnp.concatenate([canvas[..., :5], rgb], axis=-1)
    mean = jnp.asarray(cfg.img_mean, feature.dtype)
    std = jnp.asarray(cfg.img_stds, feature.dtype)
    lidar = (feature[..., :5] - mean) / std * \
        mask[..., None].astype(feature.dtype)
    return jnp.concatenate([lidar, feature[..., 5:]], axis=-1)


def build_v2_sample(key, points, labels, valid, proj_matrix, image,
                    img_h, img_w, cfg: V2Config, train: bool,
                    fov=None, pix=None):
    """One scan → (feature [H,W,8] normalized, mask, label2d, per-point
    (rows, cols, keep) in the output frame, depth). Scatter-path fill;
    build_v2_batch dispatches to the batched Pallas rasterizer instead
    where available."""
    out_h, out_w = (cfg.proj_ht, cfg.proj_wt) if train \
        else (cfg.proj_h, cfg.proj_w)
    rows_o, cols_o, keep_out, depth, vals, rgb = _v2_geometry(
        key, points, labels, valid, proj_matrix, image, img_h, img_w,
        cfg, train, fov, pix)
    winner, mask = zbuffer_scatter_packed(rows_o, cols_o, depth, keep_out,
                                          out_h, out_w)
    canvas = fill_canvas(vals, rows_o, cols_o, keep_out, winner, mask)
    lab = canvas[..., 5].astype(jnp.int32)
    feature = _v2_normalize(canvas, rgb, mask, cfg)
    return feature, mask, lab, rows_o, cols_o, keep_out, depth


def _translated_view(image, row_coords, col_coords, img_h, img_w):
    """Separable nearest gather for a pure-translation view.

    row_coords [out_h] / col_coords [out_w] are integral floats; pixels
    outside the true (img_h, img_w) extent are zero (matching
    _bilinear_sample's bounds)."""
    Hc, Wc, _ = image.shape
    r_ok = (row_coords >= 0) & (row_coords <= img_h - 1)
    c_ok = (col_coords >= 0) & (col_coords <= img_w - 1)
    iy = jnp.clip(jnp.round(row_coords).astype(jnp.int32), 0, Hc - 1)
    ix = jnp.clip(jnp.round(col_coords).astype(jnp.int32), 0, Wc - 1)
    out = image[iy][:, ix]
    return jnp.where((r_ok[:, None] & c_ok[None, :])[..., None], out, 0.0)


def _bilinear_sample(image, rows, cols, img_h, img_w):
    """Bilinear sample [Hc, Wc, 3] at float (rows, cols); 0 outside the
    actual image extent."""
    Hc, Wc, _ = image.shape
    r0 = jnp.floor(rows)
    c0 = jnp.floor(cols)
    fr = (rows - r0)[..., None]
    fc = (cols - c0)[..., None]
    r0i = jnp.clip(r0.astype(jnp.int32), 0, Hc - 1)
    c0i = jnp.clip(c0.astype(jnp.int32), 0, Wc - 1)
    r1i = jnp.clip(r0i + 1, 0, Hc - 1)
    c1i = jnp.clip(c0i + 1, 0, Wc - 1)
    v00 = image[r0i, c0i]
    v01 = image[r0i, c1i]
    v10 = image[r1i, c0i]
    v11 = image[r1i, c1i]
    out = (v00 * (1 - fr) * (1 - fc) + v01 * (1 - fr) * fc +
           v10 * fr * (1 - fc) + v11 * fr * fc)
    inside = ((rows >= 0) & (rows <= img_h - 1) &
              (cols >= 0) & (cols <= img_w - 1))
    return jnp.where(inside[..., None], out, 0.0)


def _resolve_fill(cfg: V2Config) -> str:
    if cfg.fill != "auto":
        return cfg.fill
    if jax.default_backend() == "tpu" and jax.device_count() == 1:
        return "pallas"
    return "scatter"


@functools.partial(jax.jit,
                   static_argnames=("cfg", "train", "return_points"))
def build_v2_batch(key, points, labels, valid, proj_matrix, images,
                   img_h, img_w, cfg: V2Config, train: bool, fovs=None,
                   return_points: bool = False):
    """Batched V2 preprocessing → (feature [B,H,W,8], mask, label).

    return_points=True appends (pt_pix, pt_label, pt_won) [B, N] for the
    point-domain Lovász (see perspective_pipeline.build_batch).
    """
    from ..ops.scatter import point_winner_flags

    B = points.shape[0]
    keys = jax.random.split(key, B)
    out_h, out_w = (cfg.proj_ht, cfg.proj_wt) if train \
        else (cfg.proj_h, cfg.proj_w)

    if fovs is None:
        fovs = jnp.tile(jnp.asarray([[cfg.fov_left, cfg.fov_right]],
                                    jnp.float32), (B, 1))

    if _resolve_fill(cfg) == "pallas":
        from ..ops.pallas.tile_fill import rasterize_zbuffer_pallas

        def geom(k, pts, lab, val, P, img, ih, iw, fov):
            return _v2_geometry(k, pts, lab, val, P, img, ih, iw, cfg,
                                train, fov)

        rows, cols, keep, depth, vals, rgb = jax.vmap(geom)(
            keys, points, labels, valid, proj_matrix, images, img_h,
            img_w, fovs)
        canvas, mask = rasterize_zbuffer_pallas(rows, cols, depth, keep,
                                                vals, out_h, out_w)
        lab = jnp.round(canvas[..., 5]).astype(jnp.int32)
        feature = jax.vmap(lambda c, r, m: _v2_normalize(c, r, m, cfg))(
            canvas, rgb, mask)
        if not return_points:
            return feature, mask, lab
        pix, won = jax.vmap(
            lambda r, c, d, k_: point_winner_flags(r, c, d, k_,
                                                   out_h, out_w)
        )(rows, cols, depth, keep)
        return feature, mask, lab, (pix, labels.astype(jnp.int32), won)

    def one(k, pts, lab, val, P, img, ih, iw, fov):
        f, m, l, rows, cols, keep, depth = build_v2_sample(
            k, pts, lab, val, P, img, ih, iw, cfg, train, fov)
        if not return_points:
            return f, m, l
        pix, won = point_winner_flags(rows, cols, depth, keep, out_h, out_w)
        return f, m, l, pix, won

    out = jax.vmap(one)(keys, points, labels, valid, proj_matrix, images,
                        img_h, img_w, fovs)
    if not return_points:
        return out
    f, m, l, pix, won = out
    return f, m, l, (pix, labels.astype(jnp.int32), won)


@functools.partial(jax.jit,
                   static_argnames=("cfg", "train", "return_points"))
def build_v2_batch_pix(key, points, labels, valid, rows, cols, images,
                       img_h, img_w, cfg: V2Config, train: bool,
                       return_points: bool = False):
    """Batched V2 preprocessing over precomputed pixel indices (A2D2)."""
    from ..ops.scatter import point_winner_flags

    B = points.shape[0]
    keys = jax.random.split(key, B)
    dummy_P = jnp.zeros((B, 3, 4), jnp.float32)
    out_h, out_w = (cfg.proj_ht, cfg.proj_wt) if train \
        else (cfg.proj_h, cfg.proj_w)

    if _resolve_fill(cfg) == "pallas":
        from ..ops.pallas.tile_fill import rasterize_zbuffer_pallas

        def geom(k, pts, lab, val, P, img, ih, iw, r, c):
            return _v2_geometry(k, pts, lab, val, P, img, ih, iw, cfg,
                                train, pix=(r, c))

        rows_o, cols_o, keep, depth, vals, rgb = jax.vmap(geom)(
            keys, points, labels, valid, dummy_P, images, img_h, img_w,
            rows, cols)
        canvas, mask = rasterize_zbuffer_pallas(rows_o, cols_o, depth,
                                                keep, vals, out_h, out_w)
        lab = jnp.round(canvas[..., 5]).astype(jnp.int32)
        feature = jax.vmap(lambda c, r, m: _v2_normalize(c, r, m, cfg))(
            canvas, rgb, mask)
        if not return_points:
            return feature, mask, lab
        pix, won = jax.vmap(
            lambda r, c, d, k_: point_winner_flags(r, c, d, k_,
                                                   out_h, out_w)
        )(rows_o, cols_o, depth, keep)
        return feature, mask, lab, (pix, labels.astype(jnp.int32), won)

    def one(k, pts, lab, val, P, img, ih, iw, r, c):
        f, m, l, rows_o, cols_o, keep, depth = build_v2_sample(
            k, pts, lab, val, P, img, ih, iw, cfg, train, pix=(r, c))
        if not return_points:
            return f, m, l
        pxi, won = point_winner_flags(rows_o, cols_o, depth, keep,
                                      out_h, out_w)
        return f, m, l, pxi, won

    out = jax.vmap(one)(keys, points, labels, valid, dummy_P, images,
                        img_h, img_w, rows, cols)
    if not return_points:
        return out
    f, m, l, pix, won = out
    return f, m, l, (pix, labels.astype(jnp.int32), won)


@functools.partial(jax.jit, static_argnames=("cfg",))
def build_v2_eval_sample_with_uproj(points, labels, valid, proj_matrix,
                                    image, img_h, img_w, cfg: V2Config,
                                    fov=None):
    """Eval path with per-point output-frame pixel coords (epmf_eval
    uproj mode)."""
    f, m, l, rows, cols, keep, depth = build_v2_sample(
        jax.random.PRNGKey(0), points, labels, valid, proj_matrix, image,
        img_h, img_w, cfg, train=False, fov=fov)
    return f, m, l, rows, cols, keep, depth
