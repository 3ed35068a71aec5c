"""Perspective-view ("LiDAR camera-plane image") preprocessing pipeline.

Parity: pc_processor/dataset/perspective_view_loader.py (PerspectiveViewLoader):
project LiDAR points into the RGB image plane, scatter xyzi/depth/label/
mask into image-sized planes, then 2D-augment (h-flip, ±15° rotation,
random/center crop, pad) into the network input:
  feature [H, W, 8] = depth, x, y, z, intensity, R, G, B
  mask    [H, W]    = projected-point occupancy
  label   [H, W]    = train-class id (0 = empty/ignore)

TPU-native design (the single biggest deviation from the reference —
SURVEY §7): the reference runs this per-sample in numpy DataLoader
workers; here it is one jitted, vmapped function of fixed-shape padded
inputs:
  * points padded to `n_points` with a validity mask;
  * images padded bottom/right to a fixed canvas; per-sample true
    (img_h, img_w) drive bounds checks and crop geometry as traced
    scalars — one compiled program for all sequences;
  * scatter = deterministic z-buffer (ops.scatter), nearest point wins
    (the reference's unsorted overwrite is file-order-dependent);
  * flip → rotate → crop → pad collapse into a single inverse-affine
    nearest gather (one pass over output pixels instead of three
    image-sized intermediates).
"""
from __future__ import annotations

import functools
from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.projection import perspective_project, perspective_project_cam
from ..ops.scatter import fill_canvas, zbuffer_scatter_packed
from .augment import AugmentConfig, augment_pointcloud


@dataclass(frozen=True)
class PVConfig:
    """Static pipeline geometry (mirrors YAML `sensor` group)."""
    canvas_h: int = 384     # >= max image height in the dataset
    canvas_w: int = 1248    # >= max image width
    proj_h: int = 384       # eval output size (sensor.proj_h)
    proj_w: int = 1232
    proj_ht: int = 256      # train output size (sensor.proj_ht)
    proj_wt: int = 1024
    h_pad: int = 7          # sensor.h_pad / w_pad
    w_pad: int = 3
    n_points: int = 131072  # point buffer bucket
    rot_deg: float = 15.0   # train RandomRotation bound
    p_hflip: float = 0.5
    img_mean: tuple = (12.12, 10.88, 0.23, -1.04, 0.21)
    img_stds: tuple = (12.32, 11.47, 6.91, 0.86, 0.16)
    pcd_aug: bool = False   # ref trainer.py:142 (PMF: no pcd aug)
    projection: str = "kitti"  # "kitti" (x>0.5, loose bounds) | "cam" (nuScenes)
    min_depth: float = 1.0     # cam mode: min camera-frame depth
    fill: str = "auto"      # z-buffer fill: "pallas" (sorted-winner tile
    # kernel, ~2x the scatter path on TPU) | "scatter" | "auto" (pallas
    # on a single-device TPU backend; scatter on CPU and under sharding,
    # where pallas_call has no partitioning rule)
    img_jitter: tuple | None = None  # train-time RGB ColorJitter strengths
    # (brightness, contrast, saturation) — ref loader img_aug=True with
    # ColorJitter(0.4, 0.4, 0.4) (perspective_view_loader.py:46-48)
    augment: AugmentConfig = field(default_factory=AugmentConfig)

    @property
    def train_crop(self):
        # RandomCrop target before re-padding (loader :66-68)
        return (self.proj_ht - 2 * self.h_pad, self.proj_wt - 2 * self.w_pad)

    @property
    def eval_crop(self):
        return (self.proj_h - 2 * self.h_pad, self.proj_w - 2 * self.w_pad)


def pad_points(pcd: np.ndarray, sem_label: np.ndarray, n_points: int):
    """Host-side: pad a ragged scan to the fixed point bucket."""
    n = min(len(pcd), n_points)
    points = np.zeros((n_points, pcd.shape[1]), dtype=np.float32)
    labels = np.zeros((n_points,), dtype=np.int32)
    valid = np.zeros((n_points,), dtype=bool)
    points[:n] = pcd[:n]
    labels[:n] = sem_label[:n]
    valid[:n] = True
    return points, labels, valid


def pad_image(img: np.ndarray, canvas_h: int, canvas_w: int):
    """Host-side: place the RGB image top-left on the fixed canvas, /255."""
    out = np.zeros((canvas_h, canvas_w, 3), dtype=np.float32)
    h = min(img.shape[0], canvas_h)
    w = min(img.shape[1], canvas_w)
    out[:h, :w] = img[:h, :w, :3].astype(np.float32) / 255.0
    return out, np.int32(h), np.int32(w)


def project_to_canvas(points, labels, valid, proj_matrix, image,
                      img_h, img_w, cfg: PVConfig):
    """Scatter a point cloud onto the padded image canvas.

    Returns dict with canvas-shaped planes + per-point projection data
    (used by eval unprojection, loader `return_uproj` mode :133-135).
    """
    if cfg.projection == "cam":
        rows, cols, keep = perspective_project_cam(
            points[:, :3], proj_matrix, img_h, img_w,
            min_depth=cfg.min_depth, valid=valid)
    else:
        rows, cols, keep = perspective_project(points[:, :3], proj_matrix,
                                               img_h, img_w, valid)
    depth = jnp.linalg.norm(points[:, : 3], axis=-1)
    winner, mask = zbuffer_scatter_packed(rows, cols, depth, keep,
                                          cfg.canvas_h, cfg.canvas_w)
    # one fused scatter of [depth, x, y, z, i, label] — no per-plane passes
    vals = jnp.concatenate(
        [depth[:, None], points[:, :4], labels[:, None].astype(jnp.float32)],
        axis=-1)
    canvas = fill_canvas(vals, rows, cols, keep, winner, mask)  # [Hc, Wc, 6]
    feature = jnp.concatenate([canvas[..., :5], image], axis=-1)  # 8ch
    lab = canvas[..., 5].astype(jnp.int32)
    return {
        "feature": feature,
        "mask": mask,
        "label": lab,
        "point_rows": rows, "point_cols": cols, "point_keep": keep,
        "point_depth": depth,
    }



def _affine_params(key, img_h, img_w, cfg: PVConfig, train: bool):
    """Sample the 2D-aug parameters (flip, θ, crop offset) of the view."""
    if train:
        ch, cw = cfg.train_crop
        k1, k2, k3, k4 = jax.random.split(key, 4)
        flip = jax.random.uniform(k1) < cfg.p_hflip
        theta = jax.random.uniform(k2, minval=-cfg.rot_deg,
                                   maxval=cfg.rot_deg) * jnp.pi / 180.0
        top = jax.random.randint(k3, (), 0, jnp.maximum(img_h - ch, 0) + 1)
        left = jax.random.randint(k4, (), 0, jnp.maximum(img_w - cw, 0) + 1)
    else:
        ch, cw = cfg.eval_crop
        flip = jnp.bool_(False)
        theta = jnp.float32(0.0)
        top = jnp.maximum(img_h - ch, 0) // 2
        left = jnp.maximum(img_w - cw, 0) // 2
    return flip, theta, top, left


def _view_geometry(key, points, labels, valid, proj_matrix, image,
                   img_h, img_w, cfg: PVConfig, train: bool,
                   aug_override=None):
    """Project and 2D-augment one scan's geometry WITHOUT the fill.

    Returns per-point (rows_o, cols_o, keep_out, depth,
    vals [N, 6] = depth/x/y/z/i/label) plus the augmented RGB view
    [out_h, out_w, 3] — everything the z-buffer fill needs, so callers
    can choose the scatter fill (per sample) or the batched Pallas tile
    kernel.

    TPU note: instead of scattering to an image-sized canvas and
    resampling it (one huge gather — slow on TPU), the affine view
    transform (flip → rotate → crop → pad) is applied FORWARD to the
    per-point float pixel coords and the points are z-buffer-scattered
    directly at the output resolution. RGB uses the inverse transform:
    a 3-channel nearest gather when rotated/flipped (train), a pure
    dynamic-slice + pad when not (eval).
    """
    out_h, out_w = (cfg.proj_ht, cfg.proj_wt) if train else (cfg.proj_h, cfg.proj_w)
    if cfg.projection == "cam":
        rows_f, cols_f, keep = perspective_project_cam(
            points[:, :3], proj_matrix, img_h, img_w,
            min_depth=cfg.min_depth, valid=valid)
    else:
        rows_f, cols_f, keep = perspective_project(points[:, :3], proj_matrix,
                                                   img_h, img_w, valid)
    depth = jnp.linalg.norm(points[:, :3], axis=-1)

    if aug_override is not None:
        # test hook: force (flip, theta, top, left) so the view can be
        # compared against a reference-faithful resample at identical
        # augmentation parameters (tests/test_aug_divergence.py)
        flip, theta, top, left = (jnp.asarray(v) for v in aug_override)
    else:
        flip, theta, top, left = _affine_params(key, img_h, img_w, cfg, train)
    ch, cw = cfg.train_crop if train else cfg.eval_crop
    cy = (img_h.astype(jnp.float32) - 1.0) / 2.0
    cx = (img_w.astype(jnp.float32) - 1.0) / 2.0
    ct, st = jnp.cos(theta), jnp.sin(theta)

    # forward map for points: int pixel (trunc like numpy scatter
    # perspective_view_loader.py:92-93) → flip → rotate → crop → pad
    pr = jnp.floor(rows_f)
    pc = jnp.floor(cols_f)
    pc = jnp.where(flip, img_w.astype(jnp.float32) - 1.0 - pc, pc)
    dys, dxs = pr - cy, pc - cx
    ro = cy + (-st * dxs + ct * dys) - top
    co = cx + (ct * dxs + st * dys) - left
    keep_out = keep & (ro >= -0.5) & (ro < ch - 0.5) & \
        (co >= -0.5) & (co < cw - 0.5)
    rows_o = jnp.round(ro).astype(jnp.int32) + cfg.h_pad
    cols_o = jnp.round(co).astype(jnp.int32) + cfg.w_pad

    vals = jnp.concatenate(
        [depth[:, None], points[:, :4], labels[:, None].astype(jnp.float32)],
        axis=-1)

    if train and cfg.img_jitter is not None:
        from .jitter import color_jitter
        image = color_jitter(jax.random.fold_in(key, 7), image, img_h,
                             img_w, cfg.img_jitter)

    # RGB view
    if train:
        yg = jax.lax.broadcasted_iota(jnp.float32, (out_h, out_w), 0) - cfg.h_pad
        xg = jax.lax.broadcasted_iota(jnp.float32, (out_h, out_w), 1) - cfg.w_pad
        dyo, dxo = (yg + top) - cy, (xg + left) - cx
        src_c = cx + (ct * dxo - st * dyo)
        src_r = cy + (st * dxo + ct * dyo)
        src_c = jnp.where(flip, img_w.astype(jnp.float32) - 1.0 - src_c, src_c)
        Hc, Wc = image.shape[0], image.shape[1]
        iy = jnp.clip(jnp.round(src_r).astype(jnp.int32), 0, Hc - 1)
        ix = jnp.clip(jnp.round(src_c).astype(jnp.int32), 0, Wc - 1)
        inb = ((yg >= 0) & (yg < ch) & (xg >= 0) & (xg < cw) &
               (src_r >= -0.5) & (src_r < img_h - 0.5) &
               (src_c >= -0.5) & (src_c < img_w - 0.5))
        rgb = jnp.where(inb[..., None], image[iy, ix], 0.0)
    else:
        # crop is a pure shift: slice the canvas, zero outside the pad
        window = jax.lax.dynamic_slice(
            image, (top, left, 0), (cfg.eval_crop[0], cfg.eval_crop[1], 3))
        rgb = jnp.pad(window, ((cfg.h_pad, cfg.h_pad),
                               (cfg.w_pad, cfg.w_pad), (0, 0)))
        # zero pixels beyond the true image extent (canvas padding)
        yg = jax.lax.broadcasted_iota(jnp.int32, (out_h, out_w), 0) - cfg.h_pad
        xg = jax.lax.broadcasted_iota(jnp.int32, (out_h, out_w), 1) - cfg.w_pad
        inb = ((yg >= 0) & (yg + top < img_h) & (xg >= 0) & (xg + left < img_w))
        rgb = jnp.where(inb[..., None], rgb, 0.0)

    return rows_o, cols_o, keep_out, depth, vals, rgb


def _build_view(key, points, labels, valid, proj_matrix, image,
                img_h, img_w, cfg: PVConfig, train: bool,
                aug_override=None):
    """_view_geometry + scatter-path z-buffer fill for one scan.

    Returns (feature [H,W,8], mask, label2d, rows, cols, keep, depth).
    """
    out_h, out_w = (cfg.proj_ht, cfg.proj_wt) if train \
        else (cfg.proj_h, cfg.proj_w)
    rows_o, cols_o, keep_out, depth, vals, rgb = _view_geometry(
        key, points, labels, valid, proj_matrix, image, img_h, img_w,
        cfg, train, aug_override)
    winner, mask = zbuffer_scatter_packed(rows_o, cols_o, depth, keep_out,
                                          out_h, out_w)
    canvas = fill_canvas(vals, rows_o, cols_o, keep_out, winner, mask)
    lab = canvas[..., 5].astype(jnp.int32)
    feature = jnp.concatenate([canvas[..., :5], rgb], axis=-1)
    return feature, mask, lab, rows_o, cols_o, keep_out, depth


def _affine_sample(planes: dict, src_y, src_x, in_bounds):
    """Nearest-gather feature/mask/label at float source coords.

    All planes are packed into one [Hc, Wc, 10] canvas so the resample is
    a single gather (TPU random gathers cost per row, not per channel).
    """
    Hc, Wc = planes["mask"].shape
    iy = jnp.clip(jnp.round(src_y).astype(jnp.int32), 0, Hc - 1)
    ix = jnp.clip(jnp.round(src_x).astype(jnp.int32), 0, Wc - 1)
    packed = jnp.concatenate(
        [planes["feature"],
         planes["mask"][..., None].astype(planes["feature"].dtype),
         planes["label"][..., None].astype(planes["feature"].dtype)], axis=-1)
    out = packed[iy, ix]
    out = jnp.where(in_bounds[..., None], out, 0.0)
    feat = out[..., :8]
    mask = out[..., 8] > 0.5
    lab = out[..., 9].astype(jnp.int32)
    return feat, mask, lab


def _crop_pad_grid(out_h, out_w, h_pad, w_pad, top, left):
    """Output-pixel grid → cropped-image coords; returns coords + the
    inside-the-pad mask."""
    yo = jax.lax.broadcasted_iota(jnp.float32, (out_h, out_w), 0)
    xo = jax.lax.broadcasted_iota(jnp.float32, (out_h, out_w), 1)
    yc = yo - h_pad
    xc = xo - w_pad
    inside = ((yc >= 0) & (yc < out_h - 2 * h_pad) &
              (xc >= 0) & (xc < out_w - 2 * w_pad))
    return yc + top, xc + left, inside


def train_view(key, planes: dict, img_h, img_w, cfg: PVConfig):
    """RandomHorizontalFlip → RandomRotation(±rot_deg, nearest, fill 0) →
    RandomCrop(train_crop) → Pad(w_pad, h_pad). One fused gather.

    Crop offsets are sampled within the *actual* image extent (the
    reference operates on image-sized tensors).
    """
    ch, cw = cfg.train_crop
    k1, k2, k3, k4 = jax.random.split(key, 4)
    flip = jax.random.uniform(k1) < cfg.p_hflip
    theta = jax.random.uniform(k2, minval=-cfg.rot_deg, maxval=cfg.rot_deg)
    theta = theta * jnp.pi / 180.0
    top = jax.random.randint(k3, (), 0, jnp.maximum(img_h - ch, 0) + 1)
    left = jax.random.randint(k4, (), 0, jnp.maximum(img_w - cw, 0) + 1)

    ys, xs, inside = _crop_pad_grid(cfg.proj_ht, cfg.proj_wt,
                                    cfg.h_pad, cfg.w_pad, top, left)
    # inverse rotation about the actual image center
    cy = (img_h.astype(jnp.float32) - 1.0) / 2.0
    cx = (img_w.astype(jnp.float32) - 1.0) / 2.0
    ct, st = jnp.cos(theta), jnp.sin(theta)
    dy, dx = ys - cy, xs - cx
    src_y = cy + (st * dx + ct * dy)
    src_x = cx + (ct * dx - st * dy)
    src_x = jnp.where(flip, img_w.astype(jnp.float32) - 1.0 - src_x, src_x)

    in_img = (inside & (src_y >= -0.5) & (src_y < img_h - 0.5) &
              (src_x >= -0.5) & (src_x < img_w - 0.5))
    return _affine_sample(planes, src_y, src_x, in_img)


def eval_view(planes: dict, img_h, img_w, cfg: PVConfig):
    """CenterCrop(eval_crop) → Pad. Identity geometry when the image is
    already eval_crop-sized (loader :71-74)."""
    ch, cw = cfg.eval_crop
    top = jnp.maximum(img_h - ch, 0) // 2
    left = jnp.maximum(img_w - cw, 0) // 2
    ys, xs, inside = _crop_pad_grid(cfg.proj_h, cfg.proj_w,
                                    cfg.h_pad, cfg.w_pad, top, left)
    in_img = inside & (ys < img_h) & (xs < img_w)
    return _affine_sample(planes, ys, xs, in_img)


def normalize_feature(feature, mask, cfg: PVConfig):
    """(f[0:5] - mean) / std * mask on the lidar channels; RGB untouched.

    Parity: tasks/pmf/trainer.py:291-295.
    """
    mean = jnp.asarray(cfg.img_mean, feature.dtype)
    std = jnp.asarray(cfg.img_stds, feature.dtype)
    lidar = (feature[..., :5] - mean) / std * mask[..., None].astype(feature.dtype)
    return jnp.concatenate([lidar, feature[..., 5:]], axis=-1)


def _resolve_fill(cfg: PVConfig) -> str:
    if cfg.fill != "auto":
        return cfg.fill
    if jax.default_backend() == "tpu" and jax.device_count() == 1:
        return "pallas"
    return "scatter"


@functools.partial(jax.jit,
                   static_argnames=("cfg", "train", "return_points"))
def build_batch(key, points, labels, valid, proj_matrix, images,
                img_h, img_w, cfg: PVConfig, train: bool,
                return_points: bool = False):
    """Batched end-to-end preprocessing: project, scatter, 2D-augment,
    normalize. All inputs carry a leading batch dim.

    Returns (feature [B,H,W,8] normalized, mask [B,H,W] bool,
    label [B,H,W] int32). With return_points=True a fourth element
    (pt_pix [B,N], pt_label [B,N], pt_won [B,N]) rides along — the flat
    winner pixel per point (H·W sentinel when invalid) for the
    point-domain Lovász (losses/lovasz.py lovasz_softmax_loss_points).
    """
    from ..ops.scatter import point_winner_flags

    B = points.shape[0]
    keys = jax.random.split(key, B)
    out_h, out_w = (cfg.proj_ht, cfg.proj_wt) if train \
        else (cfg.proj_h, cfg.proj_w)

    if _resolve_fill(cfg) == "pallas":
        from ..ops.pallas.tile_fill import rasterize_zbuffer_pallas

        def geom(k, pts, lab, val, P, img, ih, iw):
            if train and cfg.pcd_aug:
                pts = augment_pointcloud(k, pts, cfg.augment)
            return _view_geometry(jax.random.fold_in(k, 1), pts, lab, val,
                                  P, img, ih, iw, cfg, train)

        rows, cols, keep, depth, vals, rgb = jax.vmap(geom)(
            keys, points, labels, valid, proj_matrix, images, img_h, img_w)
        canvas, mask = rasterize_zbuffer_pallas(rows, cols, depth, keep,
                                                vals, out_h, out_w)
        lab = jnp.round(canvas[..., 5]).astype(jnp.int32)
        feature = jnp.concatenate([canvas[..., :5], rgb], axis=-1)
        if not return_points:
            return normalize_feature(feature, mask, cfg), mask, lab
        pix, won = jax.vmap(
            lambda r, c, d, k_: point_winner_flags(r, c, d, k_,
                                                   out_h, out_w)
        )(rows, cols, depth, keep)
        return (normalize_feature(feature, mask, cfg), mask, lab,
                (pix, labels.astype(jnp.int32), won))

    def one(k, pts, lab, val, P, img, ih, iw):
        if train and cfg.pcd_aug:
            pts = augment_pointcloud(k, pts, cfg.augment)
        f, m, l, rows, cols, keep, depth = _build_view(
            jax.random.fold_in(k, 1), pts, lab, val,
            P, img, ih, iw, cfg, train)
        if not return_points:
            return normalize_feature(f, m, cfg), m, l
        pix, won = point_winner_flags(rows, cols, depth, keep, out_h, out_w)
        return normalize_feature(f, m, cfg), m, l, pix, won

    if not return_points:
        return jax.vmap(one)(keys, points, labels, valid, proj_matrix,
                             images, img_h, img_w)
    f, m, l, pix, won = jax.vmap(one)(keys, points, labels, valid,
                                      proj_matrix, images, img_h, img_w)
    return f, m, l, (pix, labels.astype(jnp.int32), won)


@functools.partial(jax.jit, static_argnames=("cfg",))
def build_eval_sample_with_uproj(points, labels, valid, proj_matrix, image,
                                 img_h, img_w, cfg: PVConfig):
    """Single-scan eval path keeping per-point projection indices
    (loader `return_uproj` mode, used by tasks/pmf_eval_* infer.py).

    Returns (feature [H,W,8] normalized, mask, label2d, rows, cols, keep,
    depth) — rows/cols are canvas-space integer pixel coords per point.
    """
    f, m, l, rows, cols, keep, depth = _build_view(
        jax.random.PRNGKey(0), points, labels, valid, proj_matrix, image,
        img_h, img_w, cfg, train=False)
    return normalize_feature(f, m, cfg), m, l, rows, cols, keep, depth
