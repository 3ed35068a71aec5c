"""Spherical range-image preprocessing pipeline (SalsaNext input).

Parity: pc_processor/dataset/salsanext_loader.py (SalsaNextLoader) +
pc_processor/dataset/preprocess/projection.py (RangeProjection):
  feature [H, W, 5] = range, x, y, z, intensity — mean/std normalized
  and masked; label from the winning point per pixel; empty pixels -1 in
  the raw planes (0 after masking).

TPU-native: the far→near sort + overwrite z-buffer becomes the
deterministic scatter-min of ops.scatter; everything jits and vmaps.

NOTE (reference quirk preserved in the mask): RangeProjection marks
occupancy with `proj_idx > 0` (projection.py:84), silently dropping the
point with index 0. We use the correct `>= 0` occupancy; the one-pixel
difference is noise but documented here.
"""
from __future__ import annotations

import functools
from dataclasses import dataclass, field

import jax
import jax.numpy as jnp

from ..ops.projection import spherical_project
from ..ops.scatter import fill_canvas, zbuffer_scatter_packed
from .augment import AugmentConfig, augment_pointcloud


@dataclass(frozen=True)
class RangeConfig:
    proj_h: int = 64
    proj_w: int = 2048
    fov_up: float = 3.0
    fov_down: float = -25.0
    fov_left: float = -180.0
    fov_right: float = 180.0
    n_points: int = 131072
    img_mean: tuple = (12.12, 10.88, 0.23, -1.04, 0.21)
    img_stds: tuple = (12.32, 11.47, 6.91, 0.86, 0.16)
    pcd_aug: bool = True
    augment: AugmentConfig = field(default_factory=AugmentConfig)


def range_project(points, labels, valid, cfg: RangeConfig):
    """Project one padded scan to range-image planes.

    Returns dict: feature [H,W,5] (raw, -1 at empty like the reference),
    label [H,W] int32, mask [H,W] bool, proj_range [H,W],
    px/py/depth per point.
    """
    px, py, depth, keep = spherical_project(
        points, cfg.fov_up, cfg.fov_down, cfg.proj_h, cfg.proj_w,
        cfg.fov_left, cfg.fov_right, valid)
    winner, mask = zbuffer_scatter_packed(py, px, depth, keep,
                                          cfg.proj_h, cfg.proj_w)
    vals = jnp.concatenate(
        [depth[:, None], points[:, :4], labels[:, None].astype(jnp.float32)],
        axis=-1)
    canvas = fill_canvas(vals, py, px, keep, winner, mask)  # [H, W, 6]
    rng = jnp.where(mask, canvas[..., 0], -1.0)
    lab = canvas[..., 5].astype(jnp.int32)
    feature = jnp.concatenate(
        [rng[..., None], canvas[..., 1:5]], axis=-1)  # range,x,y,z,i
    return {"feature": feature, "label": lab, "mask": mask,
            "proj_range": rng, "px": px, "py": py, "depth": depth,
            "keep": keep}


def normalize_range_feature(feature, mask, cfg: RangeConfig):
    mean = jnp.asarray(cfg.img_mean, feature.dtype)
    std = jnp.asarray(cfg.img_stds, feature.dtype)
    f = (feature - mean) / std
    return f * mask[..., None].astype(feature.dtype)


@functools.partial(jax.jit, static_argnames=("cfg", "train"))
def build_range_batch(key, points, labels, valid, cfg: RangeConfig,
                      train: bool):
    """Batched: (augment) → spherical project → z-buffer → normalize.

    Returns (feature [B,H,W,5], label [B,H,W], mask [B,H,W]).
    """
    B = points.shape[0]
    keys = jax.random.split(key, B)

    def one(k, pts, lab, val):
        if train and cfg.pcd_aug:
            pts = augment_pointcloud(k, pts, cfg.augment)
        planes = range_project(pts, lab, val, cfg)
        f = normalize_range_feature(planes["feature"], planes["mask"], cfg)
        return f, planes["label"], planes["mask"]

    return jax.vmap(one)(keys, points, labels, valid)


@functools.partial(jax.jit, static_argnames=("cfg",))
def build_range_sample_with_uproj(points, labels, valid, cfg: RangeConfig):
    """Eval path keeping per-point pixel indices (return_uproj mode)."""
    planes = range_project(points, labels, valid, cfg)
    f = normalize_range_feature(planes["feature"], planes["mask"], cfg)
    return (f, planes["label"], planes["mask"], planes["proj_range"],
            planes["px"], planes["py"], planes["depth"], planes["keep"])
