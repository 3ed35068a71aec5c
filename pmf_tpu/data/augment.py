"""Point-cloud augmentation as pure JAX transforms.

Parity: pc_processor/dataset/preprocess/augmentor.py (Augmentor):
probabilistic x/y flips, per-axis uniform translation, intrinsic z-y-x
Euler rotation (scipy `R.from_euler("zyx", [yaw, pitch, roll])`) applied
as `pc @ R.T`.

TPU-native design: instead of mutating numpy arrays in DataLoader worker
processes, augmentation is a jittable function of (key, points) that
composes one 3×3 matrix + translation and runs fused on device, vmappable
over the batch.
"""
from __future__ import annotations

from dataclasses import dataclass, field

import jax
import jax.numpy as jnp


@dataclass(frozen=True)
class AugmentConfig:
    """Mirror of the YAML `augmentation` group (config_server_kitti.yaml:38-63)."""
    p_flipx: float = 0.0
    p_flipy: float = 0.0
    p_transx: float = 0.0
    trans_xmin: float = 0.0
    trans_xmax: float = 0.0
    p_transy: float = 0.0
    trans_ymin: float = 0.0
    trans_ymax: float = 0.0
    p_transz: float = 0.0
    trans_zmin: float = 0.0
    trans_zmax: float = 0.0
    p_rot_roll: float = 0.0
    rot_rollmin: float = 0.0
    rot_rollmax: float = 0.0
    p_rot_pitch: float = 0.0
    rot_pitchmin: float = 0.0
    rot_pitchmax: float = 0.0
    p_rot_yaw: float = 0.0
    rot_yawmin: float = 0.0
    rot_yawmax: float = 0.0

    @classmethod
    def from_dict(cls, d: dict) -> "AugmentConfig":
        keys = {f.name for f in cls.__dataclass_fields__.values()}  # type: ignore
        return cls(**{k: float(v) for k, v in d.items() if k in keys})


def _euler_zyx(yaw, pitch, roll):
    """Rotation matrix for intrinsic z-y-x Euler angles in degrees
    (== scipy R.from_euler('zyx', [yaw, pitch, roll], degrees=True))."""
    d2r = jnp.pi / 180.0
    cy, sy = jnp.cos(yaw * d2r), jnp.sin(yaw * d2r)
    cp, sp = jnp.cos(pitch * d2r), jnp.sin(pitch * d2r)
    cr, sr = jnp.cos(roll * d2r), jnp.sin(roll * d2r)
    Rz = jnp.array([[cy, -sy, 0.0], [sy, cy, 0.0], [0.0, 0.0, 1.0]])
    Ry = jnp.array([[cp, 0.0, sp], [0.0, 1.0, 0.0], [-sp, 0.0, cp]])
    Rx = jnp.array([[1.0, 0.0, 0.0], [0.0, cr, -sr], [0.0, sr, cr]])
    return Rz @ Ry @ Rx


def augment_pointcloud(key: jax.Array, points: jax.Array,
                       cfg: AugmentConfig) -> jax.Array:
    """Apply flip/translate/rotate augmentation to [N, >=3] points.

    Order matches augmentor.py:129-181: flips, then translation, then
    rotation. Extra feature columns (intensity, ...) pass through.
    """
    keys = jax.random.split(key, 9)
    xyz = points[:, :3]

    flipx = jax.random.uniform(keys[0]) < cfg.p_flipx
    flipy = jax.random.uniform(keys[1]) < cfg.p_flipy
    sign = jnp.array([jnp.where(flipx, -1.0, 1.0),
                      jnp.where(flipy, -1.0, 1.0), 1.0])
    xyz = xyz * sign[None, :]

    def _maybe(k1, k2, p, lo, hi):
        v = jax.random.uniform(k2, minval=lo, maxval=hi)
        return jnp.where(jax.random.uniform(k1) < p, v, 0.0)

    t = jnp.stack([
        _maybe(keys[2], keys[3], cfg.p_transx, cfg.trans_xmin, cfg.trans_xmax),
        _maybe(keys[4], keys[5], cfg.p_transy, cfg.trans_ymin, cfg.trans_ymax),
        _maybe(keys[6], keys[7], cfg.p_transz, cfg.trans_zmin, cfg.trans_zmax),
    ])
    xyz = xyz + t[None, :]

    rk = jax.random.split(keys[8], 6)
    roll = _maybe(rk[0], rk[1], cfg.p_rot_roll, cfg.rot_rollmin, cfg.rot_rollmax)
    pitch = _maybe(rk[2], rk[3], cfg.p_rot_pitch, cfg.rot_pitchmin, cfg.rot_pitchmax)
    yaw = _maybe(rk[4], rk[5], cfg.p_rot_yaw, cfg.rot_yawmin, cfg.rot_yawmax)
    R = _euler_zyx(yaw, pitch, roll)
    xyz = xyz @ R.T

    return jnp.concatenate([xyz, points[:, 3:]], axis=-1)
