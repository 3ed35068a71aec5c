"""Point-cloud → image projections as pure, jittable functions.

TPU-native design: the reference computes these per-sample in numpy inside
DataLoader worker processes (pc_processor/dataset/semantic_kitti/parser.py:209-257,
pc_processor/dataset/preprocess/projection.py:31-86) with dynamic-length
outputs. Here every function takes fixed-size padded point buffers with a
validity mask and returns fixed-size results + masks, so the whole
projection pipeline fuses into the jitted preprocessing stage (and can be
vmapped over the batch).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def read_kitti_calib(calib_path: str) -> np.ndarray:
    """Parse a KITTI calib.txt and return the 3x4 camera projection P2 @ Tr.

    Parity: parser.py:142-162 (read_calib) and :74 (proj matrix compose).
    """
    calib = {}
    with open(calib_path, "r") as f:
        for line in f.readlines():
            if line == "\n":
                break
            key, value = line.split(":", 1)
            calib[key] = np.array([float(x) for x in value.split()])
    P2 = calib["P2"].reshape(3, 4)
    Tr = np.identity(4)
    Tr[:3, :4] = calib["Tr"].reshape(3, 4)
    return (P2 @ Tr).astype(np.float32)


def perspective_project(points: jax.Array, proj_matrix: jax.Array,
                        img_h: int, img_w: int,
                        valid: jax.Array | None = None):
    """Project LiDAR points into the camera image plane.

    Parity: parser.py:209-227 (mapLidar2Camera). Points behind the camera
    plane (x <= 0.5) or landing outside the image are masked out instead of
    being dropped (static shapes).

    Args:
      points: [N, 3] xyz in LiDAR frame (padded).
      proj_matrix: [3, 4] P2 @ Tr.
      img_h, img_w: image size (pixels).
      valid: [N] bool padding mask.

    Returns:
      rows: [N] float32 row coords (v), cols: [N] float32 col coords (u),
      keep: [N] bool — in front of vehicle AND strictly inside the image
            AND valid.
    """
    keep = points[:, 0] > 0.5
    if valid is not None:
        keep &= valid
    # elementwise projection (not a matmul) so TPU default-bf16 MXU
    # precision cannot shift pixel indices
    uvw = (points[:, :, None] * proj_matrix.T[None, :3, :]).sum(1) + proj_matrix.T[3]
    w = jnp.where(jnp.abs(uvw[:, 2]) > 1e-9, uvw[:, 2], 1e-9)
    u = uvw[:, 0] / w  # horizontal (col)
    v = uvw[:, 1] / w  # vertical (row)
    # ref bound check (parser.py:222-223): u in (0, W), v in (0, H)
    keep &= (u > 0) & (u < img_w) & (v > 0) & (v < img_h)
    return v, u, keep


def perspective_project_cam(points: jax.Array, proj_matrix: jax.Array,
                            img_h, img_w, min_depth: float = 1.0,
                            margin: float = 1.0,
                            valid: jax.Array | None = None):
    """Projection with camera-frame depth test (nuScenes-style).

    Parity: dataset_nuscenes.py:253-276 — keep points with camera depth
    (w of the composed projection) > min_depth and pixel coords within a
    `margin`-pixel border.

    Returns (rows, cols, keep).
    """
    uvw = (points[:, :3, None] * proj_matrix.T[None, :3, :]).sum(1) + proj_matrix.T[3]
    w = uvw[:, 2]
    keep = w > min_depth
    if valid is not None:
        keep &= valid
    safe_w = jnp.where(jnp.abs(w) > 1e-9, w, 1e-9)
    u = uvw[:, 0] / safe_w
    v = uvw[:, 1] / safe_w
    keep &= (u > margin) & (u < img_w - margin) & (v > margin) & (v < img_h - margin)
    return v, u, keep


def yaw_crop_project(points: jax.Array, proj_matrix: jax.Array,
                     fov_left: float = -np.pi / 4, fov_right: float = np.pi / 4,
                     valid: jax.Array | None = None):
    """Yaw-FOV-crop variant used by the EPMF V2 loaders.

    Parity: parser.py:229-257 (mapLidar2CameraCropYaw): keep points with
    euclidean depth > 0.5 m and yaw within [fov_left, fov_right]; project
    all kept points without image-bound filtering (the V2 loader computes
    its own tight box).

    Returns (rows, cols, keep).
    """
    depth = jnp.linalg.norm(points[:, :3], axis=-1)
    keep = depth > 0.5
    yaw = -jnp.arctan2(points[:, 1], points[:, 0])
    keep &= (yaw >= fov_left) & (yaw <= fov_right)
    if valid is not None:
        keep &= valid
    uvw = (points[:, :3, None] * proj_matrix.T[None, :3, :]).sum(1) + proj_matrix.T[3]
    w = jnp.where(jnp.abs(uvw[:, 2]) > 1e-9, uvw[:, 2], 1e-9)
    return uvw[:, 1] / w, uvw[:, 0] / w, keep


def spherical_project(points: jax.Array, fov_up_deg: float, fov_down_deg: float,
                      proj_h: int, proj_w: int,
                      fov_left_deg: float = -180.0, fov_right_deg: float = 180.0,
                      valid: jax.Array | None = None):
    """Spherical (range-image) projection.

    Parity: pc_processor/dataset/preprocess/projection.py:31-58
    (RangeProjection.doProjection): yaw/pitch → normalized grid coords,
    floor + clamp to integer pixel indices.

    Args:
      points: [N, >=3] xyz(+extra).
    Returns:
      px: [N] int32 column index, py: [N] int32 row index,
      depth: [N] float32 euclidean range, keep: [N] bool (= valid).
    """
    fov_up = fov_up_deg / 180.0 * np.pi
    fov_down = fov_down_deg / 180.0 * np.pi
    fov_v = abs(fov_up) + abs(fov_down)
    fov_left = fov_left_deg / 180.0 * np.pi
    fov_right = fov_right_deg / 180.0 * np.pi
    fov_h = abs(fov_left) + abs(fov_right)

    x, y, z = points[:, 0], points[:, 1], points[:, 2]
    depth = jnp.sqrt(x * x + y * y + z * z)
    safe_depth = jnp.maximum(depth, 1e-9)
    yaw = -jnp.arctan2(y, x)
    pitch = jnp.arcsin(jnp.clip(z / safe_depth, -1.0, 1.0))

    proj_x = (yaw + abs(fov_left)) / fov_h * proj_w
    proj_y = (1.0 - (pitch + abs(fov_down)) / fov_v) * proj_h

    px = jnp.clip(jnp.floor(proj_x), 0, proj_w - 1).astype(jnp.int32)
    py = jnp.clip(jnp.floor(proj_y), 0, proj_h - 1).astype(jnp.int32)
    keep = jnp.ones(px.shape, dtype=bool) if valid is None else valid
    return px, py, depth, keep
