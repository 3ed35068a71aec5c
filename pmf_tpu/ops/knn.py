"""KNN 2D→3D label lifting as a fused window-gather + top-k.

Parity: pc_processor/postproc/knn.py:37-143 (KNN.forward):
  1. unfold S×S windows of the projected range image;
  2. gather the window of each 3D point's pixel;
  3. invalid (<0) ranges → +inf; window center ← the point's true range;
  4. |Δrange| weighted by an inverse-Gaussian spatial kernel;
  5. k smallest → candidate classes; optional distance cutoff → invalid;
  6. one-hot vote, argmax over classes 1..C-1, +1.

TPU-native design: the unfold becomes lax.conv_general_dilated_patches
(pure data movement XLA pipelines well); the per-point gather is one
take along H*W; voting is a one-hot matmul. Batched over points, no
Python loops; the whole function jits and fuses.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .reduce import argmax_last
import numpy as np

# numpy (not jnp) scalar: a module-level jnp constant would initialize
# the device backend at import time — host-only tools must be able to
# import pmf_tpu without touching the TPU relay
_INF = np.float32(np.inf)


def gaussian_kernel2d(kernel_size: int = 3, sigma: float = 2.0) -> np.ndarray:
    """Normalized 2D Gaussian (ref: knn.py:12-34, get_gaussian_kernel)."""
    ax = np.arange(kernel_size, dtype=np.float64)
    xx, yy = np.meshgrid(ax, ax, indexing="xy")
    mean = (kernel_size - 1) / 2.0
    var = sigma ** 2
    k = (1.0 / (2.0 * np.pi * var)) * np.exp(
        -((xx - mean) ** 2 + (yy - mean) ** 2) / (2.0 * var))
    return (k / k.sum()).astype(np.float32)


def _unfold(img: jax.Array, search: int) -> jax.Array:
    """Extract S×S patches of a [H, W] image → [H*W, S*S].

    Patch element order matches torch.nn.functional.unfold: row-major over
    the window.
    """
    H, W = img.shape
    patches = jax.lax.conv_general_dilated_patches(
        img[None, :, :, None],
        filter_shape=(search, search),
        window_strides=(1, 1),
        padding=((search // 2, search // 2), (search // 2, search // 2)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )  # [1, H, W, S*S] with channel = flattened window (C=1)
    return patches.reshape(H * W, search * search)


@functools.partial(jax.jit,
                   static_argnames=("knn", "search", "sigma", "cutoff", "nclasses"))
def knn_postprocess(proj_range: jax.Array, unproj_range: jax.Array,
                    proj_argmax: jax.Array, px: jax.Array, py: jax.Array,
                    valid: jax.Array | None = None,
                    knn: int = 5, search: int = 5, sigma: float = 1.0,
                    cutoff: float = 1.0, nclasses: int = 20) -> jax.Array:
    """Lift per-pixel argmax labels back to 3D points by KNN voting.

    Args:
      proj_range: [H, W] projected range image (-1 or <0 at empty pixels).
      unproj_range: [P] true range of every 3D point (padded).
      proj_argmax: [H, W] int predicted class per pixel.
      px, py: [P] int pixel coords of each point (col, row).
      valid: [P] bool padding mask (padded entries return class 0).
      knn/search/sigma/cutoff: ref config `post.KNN.params`.

    Returns: [P] int32 voted class labels.
    """
    if search % 2 == 0:
        raise ValueError("Nearest neighbor kernel must be odd number")
    H, W = proj_range.shape
    P = unproj_range.shape[0]
    S2 = search * search
    center = (S2 - 1) // 2

    idx_list = jnp.clip(py, 0, H - 1) * W + jnp.clip(px, 0, W - 1)  # [P]

    # window of ranges around each point's pixel
    range_patches = _unfold(proj_range, search)[idx_list]  # [P, S2]
    range_patches = jnp.where(range_patches < 0, _INF, range_patches)
    range_patches = range_patches.at[:, center].set(unproj_range)

    k2 = jnp.abs(range_patches - unproj_range[:, None])
    inv_gauss = (1.0 - gaussian_kernel2d(search, sigma)).reshape(-1)  # [S2]
    k2 = k2 * jnp.asarray(inv_gauss)[None, :]

    # k smallest weighted range differences
    neg_topv, knn_idx = jax.lax.top_k(-k2, knn)  # [P, k]
    knn_dist = -neg_topv

    argmax_patches = _unfold(proj_argmax.astype(jnp.float32), search)[idx_list]
    argmax_patches = argmax_patches.astype(jnp.int32)
    knn_argmax = jnp.take_along_axis(argmax_patches, knn_idx, axis=1)  # [P, k]

    if cutoff > 0:
        knn_argmax = jnp.where(knn_dist > cutoff, nclasses, knn_argmax)

    # one-hot vote over classes 0..C (C = invalid-after-cutoff bucket)
    votes = jax.nn.one_hot(knn_argmax, nclasses + 1, dtype=jnp.float32).sum(axis=1)
    # never choose unlabeled (0) or the invalid bucket (ref: knn.py:138)
    out = argmax_last(votes[:, 1:nclasses]) + 1
    if valid is not None:
        out = jnp.where(valid, out, 0)
    return out
