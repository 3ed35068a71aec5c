"""Laplacian smoothness / gradient-guide losses.

Parity: pc_processor/loss/smoothness_loss.py — depthwise 3x3 Laplacian
divergence map (center 1, ring -1/8); GradGuideLoss matches the gradient
maps of pred vs. (stop-gradient) target with smooth-L1.

Channel-last: x is [N, H, W, C]; the Laplacian is a depthwise conv,
expressed as a feature-group-count convolution (XLA fuses it fine).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .weighted_smoothl1 import weighted_smooth_l1

import numpy as np

# numpy constant (module-level jnp would init the backend at import)
_LAPLACIAN = np.array(
    [[-0.125, -0.125, -0.125],
     [-0.125, 1.0, -0.125],
     [-0.125, -0.125, -0.125]], dtype=np.float32)


def _divergence_map(x: jax.Array) -> jax.Array:
    """Depthwise 3x3 Laplacian over [N, H, W, C]."""
    C = x.shape[-1]
    # kernel [3, 3, 1, C] with feature_group_count=C → depthwise.
    k = jnp.tile(_LAPLACIAN[:, :, None, None], (1, 1, 1, C)).astype(x.dtype)
    return jax.lax.conv_general_dilated(
        x, k, window_strides=(1, 1), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=C)


def smoothness_loss(x: jax.Array, size_average: bool = True) -> jax.Array:
    div = _divergence_map(x)
    return jnp.abs(div).mean() if size_average else div


def grad_guide_loss(x: jax.Array, target: jax.Array) -> jax.Array:
    t_grad = jax.lax.stop_gradient(_divergence_map(target))
    x_grad = _divergence_map(x)
    return weighted_smooth_l1(x_grad, t_grad)
