"""Resize / reshuffle primitives used by the models (NHWC layouts).

Parity targets:
  * torch nn.Upsample(scale_factor=2, mode='bilinear', align_corners=False)
    and F.interpolate(..., mode='bilinear') — jax.image.resize('bilinear')
    uses the same half-pixel-center convention.
  * torch nn.PixelShuffle(2) — channel-to-space; torch channel order is
    (C_out, r, r), reproduced here for weight-conversion parity.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def upsample_bilinear(x: jax.Array, scale: int = 2,
                      size: tuple[int, int] | None = None) -> jax.Array:
    """Bilinear resize of [N, H, W, C] (align_corners=False semantics)."""
    N, H, W, C = x.shape
    if size is None:
        size = (H * scale, W * scale)
    return jax.image.resize(x, (N, size[0], size[1], C), method="bilinear")


def pixel_shuffle(x: jax.Array, r: int = 2) -> jax.Array:
    """PixelShuffle on NHWC: [N, H, W, C*r*r] → [N, H*r, W*r, C].

    Matches torch semantics where the input channel index factorizes as
    c * r * r + i * r + j (i=row offset, j=col offset).
    """
    N, H, W, Crr = x.shape
    C = Crr // (r * r)
    x = x.reshape(N, H, W, C, r, r)
    x = x.transpose(0, 1, 4, 2, 5, 3)  # N, H, r, W, r, C
    return x.reshape(N, H * r, W * r, C)
