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


def upsample_bilinear_x2_packed(x: jax.Array) -> jax.Array:
    """Bilinear ×2 upsample emitted directly in the space-to-depth domain:
    [N, H, W, C] → [N, H, W, 4C] phase-major ≡ s2d(upsample_bilinear(x, 2)).

    With half-pixel centers (align_corners=False), output pixel 2Y+py maps
    to input coordinate Y + py/2 − 1/4, so each output phase is a fixed
    (1/4, 3/4) two-tap blend per axis with edge clamping — four shifted
    fused multiply-adds at HALF resolution instead of a gather-based
    resize at full resolution.
    """
    q, t = jnp.asarray(0.25, x.dtype), jnp.asarray(0.75, x.dtype)
    up = jnp.pad(x, ((0, 0), (1, 0), (0, 0), (0, 0)), mode="edge")[:, :-1]
    dn = jnp.pad(x, ((0, 0), (0, 1), (0, 0), (0, 0)), mode="edge")[:, 1:]
    r0 = q * up + t * x        # output row phase 0
    r1 = t * x + q * dn        # output row phase 1
    out = []
    for r in (r0, r1):
        lf = jnp.pad(r, ((0, 0), (0, 0), (1, 0), (0, 0)), mode="edge")[:, :, :-1]
        rt = jnp.pad(r, ((0, 0), (0, 0), (0, 1), (0, 0)), mode="edge")[:, :, 1:]
        out.append(q * lf + t * r)
        out.append(t * r + q * rt)
    return jnp.concatenate(out, axis=-1)


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
