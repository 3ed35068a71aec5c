"""Train-time RGB ColorJitter, jit-fused into the projection pipelines.

Parity: the reference trains PMF and EPMF with
``torchvision.transforms.ColorJitter(0.4, 0.4, 0.4)`` applied to the
camera image before projection
(pc_processor/dataset/perspective_view_loader.py:46-48,84-85, enabled at
tasks/pmf/trainer.py:142 and tasks/epmf/trainer.py:198).

Semantics implemented (torchvision tensor-mode ColorJitter):
  * each factor f_op ~ U[max(0, 1 - s), 1 + s];
  * the three ops are applied in a uniformly random order;
  * brightness:  img * f, clamped to [0, 1];
  * contrast:    blend toward the scalar mean of the grayscale image,
                 f * img + (1 - f) * mean(gray(img)), clamped;
  * saturation:  per-pixel blend toward grayscale,
                 f * img + (1 - f) * gray(img), clamped;
  * gray(img) = 0.2989 R + 0.587 G + 0.114 B (ITU-R 601-2).

Divergence from the reference noted for parity debugging: torchvision on
*PIL* images (the reference path) rounds to uint8 after every op and
rounds the contrast mean to an integer; this float implementation skips
the quantization (≤ 1/255 per-op difference, zero-mean).

TPU note: the image here lives on a fixed padded canvas, so the contrast
mean is computed over the TRUE image extent (img_h, img_w) only — the
reference jitters the unpadded image, and including canvas zero-padding
would bias the mean dark.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

_GRAY = (0.2989, 0.587, 0.114)


def _gray(img):
    w = jnp.asarray(_GRAY, img.dtype)
    return (img * w).sum(-1, keepdims=True)


def color_jitter_fixed(image, img_h, img_w, f, order):
    """Deterministic core: factors f [3] = (brightness, contrast,
    saturation) and an op-order permutation `order` [3] of {0, 1, 2}.

    image: [Hc, Wc, 3] float in [0, 1], valid content in the top-left
    (img_h, img_w) window (canvas padding beyond it is zero and stays
    zero: every op maps 0 → 0 except contrast, which is masked).
    """
    f = jnp.asarray(f, jnp.float32)
    order = jnp.asarray(order, jnp.int32)
    Hc, Wc = image.shape[0], image.shape[1]
    inb = ((jax.lax.broadcasted_iota(jnp.int32, (Hc, Wc), 0) < img_h) &
           (jax.lax.broadcasted_iota(jnp.int32, (Hc, Wc), 1) < img_w))
    inb3 = inb[..., None]
    n_px = (jnp.asarray(img_h) * jnp.asarray(img_w)).astype(jnp.float32)

    def brightness(img):
        return jnp.clip(img * f[0], 0.0, 1.0)

    def contrast(img):
        mean = jnp.where(inb3, _gray(img), 0.0).sum() / n_px
        out = jnp.clip(f[1] * img + (1.0 - f[1]) * mean, 0.0, 1.0)
        return jnp.where(inb3, out, img)

    def saturation(img):
        out = jnp.clip(f[2] * img + (1.0 - f[2]) * _gray(img), 0.0, 1.0)
        return out

    def body(i, img):
        return jax.lax.switch(order[i], (brightness, contrast, saturation),
                              img)

    return jax.lax.fori_loop(0, 3, body, image)


def color_jitter(key, image, img_h, img_w,
                 strength: tuple = (0.4, 0.4, 0.4)):
    """Random brightness/contrast/saturation on one image canvas:
    factors ~ U[max(0, 1-s), 1+s] per op, applied in random order."""
    sb, sc, ss = strength
    kf, ko = jax.random.split(key)
    lo = jnp.asarray([max(0.0, 1.0 - sb), max(0.0, 1.0 - sc),
                      max(0.0, 1.0 - ss)], jnp.float32)
    hi = jnp.asarray([1.0 + sb, 1.0 + sc, 1.0 + ss], jnp.float32)
    f = jax.random.uniform(kf, (3,)) * (hi - lo) + lo
    order = jax.random.permutation(ko, 3)
    return color_jitter_fixed(image, img_h, img_w, f, order)
