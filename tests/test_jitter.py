"""ColorJitter golden tests vs a numpy re-implementation of
torchvision's tensor-mode ColorJitter (functional_tensor semantics)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pmf_tpu.data.jitter import color_jitter, color_jitter_fixed

pytestmark = pytest.mark.smoke


def np_gray(img):
    return (img * np.array([0.2989, 0.587, 0.114])).sum(-1, keepdims=True)


def np_color_jitter(img, f, order):
    """numpy torchvision ColorJitter (float tensor semantics):
    brightness = img*f; contrast = blend toward mean(gray);
    saturation = blend toward gray; clamp after each op."""
    out = img.copy()
    for op in order:
        if op == 0:
            out = np.clip(out * f[0], 0, 1)
        elif op == 1:
            mean = np_gray(out).mean()
            out = np.clip(f[1] * out + (1 - f[1]) * mean, 0, 1)
        else:
            out = np.clip(f[2] * out + (1 - f[2]) * np_gray(out), 0, 1)
    return out


@pytest.mark.parametrize("order", [(0, 1, 2), (2, 1, 0), (1, 0, 2)])
def test_jitter_matches_numpy_golden(order):
    rng = np.random.default_rng(0)
    img = rng.random((24, 32, 3)).astype(np.float32)
    f = np.array([1.3, 0.7, 1.25], np.float32)
    got = np.asarray(color_jitter_fixed(jnp.asarray(img), 24, 32, f, order))
    want = np_color_jitter(img, f, order)
    np.testing.assert_allclose(got, want, atol=2e-6)


def test_jitter_contrast_mean_excludes_canvas_padding():
    """The contrast mean must come from the true (img_h, img_w) extent —
    zero canvas padding would bias it dark (the reference jitters the
    unpadded PIL image)."""
    rng = np.random.default_rng(1)
    h, w = 16, 20
    img = rng.random((h, w, 3)).astype(np.float32)
    canvas = np.zeros((24, 32, 3), np.float32)
    canvas[:h, :w] = img
    f = np.array([1.0, 0.5, 1.0], np.float32)  # contrast only
    got = np.asarray(color_jitter_fixed(jnp.asarray(canvas), h, w, f,
                                        (1, 0, 2)))
    want = np_color_jitter(img, f, [1])
    np.testing.assert_allclose(got[:h, :w], want, atol=2e-6)
    # padding untouched (stays zero)
    assert got[h:].max() == 0.0 and got[:, w:].max() == 0.0


def test_jitter_vs_torchvision_oracle():
    tv = pytest.importorskip("torchvision.transforms.functional")
    import torch

    rng = np.random.default_rng(2)
    img = rng.random((24, 32, 3)).astype(np.float32)
    t = torch.from_numpy(img).permute(2, 0, 1)
    f = np.array([1.35, 0.62, 1.18], np.float32)
    want = tv.adjust_saturation(
        tv.adjust_contrast(tv.adjust_brightness(t, float(f[0])),
                           float(f[1])), float(f[2]))
    got = np.asarray(color_jitter_fixed(jnp.asarray(img), 24, 32, f,
                                        (0, 1, 2)))
    np.testing.assert_allclose(got, want.permute(1, 2, 0).numpy(),
                               atol=1e-5)


def test_jitter_random_wrapper_bounds_and_identity():
    rng = np.random.default_rng(3)
    img = rng.random((16, 16, 3)).astype(np.float32)
    out = np.asarray(color_jitter(jax.random.PRNGKey(0), jnp.asarray(img),
                                  16, 16, (0.4, 0.4, 0.4)))
    assert out.min() >= 0.0 and out.max() <= 1.0
    # zero strength → identity
    same = np.asarray(color_jitter(jax.random.PRNGKey(1), jnp.asarray(img),
                                   16, 16, (0.0, 0.0, 0.0)))
    np.testing.assert_allclose(same, img, atol=1e-6)


def test_jitter_active_in_train_pipeline():
    """build_batch with img_jitter set produces different RGB channels
    from the no-jitter run, identical lidar channels/labels."""
    from pmf_tpu.data import PVConfig, build_batch
    import dataclasses

    cfg = PVConfig(canvas_h=32, canvas_w=64, proj_h=32, proj_w=64,
                   proj_ht=32, proj_wt=48, h_pad=2, w_pad=2, n_points=256)
    cfg_j = dataclasses.replace(cfg, img_jitter=(0.4, 0.4, 0.4))
    rng = np.random.default_rng(4)
    B = 2
    args = (
        jnp.asarray(rng.uniform(-20, 20, (B, 256, 4)).astype(np.float32)),
        jnp.asarray(rng.integers(0, 20, (B, 256)).astype(np.int32)),
        jnp.ones((B, 256), bool),
        jnp.asarray(np.tile(np.array(
            [[30, -30, 0, 32 * 15], [0, 0, -30, 16 * 15], [1, 0, 0, 0]],
            np.float32)[None], (B, 1, 1))),
        jnp.asarray(rng.random((B, 32, 64, 3)).astype(np.float32)),
        jnp.full((B,), 32, jnp.int32),
        jnp.full((B,), 64, jnp.int32),
    )
    key = jax.random.PRNGKey(5)
    f0, m0, l0 = build_batch(key, *args, cfg, True)
    f1, m1, l1 = build_batch(key, *args, cfg_j, True)
    np.testing.assert_array_equal(np.asarray(l0), np.asarray(l1))
    np.testing.assert_allclose(np.asarray(f0[..., :5]),
                               np.asarray(f1[..., :5]), atol=1e-6)
    assert np.abs(np.asarray(f0[..., 5:]) - np.asarray(f1[..., 5:])).max() \
        > 1e-3
