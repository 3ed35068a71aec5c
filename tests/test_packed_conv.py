"""Exactness tests for the space-to-depth conv transform."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pmf_tpu.ops.packed_conv import (
    space_to_depth, depth_to_space, packed_conv, packed_avg_pool_3x3_s2,
    packed_max_pool_3x3_s2,
)
from pmf_tpu.models.layers import avg_pool_3x3_s2, max_pool_3x3_s2
from pmf_tpu.ops.resize import pixel_shuffle


def _conv(x, w, dil, pad):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), ((pad[0], pad[0]), (pad[1], pad[1])),
        rhs_dilation=(dil, dil),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def test_s2d_roundtrip():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 8, 12, 5)).astype(np.float32))
    np.testing.assert_array_equal(np.asarray(depth_to_space(space_to_depth(x))),
                                  np.asarray(x))


@pytest.mark.parametrize("k,dil,pad,ci,co", [
    (3, 1, (1, 1), 5, 32),    # context conv
    (3, 2, (2, 2), 32, 32),   # dilated conv
    (2, 2, (1, 1), 32, 32),   # the odd SalsaNext conv4
    (1, 1, (0, 0), 96, 32),   # 1x1 merge / logits
    (7, 1, (3, 3), 3, 64),    # ResNet stem
    (3, 1, (1, 1), 32, 64),   # resBlock conv2
    (3, 2, (2, 2), 64, 64),   # dilated (pair mode: input phase slice)
    (2, 2, (1, 1), 64, 64),   # conv4 (pair mode: flipped phase slice)
    (1, 1, (0, 0), 64, 64),   # 1x1
    (3, 1, (1, 1), 64, 128),  # wide
])
@pytest.mark.parametrize("pair_min_co", [None, 1])
def test_packed_conv_exact(k, dil, pad, ci, co, pair_min_co):
    rng = np.random.default_rng(k * 100 + dil)
    x = jnp.asarray(rng.normal(size=(2, 16, 24, ci)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(k, k, ci, co)).astype(np.float32))
    want = _conv(x, w, dil, pad)
    got = depth_to_space(packed_conv(space_to_depth(x), w, dil, pad,
                                     pair_min_co=pair_min_co))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)


def test_packed_avg_pool_exact():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(2, 16, 24, 32)).astype(np.float32))
    want = avg_pool_3x3_s2(x)
    got = packed_avg_pool_3x3_s2(space_to_depth(x), 32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-5)


def test_packed_max_pool_exact():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(2, 16, 24, 16)).astype(np.float32))
    want = max_pool_3x3_s2(x)
    got = packed_max_pool_3x3_s2(space_to_depth(x), 16)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5)


def test_s2d_of_pixel_shuffle_is_reshape():
    """s2d(pixel_shuffle(x)) must equal a pure channel reorder of x (no
    spatial movement) — upsample stages stay in the packed domain for
    free."""
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(1, 4, 6, 32)).astype(np.float32))
    up = pixel_shuffle(x, 2)             # [1, 8, 12, 8] full-res
    packed = space_to_depth(up)          # [1, 4, 6, 32]
    # same data, channel-permuted
    a = np.sort(np.asarray(packed).ravel())
    b = np.sort(np.asarray(x).ravel())
    np.testing.assert_allclose(a, b, rtol=1e-6)
    # and position-wise: every packed pixel holds the same multiset
    pa = np.sort(np.asarray(packed).reshape(-1, 32), axis=1)
    pb = np.sort(np.asarray(x).reshape(-1, 32), axis=1)
    np.testing.assert_allclose(pa, pb, rtol=1e-6)


def test_pixel_shuffle_to_packed_strict():
    from pmf_tpu.ops.packed_conv import pixel_shuffle_to_packed
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.normal(size=(1, 4, 6, 32)).astype(np.float32))
    want = space_to_depth(pixel_shuffle(x, 2))
    got = pixel_shuffle_to_packed(x)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_packed_pmfnet_matches_unpacked():
    """PMFNet(use_packed=True) must produce the same outputs from the
    SAME parameters as the standard model (f32, eval mode)."""
    from pmf_tpu.models import PMFNet

    rng = np.random.default_rng(5)
    pcd = jnp.asarray(rng.normal(size=(1, 32, 64, 5)).astype(np.float32))
    img = jnp.asarray(rng.normal(size=(1, 32, 64, 3)).astype(np.float32))
    m0 = PMFNet(nclasses=6, base_channels=8, image_backbone="resnet34")
    m1 = PMFNet(nclasses=6, base_channels=8, image_backbone="resnet34",
                use_packed=True)
    v = m0.init({"params": jax.random.PRNGKey(0),
                 "dropout": jax.random.PRNGKey(1)}, pcd, img, train=False)
    v1 = m1.init({"params": jax.random.PRNGKey(0),
                  "dropout": jax.random.PRNGKey(1)}, pcd, img, train=False)
    # identical parameter trees (paths and shapes)
    p0 = jax.tree_util.tree_flatten_with_path(v["params"])[0]
    p1 = jax.tree_util.tree_flatten_with_path(v1["params"])[0]
    assert [(jax.tree_util.keystr(k), x.shape) for k, x in p0] == \
        [(jax.tree_util.keystr(k), x.shape) for k, x in p1]

    lidar0, cam0 = m0.apply(v, pcd, img, train=False)
    lidar1, cam1 = m1.apply(v, pcd, img, train=False)  # SAME params
    np.testing.assert_allclose(np.asarray(lidar1), np.asarray(lidar0),
                               rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(cam1), np.asarray(cam0),
                               rtol=1e-3, atol=1e-4)


def test_packed_pmfnet_train_step_runs():
    """Packed mode must train (BN stats update with pooled phases)."""
    from pmf_tpu.models import PMFNet

    rng = np.random.default_rng(6)
    pcd = jnp.asarray(rng.normal(size=(2, 32, 64, 5)).astype(np.float32))
    img = jnp.asarray(rng.normal(size=(2, 32, 64, 3)).astype(np.float32))
    m = PMFNet(nclasses=6, base_channels=8, use_packed=True)
    v = m.init({"params": jax.random.PRNGKey(0),
                "dropout": jax.random.PRNGKey(1)}, pcd, img, train=False)

    def loss(params):
        (l, c), mut = m.apply({"params": params,
                               "batch_stats": v["batch_stats"]},
                              pcd, img, train=True,
                              rngs={"dropout": jax.random.PRNGKey(2)},
                              mutable=["batch_stats"])
        return (l.mean() + c.mean()) * 100

    g = jax.grad(loss)(v["params"])
    assert all(np.isfinite(np.asarray(x)).all()
               for x in jax.tree_util.tree_leaves(g))
