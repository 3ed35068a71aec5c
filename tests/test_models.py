import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pmf_tpu.models import (
    SalsaNext, PMFNet, EPMFNet, ResNetEncoder,
)


def _init(model, *xs, train=False):
    rngs = {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}
    return model.init(rngs, *xs, train=train)


def test_salsanext_shapes_and_softmax():
    m = SalsaNext(nclasses=20, base_channels=32)
    x = jnp.ones((1, 64, 128, 5))
    variables = _init(m, x)
    out = m.apply(variables, x, train=False)
    assert out.shape == (1, 64, 128, 20)
    np.testing.assert_allclose(np.asarray(out.sum(-1)), 1.0, rtol=1e-4)


def test_resnet_encoder_strides_and_channels():
    for backbone, e in [("resnet34", 1), ("resnet50", 4)]:
        m = ResNetEncoder(backbone=backbone)
        x = jnp.ones((1, 64, 96, 3))
        variables = _init(m, x)
        feats = m.apply(variables, x, train=False)
        assert len(feats) == 4
        for i, (s, c) in enumerate(zip([2, 4, 8, 16],
                                       [64 * e, 128 * e, 256 * e, 512 * e])):
            assert feats[i].shape == (1, 64 // s, 96 // s, c), \
                f"{backbone} stage {i}: {feats[i].shape}"


def test_pmfnet_forward():
    m = PMFNet(nclasses=20, base_channels=32, image_backbone="resnet34")
    pcd = jnp.ones((1, 64, 96, 5))
    img = jnp.ones((1, 64, 96, 3))
    variables = _init(m, pcd, img)
    lidar, cam = m.apply(variables, pcd, img, train=False)
    assert lidar.shape == (1, 64, 96, 20)
    assert cam.shape == (1, 64, 96, 20)
    np.testing.assert_allclose(np.asarray(lidar.sum(-1)), 1.0, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(cam.sum(-1)), 1.0, rtol=1e-4)


def test_pmfnet_train_mode_updates_batch_stats():
    m = PMFNet(nclasses=6, base_channels=8, image_backbone="resnet34")
    pcd = jax.random.normal(jax.random.PRNGKey(2), (2, 32, 48, 5))
    img = jax.random.normal(jax.random.PRNGKey(3), (2, 32, 48, 3))
    variables = _init(m, pcd, img, train=True)
    (lidar, cam), mutated = m.apply(
        variables, pcd, img, train=True,
        rngs={"dropout": jax.random.PRNGKey(4)},
        mutable=["batch_stats"])
    assert "batch_stats" in mutated
    # batch stats actually moved away from init
    leaves = jax.tree_util.tree_leaves(mutated["batch_stats"])
    assert any(float(jnp.abs(l).sum()) > 0 for l in leaves)


def test_pmfnet_gradients_flow_to_both_streams():
    m = PMFNet(nclasses=6, base_channels=8, image_backbone="resnet34")
    pcd = jax.random.normal(jax.random.PRNGKey(5), (1, 32, 48, 5))
    img = jax.random.normal(jax.random.PRNGKey(6), (1, 32, 48, 3))
    variables = _init(m, pcd, img)

    def loss_fn(params):
        lidar, cam = m.apply({"params": params,
                              "batch_stats": variables["batch_stats"]},
                             pcd, img, train=False)
        return (lidar.mean() + cam.mean()) * 100.0

    g = jax.grad(loss_fn)(variables["params"])
    for stream in ["lidar_stream", "camera_stream_encoder", "camera_stream_decoder"]:
        leaves = jax.tree_util.tree_leaves(g[stream])
        total = sum(float(jnp.abs(l).sum()) for l in leaves)
        assert total > 0, f"no gradient in {stream}"


def test_epmfnet_forward():
    m = EPMFNet(nclasses=20, base_channels=16, image_backbone="resnet34")
    pcd = jnp.ones((1, 64, 128, 5))
    img = jnp.ones((1, 64, 128, 3))
    variables = _init(m, pcd, img)
    lidar, cam = m.apply(variables, pcd, img, train=False)
    assert lidar.shape == (1, 64, 128, 20)
    assert cam.shape == (1, 64, 128, 20)
    np.testing.assert_allclose(np.asarray(lidar.sum(-1)), 1.0, rtol=1e-4)


def test_epmf_sparse_masking():
    """Zeroed input regions must stay zero through the sparse context
    blocks (epmf_net.py:79 output*mask)."""
    from pmf_tpu.models import SparseResContextBlock
    m = SparseResContextBlock(8)
    x = np.random.default_rng(0).normal(size=(1, 16, 16, 5)).astype(np.float32)
    x[:, 8:, :, :] = 0.0  # bottom half empty
    variables = m.init({"params": jax.random.PRNGKey(0)}, jnp.asarray(x), False)
    out = m.apply(variables, jnp.asarray(x), False)
    out = np.asarray(out)
    # dilation can grow the valid region by 1 pixel per conv; rows far
    # inside the empty region must be exactly zero
    assert np.abs(out[:, 12:, :, :]).max() == 0.0
    assert np.abs(out[:, :8, :, :]).max() > 0.0


def test_resnet_rejects_bad_size():
    m = ResNetEncoder(backbone="resnet34")
    with pytest.raises(ValueError):
        m.init({"params": jax.random.PRNGKey(0)}, jnp.ones((1, 60, 96, 3)),
               train=False)


def test_pmfnet_bfloat16_forward():
    m = PMFNet(nclasses=6, base_channels=8, image_backbone="resnet34",
               dtype=jnp.bfloat16)
    pcd = jnp.ones((1, 32, 48, 5))
    img = jnp.ones((1, 32, 48, 3))
    variables = _init(m, pcd, img)
    # params stay f32
    leaves = jax.tree_util.tree_leaves(variables["params"])
    assert all(l.dtype == jnp.float32 for l in leaves)
    lidar, cam = m.apply(variables, pcd, img, train=False)
    # outputs return to f32 probabilities
    assert lidar.dtype == jnp.float32
    np.testing.assert_allclose(np.asarray(lidar.sum(-1)), 1.0, rtol=1e-2)
    # bf16 forward close to f32 forward
    m32 = PMFNet(nclasses=6, base_channels=8, image_backbone="resnet34")
    lidar32, _ = m32.apply(variables, pcd, img, train=False)
    np.testing.assert_allclose(np.asarray(lidar), np.asarray(lidar32),
                               atol=0.05)
