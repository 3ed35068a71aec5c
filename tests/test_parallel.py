"""Data-parallel (and spatial) sharding tests on the virtual 8-CPU mesh."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pmf_tpu.models import PMFNet
from pmf_tpu.parallel import make_mesh, shard_batch, batch_sharding
from pmf_tpu.train import (
    TrainState, LossConfig, make_pmf_train_step, warmup_cosine_lr,
    hybrid_pmf_optimizer,
)


@pytest.fixture(scope="module")
def mesh8():
    assert len(jax.devices()) == 8
    return make_mesh(data=4, model=2)


def test_mesh_construction(mesh8):
    assert mesh8.shape == {"data": 4, "model": 2}


def _setup(nclasses=6):
    model = PMFNet(nclasses=nclasses, base_channels=8, image_backbone="resnet34")
    pcd = jnp.zeros((4, 32, 48, 5))
    img = jnp.zeros((4, 32, 48, 3))
    variables = model.init({"params": jax.random.PRNGKey(0),
                            "dropout": jax.random.PRNGKey(1)},
                           pcd, img, train=False)
    tx = hybrid_pmf_optimizer(warmup_cosine_lr(1e-3, 5, 50), 0.9, 1e-5)
    state = TrainState.create({"params": variables["params"],
                               "batch_stats": variables["batch_stats"]}, tx)
    cfg = LossConfig(nclasses=nclasses, alpha=tuple([0.0] + [1.0] * (nclasses - 1)))
    return model, tx, state, cfg


def test_sharded_train_step_matches_single_device(mesh8):
    """The jitted step over a sharded global batch must equal the
    unsharded run — DDP+SyncBN semantics by construction."""
    nclasses = 6
    model, tx, state, cfg = _setup(nclasses)
    step = make_pmf_train_step(model, tx, cfg)

    rng = np.random.default_rng(0)
    feature = rng.normal(size=(4, 32, 48, 8)).astype(np.float32)
    label = rng.integers(0, nclasses, size=(4, 32, 48))

    # single-device run (the step donates its input state, so build a
    # fresh identical one per call — _setup is deterministic)
    s1, aux1 = step(state, jnp.asarray(feature), jnp.asarray(label),
                    jax.random.PRNGKey(42))

    # sharded run: batch over 'data'
    _, _, state_b, _ = _setup(nclasses)
    sharded = shard_batch(mesh8, {"f": feature, "l": label})
    s2, aux2 = step(state_b, sharded["f"], sharded["l"],
                    jax.random.PRNGKey(42))

    np.testing.assert_allclose(float(aux1["loss"]), float(aux2["loss"]),
                               rtol=2e-4)
    np.testing.assert_allclose(np.asarray(aux1["conf"]),
                               np.asarray(aux2["conf"]), rtol=1e-5)
    # params after update agree (grad all-reduce correctness)
    l1 = jax.tree_util.tree_leaves(s1.params)
    l2 = jax.tree_util.tree_leaves(s2.params)
    for a, b in zip(l1, l2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=2e-5)


def _spatial_fwd_pair(mesh8):
    """(sharded, unsharded) eval forwards of the same model/weights with
    the batch sharded over 'data' and H over 'model'."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    model, tx, state, cfg = _setup()
    rng = np.random.default_rng(1)
    feature = rng.normal(size=(4, 32, 48, 8)).astype(np.float32)

    @jax.jit
    def fwd(params, batch_stats, f):
        return model.apply({"params": params, "batch_stats": batch_stats},
                           f[..., :5], f[..., 5:8], train=False)

    ref_lidar, _ = fwd(state.params, state.batch_stats, jnp.asarray(feature))
    fs = jax.device_put(feature, NamedSharding(mesh8, P("data", "model")))
    lidar, _ = fwd(state.params, state.batch_stats, fs)
    return np.asarray(lidar), np.asarray(ref_lidar)


def test_spatial_sharding_forward_exact(mesh8, monkeypatch):
    """H-axis spatial sharding (halo exchanges) is numerically exact:
    with eval-BN folding disabled, sharded == unsharded to float noise
    (measured 4.5e-8). Proves the partitioning itself is correct."""
    from pmf_tpu.models import layers

    monkeypatch.setattr(layers, "FOLD_EVAL_BN", False)
    lidar, ref = _spatial_fwd_pair(mesh8)
    np.testing.assert_allclose(lidar, ref, rtol=1e-5, atol=1e-6)


def test_spatial_sharding_forward_folded_bounded(mesh8):
    """The production eval path (BN folded into conv kernels) changes
    which conv codegen strategy XLA picks per program, so the sharded
    forward differs from the unsharded one by accumulation noise —
    bisected round 4 to the fold alone (barrier/epilogues irrelevant;
    models/layers.py FOLD_EVAL_BN). Bound it: ≤ 2e-3 abs on softmax
    outputs and ≥ 99% identical argmax even on random near-uniform
    weights (trained confident predictions flip far less)."""
    lidar, ref = _spatial_fwd_pair(mesh8)
    assert np.abs(lidar - ref).max() <= 2e-3
    agree = (lidar.argmax(-1) == ref.argmax(-1)).mean()
    assert agree >= 0.99, f"argmax agreement {agree:.4f}"


def test_preprocessing_under_sharding(mesh8):
    """The jitted projection/scatter pipeline accepts a data-sharded batch."""
    from pmf_tpu.data import PVConfig, build_batch

    cfg = PVConfig(canvas_h=32, canvas_w=64, proj_h=32, proj_w=64,
                   proj_ht=32, proj_wt=48, h_pad=2, w_pad=2, n_points=256)
    rng = np.random.default_rng(2)
    B = 4
    batch = {
        "points": rng.uniform(-20, 20, (B, 256, 4)).astype(np.float32),
        "labels": rng.integers(0, 20, (B, 256)).astype(np.int32),
        "valid": np.ones((B, 256), bool),
        "proj_matrix": np.tile(
            np.array([[30, -30, 0, 32 * 30 / 2], [0, 0, -30, 16 * 30 / 2],
                      [1, 0, 0, 0]], np.float32)[None], (B, 1, 1)),
        "image": rng.random((B, 32, 64, 3)).astype(np.float32),
        "img_h": np.full((B,), 32, np.int32),
        "img_w": np.full((B,), 64, np.int32),
    }
    sharded = shard_batch(mesh8, batch)
    f, m, l = build_batch(jax.random.PRNGKey(0), sharded["points"],
                          sharded["labels"], sharded["valid"],
                          sharded["proj_matrix"], sharded["image"],
                          sharded["img_h"], sharded["img_w"], cfg, True)
    assert f.shape == (B, 32, 48, 8)
    assert np.isfinite(np.asarray(f)).all()
