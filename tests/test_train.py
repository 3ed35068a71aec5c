import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from pmf_tpu.models import PMFNet, SalsaNext
from pmf_tpu.train import (
    warmup_cosine_lr, hybrid_pmf_optimizer, adamw, TrainState, LossConfig,
    make_pmf_train_step, make_pmf_eval_step, make_salsanext_train_step,
    partial_load, kitti_focal_alpha,
)


def test_warmup_cosine_schedule():
    s = warmup_cosine_lr(0.001, warmup_steps=100, max_steps=1000)
    np.testing.assert_allclose(float(s(0)), 0.0, atol=1e-9)
    np.testing.assert_allclose(float(s(50)), 0.0005, rtol=1e-5)
    np.testing.assert_allclose(float(s(100)), 0.001, rtol=1e-5)
    np.testing.assert_allclose(float(s(600)), 0.0005, rtol=1e-4)  # cos mid
    np.testing.assert_allclose(float(s(1100)), 0.0, atol=1e-9)
    np.testing.assert_allclose(float(s(5000)), 0.0, atol=1e-9)  # clamped


def test_kitti_focal_alpha():
    freq = np.array([0.1, 0.2, 0.3, 0.4], dtype=np.float64)
    ignore = {0: True, 1: False, 2: False, 3: False}
    a = kitti_focal_alpha(freq, ignore)
    assert a[0] == 0.0
    assert a.max() == 1.0
    assert (a[1:] > 0).all()
    assert a[1] > a[2] > a[3]  # rarer class → larger alpha


def _tiny_pmf_state(nclasses=6):
    model = PMFNet(nclasses=nclasses, base_channels=8, image_backbone="resnet34")
    pcd = jnp.zeros((2, 32, 48, 5))
    img = jnp.zeros((2, 32, 48, 3))
    variables = model.init({"params": jax.random.PRNGKey(0),
                            "dropout": jax.random.PRNGKey(1)},
                           pcd, img, train=False)
    sched = warmup_cosine_lr(1e-3, 10, 100)
    tx = hybrid_pmf_optimizer(sched, momentum=0.9, weight_decay=1e-5)
    state = TrainState.create(
        {"params": variables["params"],
         "batch_stats": variables["batch_stats"]}, tx)
    return model, tx, state


def test_pmf_train_step_runs_and_learns():
    nclasses = 6
    model, tx, state = _tiny_pmf_state(nclasses)
    cfg = LossConfig(nclasses=nclasses,
                     alpha=tuple([0.0] + [1.0] * (nclasses - 1)),
                     lambda_=1.0, gamma=0.5, tau=0.7)
    step = make_pmf_train_step(model, tx, cfg)

    rng = np.random.default_rng(0)
    feature = jnp.asarray(rng.normal(size=(2, 32, 48, 8)).astype(np.float32))
    label = jnp.asarray(rng.integers(0, nclasses, size=(2, 32, 48)))

    losses = []
    for i in range(3):
        state, aux = step(state, feature, label, jax.random.PRNGKey(i))
        losses.append(float(aux["loss"]))
        assert np.isfinite(losses[-1])
    assert int(state.step) == 3
    assert aux["conf"].shape == (nclasses, nclasses)
    # conf matrix counts every pixel
    assert float(aux["conf"].sum()) == 2 * 32 * 48
    # optimizer actually moved both streams
    def delta(a, b):
        return sum(float(jnp.abs(x - y).sum()) for x, y in
                   zip(jax.tree_util.tree_leaves(a), jax.tree_util.tree_leaves(b)))
    # compare against a fresh init
    _, _, state0 = _tiny_pmf_state(nclasses)
    assert delta(state.params["lidar_stream"], state0.params["lidar_stream"]) > 0
    assert delta(state.params["camera_stream_encoder"],
                 state0.params["camera_stream_encoder"]) > 0


def test_pmf_train_step_remat_is_exact():
    """remat=True (jax.checkpoint around the forward) must produce the
    SAME loss and parameter update — it only changes what the backward
    keeps live vs recomputes."""
    nclasses = 6
    cfg = LossConfig(nclasses=nclasses,
                     alpha=tuple([0.0] + [1.0] * (nclasses - 1)),
                     lambda_=1.0, gamma=0.5, tau=0.7)
    rng = np.random.default_rng(2)
    feature = jnp.asarray(rng.normal(size=(2, 32, 48, 8)).astype(np.float32))
    label = jnp.asarray(rng.integers(0, nclasses, size=(2, 32, 48)))

    results = []
    for remat in (False, True):
        model, tx, state = _tiny_pmf_state(nclasses)
        step = make_pmf_train_step(model, tx, cfg, donate=False, remat=remat)
        state, aux = step(state, feature, label, jax.random.PRNGKey(7))
        results.append((float(aux["loss"]), state.params))
    assert results[0][0] == results[1][0]
    for a, b in zip(jax.tree_util.tree_leaves(results[0][1]),
                    jax.tree_util.tree_leaves(results[1][1])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_pmf_eval_step():
    nclasses = 6
    model, tx, state = _tiny_pmf_state(nclasses)
    cfg = LossConfig(nclasses=nclasses,
                     alpha=tuple([0.0] + [1.0] * (nclasses - 1)))
    estep = make_pmf_eval_step(model, cfg)
    rng = np.random.default_rng(1)
    feature = jnp.asarray(rng.normal(size=(1, 32, 48, 8)).astype(np.float32))
    label = jnp.asarray(rng.integers(0, nclasses, size=(1, 32, 48)))
    aux, pred = estep(state, feature, label)
    assert pred.shape == (1, 32, 48, nclasses)
    assert np.isfinite(float(aux["loss"]))


def test_salsanext_train_step():
    nclasses = 5
    model = SalsaNext(nclasses=nclasses, base_channels=8)
    x = jnp.zeros((2, 16, 64, 5))
    variables = model.init({"params": jax.random.PRNGKey(0),
                            "dropout": jax.random.PRNGKey(1)}, x, train=False)
    tx = adamw(warmup_cosine_lr(1e-3, 5, 50))
    state = TrainState.create({"params": variables["params"],
                               "batch_stats": variables["batch_stats"]}, tx)
    cfg = LossConfig(nclasses=nclasses, alpha=tuple([0.0] + [1.0] * 4))
    step = make_salsanext_train_step(model, tx, cfg)
    rng = np.random.default_rng(2)
    f = jnp.asarray(rng.normal(size=(2, 16, 64, 5)).astype(np.float32))
    l = jnp.asarray(rng.integers(0, nclasses, size=(2, 16, 64)))
    state, aux = step(state, f, l, jax.random.PRNGKey(0))
    assert np.isfinite(float(aux["loss"]))
    assert int(state.step) == 1


def test_hybrid_optimizer_routes_param_groups():
    """AdamW leaves must carry Adam mu/nu state; SGD leaves momentum."""
    model, tx, state = _tiny_pmf_state()
    # multi_transform state: inner_states dict keyed by label
    inner = state.opt_state.inner_states
    assert set(inner.keys()) == {"adamw", "sgd"}


def test_partial_load_shape_mismatch_skipped():
    target = {"a": np.zeros((2, 3)), "b": {"c": np.zeros(4)}}
    source = {"a": np.ones((2, 3)), "b": {"c": np.ones(5)}}  # c mismatched
    out = partial_load(target, source)
    np.testing.assert_array_equal(out["a"], np.ones((2, 3)))
    np.testing.assert_array_equal(out["b"]["c"], np.zeros(4))


def test_torch_convert_roundtrip():
    """Fabricate a torchvision-style resnet34 state_dict (subset) and
    check the converter places tensors correctly."""
    torch = pytest.importorskip("torch")
    from pmf_tpu.models.torch_convert import convert_resnet_state_dict

    rng = np.random.default_rng(0)
    sd = {
        "conv1.weight": torch.from_numpy(
            rng.normal(size=(64, 3, 7, 7)).astype(np.float32)),
        "bn1.weight": torch.from_numpy(rng.normal(size=64).astype(np.float32)),
        "bn1.bias": torch.from_numpy(rng.normal(size=64).astype(np.float32)),
        "bn1.running_mean": torch.from_numpy(np.zeros(64, np.float32)),
        "bn1.running_var": torch.from_numpy(np.ones(64, np.float32)),
        "bn1.num_batches_tracked": torch.tensor(0),
        "layer1.0.conv1.weight": torch.from_numpy(
            rng.normal(size=(64, 64, 3, 3)).astype(np.float32)),
        "layer1.0.bn1.weight": torch.from_numpy(
            rng.normal(size=64).astype(np.float32)),
        "layer2.0.downsample.0.weight": torch.from_numpy(
            rng.normal(size=(128, 64, 1, 1)).astype(np.float32)),
        "layer2.0.downsample.1.running_var": torch.from_numpy(
            np.ones(128, np.float32)),
        "fc.weight": torch.from_numpy(rng.normal(size=(1000, 512)).astype(np.float32)),
    }
    sd_np = {k: v.numpy() if hasattr(v, "numpy") else v for k, v in sd.items()}
    params, stats = convert_resnet_state_dict(sd_np)
    np.testing.assert_array_equal(
        params["conv1"]["Conv_0"]["kernel"],
        np.transpose(sd_np["conv1.weight"], (2, 3, 1, 0)))
    np.testing.assert_array_equal(params["bn1"]["BatchNorm_0"]["scale"],
                                  sd_np["bn1.weight"])
    np.testing.assert_array_equal(stats["bn1"]["BatchNorm_0"]["mean"],
                                  sd_np["bn1.running_mean"])
    np.testing.assert_array_equal(
        params["layer1_0"]["conv1"]["Conv_0"]["kernel"],
        np.transpose(sd_np["layer1.0.conv1.weight"], (2, 3, 1, 0)))
    np.testing.assert_array_equal(
        params["layer2_0"]["downsample_conv"]["Conv_0"]["kernel"],
        np.transpose(sd_np["layer2.0.downsample.0.weight"], (2, 3, 1, 0)))
    np.testing.assert_array_equal(
        stats["layer2_0"]["downsample_bn"]["BatchNorm_0"]["var"],
        sd_np["layer2.0.downsample.1.running_var"])
    assert "fc" not in params

    # converted weights slot into the real encoder via partial_load
    import jax
    import jax.numpy as jnp
    from pmf_tpu.models.resnet import ResNetEncoder
    from pmf_tpu.train.checkpoint import partial_load

    enc = ResNetEncoder(backbone="resnet34")
    v = enc.init({"params": jax.random.PRNGKey(0)},
                 jnp.zeros((1, 32, 48, 3)), train=False)
    merged = partial_load(dict(v["params"]), params)
    np.testing.assert_array_equal(
        np.asarray(merged["conv1"]["Conv_0"]["kernel"]),
        np.transpose(sd_np["conv1.weight"], (2, 3, 1, 0)))


def test_warmup_multistep_and_clip():
    from pmf_tpu.train import warmup_multistep_lr, clip_lr

    s = warmup_multistep_lr(0.01, warmup_steps=10, milestones=[100, 200],
                            gamma=0.1)
    np.testing.assert_allclose(float(s(5)), 0.005, rtol=1e-6)
    np.testing.assert_allclose(float(s(50)), 0.01, rtol=1e-6)
    np.testing.assert_allclose(float(s(150)), 0.001, rtol=1e-6)
    np.testing.assert_allclose(float(s(250)), 0.0001, rtol=1e-6)
    c = clip_lr(s, 0.001)
    np.testing.assert_allclose(float(c(250)), 0.001, rtol=1e-6)
