import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pmf_tpu.data.sensat_urban import (
    read_ply, write_ply, compute_bev_feature, prepare_bev_frames,
    SensatUrban, SensatConfig, build_sensat_batch, sensat_frame_weights,
)


def test_ply_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    fields = {
        "x": rng.normal(size=50).astype(np.float32),
        "y": rng.normal(size=50).astype(np.float32),
        "z": rng.normal(size=50).astype(np.float32),
        "red": rng.integers(0, 255, 50).astype(np.uint8),
        "green": rng.integers(0, 255, 50).astype(np.uint8),
        "blue": rng.integers(0, 255, 50).astype(np.uint8),
        "class": rng.integers(0, 13, 50).astype(np.uint8),
    }
    path = str(tmp_path / "test.ply")
    write_ply(path, fields)
    back = read_ply(path)
    for k, v in fields.items():
        np.testing.assert_array_equal(back[k], v)


def _slow_bev(pc, grid=0.1):
    """Literal re-derivation of the reference python loop."""
    min_x, min_y = pc[:, 0].min(), pc[:, 1].min()
    h_idx = ((pc[:, 1] - min_y) / grid).astype(np.int32)
    w_idx = ((pc[:, 0] - min_x) / grid).astype(np.int32)
    H, W = h_idx.max() + 1, w_idx.max() + 1
    f = np.zeros((8, H, W))
    lab = np.zeros((H, W)) - 1
    for i in range(len(pc)):
        p = pc[i]
        hi, wi = h_idx[i], w_idx[i]
        if f[4, hi, wi]:
            if f[0, hi, wi] < p[2]:
                f[0, hi, wi] = p[2]
                lab[hi, wi] = p[6]
                f[5:8, hi, wi] = p[3:6]
            if f[1, hi, wi] > p[2]:
                f[1, hi, wi] = p[2]
        else:
            f[0, hi, wi] = p[2]
            f[1, hi, wi] = p[2]
            lab[hi, wi] = p[6]
            f[5:8, hi, wi] = p[3:6]
        f[2, hi, wi] += p[2]
        f[3, hi, wi] += 1
        f[4, hi, wi] = 1
    f[2] = f[2] / (f[3] + 1e-6)
    f[3] = np.log10(f[3] + 1)
    return f, lab


def test_bev_feature_matches_reference_loop():
    rng = np.random.default_rng(1)
    n = 2000
    pc = np.zeros((n, 7))
    pc[:, 0] = rng.uniform(0, 3, n)
    pc[:, 1] = rng.uniform(0, 2, n)
    pc[:, 2] = rng.uniform(-1, 9, n)
    pc[:, 3:6] = rng.uniform(0, 1, (n, 3))
    pc[:, 6] = rng.integers(0, 13, n)
    got = compute_bev_feature(pc, 0.1)
    want_f, want_l = _slow_bev(pc, 0.1)
    np.testing.assert_allclose(got["feature_map"], want_f.astype(np.float32),
                               rtol=1e-4, atol=1e-5)
    # label/RGB winner: ours is exact max-height; ref loop keeps the
    # FIRST point when a later one has equal z — ties are measure-zero
    # with continuous z
    np.testing.assert_array_equal(got["label_map"], want_l.astype(np.float32))


@pytest.fixture(scope="module")
def sensat_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("sensat"))
    rng = np.random.default_rng(2)
    for split in ["train", "val"]:
        os.makedirs(os.path.join(root, split), exist_ok=True)
        for b in range(2):
            n = 3000
            fields = {
                "x": rng.uniform(0, 8, n).astype(np.float32),
                "y": rng.uniform(0, 6, n).astype(np.float32),
                "z": rng.uniform(0, 10, n).astype(np.float32),
                "red": rng.integers(0, 255, n).astype(np.uint8),
                "green": rng.integers(0, 255, n).astype(np.uint8),
                "blue": rng.integers(0, 255, n).astype(np.uint8),
                "class": rng.integers(0, 13, n).astype(np.uint8),
            }
            write_ply(os.path.join(root, split, f"block_{b}.ply"), fields)
            # per-point label dump next to the frames (the reference's
            # extract_label.py output, read by readLabelByIndex)
            fields["class"].astype(np.uint8).tofile(
                os.path.join(root, split, f"block_{b}.bin"))
    assert prepare_bev_frames(root, "train") == 2
    assert prepare_bev_frames(root, "val") == 2
    return root


def test_adapter_and_tiling(sensat_root):
    ds = SensatUrban(sensat_root, "train")
    assert len(ds) == 2
    frame = ds.readDataByIndex(0)
    assert frame["feature_map"].shape[0] == 8
    # tiled variant produces fixed-size frames
    ds_t = SensatUrban(sensat_root, "val", img_h=32, img_w=32, use_crop=True)
    assert len(ds_t) >= 4
    for i in range(len(ds_t)):
        assert ds_t.readDataByIndex(i)["feature_map"].shape == (8, 32, 32)


def test_build_sensat_batch(sensat_root):
    ds = SensatUrban(sensat_root, "train", img_h=48, img_w=48, use_crop=True)
    cfg = SensatConfig(img_h=32, img_w=32)
    fm = np.stack([ds.readDataByIndex(i)["feature_map"] for i in range(2)])
    lm = np.stack([ds.readDataByIndex(i)["label_map"] for i in range(2)])
    f, l = build_sensat_batch(jax.random.PRNGKey(0), jnp.asarray(fm),
                              jnp.asarray(lm), cfg, True)
    f, l = np.asarray(f), np.asarray(l)
    assert f.shape == (2, 32, 32, 8)
    assert l.shape == (2, 32, 32)
    assert l.min() >= 0 and l.max() <= 13  # shifted labels
    mask = f[..., 4] > 0
    # rejection resample found ≥10% labeled pixels
    assert (l > 0).mean(axis=(1, 2)).min() >= 0.05
    # rgb jitter multiplied by mask → zero where empty
    assert np.abs(f[..., 5:8][~mask]).max() == 0.0

    # eval path: identity, labels shifted
    cfg48 = SensatConfig(img_h=48, img_w=48)
    fe, le = build_sensat_batch(jax.random.PRNGKey(0), jnp.asarray(fm),
                                jnp.asarray(lm), cfg48, False)
    np.testing.assert_allclose(np.asarray(fe)[0, ..., 3],
                               fm[0, 3], rtol=1e-6)
    want_l = ((lm[0] + 1) * fm[0, 4]).astype(np.int32)
    np.testing.assert_array_equal(np.asarray(le)[0], want_l)


def test_frame_weights(sensat_root):
    ds = SensatUrban(sensat_root, "train")
    weights = sensat_frame_weights(ds, 200)
    assert len(weights) >= 2
    assert set(weights).issubset({0, 1})


def test_sensat_experiment_and_tta_eval(sensat_root, tmp_path):
    """PMF on BEV: debug train + multi-scale TTA eval."""
    import yaml

    cfg = {
        "save_path": str(tmp_path / "exp"), "seed": 1, "n_epochs": 1,
        "batch_size": [2, 1], "lr": 0.001, "warmup_epochs": 1,
        "momentum": 0.9, "weight_decay": 1e-5, "val_frequency": 1,
        "dataset": "SensatUrban", "nclasses": 14, "data_root": sensat_root,
        "net_type": "PMFNet", "base_channels": 8, "img_backbone": "resnet34",
        "lambda": 1.0, "gamma": 0.5, "tau": 0.7, "is_debug": True,
        "n_threads": 2, "experiment_id": "sensat", "mesh_data": 1,
        "mesh_model": 1,
        "sensor": {"proj_h": 32, "proj_w": 32, "proj_ht": 32, "proj_wt": 32,
                   "n_samples_split": 200},
        "augmentation": {},
    }
    cfg_path = str(tmp_path / "sensat.yaml")
    with open(cfg_path, "w") as f:
        yaml.safe_dump(cfg, f)

    from pmf_tpu.config import load_options
    from pmf_tpu.tools.train import Experiment
    from pmf_tpu.tools.infer_sensat import SensatInference

    opts = load_options(cfg_path)
    exp = Experiment(opts)
    best = exp.run()
    assert np.isfinite(best["IOU"])
    best_dir = os.path.join(exp.trainer.ckpt.directory, "best_last_model")

    preds = str(tmp_path / "preds")
    inf = SensatInference(opts, best_dir, scales=[32], use_tta=True,
                          save_preds=preds)
    out = inf.run(max_frames=1)
    assert np.isfinite(out["mIoU"])
    assert "point_mIoU" in out  # 3D point eval vs the .bin label dump
    labels = [f for f in os.listdir(preds) if f.endswith(".label")]
    assert len(labels) == 1
    pred = np.fromfile(os.path.join(preds, labels[0]), np.uint8)
    assert pred.shape[0] == 3000  # one label per point
    assert pred.max() <= 12

    # KNN lift (ref tasks/sensat_urban/pmf_eval/infer.py:186-198):
    # per-point labels via KNN over (max-height map, per-point z)
    preds_knn = str(tmp_path / "preds_knn")
    inf_knn = SensatInference(opts, best_dir, scales=[32], use_tta=False,
                              use_knn=True, save_preds=preds_knn)
    out_knn = inf_knn.run(max_frames=1)
    assert np.isfinite(out_knn["mIoU"])
    pred_knn = np.fromfile(
        os.path.join(preds_knn, labels[0]), np.uint8)
    assert pred_knn.shape[0] == 3000
    assert pred_knn.max() <= 12
    assert "point_mIoU" in out_knn
