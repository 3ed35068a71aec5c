"""Task-level tests: SalsaNext train+eval, nuScenes 6-cam merge inference,
submission merge, FOV dataset distillation."""
import json
import os

import numpy as np
import pytest
import yaml

from tests.test_data_pipeline import make_synthetic_kitti
from tests.test_nuscenes import _make_mini_nuscenes


@pytest.fixture(scope="module")
def kitti_root(tmp_path_factory):
    root = make_synthetic_kitti(str(tmp_path_factory.mktemp("kitti_t")),
                                n_scans=2, n_points=500)
    for seq in range(11):
        dst = os.path.join(root, f"{seq:02d}")
        if not os.path.exists(dst):
            os.symlink(os.path.join(root, "00"), dst)
    return root


def test_salsanext_train_and_eval(kitti_root, tmp_path):
    cfg = {
        "save_path": str(tmp_path / "exp"), "seed": 1, "n_epochs": 1,
        "batch_size": [2, 1], "lr": 0.001, "warmup_epochs": 1,
        "momentum": 0.9, "weight_decay": 1e-5, "val_frequency": 1,
        "dataset": "SemanticKitti", "nclasses": 20, "data_root": kitti_root,
        "net_type": "SalsaNext", "base_channels": 8, "is_debug": True,
        "n_threads": 2, "experiment_id": "salsa", "mesh_data": 1,
        "mesh_model": 1,
        "sensor": {"proj_h": 16, "proj_w": 128, "fov_up": 25.0,
                   "fov_down": -25.0, "n_points": 1024,
                   "img_mean": [12.12, 10.88, 0.23, -1.04, 0.21],
                   "img_stds": [12.32, 11.47, 6.91, 0.86, 0.16]},
        "augmentation": {"p_flipy": 0.5},
        "post": {"KNN": {"use": False, "params": {"knn": 3, "search": 3,
                                                  "sigma": 1.0, "cutoff": 1.0}}},
    }
    cfg_path = str(tmp_path / "salsa.yaml")
    with open(cfg_path, "w") as f:
        yaml.safe_dump(cfg, f)

    from pmf_tpu.config import load_options
    from pmf_tpu.tools.train import Experiment
    from pmf_tpu.tools.infer_salsanext import SalsaNextInference

    opts = load_options(cfg_path)
    exp = Experiment(opts)
    best = exp.run()
    assert np.isfinite(best["IOU"])
    best_dir = os.path.join(exp.trainer.ckpt.directory, "best_last_model")

    preds = str(tmp_path / "preds")
    inf = SalsaNextInference(opts, best_dir, use_knn=True, save_preds=preds)
    out = inf.run(max_scans=1)
    assert np.isfinite(out["mIoU"])
    lbl = os.path.join(preds, "sequences", "08", "predictions", "000000.label")
    assert os.path.isfile(lbl)
    raw = np.fromfile(lbl, np.int32)
    assert raw.shape[0] == 500


@pytest.fixture(scope="module")
def nusc_root(tmp_path_factory):
    return _make_mini_nuscenes(str(tmp_path_factory.mktemp("nusc_t")),
                               n_samples=2, n_points=300)


def test_nuscenes_merge_inference(nusc_root, tmp_path):
    """PMF 6-camera inference on the synthetic mini DB with random
    weights: exercises the merge loop + bin writer + metrics."""
    cfg = {
        "save_path": str(tmp_path / "exp"), "seed": 1,
        "dataset": "nuScenes", "nclasses": 17, "data_root": nusc_root,
        "nusc_version": "v1.0-mini",
        "net_type": "PMFNet", "base_channels": 8, "img_backbone": "resnet34",
        "experiment_id": "nusc", "batch_size": [1, 1],
        "sensor": {"canvas_h": 224, "canvas_w": 400, "proj_h": 224,
                   "proj_w": 400, "h_pad": 0, "w_pad": 0, "n_points": 512,
                   "img_mean": [12.12, 10.88, 0.23, -1.04, 0.21],
                   "img_stds": [12.32, 11.47, 6.91, 0.86, 0.16]},
        "post": {"KNN": {"use": False, "params": {}}},
    }
    cfg_path = str(tmp_path / "nusc.yaml")
    with open(cfg_path, "w") as f:
        yaml.safe_dump(cfg, f)

    # make random-init weights via a checkpoint save
    import jax
    import jax.numpy as jnp
    from pmf_tpu.config import load_options
    from pmf_tpu.models import PMFNet
    from pmf_tpu.train.checkpoint import CheckpointManager

    opts = load_options(cfg_path)
    model = PMFNet(nclasses=17, base_channels=8, image_backbone="resnet34")
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        jnp.zeros((1, 32, 48, 5)), jnp.zeros((1, 32, 48, 3)), train=False)
    ckpt = CheckpointManager(str(tmp_path / "ckpt"))
    ckpt.save_best({"params": variables["params"],
                    "batch_stats": variables["batch_stats"]}, "last")

    from pmf_tpu.tools.infer_nuscenes import NuscenesInference

    preds = str(tmp_path / "preds")
    inf = NuscenesInference(opts, str(tmp_path / "ckpt" / "best_last_model"),
                            save_preds=preds, split="train")
    out = inf.run()
    assert out["frames"] == 2
    bins = os.listdir(os.path.join(preds, "lidarseg", "train"))
    assert len(bins) == 2
    pred = np.fromfile(os.path.join(preds, "lidarseg", "train", bins[0]),
                       np.uint8)
    assert pred.shape[0] == 300


def _load_shipped_config(name, **top_overrides):
    """Load a config shipped in configs/experiments/ (the test exercises
    the real file, not a copy of its contents)."""
    from pmf_tpu.config import load_options

    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "configs", "experiments", name)
    return load_options(path, top_overrides)


def test_epmf_nuscenes_config_e2e(nusc_root, tmp_path):
    """The TPAMI headline path: shipped epmf_nuscenes.yaml (EPMFNet +
    nuScenes + MultiTaskLoss + V2 pipeline) trains a debug epoch on the
    mini fixture and evaluates with the 6-cam merge."""
    opts = _load_shipped_config(
        "epmf_nuscenes.yaml",
        save_path=str(tmp_path / "exp"), data_root=nusc_root,
        is_debug=True, n_epochs=1, batch_size=(1, 1), n_threads=2,
        base_channels=8, imagenet_pretrained=False,
        compute_dtype="float32", use_packed=False, mesh_data=1)
    assert opts.net_type == "EPMFNet" and opts.nclasses == 17
    assert opts.config.get("use_mtloss") is True
    assert len(opts.config["cls_freq"]) == 17
    # shrink the V2 projection for the CPU fixture; every other shipped
    # key (mtloss, cls_freq, jitter, means) is exercised as-is
    opts.config["PVconfig"].update(
        {"canvas_h": 224, "canvas_w": 400, "proj_h": 64, "proj_w": 192,
         "proj_ht": 64, "proj_wt": 192, "n_points": 512})
    opts.config["nusc_version"] = "v1.0-mini"

    from pmf_tpu.tools.train import Experiment

    exp = Experiment(opts)
    best = exp.run()
    assert np.isfinite(best["IOU"])
    # MultiTaskLoss sigmas live in the param pytree and get trained
    assert "mt_sigma" in exp.trainer.state.params

    from pmf_tpu.tools.infer_nuscenes import NuscenesInference

    best_dir = os.path.join(exp.trainer.ckpt.directory, "best_last_model")
    inf = NuscenesInference(opts, best_dir, split="train",
                            save_preds=str(tmp_path / "preds"))
    out = inf.run()
    assert out["frames"] == 2
    assert np.isfinite(out["mIoU"])

    # --knn on the V2 path also KNN-refines the confidence before the
    # merge (ref epmf_eval_nuscenes/infer.py:147-161)
    inf_knn = NuscenesInference(opts, best_dir, split="train", use_knn=True)
    out_knn = inf_knn.run(max_frames=1)
    assert out_knn["frames"] == 1
    assert np.isfinite(out_knn["mIoU"])


def test_salsanext_nuscenes_config_e2e(nusc_root, tmp_path):
    """Shipped salsanext_nuscenes.yaml (32-beam spherical projection,
    fov +10/-30) trains a debug epoch on the mini fixture."""
    opts = _load_shipped_config(
        "salsanext_nuscenes.yaml",
        save_path=str(tmp_path / "exp"), data_root=nusc_root,
        is_debug=True, n_epochs=1, batch_size=(2, 2), n_threads=2,
        base_channels=8, mesh_data=1)
    assert opts.net_type == "SalsaNext" and opts.nclasses == 17
    sensor = opts.group("sensor")
    assert (sensor["proj_h"], sensor["fov_up"], sensor["fov_down"]) == \
        (32, 10.0, -30.0)
    # shrink the range image for the CPU fixture
    opts.config["sensor"].update({"proj_h": 16, "proj_w": 128,
                                  "n_points": 512})
    opts.config["nusc_version"] = "v1.0-mini"

    from pmf_tpu.tools.train import Experiment

    exp = Experiment(opts)
    best = exp.run()
    assert np.isfinite(best["IOU"])


def test_submission_merge(tmp_path):
    from pmf_tpu.tools.merge_nuscenes_submission import merge_predictions

    main_dir = tmp_path / "main" / "lidarseg" / "test"
    sub_dir = tmp_path / "sub" / "lidarseg" / "test"
    os.makedirs(main_dir)
    os.makedirs(sub_dir)
    main = np.array([0, 3, 0, 5], np.uint8)
    sub = np.array([2, 9, 0, 9], np.uint8)
    main.tofile(main_dir / "tokA_lidarseg.bin")
    sub.tofile(sub_dir / "tokA_lidarseg.bin")

    n = merge_predictions(str(tmp_path / "main"), str(tmp_path / "sub"),
                          str(tmp_path / "out"), "test")
    assert n == 1
    merged = np.fromfile(tmp_path / "out" / "lidarseg" / "test" /
                         "tokA_lidarseg.bin", np.uint8)
    # main wins; holes from sub; residual zeros → class 11
    np.testing.assert_array_equal(merged, [2, 3, 11, 5])
    assert os.path.isfile(tmp_path / "out" / "test" / "submission.json")
    meta = json.load(open(tmp_path / "out" / "test" / "submission.json"))
    assert meta["meta"]["use_lidar"] is True


def test_create_fov_dataset(kitti_root, tmp_path):
    from pmf_tpu.tools.create_fov_dataset import create_fov_dataset
    from pmf_tpu.data import SemanticKitti

    dst = str(tmp_path / "fov")
    n = create_fov_dataset(kitti_root, dst, sequences=[0])
    assert n == 2
    ds = SemanticKitti(dst, [0])
    pcd, sem, _ = ds.loadDataByIndex(0)
    # all surviving points must project into the image
    src = SemanticKitti(kitti_root, [0])
    full, _, _ = src.loadDataByIndex(0)
    assert 0 < len(pcd) < len(full)
    assert (pcd[:, 0] > 0.5).all()
    assert sem.shape[0] == pcd.shape[0]


@pytest.mark.smoke
def test_epmf_configs_pin_image_domain_lovasz():
    """The shipped EPMF configs must keep `point_lovasz: false`:
    XLA:TPU cannot compile the EPMF train step with the point-domain
    pair Lovász (4 bounded attempts >25 min at bs4 320x1216, default
    and -0.7 codegen effort, 2026-08), while the image-domain variant
    compiles in ~254 s. The trainer honors the flag (trainer.py:
    point_lovasz) and PMF configs keep the faster point path."""
    root = os.path.join(os.path.dirname(__file__), "..", "configs",
                        "experiments")
    for name in ("epmf_kitti", "epmf_nuscenes", "epmf_a2d2"):
        cfg = yaml.safe_load(open(os.path.join(root, f"{name}.yaml")))
        assert cfg.get("point_lovasz") is False, name
    for name in ("pmf_kitti", "pmf_nuscenes"):
        cfg = yaml.safe_load(open(os.path.join(root, f"{name}.yaml")))
        assert cfg.get("point_lovasz", True) is True, name
