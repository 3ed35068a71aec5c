import json
import os

import numpy as np
import pytest

from pmf_tpu.data.a2d2 import A2D2_PV, undistort_image, MAPPED_CLASS_NAME


def _make_mini_a2d2(root, n_frames=3, n_points=200, seed=0):
    from PIL import Image

    rng = np.random.default_rng(seed)
    classes = {"#ff0000": 1, "#00ff00": 27, "#0000ff": 34, "#ffffff": 35}
    with open(os.path.join(root, "class_index.json"), "w") as f:
        json.dump(classes, f)
    cams = {"cameras": {"front_center": {
        "CamMatrix": [[100.0, 0, 64], [0, 100.0, 48], [0, 0, 1]],
        "CamMatrixOriginal": [[100.0, 0, 64], [0, 100.0, 48], [0, 0, 1]],
        "Distortion": [0.0, 0.0, 0.0, 0.0, 0.0],
        "Lens": "Telecam"}}}
    with open(os.path.join(root, "cams_lidars.json"), "w") as f:
        json.dump(cams, f)

    seq = os.path.join(root, "20180807_145028")
    colors = np.array([[255, 0, 0], [0, 255, 0], [0, 0, 255],
                       [255, 255, 255]], np.uint8)
    for sub in ["lidar/cam_front_center", "camera/cam_front_center",
                "label/cam_front_center"]:
        os.makedirs(os.path.join(seq, sub), exist_ok=True)
    for i in range(n_frames):
        pts = rng.uniform(-20, 20, (n_points, 3)).astype(np.float32)
        refl = rng.uniform(0, 255, n_points).astype(np.float32)
        rows = rng.uniform(0, 95, n_points).astype(np.float64)
        cols = rng.uniform(0, 127, n_points).astype(np.float64)
        np.savez(os.path.join(seq, "lidar/cam_front_center",
                              f"2018_lidar_frontcenter_{i:09d}.npz"),
                 points=pts, reflectance=refl, row=rows, col=cols)
        img = rng.integers(0, 255, (96, 128, 3), dtype=np.uint8)
        Image.fromarray(img).save(os.path.join(
            seq, "camera/cam_front_center",
            f"2018_camera_frontcenter_{i:09d}.png"))
        sem = colors[rng.integers(0, 4, (96, 128))]
        Image.fromarray(sem).save(os.path.join(
            seq, "label/cam_front_center",
            f"2018_label_frontcenter_{i:09d}.png"))
    return root


@pytest.fixture(scope="module")
def a2d2_root(tmp_path_factory):
    return _make_mini_a2d2(str(tmp_path_factory.mktemp("a2d2")))


def test_a2d2_adapter(a2d2_root):
    ds = A2D2_PV(a2d2_root, os.path.join(a2d2_root, "cams_lidars.json"),
                 os.path.join(a2d2_root, "class_index.json"),
                 split="train", apply_excludes=False)
    assert len(ds) == 3
    pcd, sem, _ = ds.loadDataByIndex(0)
    assert pcd.shape[1] == 4
    assert set(np.unique(sem)).issubset({1, 27, 34, 35})
    # labels decode exactly from the semantic PNG colors
    from PIL import Image
    sem_img = np.asarray(Image.open(ds.label_files[0]))
    rows, cols = ds.pixel_indices(0)
    lut = {0xFF0000: 1, 0x00FF00: 27, 0x0000FF: 34, 0xFFFFFF: 35}
    want = np.array([lut[(int(sem_img[r, c, 0]) << 16) |
                         (int(sem_img[r, c, 1]) << 8) | int(sem_img[r, c, 2])]
                     for r, c in zip(rows, cols)])
    np.testing.assert_array_equal(sem, want)
    # zero-distortion undistort = identity
    img = ds.loadImage(0)
    raw = np.asarray(Image.open(ds.camera_files[0]))
    np.testing.assert_array_equal(img, raw)
    assert ds.labelMapping(sem) is sem  # identity mapping
    assert ds.cls_freq[0] == 0


def test_undistort_radtan_known_case():
    """Pincushion distortion (k1>0) must pull pixels toward the center
    when undistorting; center pixel stays fixed."""
    rng = np.random.default_rng(1)
    img = rng.integers(0, 255, (64, 64, 3), dtype=np.uint8)
    K = np.array([[50.0, 0, 32], [0, 50.0, 32], [0, 0, 1]])
    out = undistort_image(img, K, np.array([0.2, 0, 0, 0, 0]), K, "Telecam")
    assert out.shape == img.shape
    # center preserved exactly (r=0 → no distortion)
    np.testing.assert_array_equal(out[32, 32], img[32, 32])
    assert (out != img).any()


def test_undistort_fisheye_runs():
    rng = np.random.default_rng(2)
    img = rng.integers(0, 255, (64, 64, 3), dtype=np.uint8)
    K = np.array([[40.0, 0, 32], [0, 40.0, 32], [0, 0, 1]])
    out = undistort_image(img, K, np.array([0.05, 0.01, 0.0, 0.0]), K,
                          "Fisheye")
    assert out.shape == img.shape
    np.testing.assert_array_equal(out[32, 32], img[32, 32])


def test_a2d2_inference_task(a2d2_root, tmp_path):
    import yaml
    import jax
    import jax.numpy as jnp
    from pmf_tpu.config import load_options
    from pmf_tpu.models import PMFNet
    from pmf_tpu.train.checkpoint import CheckpointManager
    from pmf_tpu.tools.infer_a2d2 import A2D2Inference

    cfg = {
        "save_path": str(tmp_path / "exp"),
        "dataset": "A2D2", "nclasses": 39, "data_root": a2d2_root,
        "net_type": "PMFNet", "base_channels": 8, "img_backbone": "resnet34",
        "experiment_id": "a2d2", "batch_size": [1, 1],
        "apply_excludes": False,
        "PVconfig": {"proj_h": 96, "proj_w": 128, "n_points": 512,
                     "pcd_mean": [12.12, 10.88, 0.23, -1.04, 0.21],
                     "pcd_stds": [12.32, 11.47, 6.91, 0.86, 0.16]},
    }
    cfg_path = str(tmp_path / "a2d2.yaml")
    with open(cfg_path, "w") as f:
        yaml.safe_dump(cfg, f)
    opts = load_options(cfg_path)

    model = PMFNet(nclasses=39, base_channels=8, image_backbone="resnet34")
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        jnp.zeros((1, 32, 48, 5)), jnp.zeros((1, 32, 48, 3)), train=False)
    ckpt = CheckpointManager(str(tmp_path / "ckpt"))
    ckpt.save_best({"params": variables["params"],
                    "batch_stats": variables["batch_stats"]}, "last")

    preds = str(tmp_path / "preds")
    inf = A2D2Inference(opts, str(tmp_path / "ckpt" / "best_last_model"),
                        save_preds=preds, split="train")
    out = inf.run(max_scans=2)
    assert np.isfinite(out["mIoU"])
    files = os.listdir(preds)
    assert len(files) == 2
    assert all(f.endswith(".label") and "pred" in f for f in files)
    pred = np.fromfile(os.path.join(preds, files[0]), np.int32)
    assert pred.shape[0] == 200


def test_a2d2_epmf_train_task(a2d2_root, tmp_path):
    """EPMF debug training on synthetic A2D2 through the precomputed-pixel
    V2 pipeline (parity: tasks/epmf/trainer.py:168-190)."""
    import yaml

    cfg = {
        "save_path": str(tmp_path / "exp"), "seed": 1, "n_epochs": 1,
        "batch_size": [2, 1], "lr": 0.001, "warmup_epochs": 1,
        "momentum": 0.9, "weight_decay": 1e-5, "val_frequency": 1,
        "dataset": "a2d2", "nclasses": 39, "data_root": a2d2_root,
        "cams_lidars_json": os.path.join(a2d2_root, "cams_lidars.json"),
        "class_index_json": os.path.join(a2d2_root, "class_index.json"),
        "apply_excludes": False,
        "net_type": "EPMFNet", "base_channels": 8, "img_backbone": "resnet34",
        "lambda": 1.0, "gamma": 0.5, "tau": 0.7, "is_debug": True,
        "n_threads": 2, "experiment_id": "epmf-a2d2", "use_mtloss": True,
        "mesh_data": 1, "mesh_model": 1,
        "cls_freq": [0] + [1000] * 38,
        "PVconfig": {
            "canvas_h": 96, "canvas_w": 128,
            "proj_h": 64, "proj_w": 128, "proj_ht": 64, "proj_wt": 128,
            "n_points": 512,
            "pcd_mean": [17.95, 16.17, -0.17, 1.23, 18.49],
            "pcd_stds": [24.0, 23.55, 8.06, 3.96, 21.45]},
        "augmentation": {},
    }
    cfg_path = str(tmp_path / "epmf_a2d2.yaml")
    with open(cfg_path, "w") as f:
        yaml.safe_dump(cfg, f)

    from pmf_tpu.config import load_options
    from pmf_tpu.tools.train import Experiment

    opts = load_options(cfg_path)
    exp = Experiment(opts)
    assert exp.trainer.use_pix
    best = exp.run()
    assert np.isfinite(best["IOU"])
