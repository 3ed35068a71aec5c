"""Full-stack smoke: train PMF on synthetic KITTI for 2 debug epochs,
save best model, then run the eval task on the saved weights."""
import os

import numpy as np
import pytest
import yaml

from tests.test_data_pipeline import make_synthetic_kitti


@pytest.fixture(scope="module")
def kitti_root(tmp_path_factory):
    return make_synthetic_kitti(str(tmp_path_factory.mktemp("kitti_e2e")),
                                n_scans=3, n_points=600)


def _make_sequences(root):
    """Trainer expects train sequences 0-7,9,10 and val 8 — symlink them
    all to the synthetic seq 00."""
    for seq in list(range(11)):
        dst = os.path.join(root, f"{seq:02d}")
        if not os.path.exists(dst):
            os.symlink(os.path.join(root, "00"), dst)


def _write_config(path, root, save_path):
    cfg = {
        "save_path": save_path,
        "seed": 1,
        "n_epochs": 2,
        "batch_size": [2, 1],
        "lr": 0.001,
        "warmup_epochs": 1,
        "momentum": 0.9,
        "weight_decay": 1e-5,
        "val_frequency": 1,
        "dataset": "SemanticKitti",
        "nclasses": 20,
        "data_root": root,
        "net_type": "PMFNet",
        "base_channels": 8,
        "img_backbone": "resnet34",
        "lambda": 1.0,
        "gamma": 0.5,
        "tau": 0.7,
        "is_debug": True,
        "n_threads": 2,
        "experiment_id": "e2e",
        "mesh_data": 1,
        "mesh_model": 1,
        "sensor": {
            "canvas_h": 64, "canvas_w": 160,
            "proj_h": 64, "proj_w": 160,
            "proj_ht": 48, "proj_wt": 96,
            "h_pad": 2, "w_pad": 2, "n_points": 1024,
            "img_mean": [12.12, 10.88, 0.23, -1.04, 0.21],
            "img_stds": [12.32, 11.47, 6.91, 0.86, 0.16],
        },
        "augmentation": {},
        "post": {"KNN": {"use": False,
                         "params": {"knn": 3, "search": 3, "sigma": 1.0,
                                    "cutoff": 1.0}}},
    }
    with open(path, "w") as f:
        yaml.safe_dump(cfg, f)
    return path


def test_experiment_train_and_infer(kitti_root, tmp_path):
    _make_sequences(kitti_root)
    cfg_path = _write_config(str(tmp_path / "cfg.yaml"), kitti_root,
                             str(tmp_path / "exp"))

    from pmf_tpu.config import load_options
    from pmf_tpu.tools.train import Experiment

    opts = load_options(cfg_path)
    exp = Experiment(opts)
    best = exp.run()
    assert np.isfinite(best["IOU"])
    ckpt_dir = exp.trainer.ckpt.directory
    best_dir = os.path.join(ckpt_dir, "best_last_model")
    assert os.path.isdir(best_dir)
    # resume checkpoint exists
    assert exp.trainer.ckpt.has_checkpoint()

    # ---- train-time observability parity (tasks/pmf/trainer.py:438-524)
    log_dir = exp.recorder.log_dir
    import json as _json

    tags = {(_json.loads(line)["tag"]) for line in
            open(os.path.join(log_dir, "scalars.jsonl"))}
    assert "Train_meanIOU" in tags and "Train_lr" in tags
    assert "Train_LossFocal" in tags and "Train_LossPerception" in tags
    assert any(t.startswith("Train_01_") and t.endswith("_IOU")
               for t in tags), tags
    assert any("_ImageIOU" in t for t in tags)
    panels = os.listdir(os.path.join(log_dir, "images"))
    assert any(p.startswith("Train_PredEntropy") for p in panels)
    assert any(p.startswith("Train_PCDGuideWeight") for p in panels)
    assert any(p.startswith("Train_RGB_") for p in panels)
    # code snapshot (recorder.py:63-75 parity)
    assert os.path.isdir(os.path.join(exp.recorder.code_dir, "pmf_tpu"))

    # ---- eval task on the saved weights ----
    from pmf_tpu.tools.infer_kitti import Inference

    preds_dir = str(tmp_path / "preds")
    inf = Inference(opts, best_dir, use_knn=False, save_preds=preds_dir)
    out = inf.run(max_scans=2)
    assert np.isfinite(out["point"]["mIoU"])
    assert np.isfinite(out["pixel"]["mIoU"])
    # submission files written with raw label ids
    lbl = os.path.join(preds_dir, "sequences", "08", "predictions",
                       "000000.label")
    assert os.path.isfile(lbl)
    raw = np.fromfile(lbl, dtype=np.int32)
    assert raw.shape[0] == 600
    valid_raw = set(int(k) for k in
                    inf.dataset.data_config["learning_map"].keys())
    assert set(np.unique(raw)).issubset(valid_raw)


def test_knn_eval_path(kitti_root, tmp_path):
    _make_sequences(kitti_root)
    cfg_path = _write_config(str(tmp_path / "cfg2.yaml"), kitti_root,
                             str(tmp_path / "exp2"))
    from pmf_tpu.config import load_options
    from pmf_tpu.tools.train import Experiment
    from pmf_tpu.tools.infer_kitti import Inference

    opts = load_options(cfg_path)
    exp = Experiment(opts)
    exp.run()
    best_dir = os.path.join(exp.trainer.ckpt.directory, "best_last_model")
    inf = Inference(opts, best_dir, use_knn=True)
    out = inf.run(max_scans=1)
    assert np.isfinite(out["point"]["mIoU"])
