"""End-to-end prediction parity vs the ACTUAL reference eval chain.

Composes the reference's own code on a synthetic KITTI fixture (CPU
torch, torchvision stubbed):
  SemanticKitti parser (pc_processor/dataset/semantic_kitti/parser.py)
  → PerspectiveViewLoader return_uproj mode
    (pc_processor/dataset/perspective_view_loader.py:77-135)
  → pad/normalize/forward/crop/argmax/point-gather exactly as
    tasks/pmf_eval_semantickitti/infer.py:78-146 (no KNN),
with random PMFNet weights, against OUR full chain (adapter →
build_eval_sample_with_uproj → PMFNet with the CONVERTED weights →
argmax → gather), and asserts:
  * identical keep masks (same points survive projection),
  * ≥ 99.5% per-point class agreement,
  * |Δ mIoU| ≤ 0.2 points between the two prediction sets.

This is the last accuracy-parity evidence available without the real
datasets: it exercises calib parsing, label decode, projection, scatter,
padding, normalization, the model, and unprojection in one chain.
"""
import importlib.util
import os
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

pytestmark = pytest.mark.smoke

REF = "/root/reference/pc_processor"
IMG_H, IMG_W = 60, 154      # +2·(h_pad=2, w_pad=3) → 64×160 (/16 ✓)
H_PAD, W_PAD = 2, 3
PROJ_H, PROJ_W = IMG_H + 2 * H_PAD, IMG_W + 2 * W_PAD
N_SCANS = 3


# --------------------------------------------------------------- fixture
def _make_fixture(root):
    from PIL import Image

    rng = np.random.default_rng(7)
    seq = os.path.join(root, "00")
    for sub in ["velodyne", "labels", "image_2"]:
        os.makedirs(os.path.join(seq, sub), exist_ok=True)
    fx = fy = 80.0
    cx, cy = IMG_W / 2, IMG_H / 2
    K = np.array([[fx, 0, cx, 0], [0, fy, cy, 0], [0, 0, 1, 0.0]])
    R = np.array([[0, -1, 0], [0, 0, -1], [1, 0, 0.0]])
    Tr = np.eye(4)
    Tr[:3, :3] = R
    P2 = K[:, :3] @ np.eye(3, 4)
    with open(os.path.join(seq, "calib.txt"), "w") as f:
        f.write("P0: " + " ".join("0" for _ in range(12)) + "\n")
        f.write("P2: " + " ".join(str(v) for v in P2.reshape(-1)) + "\n")
        f.write("Tr: " + " ".join(str(v) for v in Tr[:3].reshape(-1)) + "\n")
    raw_classes = [10, 40, 48, 50, 70, 80]
    for i in range(N_SCANS):
        n = 900
        pts = np.zeros((n, 4), np.float32)
        pts[:, 0] = rng.uniform(2, 40, n)
        pts[:, 1] = rng.uniform(-8, 8, n)
        pts[:, 2] = rng.uniform(-2, 1, n)
        pts[:, 3] = rng.uniform(0, 1, n)
        pts.tofile(os.path.join(seq, "velodyne", f"{i:06d}.bin"))
        sem = rng.choice(raw_classes, n).astype(np.int32)
        inst = rng.integers(0, 5, n).astype(np.int32)
        (sem | (inst << 16)).astype(np.int32).tofile(
            os.path.join(seq, "labels", f"{i:06d}.label"))
        img = rng.integers(0, 255, (IMG_H, IMG_W, 3), dtype=np.uint8)
        Image.fromarray(img).save(
            os.path.join(seq, "image_2", f"{i:06d}.png"))
    return root


@pytest.fixture(scope="module")
def kitti_root(tmp_path_factory):
    return _make_fixture(str(tmp_path_factory.mktemp("kitti_e2e")))


# ------------------------------------------------- reference module rig
def _stub_torchvision():
    """transforms stub: the uproj eval path only CONSTRUCTS the
    transforms (ColorJitter/aug ops are never called), so no-op
    constructibles suffice; torchvision.models comes from the resnet
    stub shared with test_torch_parity."""
    spec = importlib.util.spec_from_file_location(
        "_torchvision_stub",
        os.path.join(os.path.dirname(__file__), "_torchvision_stub.py"))
    stub = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(stub)

    tv = types.ModuleType("torchvision")
    tv_models = types.ModuleType("torchvision.models")
    tv_resnet = types.ModuleType("torchvision.models.resnet")
    for n in ("resnet34", "resnet50", "resnet101", "resnet152"):
        setattr(tv_resnet, n, getattr(stub, n))
    tv_models.resnet = tv_resnet
    tv.models = tv_models

    class _NoOp:
        def __init__(self, *a, **k):
            pass

        def __call__(self, x):
            return x

    tv_tf = types.ModuleType("torchvision.transforms")
    for n in ("ColorJitter", "Pad", "RandomHorizontalFlip",
              "RandomRotation", "RandomCrop", "CenterCrop"):
        setattr(tv_tf, n, _NoOp)

    class _Compose:
        def __init__(self, ops):
            self.ops = ops

        def __call__(self, x):
            for op in self.ops:
                x = op(x)
            return x

    tv_tf.Compose = _Compose
    tv.transforms = tv_tf
    sys.modules.setdefault("torchvision", tv)
    sys.modules.setdefault("torchvision.models", tv_models)
    sys.modules.setdefault("torchvision.models.resnet", tv_resnet)
    sys.modules.setdefault("torchvision.transforms", tv_tf)


@pytest.fixture(scope="module")
def ref_stack():
    """Load the reference parser, loader and PMFNet without importing
    the full pc_processor package (whose __init__ pulls devkit/cv2)."""
    _stub_torchvision()

    def load(name, path):
        spec = importlib.util.spec_from_file_location(name, path)
        mod = importlib.util.module_from_spec(spec)
        sys.modules[name] = mod
        spec.loader.exec_module(mod)
        return mod

    # fabricate the package skeleton the loader's imports resolve through
    for pkg_name, path in [
            ("pc_processor", REF),
            ("pc_processor.dataset", f"{REF}/dataset"),
            ("pc_processor.dataset.preprocess", f"{REF}/dataset/preprocess")]:
        if pkg_name not in sys.modules:
            pkg = types.ModuleType(pkg_name)
            pkg.__path__ = [path]
            sys.modules[pkg_name] = pkg
    aug = load("pc_processor.dataset.preprocess.augmentor",
               f"{REF}/dataset/preprocess/augmentor.py")
    sys.modules["pc_processor.dataset.preprocess"].augmentor = aug
    parser = load("ref_kitti_parser",
                  f"{REF}/dataset/semantic_kitti/parser.py")
    pvl = load("ref_pv_loader", f"{REF}/dataset/perspective_view_loader.py")
    # pmf_net does `from .salsanext import ...` — needs a parent package
    if "ref_models_e2e" not in sys.modules:
        pkg = types.ModuleType("ref_models_e2e")
        pkg.__path__ = [f"{REF}/models"]
        sys.modules["ref_models_e2e"] = pkg
    load("ref_models_e2e.salsanext", f"{REF}/models/salsanext.py")
    pmf = load("ref_models_e2e.pmf_net", f"{REF}/models/pmf_net.py")
    return {"parser": parser, "pvl": pvl, "pmf": pmf}


def _randomize(module, seed=0):
    g = torch.Generator().manual_seed(seed)
    sd = module.state_dict()
    new = {}
    for k, v in sd.items():
        if v.is_floating_point():
            if k.endswith("running_var"):
                new[k] = torch.rand(v.shape, generator=g) + 0.5
            else:
                new[k] = torch.randn(v.shape, generator=g) * 0.1
        else:
            new[k] = v
    module.load_state_dict(new)
    return module


MEAN = (12.12, 10.88, 0.23, -1.04, 0.21)
STD = (12.32, 11.47, 6.91, 0.86, 0.16)


def _ref_predict(ref_stack, kitti_root, model_t):
    """Reference chain per scan → (pred [n_pts], keep [n_pts], gt)."""
    ds = ref_stack["parser"].SemanticKitti(
        kitti_root, [0],
        config_path=f"{REF}/dataset/semantic_kitti/semantic-kitti.yaml")
    config = {
        "augmentation": {},
        "sensor": {"proj_h": PROJ_H, "proj_w": PROJ_W,
                   "proj_ht": PROJ_H, "proj_wt": PROJ_W,
                   "h_pad": H_PAD, "w_pad": W_PAD,
                   "img_mean": list(MEAN), "img_stds": list(STD)},
    }
    loader = ref_stack["pvl"].PerspectiveViewLoader(
        ds, config, is_train=False, return_uproj=True)
    mean = torch.tensor(MEAN).view(1, 5, 1, 1)
    std = torch.tensor(STD).view(1, 5, 1, 1)
    out = []
    with torch.no_grad():
        for i in range(N_SCANS):
            feat, mask, label, x_idx, y_idx, depth = loader[i]
            feat = feat[None]
            pad = torch.nn.ZeroPad2d((W_PAD, W_PAD, H_PAD, H_PAD))
            feat = pad(feat)
            m = pad(mask[None])
            feat[:, :5] = (feat[:, :5] - mean) / std * \
                m.unsqueeze(1).expand_as(feat[:, :5])
            pred, _ = model_t(feat[:, :5], feat[:, 5:8])
            pred = pred[:, :, H_PAD:H_PAD + label.shape[0],
                        W_PAD:W_PAD + label.shape[1]]
            pred_argmax = pred[0].argmax(dim=0)
            point_pred = pred_argmax[x_idx.long(), y_idx.long()].numpy()
            # keep mask from the adapter (x_idx covers kept points only)
            pcd, sem, _ = ds.loadDataByIndex(i)
            _, keep = ds.mapLidar2Camera(
                "00", pcd[:, :3], IMG_W, IMG_H)
            gt = ds.class_map_lut[sem]
            out.append((point_pred, keep, gt))
    return out


def _ours_predict(kitti_root):
    import jax.numpy as jnp

    from pmf_tpu.data import (PVConfig, SemanticKitti,
                              build_eval_sample_with_uproj,
                              kitti_sample_reader)

    cfg = PVConfig(canvas_h=PROJ_H, canvas_w=PROJ_W + 16, proj_h=PROJ_H,
                   proj_w=PROJ_W, proj_ht=PROJ_H, proj_wt=PROJ_W,
                   h_pad=H_PAD, w_pad=W_PAD, n_points=1024,
                   img_mean=MEAN, img_stds=STD)
    ds = SemanticKitti(kitti_root, [0])
    reader = kitti_sample_reader(ds, cfg, use_native=False)
    return ds, cfg, reader


def test_e2e_prediction_parity(ref_stack, kitti_root):
    import jax.numpy as jnp

    from pmf_tpu.metrics.iou import confusion_matrix, iou_from_confusion
    from pmf_tpu.models import PMFNet
    from pmf_tpu.models.torch_convert import convert_pmf_state_dict
    from pmf_tpu.data import build_eval_sample_with_uproj
    from pmf_tpu.ops import argmax_last

    model_t = _randomize(ref_stack["pmf"].PMFNet(
        pcd_channels=5, img_channels=3, nclasses=20, base_channels=32,
        imagenet_pretrained=False, image_backbone="resnet34"), seed=11)
    model_t.eval()
    ref_out = _ref_predict(ref_stack, kitti_root, model_t)

    params, stats = convert_pmf_state_dict(
        {k: v.numpy() for k, v in model_t.state_dict().items()})
    model = PMFNet(nclasses=20, base_channels=32, image_backbone="resnet34")
    variables = {"params": params, "batch_stats": stats}

    ds, cfg, reader = _ours_predict(kitti_root)

    conf_ref = np.zeros((20, 20))
    conf_ours = np.zeros((20, 20))
    n_agree = n_total = 0
    for i in range(N_SCANS):
        s = reader(i)
        f, m, l2d, rows, cols, keep, depth = build_eval_sample_with_uproj(
            jnp.asarray(s["points"]), jnp.asarray(s["labels"]),
            jnp.asarray(s["valid"]), jnp.asarray(s["proj_matrix"]),
            jnp.asarray(s["image"]), s["img_h"], s["img_w"], cfg)
        lidar, _ = model.apply(variables, f[None, ..., :5],
                               f[None, ..., 5:8], train=False)
        argmax = argmax_last(lidar[0])
        point_pred = np.asarray(
            argmax[jnp.clip(rows, 0, PROJ_H - 1),
                   jnp.clip(cols, 0, PROJ_W - 1)])
        keep_np = np.asarray(keep)

        pred_ref, keep_ref, gt = ref_out[i]
        n_valid = len(gt)
        # identical surviving point sets
        np.testing.assert_array_equal(keep_np[:n_valid], keep_ref)
        ours_kept = point_pred[:n_valid][keep_ref]
        n_agree += int((ours_kept == pred_ref).sum())
        n_total += len(pred_ref)
        gt_kept = gt[keep_ref]
        conf_ref += np.asarray(confusion_matrix(
            jnp.asarray(pred_ref), jnp.asarray(gt_kept), 20))
        conf_ours += np.asarray(confusion_matrix(
            jnp.asarray(ours_kept), jnp.asarray(gt_kept), 20))

    agreement = n_agree / n_total
    assert agreement >= 0.995, f"per-point agreement {agreement:.4f}"
    miou_ref, _ = iou_from_confusion(conf_ref, ignore=[0])
    miou_ours, _ = iou_from_confusion(conf_ours, ignore=[0])
    assert abs(miou_ref - miou_ours) <= 0.002, (miou_ref, miou_ours)
