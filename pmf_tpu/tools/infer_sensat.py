"""SensatUrban evaluation: multi-scale sliding-window TTA inference.

Parity: tasks/sensat_urban/pmf_eval/infer.py —
  * sliding windows at multiple crop sizes (ref 320/448/576, :93-174)
    accumulated into a per-pixel confidence map;
  * 7-way test-time augmentation: identity, rot90/180/270, h-flip,
    v-flip, transpose (:127-169);
  * per-point labels via the stored (h_idx, w_idx) gather — or, with
    --knn, lifted by the KNN post-processor over the BEV max-height
    channel as the range image and per-point z as the true range
    (:186-198: knn_post(feature_map[0], z, pred_map, w_idx, h_idx));
  * zero predictions reassigned to class 1 / "ground" (:203-207);
  * 3D point metrics vs readLabelByIndex()+1 when labels exist (:212-215);
  * 2D metrics on labeled cells.

Usage:
  python -m pmf_tpu.tools.infer_sensat <config.yaml> --weights <dir>
      [--scales 320 448] [--no-tta] [--knn] [--save-preds DIR] [--split val]
"""
from __future__ import annotations

import argparse
import os

import jax
import jax.numpy as jnp
import numpy as np

from ..config import load_options
from ..data.sensat_urban import SensatUrban
from ..metrics import IOUEval
from ..models import PMFNet
from ..train import Recorder
from ..train.checkpoint import CheckpointManager
from ..utils.tables import per_class_report

_TTA_OPS = [
    ("id", lambda x: x, lambda x: x),
    ("rot90", lambda x: jnp.rot90(x, 1, (0, 1)), lambda x: jnp.rot90(x, -1, (0, 1))),
    ("rot180", lambda x: jnp.rot90(x, 2, (0, 1)), lambda x: jnp.rot90(x, -2, (0, 1))),
    ("rot270", lambda x: jnp.rot90(x, 3, (0, 1)), lambda x: jnp.rot90(x, -3, (0, 1))),
    ("hflip", lambda x: x[:, ::-1], lambda x: x[:, ::-1]),
    ("vflip", lambda x: x[::-1], lambda x: x[::-1]),
    ("transpose", lambda x: jnp.swapaxes(x, 0, 1), lambda x: jnp.swapaxes(x, 0, 1)),
]


class SensatInference:
    def __init__(self, opts, weights: str, scales=(320, 448, 576),
                 use_tta: bool = True, use_knn: bool = False,
                 save_preds: str | None = None,
                 recorder=None, split: str = "val"):
        self.opts = opts
        self.scales = [int(s) for s in scales]
        self.use_tta = use_tta
        self.use_knn = use_knn
        knn_params = opts.group("post").get("KNN", {}).get("params", {})
        self.knn_params = {
            "knn": int(knn_params.get("knn", 5)),
            "search": int(knn_params.get("search", 5)),
            "sigma": float(knn_params.get("sigma", 1.0)),
            "cutoff": float(knn_params.get("cutoff", 1.0)),
        }
        self.save_preds = save_preds
        self.recorder = recorder
        self.split = split
        self.dataset = SensatUrban(opts.data_root, split, keep_idx=True)
        self.model = PMFNet(nclasses=opts.nclasses,
                            base_channels=opts.base_channels,
                            image_backbone=opts.img_backbone)
        variables = jax.jit(lambda k: self.model.init(
            {"params": k, "dropout": jax.random.PRNGKey(1)},
            jnp.zeros((1, 32, 32, 5)), jnp.zeros((1, 32, 32, 3)),
            train=False))(jax.random.PRNGKey(0))
        ckpt = CheckpointManager(os.path.dirname(os.path.abspath(weights)))
        self.variables = ckpt.restore_weights(
            weights, {"params": variables["params"],
                      "batch_stats": variables["batch_stats"]})
        self.eval2d = IOUEval(opts.nclasses, ignore=[0])
        self.eval3d = IOUEval(opts.nclasses, ignore=[0])

        self._forwards = {}

    def _lift_points(self, frame, pred2d: np.ndarray, fm: np.ndarray,
                     index: int) -> np.ndarray:
        """2D BEV prediction → per-point labels (1..C-1 domain).

        Default: direct (h_idx, w_idx) gather. With --knn: the KNN
        post-processor over the max-height channel as the range image
        and per-point z from the source .ply as the true range
        (ref infer.py:186-198). Zero predictions → 1 ("ground",
        ref :203-207)."""
        h_idx = np.asarray(frame["h_idx"], np.int64)
        w_idx = np.asarray(frame["w_idx"], np.int64)
        if self.use_knn:
            from ..data.sensat_urban import read_ply
            from ..ops import knn_postprocess

            ply = os.path.join(
                self.dataset.split_folder,
                os.path.splitext(self.dataset.readFileNameByIndex(index))[0]
                + ".ply")
            z = np.asarray(read_ply(ply)["z"], np.float32)
            # pad P to a power-of-two bucket: jit caches per (P, params)
            P = len(z)
            bucket = max(1024, 1 << (P - 1).bit_length())
            zp = np.zeros((bucket,), np.float32)
            zp[:P] = z
            wi = np.zeros((bucket,), np.int32)
            hi = np.zeros((bucket,), np.int32)
            wi[:P] = w_idx
            hi[:P] = h_idx
            vmask = np.zeros((bucket,), bool)
            vmask[:P] = True
            pt = np.asarray(knn_postprocess(
                jnp.asarray(fm[0]), jnp.asarray(zp),
                jnp.asarray(pred2d), jnp.asarray(wi), jnp.asarray(hi),
                valid=jnp.asarray(vmask), nclasses=self.opts.nclasses,
                **self.knn_params))[:P]
        else:
            pt = pred2d[h_idx, w_idx]
        pt = np.where(pt == 0, 1, pt)  # "set zero to ground"
        return pt.astype(np.int32)

    def _forward(self, size: int):
        if size not in self._forwards:
            @jax.jit
            def f(variables, window):
                lidar, cam = self.model.apply(
                    variables, window[None, ..., :5], window[None, ..., 5:8],
                    train=False)
                return lidar[0]

            self._forwards[size] = f
        return self._forwards[size]

    def _predict_window(self, window: jnp.ndarray, size: int) -> np.ndarray:
        """Average class probabilities over the TTA variants."""
        fwd = self._forward(size)
        ops = _TTA_OPS if self.use_tta else _TTA_OPS[:1]
        acc = None
        for _, aug, inv in ops:
            probs = fwd(self.variables, aug(window))
            probs = inv(probs)
            acc = probs if acc is None else acc + probs
        return np.asarray(acc) / len(ops)

    def run(self, max_frames: int = -1) -> dict:
        n = len(self.dataset) if max_frames < 0 else min(max_frames,
                                                         len(self.dataset))
        for i in range(n):
            frame = self.dataset.readDataByIndex(i)
            fm = np.asarray(frame["feature_map"], np.float32)  # [8, H, W]
            lm = np.asarray(frame["label_map"], np.float32)
            H, W = lm.shape
            conf = np.zeros((H, W, self.opts.nclasses), np.float32)

            for size in self.scales:
                stride = size  # non-overlapping sliding grid w/ edge snap
                for top in _grid(H, size, stride):
                    for left in _grid(W, size, stride):
                        win = np.zeros((size, size, 8), np.float32)
                        h = min(size, H - top)
                        w = min(size, W - left)
                        win[:h, :w] = fm[:, top:top + h,
                                         left:left + w].transpose(1, 2, 0)
                        probs = self._predict_window(jnp.asarray(win), size)
                        conf[top:top + h, left:left + w] += probs[:h, :w]

            pred2d = conf.argmax(-1).astype(np.int32)
            gt2d = ((lm + 1) * fm[4]).astype(np.int32)
            self.eval2d.addBatch(pred2d, gt2d, valid=gt2d > 0)

            if frame.get("h_idx") is not None:
                pt = self._lift_points(frame, pred2d, fm, i)
                if self.split != "test":
                    try:
                        gt3d = self.dataset.readLabelByIndex(i).astype(
                            np.int32) + 1
                        self.eval3d.addBatch(pt, gt3d)
                    except FileNotFoundError:
                        pass  # no .bin label dump next to the frames
                if self.save_preds:
                    os.makedirs(self.save_preds, exist_ok=True)
                    (pt - 1).astype(np.uint8).tofile(os.path.join(
                        self.save_preds,
                        self.dataset.readFileNameByIndex(i).replace(
                            ".bin", ".label")))
            if self.recorder:
                miou, _ = self.eval2d.getIoU()
                self.recorder.logger.info(f"[{i + 1}/{n}] mIoU {miou:.4f}")
        miou, iou = self.eval2d.getIoU()
        macc, acc = self.eval2d.getAcc()
        mrec, rec = self.eval2d.getRecall()
        out = {"mIoU": float(miou), "mAcc": float(macc),
               "mRecall": float(mrec)}
        has_3d = float(self.eval3d.conf.sum()) > 0
        if has_3d:
            miou3, iou3 = self.eval3d.getIoU()
            out["point_mIoU"] = float(miou3)
        if self.recorder:
            names = {0: "ignore"}
            names.update({k + 1: v for k, v in
                          self.dataset.mapped_cls_name.items() if k >= 0})
            self.recorder.logger.info(
                "\n" + per_class_report(names, iou, acc, rec,
                                        self.eval2d.include) +
                f"\nmIoU {miou * 100:.2f}")
            if has_3d:
                _, acc3 = self.eval3d.getAcc()
                _, rec3 = self.eval3d.getRecall()
                self.recorder.logger.info(
                    "\n==== 3D point metrics ====\n" +
                    per_class_report(names, iou3, acc3, rec3,
                                     self.eval3d.include) +
                    f"\npoint mIoU {miou3 * 100:.2f}")
        return out


def _grid(total: int, size: int, stride: int):
    """Window starts covering [0, total) with edge snap-back."""
    starts = list(range(0, max(total - size, 0) + 1, stride))
    if not starts:
        starts = [0]
    if starts[-1] + size < total:
        starts.append(max(total - size, 0))
    return starts


def main():
    from ..utils import configure_compiler

    configure_compiler()  # see pmf_tpu/utils/compiler.py
    parser = argparse.ArgumentParser()
    parser.add_argument("config")
    parser.add_argument("--weights", required=True)
    parser.add_argument("--scales", type=int, nargs="*", default=[320, 448, 576])
    parser.add_argument("--no-tta", action="store_true")
    parser.add_argument("--knn", action="store_true")
    parser.add_argument("--save-preds", default=None)
    parser.add_argument("--split", default="val")
    parser.add_argument("--max-frames", type=int, default=-1)
    args = parser.parse_args()

    opts = load_options(args.config)
    recorder = Recorder(os.path.join(opts.run_dir, "eval_sensat"))
    inf = SensatInference(opts, args.weights, scales=args.scales,
                          use_tta=not args.no_tta,
                          use_knn=args.knn or bool(
                              opts.group("post").get("KNN", {}).get("use")),
                          save_preds=args.save_preds, recorder=recorder,
                          split=args.split)
    print(inf.run(args.max_frames))


if __name__ == "__main__":
    main()
