"""SensatUrban evaluation: multi-scale sliding-window TTA inference.

Parity: tasks/sensat_urban/pmf_eval/infer.py —
  * sliding windows at multiple crop sizes (ref 320/448/576, :93-174)
    accumulated into a per-pixel confidence map;
  * 7-way test-time augmentation: identity, rot90/180/270, h-flip,
    v-flip, transpose (:127-169);
  * per-point labels via the stored (h_idx, w_idx) gather, written as
    .label submission files;
  * 2D metrics on labeled cells.

Usage:
  python -m pmf_tpu.tools.infer_sensat <config.yaml> --weights <dir>
      [--scales 320 448] [--no-tta] [--save-preds DIR] [--split val]
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
                 use_tta: bool = True, save_preds: str | None = None,
                 recorder=None, split: str = "val"):
        self.opts = opts
        self.scales = [int(s) for s in scales]
        self.use_tta = use_tta
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

        self._forwards = {}

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

            if self.save_preds and frame.get("h_idx") is not None:
                pt = pred2d[frame["h_idx"], frame["w_idx"]] - 1
                pt = np.clip(pt, 0, self.opts.nclasses - 2).astype(np.uint8)
                os.makedirs(self.save_preds, exist_ok=True)
                pt.tofile(os.path.join(
                    self.save_preds,
                    self.dataset.readFileNameByIndex(i).replace(".bin",
                                                                ".label")))
            if self.recorder:
                miou, _ = self.eval2d.getIoU()
                self.recorder.logger.info(f"[{i + 1}/{n}] mIoU {miou:.4f}")
        miou, iou = self.eval2d.getIoU()
        macc, acc = self.eval2d.getAcc()
        mrec, rec = self.eval2d.getRecall()
        if self.recorder:
            names = {0: "ignore"}
            names.update({k + 1: v for k, v in
                          self.dataset.mapped_cls_name.items() if k >= 0})
            self.recorder.logger.info(
                "\n" + per_class_report(names, iou, acc, rec,
                                        self.eval2d.include) +
                f"\nmIoU {miou * 100:.2f}")
        return {"mIoU": float(miou), "mAcc": float(macc),
                "mRecall": float(mrec)}


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
    parser.add_argument("--save-preds", default=None)
    parser.add_argument("--split", default="val")
    parser.add_argument("--max-frames", type=int, default=-1)
    args = parser.parse_args()

    opts = load_options(args.config)
    recorder = Recorder(os.path.join(opts.run_dir, "eval_sensat"))
    inf = SensatInference(opts, args.weights, scales=args.scales,
                          use_tta=not args.no_tta,
                          save_preds=args.save_preds, recorder=recorder,
                          split=args.split)
    print(inf.run(args.max_frames))


if __name__ == "__main__":
    main()
