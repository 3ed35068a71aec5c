"""A2D2 evaluation task.

Parity: tasks/epmf_eval_a2d2/infer.py — per-scan fusion inference on
A2D2's precomputed point→pixel indices (the adapter's npz carries
row/col; no projection matrix involved), tight window around the
points padded to the static network size, 3D point metrics and
`.label` prediction files named via get_save_file_name.
"""
from __future__ import annotations

import argparse
import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

from ..config import load_options
from ..data.a2d2 import A2D2_PV
from ..data.perspective_pipeline import pad_points
from ..metrics import IOUEval
from ..ops.reduce import argmax_last
from ..ops.scatter import fill_canvas, zbuffer_scatter_packed
from ..train import Recorder
from ..train.checkpoint import CheckpointManager
from ..utils.tables import per_class_report
from .infer_kitti import build_model


@functools.partial(jax.jit, static_argnames=("out_h", "out_w", "mean", "std"))
def _build_window(points, labels, valid, rows, cols, image, out_h, out_w,
                  mean, std):
    """Scatter points (with precomputed pixel coords shifted into the
    window) + slice RGB; returns (feature, mask, label2d)."""
    depth = jnp.linalg.norm(points[:, :3], axis=-1)
    keep = valid & (rows >= 0) & (rows < out_h) & (cols >= 0) & (cols < out_w)
    winner, mask = zbuffer_scatter_packed(rows, cols, depth, keep,
                                          out_h, out_w)
    vals = jnp.concatenate(
        [depth[:, None], points[:, :4], labels[:, None].astype(jnp.float32)],
        axis=-1)
    canvas = fill_canvas(vals, rows, cols, keep, winner, mask)
    lab = canvas[..., 5].astype(jnp.int32)
    feature = jnp.concatenate([canvas[..., :5], image], axis=-1)
    m = jnp.asarray(mean, feature.dtype)
    s = jnp.asarray(std, feature.dtype)
    lidar = (feature[..., :5] - m) / s * mask[..., None].astype(feature.dtype)
    return jnp.concatenate([lidar, feature[..., 5:]], axis=-1), mask, lab, keep


class A2D2Inference:
    def __init__(self, opts, weights: str, save_preds: str | None = None,
                 recorder=None, split: str = "valid"):
        self.opts = opts
        self.save_preds = save_preds
        self.recorder = recorder
        group = opts.group("PVconfig") or opts.group("sensor")
        self.out_h = int(group.get("proj_h", 1216))
        self.out_w = int(group.get("proj_w", 1920))
        self.n_points = int(group.get("n_points", 32768))
        self.mean = tuple(group.get("pcd_mean",
                                    group.get("img_mean",
                                              (12.12, 10.88, 0.23, -1.04, 0.21))))
        self.std = tuple(group.get("pcd_stds",
                                   group.get("img_stds",
                                             (12.32, 11.47, 6.91, 0.86, 0.16))))
        self.dataset = A2D2_PV(
            opts.data_root,
            opts.config.get("cams_lidars_json",
                            os.path.join(opts.data_root, "cams_lidars.json")),
            opts.config.get("class_index_json",
                            os.path.join(opts.data_root, "class_index.json")),
            split=split,
            apply_excludes=bool(opts.config.get("apply_excludes", True)))

        self.model = build_model(opts)
        variables = jax.jit(lambda k: self.model.init(
            {"params": k, "dropout": jax.random.PRNGKey(1)},
            jnp.zeros((1, 64, 128, 5)), jnp.zeros((1, 64, 128, 3)),
            train=False))(jax.random.PRNGKey(0))
        ckpt = CheckpointManager(os.path.dirname(os.path.abspath(weights)))
        self.variables = ckpt.restore_weights(
            weights, {"params": variables["params"],
                      "batch_stats": variables["batch_stats"]})
        self.point_eval = IOUEval(opts.nclasses, ignore=[0])

        @jax.jit
        def forward(variables, feature):
            lidar, cam = self.model.apply(variables, feature[None, ..., :5],
                                          feature[None, ..., 5:8], train=False)
            return argmax_last(lidar[0])

        self._forward = forward

    def run(self, max_scans: int = -1) -> dict:
        n = len(self.dataset) if max_scans < 0 else min(max_scans,
                                                        len(self.dataset))
        for i in range(n):
            pcd, sem, _ = self.dataset.loadDataByIndex(i)
            rows, cols = self.dataset.pixel_indices(i)
            img = self.dataset.loadImage(i).astype(np.float32) / 255.0

            # center the point window in the static output frame
            r0 = max((rows.min() + rows.max()) // 2 - self.out_h // 2, 0)
            c0 = max((cols.min() + cols.max()) // 2 - self.out_w // 2, 0)
            rw = rows - r0
            cw = cols - c0
            image = np.zeros((self.out_h, self.out_w, 3), np.float32)
            h = min(self.out_h, img.shape[0] - r0)
            w = min(self.out_w, img.shape[1] - c0)
            if h > 0 and w > 0:
                image[:h, :w] = img[r0:r0 + h, c0:c0 + w]

            pts, labels, valid = pad_points(pcd, sem, self.n_points)
            rwp = np.zeros((self.n_points,), np.int32)
            cwp = np.zeros((self.n_points,), np.int32)
            m = min(len(rw), self.n_points)
            rwp[:m] = rw[:m]
            cwp[:m] = cw[:m]

            f, mask2d, l2d, keep = _build_window(
                jnp.asarray(pts), jnp.asarray(labels), jnp.asarray(valid),
                jnp.asarray(rwp), jnp.asarray(cwp), jnp.asarray(image),
                self.out_h, self.out_w, self.mean, self.std)
            argmax = self._forward(self.variables, f)
            keep_np = np.asarray(keep)
            pred = np.asarray(argmax)[np.clip(rwp, 0, self.out_h - 1),
                                      np.clip(cwp, 0, self.out_w - 1)]
            pred = np.where(keep_np, pred, 0)

            n_pts = len(pcd)
            self.point_eval.addBatch(pred[:n_pts], sem,
                                     valid=keep_np[:n_pts])
            if self.save_preds:
                os.makedirs(self.save_preds, exist_ok=True)
                name = self.dataset.get_save_file_name(
                    self.dataset.label_files[i])
                pred[:n_pts].astype(np.int32).tofile(
                    os.path.join(self.save_preds, name))
            if self.recorder and (i % 200 == 0 or i == n - 1):
                miou, _ = self.point_eval.getIoU()
                self.recorder.logger.info(f"[{i + 1}/{n}] mIoU {miou:.4f}")

        miou, iou = self.point_eval.getIoU()
        macc, acc = self.point_eval.getAcc()
        mrec, rec = self.point_eval.getRecall()
        if self.recorder:
            self.recorder.logger.info(
                "\n" + per_class_report(self.dataset.mapped_class_name, iou,
                                        acc, rec, self.point_eval.include) +
                f"\nmIoU {miou * 100:.2f}")
        return {"mIoU": float(miou), "mAcc": float(macc),
                "mRecall": float(mrec)}


def main():
    from ..utils import configure_compiler

    configure_compiler()  # see pmf_tpu/utils/compiler.py
    parser = argparse.ArgumentParser()
    parser.add_argument("config")
    parser.add_argument("--weights", required=True)
    parser.add_argument("--save-preds", default=None)
    parser.add_argument("--split", default="valid")
    parser.add_argument("--max-scans", type=int, default=-1)
    args = parser.parse_args()

    opts = load_options(args.config)
    recorder = Recorder(os.path.join(opts.run_dir, "eval_a2d2"))
    inf = A2D2Inference(opts, args.weights, save_preds=args.save_preds,
                        recorder=recorder, split=args.split)
    print(inf.run(args.max_scans))


if __name__ == "__main__":
    main()
