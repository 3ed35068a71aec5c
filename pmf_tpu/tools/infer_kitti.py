"""SemanticKITTI evaluation / inference task.

Parity: tasks/pmf_eval_semantickitti/infer.py — per-scan (batch 1)
inference with unprojection indices, 2D pixel + 3D point evaluators,
optional KNN refinement, KITTI submission `.label` files via the inverse
class LUT, and the full per-class IoU/Acc/Recall + fwIoU report with a
LaTeX row.

Usage:
  python -m pmf_tpu.tools.infer_kitti <config.yaml> --weights <ckpt dir>
      [--knn] [--save-preds DIR] [--max-scans N]
"""
from __future__ import annotations

import argparse
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from ..config import load_options
from ..data import (
    PVConfig, SemanticKitti, build_eval_sample_with_uproj,
    kitti_sample_reader,
)
from ..data.perspective_pipeline_v2 import (
    V2Config, build_v2_eval_sample_with_uproj,
)
from ..data.augment import AugmentConfig
from ..metrics import IOUEval
from ..models import EPMFNet, PMFNet
from ..ops import argmax_last, knn_postprocess
from ..train import Recorder
from ..train.checkpoint import CheckpointManager
from ..utils.tables import (format_table, latex_row, matrix_report,
    per_class_report)


def build_model(opts):
    """Model per config, honoring the perf flags (compute_dtype,
    use_packed) — checkpoints are interchangeable across both."""
    import jax.numpy as jnp

    dtype = jnp.bfloat16 if opts.compute_dtype == "bfloat16" else jnp.float32
    if opts.net_type == "EPMFNet":
        return EPMFNet(nclasses=opts.nclasses, base_channels=opts.base_channels,
                       image_backbone=opts.img_backbone, dtype=dtype,
                       use_packed=opts.use_packed)
    return PMFNet(nclasses=opts.nclasses, base_channels=opts.base_channels,
                  image_backbone=opts.img_backbone, dtype=dtype,
                  use_packed=opts.use_packed)


class Inference:
    def __init__(self, opts, weights: str, use_knn: bool = False,
                 save_preds: str | None = None, recorder=None):
        self.opts = opts
        self.use_knn = use_knn
        self.save_preds = save_preds
        self.recorder = recorder
        self.is_v2 = opts.net_type == "EPMFNet"
        sensor = opts.group("PVconfig") if self.is_v2 and \
            opts.group("PVconfig") else opts.group("sensor")
        if self.is_v2:
            self.pv_cfg = V2Config(
                canvas_h=int(sensor.get("canvas_h", 384)),
                canvas_w=int(sensor.get("canvas_w", 1248)),
                proj_h=int(sensor.get("proj_h", 320)),
                proj_w=int(sensor.get("proj_w", 1280)),
                proj_ht=int(sensor.get("proj_ht", 320)),
                proj_wt=int(sensor.get("proj_wt", 1280)),
                n_points=int(sensor.get("n_points", 131072)),
                img_mean=tuple(sensor.get("pcd_mean", V2Config.img_mean)),
                img_stds=tuple(sensor.get("pcd_stds", V2Config.img_stds)))
        else:
            self.pv_cfg = PVConfig(
                canvas_h=int(sensor.get("canvas_h", 384)),
                canvas_w=int(sensor.get("canvas_w", 1248)),
                proj_h=int(sensor.get("proj_h", 384)),
                proj_w=int(sensor.get("proj_w", 1232)),
                h_pad=int(sensor.get("h_pad", 7)),
                w_pad=int(sensor.get("w_pad", 3)),
                n_points=int(sensor.get("n_points", 131072)),
                img_mean=tuple(sensor.get("img_mean", PVConfig.img_mean)),
                img_stds=tuple(sensor.get("img_stds", PVConfig.img_stds)),
                augment=AugmentConfig())
        knn_params = opts.group("post").get("KNN", {}).get("params", {})
        self.knn_params = {
            "knn": int(knn_params.get("knn", 5)),
            "search": int(knn_params.get("search", 5)),
            "sigma": float(knn_params.get("sigma", 1.0)),
            "cutoff": float(knn_params.get("cutoff", 1.0)),
        }

        self.dataset = SemanticKitti(opts.data_root, [8])
        self.reader = kitti_sample_reader(self.dataset, self.pv_cfg)

        self.model = build_model(opts)
        variables = self.model.init(
            {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
            jnp.zeros((1, self.pv_cfg.proj_h, self.pv_cfg.proj_w, 5)),
            jnp.zeros((1, self.pv_cfg.proj_h, self.pv_cfg.proj_w, 3)),
            train=False)
        ckpt = CheckpointManager(os.path.dirname(os.path.abspath(weights)))
        self.variables = ckpt.restore_weights(
            weights, {"params": variables["params"],
                      "batch_stats": variables["batch_stats"]})

        # learning_ignore: train-class id → bool (semantic-kitti.yaml)
        self.ignore = [cl for cl, ig in self.dataset.learning_ignore.items()
                       if ig] or [0]
        self.pixel_eval = IOUEval(opts.nclasses, ignore=self.ignore)
        self.point_eval = IOUEval(opts.nclasses, ignore=self.ignore)

        # variables as an ARGUMENT (not a closure constant): a closure
        # embeds every weight into the executable (~300 MB serialized)
        # and defeats the persistent compile cache
        @jax.jit
        def forward(variables, feature):
            lidar, cam = self.model.apply(variables, feature[..., :5],
                                          feature[..., 5:8], train=False)
            return lidar

        self._forward = lambda f: forward(self.variables, f)

    def run(self, max_scans: int = -1):
        n = len(self.dataset) if max_scans < 0 else min(max_scans, len(self.dataset))
        t_total = 0.0
        for i in range(n):
            s = self.reader(i)
            build = build_v2_eval_sample_with_uproj if self.is_v2 \
                else build_eval_sample_with_uproj
            f, m, l2d, rows, cols, keep, depth = build(
                jnp.asarray(s["points"]), jnp.asarray(s["labels"]),
                jnp.asarray(s["valid"]), jnp.asarray(s["proj_matrix"]),
                jnp.asarray(s["image"]), s["img_h"], s["img_w"], self.pv_cfg)
            t0 = time.perf_counter()
            probs = self._forward(f[None])[0]
            argmax = argmax_last(probs)

            if self.use_knn:
                # depth plane for KNN: the projected depth channel denorm
                proj_depth = (f[..., 0] * self.pv_cfg.img_stds[0]
                              + self.pv_cfg.img_mean[0]) * m
                proj_range = jnp.where(m, proj_depth, -1.0)
                unproj_range = jnp.linalg.norm(
                    jnp.asarray(s["points"])[:, :3], axis=-1)
                point_pred = knn_postprocess(
                    proj_range, unproj_range, argmax, cols, rows, valid=keep,
                    nclasses=self.opts.nclasses, **self.knn_params)
            else:
                point_pred = argmax[jnp.clip(rows, 0, self.pv_cfg.proj_h - 1),
                                    jnp.clip(cols, 0, self.pv_cfg.proj_w - 1)]
                point_pred = jnp.where(keep, point_pred, 0)
            point_pred = np.asarray(jax.block_until_ready(point_pred))
            t_total += time.perf_counter() - t0

            # 2D pixel eval on labeled pixels
            self.pixel_eval.addBatch(np.asarray(argmax), np.asarray(l2d),
                                     valid=np.asarray(l2d) > 0)
            # 3D point eval on kept + labeled points
            keep_np = np.asarray(keep) & np.asarray(s["valid"])
            gt = s["labels"]
            self.point_eval.addBatch(point_pred[keep_np], gt[keep_np])

            if self.save_preds:
                seq, frame = self.dataset.parsePathInfoByIndex(i)
                out_dir = os.path.join(self.save_preds, "sequences", seq,
                                       "predictions")
                os.makedirs(out_dir, exist_ok=True)
                raw = self.dataset.labelInvMapping(
                    point_pred[:int(np.asarray(s["valid"]).sum())])
                raw.astype(np.int32).tofile(
                    os.path.join(out_dir, f"{frame}.label"))

            if self.recorder and (i % 100 == 0 or i == n - 1):
                miou, _ = self.point_eval.getIoU()
                self.recorder.logger.info(
                    f"[{i + 1}/{n}] 3D mIoU {miou:.4f} "
                    f"({t_total / (i + 1) * 1000:.1f} ms/scan)")
        return self.report(n, t_total)

    def report(self, n: int, t_total: float) -> dict:
        out = {}
        for tag, ev in [("pixel", self.pixel_eval), ("point", self.point_eval)]:
            miou, iou = ev.getIoU()
            macc, acc = ev.getAcc()
            mrec, rec = ev.getRecall()
            fwiou = ev.getFwIoU()
            out[tag] = {"mIoU": float(miou), "mAcc": float(macc),
                        "mRecall": float(mrec), "fwIoU": float(fwiou)}
            if self.recorder:
                self.recorder.logger.info(
                    f"\n==== {tag} metrics ({n} scans) ====\n" +
                    per_class_report(self.dataset.mapped_cls_name, iou, acc,
                                     rec, ev.include) +
                    f"\nmIoU {miou * 100:.2f}  mAcc {macc * 100:.2f}  "
                    f"mRecall {mrec * 100:.2f}  fwIoU {fwiou * 100:.2f}\n"
                    f"LaTeX: {latex_row(iou, ev.include)}\n"
                    "confusion (counts):\n" +
                    matrix_report(ev.conf, self.dataset.mapped_cls_name) +
                    "\nacc matrix (row-normalized):\n" +
                    matrix_report(ev.conf, self.dataset.mapped_cls_name,
                                  "acc") +
                    "\nrecall matrix (col-normalized):\n" +
                    matrix_report(ev.conf, self.dataset.mapped_cls_name,
                                  "recall"))
        out["ms_per_scan"] = t_total / max(n, 1) * 1000
        if self.recorder:
            self.recorder.logger.info(
                f"inference: {out['ms_per_scan']:.1f} ms/scan "
                f"({1000 / max(out['ms_per_scan'], 1e-9):.1f} scans/sec)")
        return out


def main():
    from ..utils import configure_compiler

    configure_compiler()  # see pmf_tpu/utils/compiler.py
    parser = argparse.ArgumentParser()
    parser.add_argument("config")
    parser.add_argument("--weights", required=True,
                        help="orbax dir saved by CheckpointManager.save_best")
    parser.add_argument("--knn", action="store_true")
    parser.add_argument("--save-preds", default=None)
    parser.add_argument("--max-scans", type=int, default=-1)
    args = parser.parse_args()

    opts = load_options(args.config)
    recorder = Recorder(os.path.join(opts.run_dir, "eval"))
    inf = Inference(opts, args.weights, use_knn=args.knn,
                    save_preds=args.save_preds, recorder=recorder)
    print(inf.run(args.max_scans))


if __name__ == "__main__":
    main()
