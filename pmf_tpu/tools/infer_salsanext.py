"""SalsaNext (LiDAR-only) range-image evaluation.

Parity: tasks/salsanext_eval_nuscenes/infer.py — per-scan forward on the
spherical range image, per-point label via `pred_argmax[py, px]` gather
(:107), optional KNN, per-token uint8 bin dump (nuScenes) or KITTI
.label writer, 3D metrics.

Usage:
  python -m pmf_tpu.tools.infer_salsanext <config.yaml> --weights <dir>
      [--knn] [--save-preds DIR] [--max-scans N]
"""
from __future__ import annotations

import argparse
import os

import jax
import jax.numpy as jnp
import numpy as np

from ..config import load_options
from ..data import RangeConfig, SemanticKitti, Nuscenes, build_range_sample_with_uproj
from ..data.loader import range_sample_reader
from ..metrics import IOUEval
from ..models import SalsaNext
from ..ops import argmax_last, knn_postprocess
from ..train import Recorder
from ..train.checkpoint import CheckpointManager
from ..utils.tables import per_class_report


class SalsaNextInference:
    def __init__(self, opts, weights: str, use_knn: bool = False,
                 save_preds: str | None = None, recorder=None,
                 split: str = "val"):
        self.opts = opts
        self.use_knn = use_knn
        self.save_preds = save_preds
        self.recorder = recorder
        self.split = split
        sensor = opts.group("sensor")
        self.cfg = RangeConfig(
            proj_h=int(sensor.get("proj_h", 64)),
            proj_w=int(sensor.get("proj_w", 2048)),
            fov_up=float(sensor.get("fov_up", 10.0)),
            fov_down=float(sensor.get("fov_down", -30.0)),
            n_points=int(sensor.get("n_points", 131072)),
            img_mean=tuple(sensor.get("img_mean", RangeConfig.img_mean)),
            img_stds=tuple(sensor.get("img_stds", RangeConfig.img_stds)),
            pcd_aug=False)
        knn_params = opts.group("post").get("KNN", {}).get("params", {})
        self.knn_params = {
            "knn": int(knn_params.get("knn", 5)),
            "search": int(knn_params.get("search", 5)),
            "sigma": float(knn_params.get("sigma", 1.0)),
            "cutoff": float(knn_params.get("cutoff", 1.0)),
        }

        if opts.dataset == "nuScenes":
            self.dataset = Nuscenes(
                opts.data_root,
                version=opts.config.get("nusc_version", "v1.0-trainval"),
                split=split, has_image=False,
                splits_file=opts.config.get("nusc_splits_file"))
        else:
            self.dataset = SemanticKitti(opts.data_root, [8], has_image=False)

        self.model = SalsaNext(nclasses=opts.nclasses,
                               base_channels=opts.base_channels)
        variables = jax.jit(lambda k: self.model.init(
            {"params": k, "dropout": jax.random.PRNGKey(1)},
            jnp.zeros((1, 64, 128, 5)), train=False))(jax.random.PRNGKey(0))
        ckpt = CheckpointManager(os.path.dirname(os.path.abspath(weights)))
        self.variables = ckpt.restore_weights(
            weights, {"params": variables["params"],
                      "batch_stats": variables["batch_stats"]})
        self.point_eval = IOUEval(opts.nclasses, ignore=[0])

        @jax.jit
        def forward(variables, feature):
            probs = self.model.apply(variables, feature[None], train=False)[0]
            return argmax_last(probs)

        self._forward = forward
        self.reader = range_sample_reader(self.dataset, self.cfg)

    def run(self, max_scans: int = -1):
        n = len(self.dataset) if max_scans < 0 else min(max_scans,
                                                        len(self.dataset))
        for i in range(n):
            s = self.reader(i)
            f, l2d, m, proj_range, px, py, depth, keep = \
                build_range_sample_with_uproj(
                    jnp.asarray(s["points"]), jnp.asarray(s["labels"]),
                    jnp.asarray(s["valid"]), self.cfg)
            argmax = self._forward(self.variables, f)
            if self.use_knn:
                pt_pred = knn_postprocess(
                    proj_range, depth, argmax, px, py, valid=keep,
                    nclasses=self.opts.nclasses, **self.knn_params)
            else:
                pt_pred = argmax[py, px]
                pt_pred = jnp.where(keep, pt_pred, 0)
            pt_pred = np.asarray(pt_pred)

            valid_np = np.asarray(s["valid"])
            n_pts = int(valid_np.sum())
            if self.split != "test" and self.opts.has_label:
                gt = s["labels"][:n_pts]
                self.point_eval.addBatch(pt_pred[:n_pts], gt)
            if self.save_preds:
                self._write(i, pt_pred[:n_pts])
            if self.recorder and (i % 200 == 0 or i == n - 1):
                miou, _ = self.point_eval.getIoU()
                self.recorder.logger.info(f"[{i + 1}/{n}] mIoU {miou:.4f}")
        return self.report(n)

    def _write(self, index, pred):
        if self.opts.dataset == "nuScenes":
            out_dir = os.path.join(self.save_preds, "lidarseg", self.split)
            os.makedirs(out_dir, exist_ok=True)
            token = self.dataset.lidar_token(index)
            pred.astype(np.uint8).tofile(
                os.path.join(out_dir, f"{token}_lidarseg.bin"))
        else:
            seq, frame = self.dataset.parsePathInfoByIndex(index)
            out_dir = os.path.join(self.save_preds, "sequences", seq,
                                   "predictions")
            os.makedirs(out_dir, exist_ok=True)
            raw = self.dataset.labelInvMapping(pred)
            raw.astype(np.int32).tofile(os.path.join(out_dir, f"{frame}.label"))

    def report(self, n):
        miou, iou = self.point_eval.getIoU()
        macc, acc = self.point_eval.getAcc()
        mrec, rec = self.point_eval.getRecall()
        if self.recorder:
            self.recorder.logger.info(
                f"\n==== SalsaNext point metrics ({n} scans) ====\n" +
                per_class_report(self.dataset.mapped_cls_name, iou, acc, rec,
                                 self.point_eval.include) +
                f"\nmIoU {miou * 100:.2f}")
        return {"mIoU": float(miou), "mAcc": float(macc),
                "mRecall": float(mrec)}


def main():
    from ..utils import configure_compiler

    configure_compiler()  # see pmf_tpu/utils/compiler.py
    parser = argparse.ArgumentParser()
    parser.add_argument("config")
    parser.add_argument("--weights", required=True)
    parser.add_argument("--knn", action="store_true")
    parser.add_argument("--save-preds", default=None)
    parser.add_argument("--split", default="val")
    parser.add_argument("--max-scans", type=int, default=-1)
    args = parser.parse_args()

    opts = load_options(args.config)
    recorder = Recorder(os.path.join(opts.run_dir, "eval_salsanext"))
    inf = SalsaNextInference(opts, args.weights, use_knn=args.knn,
                             save_preds=args.save_preds, recorder=recorder,
                             split=args.split)
    print(inf.run(args.max_scans))


if __name__ == "__main__":
    main()
