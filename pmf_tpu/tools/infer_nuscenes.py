"""nuScenes evaluation: 6-camera max-confidence merge + submission bins.

Parity: tasks/pmf_eval_nuscenes/infer.py and tasks/epmf_eval_nuscenes/
infer.py —
  * per (lidar, camera) item forward at eval resolution;
  * per-point (confidence, argmax) unprojected through the pixel indices;
  * incremental running max-confidence merge over the full point cloud
    across the 6 cameras of each keyframe (epmf variant :170-181);
  * lidar-token continuity assert across the 6 items (:176-180);
  * optional KNN on the per-camera predictions;
  * writes preds/lidarseg/{split}/{token}_lidarseg.bin uint8 (:202-210);
  * 3D point metrics vs ground truth when labels exist.

Usage:
  python -m pmf_tpu.tools.infer_nuscenes <config.yaml> --weights <dir>
      [--knn] [--save-preds DIR] [--max-frames N]
"""
from __future__ import annotations

import argparse
import os

import jax
import jax.numpy as jnp
import numpy as np

from ..config import load_options
from ..data import Nuscenes, PVConfig, build_eval_sample_with_uproj, pad_image, pad_points
from ..data.perspective_pipeline_v2 import (
    V2Config, build_v2_eval_sample_with_uproj,
)
from ..metrics import IOUEval
from ..ops import argmax_last, knn_postprocess
from ..train import Recorder
from ..train.checkpoint import CheckpointManager
from ..utils.tables import per_class_report
from .infer_kitti import build_model


class NuscenesInference:
    def __init__(self, opts, weights: str, use_knn: bool = False,
                 save_preds: str | None = None, recorder=None,
                 split: str = "val"):
        self.opts = opts
        self.use_knn = use_knn
        self.save_preds = save_preds
        self.recorder = recorder
        self.split = split
        self.is_v2 = opts.net_type == "EPMFNet"

        group = opts.group("PVconfig") if self.is_v2 else opts.group("sensor")
        common = dict(
            canvas_h=int(group.get("canvas_h", 900)),
            canvas_w=int(group.get("canvas_w", 1600)),
            proj_h=int(group.get("proj_h", 896)),
            proj_w=int(group.get("proj_w", 1600)),
            n_points=int(group.get("n_points", 65536)),
            img_mean=tuple(group.get("pcd_mean", group.get("img_mean",
                                                           PVConfig.img_mean))),
            img_stds=tuple(group.get("pcd_stds", group.get("img_stds",
                                                           PVConfig.img_stds))))
        if self.is_v2:
            self.cfg = V2Config(proj_ht=common["proj_h"],
                                proj_wt=common["proj_w"], **common)
        else:
            self.cfg = PVConfig(h_pad=int(group.get("h_pad", 0)),
                                w_pad=int(group.get("w_pad", 0)),
                                projection="cam", **common)
        knn_params = opts.group("post").get("KNN", {}).get("params", {})
        self.knn_params = {
            "knn": int(knn_params.get("knn", 5)),
            "search": int(knn_params.get("search", 5)),
            "sigma": float(knn_params.get("sigma", 1.0)),
            "cutoff": float(knn_params.get("cutoff", 1.0)),
        }

        self.dataset = Nuscenes(
            opts.data_root, version=opts.config.get("nusc_version", "v1.0-trainval"),
            split=split, splits_file=opts.config.get("nusc_splits_file"))

        self.model = build_model(opts)
        h = self.cfg.proj_h if not self.is_v2 else self.cfg.proj_h
        w = self.cfg.proj_w
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
            probs = lidar[0]
            conf = jnp.max(probs, -1)
            argmax = argmax_last(probs)
            return conf, argmax

        self._forward = forward

    def _eval_sample(self, s):
        args = (jnp.asarray(s["points"]), jnp.asarray(s["labels"]),
                jnp.asarray(s["valid"]), jnp.asarray(s["proj_matrix"]),
                jnp.asarray(s["image"]), s["img_h"], s["img_w"], self.cfg)
        if self.is_v2:
            return build_v2_eval_sample_with_uproj(*args)
        return build_eval_sample_with_uproj(*args)

    def run(self, max_frames: int = -1):
        from ..data.loader import nuscenes_sample_reader

        reader = nuscenes_sample_reader(self.dataset, self.cfg)
        n_items = len(self.dataset)
        if max_frames > 0:
            n_items = min(n_items, max_frames * 6)

        merged_conf = merged_pred = None
        current_token = None
        cams_seen = 0
        n_frames = 0

        for i in range(n_items):
            token = self.dataset.lidar_token(i)
            if token != current_token:
                if current_token is not None and cams_seen == 6:
                    self._finish_frame(current_token, merged_pred, merged_conf, i - 1)
                    n_frames += 1
                current_token = token
                cams_seen = 0
                merged_conf = merged_pred = None

            s = reader(i)
            f, m, l2d, rows, cols, keep, depth = self._eval_sample(s)
            conf2d, argmax2d = self._forward(self.variables, f)

            rows_c = jnp.clip(rows.astype(jnp.int32), 0, conf2d.shape[0] - 1)
            cols_c = jnp.clip(cols.astype(jnp.int32), 0, conf2d.shape[1] - 1)
            if self.use_knn:
                proj_depth = jnp.where(m, f[..., 0] * self.cfg.img_stds[0]
                                       + self.cfg.img_mean[0], -1.0)
                pt_pred = knn_postprocess(
                    proj_depth, depth, argmax2d, cols_c, rows_c, valid=keep,
                    nclasses=self.opts.nclasses, **self.knn_params)
                if self.is_v2:
                    # EPMF parity: the reference also pushes the CONFIDENCE
                    # map through the voting KNN before the 6-camera merge
                    # (tasks/epmf_eval_nuscenes/infer.py:155-161). Because
                    # that KNN truncates its value map to ints (knn.py:118
                    # .long()), conf∈[0,1) votes as class 0, the 1..C-1
                    # vote argmax is 0, and the output is identically 1 —
                    # so with --knn the merge effectively becomes
                    # first-camera-wins at overlaps. We reproduce the same
                    # chain (our knn_postprocess truncates identically)
                    # rather than the raw-gather conf, to match which
                    # camera wins in the reference.
                    pt_conf = knn_postprocess(
                        proj_depth, depth, conf2d, cols_c, rows_c,
                        valid=keep, nclasses=self.opts.nclasses,
                        **self.knn_params).astype(jnp.float32)
                else:
                    # PMF parity: conf stays a raw gather
                    # (tasks/pmf_eval_nuscenes/infer.py:165)
                    pt_conf = conf2d[rows_c, cols_c]
            else:
                pt_pred = argmax2d[rows_c, cols_c]
                pt_conf = conf2d[rows_c, cols_c]
            pt_pred = np.where(np.asarray(keep), np.asarray(pt_pred), 0)
            pt_conf = np.where(np.asarray(keep), np.asarray(pt_conf), -1.0)

            # incremental max-confidence merge (epmf_eval_nuscenes :170-181)
            if merged_conf is None:
                merged_conf = pt_conf
                merged_pred = pt_pred
            else:
                better = pt_conf > merged_conf
                merged_conf = np.where(better, pt_conf, merged_conf)
                merged_pred = np.where(better, pt_pred, merged_pred)
            cams_seen += 1

        if current_token is not None and cams_seen == 6:
            self._finish_frame(current_token, merged_pred, merged_conf,
                               n_items - 1)
            n_frames += 1
        return self.report(n_frames)

    def _finish_frame(self, token, pred, conf, last_index):
        pcd, sem, _ = self.dataset.loadDataByIndex(last_index)
        n = len(pcd)
        pred = pred[:n]
        if self.split != "test":
            gt = self.dataset.labelMapping(sem)
            covered = pred > 0
            self.point_eval.addBatch(pred[covered], gt[:n][covered])
        if self.save_preds:
            out_dir = os.path.join(self.save_preds, "lidarseg", self.split)
            os.makedirs(out_dir, exist_ok=True)
            pred.astype(np.uint8).tofile(
                os.path.join(out_dir, f"{token}_lidarseg.bin"))

    def report(self, n_frames: int) -> dict:
        miou, iou = self.point_eval.getIoU()
        macc, acc = self.point_eval.getAcc()
        mrec, rec = self.point_eval.getRecall()
        if self.recorder:
            self.recorder.logger.info(
                f"\n==== nuScenes point metrics ({n_frames} frames) ====\n" +
                per_class_report(self.dataset.mapped_cls_name, iou, acc, rec,
                                 self.point_eval.include) +
                f"\nmIoU {miou * 100:.2f}")
        return {"mIoU": float(miou), "mAcc": float(macc),
                "mRecall": float(mrec), "frames": n_frames}


def main():
    from ..utils import configure_compiler

    configure_compiler()  # see pmf_tpu/utils/compiler.py
    parser = argparse.ArgumentParser()
    parser.add_argument("config")
    parser.add_argument("--weights", required=True)
    parser.add_argument("--knn", action="store_true")
    parser.add_argument("--save-preds", default=None)
    parser.add_argument("--split", default="val")
    parser.add_argument("--max-frames", type=int, default=-1)
    args = parser.parse_args()

    opts = load_options(args.config)
    recorder = Recorder(os.path.join(opts.run_dir, "eval_nuscenes"))
    inf = NuscenesInference(opts, args.weights, use_knn=args.knn,
                            save_preds=args.save_preds, recorder=recorder,
                            split=args.split)
    print(inf.run(args.max_frames))


if __name__ == "__main__":
    main()
