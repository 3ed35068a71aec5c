"""Offline SemanticKITTI → camera-FOV dataset distillation.

Parity: tasks/process_semantickitti_fov/create_fov_dataset.py:10-61 —
for every scan keep only the points inside the camera image
(mapLidar2Camera keep mask), write filtered .bin/.label, copy image_2
and calib.txt into a `semantic-kitti-fov` tree.

Usage:
  python -m pmf_tpu.tools.create_fov_dataset --src <sequences dir>
      --dst <fov sequences dir> [--sequences 0 1 2 ...]
"""
from __future__ import annotations

import argparse
import os
import shutil

import numpy as np

from ..data import SemanticKitti


def _np_keep_mask(points, proj_matrix, img_h, img_w):
    """Host-side keep mask (parser.py:209-227 semantics)."""
    keep = points[:, 0] > 0.5
    hom = np.concatenate([points[:, :3], np.ones((len(points), 1),
                                                 np.float32)], axis=1)
    uvw = hom @ proj_matrix.T
    w = np.where(np.abs(uvw[:, 2]) > 1e-9, uvw[:, 2], 1e-9)
    u = uvw[:, 0] / w
    v = uvw[:, 1] / w
    keep &= (u > 0) & (u < img_w) & (v > 0) & (v < img_h)
    return keep


def create_fov_dataset(src: str, dst: str, sequences=None, has_label=True):
    sequences = sequences if sequences is not None else list(range(11))
    n_total = 0
    for seq in sequences:
        ds = SemanticKitti(src, [seq], has_label=has_label)
        seq_s = f"{int(seq):02d}"
        out = os.path.join(dst, seq_s)
        os.makedirs(os.path.join(out, "velodyne"), exist_ok=True)
        if has_label:
            os.makedirs(os.path.join(out, "labels"), exist_ok=True)
        os.makedirs(os.path.join(out, "image_2"), exist_ok=True)
        shutil.copy2(os.path.join(src, seq_s, "calib.txt"),
                     os.path.join(out, "calib.txt"))
        P = ds.projection_matrix(seq_s)
        for i in range(len(ds)):
            pcd, sem, inst = ds.loadDataByIndex(i)
            from PIL import Image

            img = Image.open(ds.image_files[i])
            keep = _np_keep_mask(pcd, P, img.height, img.width)
            _, frame = ds.parsePathInfoByIndex(i)
            pcd[keep].astype(np.float32).tofile(
                os.path.join(out, "velodyne", f"{frame}.bin"))
            if has_label:
                packed = (sem[keep].astype(np.int32) |
                          (inst[keep].astype(np.int32) << 16))
                packed.tofile(os.path.join(out, "labels", f"{frame}.label"))
            shutil.copy2(ds.image_files[i],
                         os.path.join(out, "image_2", f"{frame}.png"))
            n_total += 1
    return n_total


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--src", required=True)
    parser.add_argument("--dst", required=True)
    parser.add_argument("--sequences", type=int, nargs="*", default=None)
    parser.add_argument("--no-labels", action="store_true")
    args = parser.parse_args()
    n = create_fov_dataset(args.src, args.dst, args.sequences,
                           has_label=not args.no_labels)
    print(f"wrote {n} FOV scans to {args.dst}")


if __name__ == "__main__":
    main()
