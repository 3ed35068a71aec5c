"""SemanticKITTI dataset adapter.

Parity: pc_processor/dataset/semantic_kitti/parser.py (SemanticKitti):
file discovery per sequence, .bin/.label decoding (semantic = low 16
bits, instance = high 16), calib P2·Tr projection matrix, learning-map /
color LUTs from the class-map YAML, class frequency from `content`.

The adapter is host-side numpy only (file IO). All geometry
(mapLidar2Camera etc.) lives in pmf_tpu.ops.projection as jittable
functions; `projection_matrix(seq)` feeds them.
"""
from __future__ import annotations

import os

import numpy as np
import yaml

from ..ops.projection import read_kitti_calib

DEFAULT_CONFIG = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "configs", "semantic-kitti.yaml")


def _build_lut(mapping: dict, dtype=np.int32) -> np.ndarray:
    """Dense LUT from a sparse {id: value} map (+100 headroom like
    parser.py:117-130)."""
    max_key = max(mapping.keys())
    lut = np.zeros((max_key + 100,), dtype=dtype)
    for k, v in mapping.items():
        lut[k] = v
    return lut


class SemanticKitti:
    """File-level adapter exposing the reference's duck-typed API."""

    def __init__(self, root: str, sequences, config_path: str | None = None,
                 has_image: bool = True, has_label: bool = True):
        config_path = config_path or DEFAULT_CONFIG
        with open(config_path) as f:
            self.data_config = yaml.safe_load(f)
        if not os.path.isdir(root):
            raise ValueError(f"dataset not found: {root}")
        self.root = root
        self.sequences = sorted(int(s) for s in sequences)
        self.has_image = has_image
        self.has_label = has_label
        self.fov_left = -45 / 180.0 * np.pi
        self.fov_right = 45 / 180.0 * np.pi

        self.pointcloud_files: list[str] = []
        self.label_files: list[str] = []
        self.image_files: list[str] = []
        self.proj_matrix: dict[str, np.ndarray] = {}

        for seq in self.sequences:
            seq_s = f"{seq:02d}"
            pc_dir = os.path.join(root, seq_s, "velodyne")
            pc_files = sorted(
                os.path.join(pc_dir, f) for f in os.listdir(pc_dir)
                if f.endswith(".bin"))
            self.pointcloud_files.extend(pc_files)
            if has_label:
                lb_dir = os.path.join(root, seq_s, "labels")
                lb_files = sorted(
                    os.path.join(lb_dir, f) for f in os.listdir(lb_dir)
                    if f.endswith(".label"))
                assert len(lb_files) == len(pc_files), \
                    f"seq {seq_s}: {len(lb_files)} labels vs {len(pc_files)} scans"
                self.label_files.extend(lb_files)
            if has_image:
                im_dir = os.path.join(root, seq_s, "image_2")
                im_files = sorted(
                    os.path.join(im_dir, f) for f in os.listdir(im_dir)
                    if f.endswith(".png"))
                assert len(im_files) == len(pc_files)
                self.image_files.extend(im_files)
                self.proj_matrix[seq_s] = read_kitti_calib(
                    os.path.join(root, seq_s, "calib.txt"))

        cfg = self.data_config
        self.class_map_lut = _build_lut(cfg["learning_map"])
        self.class_map_lut_inv = _build_lut(cfg["learning_map_inv"])
        self.mapped_cls_name = cfg.get("mapped_class_name", {})
        self.learning_ignore = cfg.get("learning_ignore", {})

        # per-train-class content frequency (parser.py:132-138)
        n_train = len(cfg["learning_map_inv"])
        content = np.zeros((n_train,), dtype=np.float32)
        for cl, freq in cfg["content"].items():
            content[self.class_map_lut[cl]] += freq
        self.cls_freq = content

        # color LUT for visualization (parser.py:89-96)
        cmap = cfg.get("color_map", {})
        if cmap:
            self.sem_color_lut = np.zeros((max(cmap) + 100, 3), np.float32)
            for k, v in cmap.items():
                self.sem_color_lut[k] = np.asarray(v, np.float32) / 255.0

    # ------------------------------------------------------- file decode
    @staticmethod
    def readPCD(path: str) -> np.ndarray:
        return np.fromfile(path, dtype=np.float32).reshape(-1, 4)

    @staticmethod
    def readLabel(path: str):
        label = np.fromfile(path, dtype=np.int32)
        sem = label & 0xFFFF
        inst = label >> 16
        return sem, inst

    # --------------------------------------------------- duck-typed API
    def __len__(self):
        return len(self.pointcloud_files)

    def parsePathInfoByIndex(self, index: int):
        path = os.path.normpath(self.pointcloud_files[index])
        parts = path.split(os.sep)
        return parts[-3], os.path.splitext(parts[-1])[0]

    def loadDataByIndex(self, index: int):
        pcd = self.readPCD(self.pointcloud_files[index])
        if self.has_label:
            sem, inst = self.readLabel(self.label_files[index])
        else:
            sem = np.zeros(pcd.shape[0], dtype=np.int32)
            inst = np.zeros(pcd.shape[0], dtype=np.int32)
        return pcd, sem, inst

    def loadLabelByIndex(self, index: int):
        return self.readLabel(self.label_files[index])

    def loadImage(self, index: int) -> np.ndarray:
        from PIL import Image

        img = Image.open(self.image_files[index])
        if img.mode != "RGB":  # palette/gray frames → 3-channel
            img = img.convert("RGB")
        return np.asarray(img)

    def labelMapping(self, label: np.ndarray) -> np.ndarray:
        return self.class_map_lut[label]

    def labelInvMapping(self, label: np.ndarray) -> np.ndarray:
        return self.class_map_lut_inv[label]

    def projection_matrix(self, seq: str) -> np.ndarray:
        return self.proj_matrix[seq]
