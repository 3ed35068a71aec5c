"""Host-side batching loader with threaded prefetch.

Replaces torch DataLoader + DistributedSampler (tasks/pmf/trainer.py:149-168):
  * file IO + padding runs in a thread pool (numpy IO releases the GIL);
  * per-process sharding for multi-host: each JAX process reads
    indices[process_index::process_count] — the DistributedSampler
    equivalent;
  * batches are stacked numpy dicts, handed to the jitted on-device
    preprocessing (build_batch / build_range_batch).
"""
from __future__ import annotations

import concurrent.futures as cf
from typing import Callable, Iterator

import numpy as np

from .perspective_pipeline import PVConfig, pad_image, pad_points


def kitti_sample_reader(dataset, cfg: PVConfig,
                        use_native: bool | None = None) -> Callable[[int], dict]:
    """Build a reader(index) → numpy sample dict for the PV pipeline.

    Uses the native C++ scan reader (native/loader.cpp: parallel read +
    label decode + LUT + pad) when built, numpy otherwise.
    """
    from . import native as native_loader

    if use_native is None:
        use_native = native_loader.available() and getattr(
            dataset, "has_label", True)

    # native decode covers PNG (KITTI image_2) and JPEG (nuScenes CAM_*).
    # An exotic file (palette/16-bit/interlaced PNG) falls back to PIL
    # for THAT image only, keeping the native point read; only after
    # several consecutive decode failures is the whole reader demoted
    # (a dataset that's wholly exotic shouldn't pay a failed native
    # attempt per sample).
    state = {"native_img": use_native and native_loader.image_available(),
             "img_failures": 0}
    MAX_CONSECUTIVE_IMG_FAILURES = 3

    def read(index: int) -> dict:
        if state["native_img"]:
            # one GIL-dropping call: points + labels + image → padded
            # buffers (native/loader.cpp read_scan_full)
            try:
                (points, labels, valid, image, img_h, img_w,
                 _) = native_loader.read_scan_full(
                    dataset.pointcloud_files[index],
                    dataset.label_files[index],
                    dataset.image_files[index], dataset.class_map_lut,
                    cfg.n_points, cfg.canvas_h, cfg.canvas_w)
                state["img_failures"] = 0
                seq, _ = dataset.parsePathInfoByIndex(index)
                return {
                    "points": points, "labels": labels, "valid": valid,
                    "proj_matrix": dataset.projection_matrix(seq).astype(
                        np.float32),
                    "image": image, "img_h": img_h, "img_w": img_w,
                    "index": np.int32(index),
                }
            except IOError:
                state["img_failures"] += 1
                if state["img_failures"] >= MAX_CONSECUTIVE_IMG_FAILURES:
                    state["native_img"] = False
        if use_native:
            points, labels, valid, _ = native_loader.read_scan(
                dataset.pointcloud_files[index], dataset.label_files[index],
                dataset.class_map_lut, cfg.n_points)
        else:
            pcd, sem, _ = dataset.loadDataByIndex(index)
            sem = dataset.labelMapping(sem)
            points, labels, valid = pad_points(pcd, sem, cfg.n_points)
        img = dataset.loadImage(index)
        image, img_h, img_w = pad_image(img, cfg.canvas_h, cfg.canvas_w)
        seq, _ = dataset.parsePathInfoByIndex(index)
        return {
            "points": points, "labels": labels, "valid": valid,
            "proj_matrix": dataset.projection_matrix(seq).astype(np.float32),
            "image": image, "img_h": img_h, "img_w": img_w,
            "index": np.int32(index),
        }

    return read


def nuscenes_sample_reader(dataset, cfg: PVConfig) -> Callable[[int], dict]:
    """Reader for the nuScenes adapter: per-item composed projection
    matrix (6 camera pairings per keyframe)."""

    def read(index: int) -> dict:
        pcd, sem, _ = dataset.loadDataByIndex(index)
        sem = dataset.labelMapping(sem)
        points, labels, valid = pad_points(pcd, sem, cfg.n_points)
        img = dataset.loadImage(index)
        image, img_h, img_w = pad_image(img, cfg.canvas_h, cfg.canvas_w)
        return {
            "points": points, "labels": labels, "valid": valid,
            "proj_matrix": dataset.projection_matrix(index).astype(np.float32),
            "image": image, "img_h": img_h, "img_w": img_w,
            "index": np.int32(index),
        }

    return read


def nuscenes_v2_sample_reader(dataset, cfg) -> Callable[[int], dict]:
    """NuscenesV2 reader: transforms the scan into the CAMERA frame on
    host (the V2 pipeline then crops by camera-frame yaw,
    dataset_nuscenes_v2.py:301-376) and projects with the (rescaled)
    intrinsic only. Emits per-sample fov bounds."""

    def read(index: int) -> dict:
        pcd, sem, _ = dataset.loadDataByIndex(index)
        sem = dataset.labelMapping(sem)
        M, K = dataset.camera_transform(index)
        xyz_cam = pcd[:, :3] @ M[:3, :3].T + M[:3, 3]
        pcd_cam = np.concatenate([xyz_cam, pcd[:, 3:4]], axis=1)
        points, labels, valid = pad_points(pcd_cam, sem, cfg.n_points)
        img = dataset.loadImage(index)
        image, img_h, img_w = pad_image(img, cfg.canvas_h, cfg.canvas_w)
        proj = np.zeros((3, 4), np.float32)
        proj[:, :3] = K
        fov = np.asarray(dataset.fov(index), np.float32)
        return {
            "points": points, "labels": labels, "valid": valid,
            "proj_matrix": proj, "image": image, "img_h": img_h,
            "img_w": img_w, "fov": fov, "index": np.int32(index),
        }

    return read


def a2d2_sample_reader(dataset, cfg) -> Callable[[int], dict]:
    """A2D2 reader for the V2 pipeline: precomputed point→pixel indices
    ride along instead of a projection matrix (tasks/epmf/trainer.py:168-
    190 trains EPMF on A2D2 through PerspectiveViewLoaderV2, whose
    mapLidar2CameraCropYaw for A2D2 returns the stored row/col)."""

    def read(index: int) -> dict:
        pcd, sem, _ = dataset.loadDataByIndex(index)
        rows, cols = dataset.pixel_indices(index)
        points, labels, valid = pad_points(pcd, sem, cfg.n_points)
        rp = np.zeros((cfg.n_points,), np.int32)
        cp = np.zeros((cfg.n_points,), np.int32)
        m = min(len(rows), cfg.n_points)
        rp[:m] = rows[:m]
        cp[:m] = cols[:m]
        img = dataset.loadImage(index).astype(np.float32) / 255.0
        image, img_h, img_w = pad_image(img, cfg.canvas_h, cfg.canvas_w)
        return {
            "points": points, "labels": labels, "valid": valid,
            "rows": rp, "cols": cp, "image": image,
            "img_h": img_h, "img_w": img_w, "index": np.int32(index),
        }

    return read


def sensat_sample_reader(dataset, cfg, frame_weights=None,
                         train: bool = True) -> Callable[[int], dict]:
    """SensatUrban reader: train mode cuts a random (2h, 2w) window from
    the (variable-size) frame — the device pipeline rotates/crops/flips
    inside it (sensat_loader.py crop(2x)→aug→crop). Val mode expects
    pre-tiled fixed frames (SensatUrban(use_crop=True))."""
    import numpy as np

    def read(index: int) -> dict:
        if train and frame_weights is not None:
            index = frame_weights[index % len(frame_weights)]
        frame = dataset.readDataByIndex(index)
        fm = np.asarray(frame["feature_map"], np.float32)
        lm = np.asarray(frame["label_map"], np.float32)
        if train:
            wh, ww = cfg.img_h * 2, cfg.img_w * 2
            out_f = np.zeros((8, wh, ww), np.float32)
            out_l = np.full((wh, ww), -1.0, np.float32)
            H, W = lm.shape
            top = np.random.randint(0, max(H - wh, 0) + 1)
            left = np.random.randint(0, max(W - ww, 0) + 1)
            h = min(wh, H - top)
            w = min(ww, W - left)
            out_f[:, :h, :w] = fm[:, top:top + h, left:left + w]
            out_l[:h, :w] = lm[top:top + h, left:left + w]
            fm, lm = out_f, out_l
        return {"feature_map": fm, "label_map": lm, "index": np.int32(index)}

    return read


def range_sample_reader(dataset, cfg) -> Callable[[int], dict]:
    """Reader for the spherical range pipeline (no image)."""

    def read(index: int) -> dict:
        pcd, sem, _ = dataset.loadDataByIndex(index)
        sem = dataset.labelMapping(sem)
        points, labels, valid = pad_points(pcd, sem, cfg.n_points)
        return {"points": points, "labels": labels, "valid": valid,
                "index": np.int32(index)}

    return read


class HostLoader:
    """Sharded, shuffled, prefetching batch iterator."""

    def __init__(self, reader: Callable[[int], dict], n_samples: int,
                 batch_size: int, shuffle: bool = False,
                 drop_last: bool = True, seed: int = 0,
                 num_workers: int = 8, prefetch: int = 4,
                 process_index: int = 0, process_count: int = 1):
        self.reader = reader
        self.n_samples = n_samples
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.seed = seed
        self.num_workers = num_workers
        self.prefetch = prefetch
        self.process_index = process_index
        self.process_count = process_count
        self.epoch = 0

    def set_epoch(self, epoch: int):
        """Reshuffle per epoch (DistributedSampler.set_epoch parity)."""
        self.epoch = epoch

    def _indices(self) -> np.ndarray:
        idx = np.arange(self.n_samples)
        if self.shuffle:
            rng = np.random.default_rng(self.seed + self.epoch)
            rng.shuffle(idx)
        return idx[self.process_index::self.process_count]

    def __len__(self) -> int:
        n = len(self._indices())
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def __iter__(self) -> Iterator[dict]:
        """Yields stacked batches. With drop_last=False the final short
        batch is padded (repeating its last sample) to keep shapes static
        for jit; `batch_valid` [B] marks real samples."""
        idx = self._indices()
        n_batches = len(self)
        with cf.ThreadPoolExecutor(max_workers=self.num_workers) as pool:
            futures = []
            submitted = 0

            def submit_batch(b):
                lo = b * self.batch_size
                batch_idx = idx[lo:lo + self.batch_size]
                return [pool.submit(self.reader, int(i)) for i in batch_idx]

            for b in range(min(self.prefetch, n_batches)):
                futures.append(submit_batch(b))
                submitted += 1
            for b in range(n_batches):
                if submitted < n_batches:
                    futures.append(submit_batch(submitted))
                    submitted += 1
                samples = [f.result() for f in futures[b]]
                n_real = len(samples)
                while len(samples) < self.batch_size:
                    samples.append(samples[-1])
                batch = {k: np.stack([s[k] for s in samples])
                         for k in samples[0]}
                bv = np.zeros((self.batch_size,), bool)
                bv[:n_real] = True
                batch["batch_valid"] = bv
                yield batch
