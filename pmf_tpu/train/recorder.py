"""Experiment recorder: run directory, logging, scalar streams.

Parity: pc_processor/checkpoint/recorder.py (Recorder): experiment dir
{code/, log/, checkpoint/}, recursive source snapshot, file+console
logger, settings dump, scalar metrics stream. TensorboardX is replaced
by an always-available JSONL scalar stream (log/scalars.jsonl) that TB
or any plotting tool can ingest; a tensorboard writer is attached when
the package exists.
"""
from __future__ import annotations

import json
import os
import shutil
import time

from ..utils.logger import is_main_process, make_logger


class Recorder:
    def __init__(self, save_path: str, settings_dict: dict | None = None,
                 snapshot_code: bool = False, use_tensorboard: bool = True):
        self.save_path = os.path.abspath(save_path)
        self.is_main = is_main_process()
        self.log_dir = os.path.join(self.save_path, "log")
        self.checkpoint_dir = os.path.join(self.save_path, "checkpoint")
        self.code_dir = os.path.join(self.save_path, "code")

        if self.is_main:
            for d in [self.log_dir, self.checkpoint_dir]:
                os.makedirs(d, exist_ok=True)
        self.logger = make_logger(
            "pmf_tpu.run", os.path.join(self.log_dir, "experiment.log")
            if self.is_main else None)

        self._scalar_file = None
        if self.is_main:
            self._scalar_file = open(
                os.path.join(self.log_dir, "scalars.jsonl"), "a")
            if settings_dict is not None:
                with open(os.path.join(self.save_path, "settings.json"), "w") as f:
                    json.dump(settings_dict, f, indent=2, default=str)
            if snapshot_code:
                self._snapshot_code()

        self.tensorboard = None
        if self.is_main and use_tensorboard:
            try:
                from torch.utils.tensorboard import SummaryWriter

                self.tensorboard = SummaryWriter(self.log_dir)
            except Exception:
                self.tensorboard = None

    def _snapshot_code(self, extensions=(".py", ".yaml", ".sh")):
        """Copy the framework source into the run dir (recorder.py:63-75)."""
        src_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        for dirpath, _, files in os.walk(src_root):
            for fn in files:
                if any(fn.endswith(e) for e in extensions):
                    src = os.path.join(dirpath, fn)
                    rel = os.path.relpath(src, os.path.dirname(src_root))
                    dst = os.path.join(self.code_dir, rel)
                    os.makedirs(os.path.dirname(dst), exist_ok=True)
                    shutil.copy2(src, dst)

    def add_image(self, tag: str, image, step: int):
        """Log an image panel ([H,W] or [H,W,3] float array; min-max
        normalized). Always writes a PNG under log/images/ (parity stand-
        in for tensorboard add_image, tasks/pmf/trainer.py:497-524) and
        mirrors to tensorboard when available."""
        if not self.is_main:
            return
        import numpy as np

        img = np.asarray(image, np.float32)
        lo, hi = float(img.min()), float(img.max())
        if hi > lo:
            img = (img - lo) / (hi - lo)
        img8 = (img * 255).astype(np.uint8)
        d = os.path.join(self.log_dir, "images")
        os.makedirs(d, exist_ok=True)
        try:
            from PIL import Image

            Image.fromarray(img8).save(
                os.path.join(d, f"{tag}_{step:04d}.png"))
        except Exception:
            pass
        if self.tensorboard is not None:
            chw = img[None] if img.ndim == 2 else img.transpose(2, 0, 1)
            self.tensorboard.add_image(tag, chw, step)

    def add_scalar(self, tag: str, value, step: int):
        if self._scalar_file is not None:
            self._scalar_file.write(json.dumps(
                {"tag": tag, "value": float(value), "step": int(step),
                 "time": time.time()}) + "\n")
            self._scalar_file.flush()
        if self.tensorboard is not None:
            self.tensorboard.add_scalar(tag, float(value), step)

    def close(self):
        if self._scalar_file is not None:
            self._scalar_file.close()
        if self.tensorboard is not None:
            self.tensorboard.close()
