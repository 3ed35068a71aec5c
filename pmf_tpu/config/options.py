"""Typed experiment configuration.

Parity: tasks/pmf/option.py (and the epmf/salsanext variants): one YAML
per experiment parsed into typed attributes, with the raw dict available
as `.config` for nested groups (augmentation / sensor / post), and the
derived run-directory name encoding dataset/net/bs/lr/experiment-id
(option.py:62-68).
"""
from __future__ import annotations

import os
from dataclasses import dataclass, field
from typing import Any

import yaml


@dataclass
class Options:
    config: dict = field(default_factory=dict)

    # common
    save_path: str = "./experiments"
    seed: int = 1
    print_frequency: int = 2
    n_threads: int = 8
    experiment_id: str = "baseline"

    # run control
    val_only: bool = False
    has_label: bool = True
    is_debug: bool = False
    n_epochs: int = 50
    batch_size: tuple = (2, 4)
    lr: float = 0.001
    warmup_epochs: int = 1
    momentum: float = 0.9
    weight_decay: float = 1e-5
    val_frequency: int = 1

    # data
    dataset: str = "SemanticKitti"
    nclasses: int = 20
    data_root: str = ""

    # model
    net_type: str = "PMFNet"      # PMFNet | EPMFNet | SalsaNext
    compute_dtype: str = "float32"  # float32 | bfloat16 (params stay f32)
    use_packed: bool = False        # space-to-depth full-res stages
    base_channels: int = 32
    img_backbone: str = "resnet34"
    imagenet_pretrained: bool = False
    pretrained_weights: str = ""  # converted torchvision npz (optional)

    # loss
    lambda_: float = 1.0
    gamma: float = 0.5
    tau: float = 0.7

    # checkpoints
    checkpoint: str | None = None
    pretrained_model: str | None = None

    # parallelism
    mesh_data: int = -1
    mesh_model: int = 1

    @property
    def run_dir(self) -> str:
        """Derived experiment dir name (option.py:62-68 parity)."""
        name = "-".join([
            f"{self.dataset}", f"{self.net_type}", f"{self.img_backbone}",
            f"bs{self.batch_size[0]}", f"lr{self.lr}",
            f"{self.experiment_id}"])
        return os.path.join(self.save_path, name)

    def group(self, key: str, default=None) -> Any:
        return self.config.get(key, default if default is not None else {})


_RENAMES = {"lambda": "lambda_"}


def check_run_dir(run_dir: str, policy: str = "auto") -> None:
    """Guard against silently reusing an existing experiment dir.

    Parity: tasks/pmf/option.py:70-81 (check_path) prompts
    d(delete)/q(quit) when the run dir exists. Non-interactive TPU jobs
    must not hang on input(), so the behavior is policy-gated:

      auto   — prompt when stdin is a TTY, else warn and reuse;
      ask    — always prompt d(delete)/q(quit) (reference behavior);
      reuse  — keep going in the existing dir (pre-round-5 behavior);
      delete — rm -rf the dir, no questions;
      abort  — raise OSError if the dir exists.
    """
    import shutil
    import sys

    if not os.path.exists(run_dir):
        return
    if policy == "auto":
        policy = "ask" if sys.stdin.isatty() else "reuse"
        if policy == "reuse":
            print(f"warning: reusing existing run dir {run_dir} "
                  "(set overwrite_policy: delete/abort to change)",
                  file=sys.stderr)
            return
    if policy == "reuse":
        return
    if policy == "ask":
        print(f"file exist: {run_dir}")
        action = input("Select Action: d(delete) / q(quit): ").lower().strip()
        policy = "delete" if action == "d" else "abort"
    if policy == "delete":
        shutil.rmtree(run_dir)
        return
    raise OSError(f"Directory exists: {run_dir}")


def load_options(path: str, overrides: dict | None = None) -> Options:
    with open(path) as f:
        raw = yaml.safe_load(f)
    opts = Options(config=raw)
    fields = set(Options.__dataclass_fields__)
    for k, v in raw.items():
        k = _RENAMES.get(k, k)
        if k in fields and k != "config":
            if k == "batch_size" and isinstance(v, (list, tuple)):
                v = tuple(v)
            setattr(opts, k, v)
    for k, v in (overrides or {}).items():
        setattr(opts, _RENAMES.get(k, k), v)
    return opts
