"""Checkpoint / resume / best-model management (orbax-backed).

Parity: tasks/pmf/main.py —
  * resume checkpoint {model, optimizer, epoch} saved every epoch
    (:117-127), restored with epoch bump (:72-83);
  * best-per-metric snapshots best_{Acc,IOU,Recall,last}_model
    (:104-114);
  * tolerant partial load for pretrained weights that skips
    missing/shape-mismatched keys (:55-66).
"""
from __future__ import annotations

import os
from typing import Any

import jax
import numpy as np
import orbax.checkpoint as ocp


class CheckpointManager:
    def __init__(self, directory: str):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self._ckpt = ocp.StandardCheckpointer()

    # ------------------------------------------------------------ resume
    def save(self, state, epoch: int, keep: int = 1):
        """Save the full train state for resume (overwrites 'checkpoint')."""
        path = os.path.join(self.directory, "checkpoint")
        tree = {"state": state, "epoch": np.int32(epoch)}
        self._ckpt.save(path, tree, force=True)
        self._ckpt.wait_until_finished()

    def restore(self, state_template) -> tuple[Any, int]:
        path = os.path.join(self.directory, "checkpoint")
        tree = self._ckpt.restore(
            path, target={"state": state_template, "epoch": np.int32(0)})
        return tree["state"], int(tree["epoch"])

    def has_checkpoint(self) -> bool:
        return os.path.isdir(os.path.join(self.directory, "checkpoint"))

    # ------------------------------------------------------- best models
    def save_best(self, variables: dict, metric_name: str):
        """Save {params, batch_stats} under best_<metric>_model."""
        path = os.path.join(self.directory, f"best_{metric_name}_model")
        self._ckpt.save(path, variables, force=True)
        self._ckpt.wait_until_finished()

    def restore_weights(self, path: str, template: dict) -> dict:
        try:
            return self._ckpt.restore(os.path.abspath(path), target=template)
        except ValueError:
            # tree-structure mismatch — e.g. an MTLoss training run saves
            # params.mt_sigma alongside the model weights, which an
            # inference template doesn't carry. Fall back to the tolerant
            # partial-match load (tasks/pmf/main.py:55-66 semantics).
            raw = self._ckpt.restore(os.path.abspath(path))
            return partial_load(template, raw)


def partial_load(target: dict, source: dict, log=None) -> dict:
    """Copy leaves from source into target where path+shape match.

    Parity: tasks/pmf/main.py:55-66 (pretrained partial-match load).
    """
    flat_t = dict(jax.tree_util.tree_flatten_with_path(target)[0])
    flat_s = dict(jax.tree_util.tree_flatten_with_path(source)[0])
    out = {}
    n_hit = 0
    for path, leaf in flat_t.items():
        src = flat_s.get(path)
        if src is not None and np.shape(src) == np.shape(leaf):
            out[path] = src
            n_hit += 1
        else:
            out[path] = leaf
            if log is not None:
                log.info(f"partial_load: skipping {jax.tree_util.keystr(path)}")
    if log is not None:
        log.info(f"partial_load: matched {n_hit}/{len(flat_t)} tensors")
    treedef = jax.tree_util.tree_structure(target)
    return jax.tree_util.tree_unflatten(
        treedef, [out[p] for p, _ in jax.tree_util.tree_flatten_with_path(target)[0]])
