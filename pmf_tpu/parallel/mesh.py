"""Device mesh + sharding utilities — the framework's parallelism layer.

Replaces the reference's torch.distributed/NCCL stack
(pc_processor/utils/utils.py:21-44 init_distributed_mode, DDP wrapping at
tasks/pmf/trainer.py:38-39, SyncBN layers, metric all_reduce):

  * data parallelism: the global batch is sharded over the mesh `data`
    axis; one jitted train step sees the logical global batch and XLA
    emits ICI all-reduces for gradients, global-batch BN statistics and
    metric reductions — no DDP wrapper, no gradient hooks, no custom
    SyncBN, no metric all_reduce calls;
  * spatial parallelism (the conv-net analogue of sequence parallelism):
    optionally shard the image H axis over a `model` mesh axis — XLA
    inserts halo exchanges for the convolutions. Useful when single-chip
    HBM can't hold the 896×1600 nuScenes activations;
  * multi-host bootstrap: jax.distributed.initialize (DCN coordination),
    rank discovery via standard env vars — SLURM/env:// parity.
"""
from __future__ import annotations

import os

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def init_distributed() -> tuple[int, int]:
    """Initialize multi-host JAX if a coordinator is configured.

    Env protocol (parity with env:///SLURM discovery in utils.py:21-36):
    COORDINATOR_ADDRESS, PROCESS_COUNT/PROCESS_ID (or their JAX_*
    variants). Single-host if unset. Returns (process_index, process_count).
    """
    addr = os.environ.get("COORDINATOR_ADDRESS")
    n = os.environ.get("PROCESS_COUNT")
    i = os.environ.get("PROCESS_ID")
    if addr and n and i:
        jax.distributed.initialize(coordinator_address=addr,
                                   num_processes=int(n), process_id=int(i))
    return jax.process_index(), jax.process_count()


def make_mesh(data: int = -1, model: int = 1, devices=None) -> Mesh:
    """Build a 2D ('data', 'model') mesh. data=-1 → all remaining devices."""
    devices = np.asarray(devices if devices is not None else jax.devices())
    n = devices.size
    if data == -1:
        assert n % model == 0, f"{n} devices not divisible by model={model}"
        data = n // model
    assert data * model <= n, f"mesh {data}x{model} > {n} devices"
    return Mesh(devices.reshape(-1)[: data * model].reshape(data, model),
                axis_names=("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Batch axis over 'data', everything else replicated."""
    return NamedSharding(mesh, P("data"))


def spatial_batch_sharding(mesh: Mesh) -> NamedSharding:
    """[B, H, W, C]: batch over 'data', H over 'model' (spatial tiling)."""
    return NamedSharding(mesh, P("data", "model"))


def replicate(mesh: Mesh):
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch: dict, spatial: bool = False) -> dict:
    """device_put every leaf with its batch (or batch+spatial) sharding."""
    def put(x):
        x = np.asarray(x)
        if x.ndim >= 4 and spatial:
            spec = P("data", "model")
        elif x.ndim >= 1:
            spec = P("data")
        else:
            spec = P()
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map(put, batch)
