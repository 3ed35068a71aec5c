"""XLA compiler tuning for the TPU entry points.

The TPU backend's default `exec_time_optimization_effort` aggressively
unrolls the conv loop nests at our shapes: the flagship PMF-ResNet34
forward (bs8, 384×1232 bf16) compiles to **87.5 MB** of generated code
at the default vs **27.0 MB** at effort −0.7 — and the −0.7 build is
also *faster* end to end (131 vs 140 ms/fwd measured on v5e). The bloat
is what made round 3's bench time out: 100–360 MB serialized
executables cost minutes to compile/deserialize/load through the axon
relay before a single scan is measured.

Applied from the entry points (bench, CLIs, __graft_entry__) rather
than at package import so tests and embedders keep stock defaults.
Override with PMF_TPU_COMPILER_EFFORT=<float|none>.
"""
from __future__ import annotations

import os

DEFAULT_EFFORT = -0.7


def configure_compiler(effort: float | None = None) -> None:
    """Set jax's exec_time_optimization_effort (idempotent).

    Must run before the target programs are compiled; safe any time.
    """
    import jax

    env = os.environ.get("PMF_TPU_COMPILER_EFFORT")
    if env is not None:
        if env.lower() == "none":
            return
        effort = float(env)
    if effort is None:
        effort = DEFAULT_EFFORT
    jax.config.update("jax_exec_time_optimization_effort", effort)
