"""Capture a device trace of the fused TRAIN step (bs8 256x1024).

Writes perfetto/xplane traces under /tmp/jtrace_train; summarize with
scripts/trace_summary.py.
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

BATCH = int(os.environ.get("TRACE_BATCH", "8"))
N_POINTS = 32768
H, W = 384, 1232
HT, WT = 256, 1024
OUT = os.environ.get("TRACE_DIR", "/tmp/jtrace_train")


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from bench import make_inputs
    from pmf_tpu.data import PVConfig, build_batch
    from pmf_tpu.models import PMFNet
    from pmf_tpu.train import (LossConfig, TrainState, hybrid_pmf_optimizer,
                               make_pmf_train_step, warmup_cosine_lr)

    cfg = PVConfig(canvas_h=H, canvas_w=W + 16, proj_h=H, proj_w=W,
                   proj_ht=HT, proj_wt=WT, h_pad=7, w_pad=3,
                   n_points=N_POINTS)
    rng = np.random.default_rng(0)
    args = tuple(map(jnp.asarray, make_inputs(rng, BATCH)))

    model = PMFNet(nclasses=20, base_channels=32, image_backbone="resnet34",
                   dtype=jnp.bfloat16, use_packed=True)
    variables = jax.jit(lambda k: model.init(
        {"params": k, "dropout": jax.random.PRNGKey(1)},
        jnp.zeros((1, 64, 80, 5)), jnp.zeros((1, 64, 80, 3)),
        train=False))(jax.random.PRNGKey(0))
    tx = hybrid_pmf_optimizer(warmup_cosine_lr(1e-3, 100, 10000), 0.9, 1e-5)
    state = TrainState.create({"params": variables["params"],
                               "batch_stats": variables["batch_stats"]}, tx)
    loss_cfg = LossConfig(nclasses=20, alpha=tuple([0.0] + [1.0] * 19))
    step = make_pmf_train_step(model, tx, loss_cfg, donate=False)
    # donate=False: these probes wrap/reuse the same state across
    # variants; the outer jits donate where it matters
    key = jax.random.PRNGKey(0)

    @jax.jit
    def train_iter(state, key, points, labels, valid, proj_matrix, image,
                   ih, iw):
        key = jax.random.fold_in(key, state.step)
        f, m, l, pts = build_batch(key, points, labels, valid, proj_matrix,
                                   image, ih, iw, cfg, True,
                                   return_points=True)
        return step(state, f, l, key, pts)

    lowered = train_iter.lower(state, key, *args)
    compiled = lowered.compile()
    with open(os.path.join("/tmp", "train_step_hlo.txt"), "w") as f:
        f.write(compiled.as_text())
    state, aux = train_iter(state, key, *args)
    np.asarray(aux["loss"])  # compile + warm
    with jax.profiler.trace(OUT, create_perfetto_trace=True):
        for _ in range(3):
            state, aux = train_iter(state, key, *args)
        np.asarray(aux["loss"])
    print("trace written to", OUT)


if __name__ == "__main__":
    main()
