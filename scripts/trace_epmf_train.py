"""Capture a device trace of the fused EPMF TRAIN step (bs4 320x1216).

Round-5 finding: the EPMF train step runs at ~200 ms/scan (MFU 0.034)
at every batch size tried, while the PMF train step reaches 49 ms/scan
(MFU 0.24) and EPMF *eval* reaches 16 ms/scan — something in the
backward or V2 train-time preprocessing is pathologically slow. This
trace names it. Summarize with scripts/trace_summary.py /tmp/jtrace_epmf.
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

BATCH = int(os.environ.get("TRACE_BATCH", "4"))
N_POINTS = 32768
H, W = 384, 1232   # canvas (matches bench make_inputs)
OUT = os.environ.get("TRACE_DIR", "/tmp/jtrace_epmf")


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from bench import make_inputs
    from pmf_tpu.data.perspective_pipeline_v2 import V2Config, build_v2_batch
    from pmf_tpu.models import EPMFNet
    from pmf_tpu.train import (LossConfig, TrainState, hybrid_pmf_optimizer,
                               make_pmf_train_step, warmup_cosine_lr)

    h, w = 320, 1216
    cfg = V2Config(canvas_h=H, canvas_w=W + 16, proj_h=h, proj_w=w,
                   proj_ht=h, proj_wt=w, n_points=N_POINTS)
    rng = np.random.default_rng(2)
    args = tuple(map(jnp.asarray, make_inputs(rng, BATCH)))

    model = EPMFNet(nclasses=20, base_channels=32, image_backbone="resnet34",
                    dtype=jnp.bfloat16, use_packed=True)
    variables = jax.jit(lambda k: model.init(
        {"params": k, "dropout": jax.random.PRNGKey(1)},
        jnp.zeros((1, 64, 128, 5)), jnp.zeros((1, 64, 128, 3)),
        train=False))(jax.random.PRNGKey(0))
    tx = hybrid_pmf_optimizer(warmup_cosine_lr(1e-3, 100, 10000), 0.9, 1e-5)
    state = TrainState.create({"params": variables["params"],
                               "batch_stats": variables["batch_stats"]}, tx)
    loss_cfg = LossConfig(nclasses=20, alpha=tuple([0.0] + [1.0] * 19))
    step = make_pmf_train_step(model, tx, loss_cfg, donate=False)
    key = jax.random.PRNGKey(0)

    import functools

    @functools.partial(
        jax.jit,
        compiler_options={"exec_time_optimization_effort": 0.0})
    def train_iter(state, key, points, labels, valid, proj_matrix, image,
                   ih, iw):
        key = jax.random.fold_in(key, state.step)
        f, m, l = build_v2_batch(key, points, labels, valid, proj_matrix,
                                 image, ih, iw, cfg, True)
        return step(state, f, l, key)

    state, aux = train_iter(state, key, *args)
    np.asarray(aux["loss"])  # compile + warm
    with jax.profiler.trace(OUT, create_perfetto_trace=True):
        for _ in range(3):
            state, aux = train_iter(state, key, *args)
        np.asarray(aux["loss"])
    print("trace written to", OUT)


if __name__ == "__main__":
    main()
