"""Diagnose the fused train_iter slowdown: time (a) bench's fused
build_batch+step program, (b) two separate dispatches, (c) fused with
donated state."""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import bench as B  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from pmf_tpu.data import PVConfig, build_batch
    from pmf_tpu.models import PMFNet
    from pmf_tpu.train import (LossConfig, TrainState, hybrid_pmf_optimizer,
                               make_pmf_train_step, warmup_cosine_lr)

    H, W, HT, WT, N_POINTS, BATCH = B.H, B.W, B.HT, B.WT, B.N_POINTS, B.BATCH
    rng = np.random.default_rng(0)
    raw = B.make_inputs(rng, BATCH)
    args = tuple(map(jnp.asarray, raw))
    model = PMFNet(nclasses=20, base_channels=32, image_backbone="resnet34",
                   dtype=jnp.bfloat16, use_packed=True)

    @jax.jit
    def init_fn(key):
        return model.init({"params": key, "dropout": jax.random.PRNGKey(1)},
                          jnp.zeros((1, 64, 80, 5)), jnp.zeros((1, 64, 80, 3)),
                          train=False)

    variables = init_fn(jax.random.PRNGKey(0))
    cfg = PVConfig(canvas_h=H, canvas_w=W + 16, proj_h=H, proj_w=W,
                   proj_ht=HT, proj_wt=WT, h_pad=7, w_pad=3,
                   n_points=N_POINTS)
    tx = hybrid_pmf_optimizer(warmup_cosine_lr(1e-3, 100, 10000), 0.9, 1e-5)
    loss_cfg = LossConfig(nclasses=20, alpha=tuple([0.0] + [1.0] * 19))
    step = make_pmf_train_step(model, tx, loss_cfg, donate=False)
    # donate=False: these probes wrap/reuse the same state across
    # variants; the outer jits donate where it matters
    key = jax.random.PRNGKey(0)
    N_IT = 8

    def run(name, fn, state):
        state, aux = fn(state, key, *args)
        np.asarray(aux["loss"])
        t0 = time.perf_counter()
        for _ in range(N_IT):
            state, aux = fn(state, key, *args)
        np.asarray(aux["loss"])
        dt = (time.perf_counter() - t0) / N_IT
        print(f"{name:12s} {dt * 1000:8.1f} ms/iter  "
              f"{BATCH / dt:6.2f} scans/s", flush=True)

    def fresh_state():
        return TrainState.create({"params": variables["params"],
                                  "batch_stats": variables["batch_stats"]},
                                 tx)

    # (a) fused, as bench.py
    @jax.jit
    def fused(state, key, *a):
        key = jax.random.fold_in(key, state.step)
        f, m, l, pts = build_batch(key, *a, cfg, True, return_points=True)
        return step(state, f, l, key, pts)

    # (b) split dispatches
    pre = jax.jit(lambda key, *a: build_batch(key, *a, cfg, True,
                                              return_points=True))

    def split(state, key, *a):
        f, m, l, pts = pre(key, *a)
        return step(state, f, l, key, pts)

    # (c) fused + donated state
    @jax.jit
    def build_only(key, *a):
        f, m, l, pts = build_batch(key, *a, cfg, True, return_points=True)
        return f

    def build_loop(state, key, *a):
        f = build_only(key, *a)
        return state, {"loss": f[0, 0, 0, 0]}

    which = sys.argv[1:] or ["fused", "split", "build"]
    for name in which:
        fn = {"fused": fused, "split": split, "build": build_loop}[name]
        run(name, fn, fresh_state())


if __name__ == "__main__":
    main()
