"""Component-level TPU timing for the flagship TRAIN config.

Times the bs8 256x1024 PMF-ResNet34 training step in pieces: the
on-device preprocessing (build_batch train=True), the fwd-only loss,
fwd+bwd grads, and the full fused step (grads + optimizer + metrics) —
relay-safe methodology as scripts/profile_components.py.

Usage: python scripts/profile_train.py [stage ...]
Stages: preproc fwd grads step
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

BATCH = int(os.environ.get("PROF_BATCH", "8"))
N_POINTS = 32768
H, W = 384, 1232
HT, WT = 256, 1024
N_ITERS = 10


def timed(name, fn, args):
    import jax
    import jax.numpy as jnp

    jfn = jax.jit(lambda acc, *a: fn(acc * 0.0, *a))
    zero = jnp.float32(0.0)
    t0 = time.perf_counter()
    out = jfn(zero, *args)
    np.asarray(out)
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    acc = zero
    for _ in range(N_ITERS):
        acc = jfn(acc, *args)
    np.asarray(acc)
    dt = (time.perf_counter() - t0) / N_ITERS * 1000
    print(f"{name:28s} {dt:8.2f} ms/batch  {dt / BATCH:7.2f} ms/scan"
          f"   (compile {compile_s:.1f}s)")
    return dt


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from bench import make_inputs
    from pmf_tpu.data import PVConfig, build_batch
    from pmf_tpu.models import PMFNet
    from pmf_tpu.train import (LossConfig, TrainState, hybrid_pmf_optimizer,
                               make_pmf_train_step, warmup_cosine_lr)

    stages = sys.argv[1:] or ["preproc", "fwd", "grads", "step"]
    cfg = PVConfig(canvas_h=H, canvas_w=W + 16, proj_h=H, proj_w=W,
                   proj_ht=HT, proj_wt=WT, h_pad=7, w_pad=3,
                   n_points=N_POINTS)
    rng = np.random.default_rng(0)
    raw = make_inputs(rng, BATCH)
    args = tuple(map(jnp.asarray, raw))

    model = PMFNet(nclasses=20, base_channels=32, image_backbone="resnet34",
                   dtype=jnp.bfloat16, use_packed=True)

    @jax.jit
    def init_fn(key):
        return model.init({"params": key, "dropout": jax.random.PRNGKey(1)},
                          jnp.zeros((1, 64, 80, 5)), jnp.zeros((1, 64, 80, 3)),
                          train=False)

    variables = init_fn(jax.random.PRNGKey(0))
    tx = hybrid_pmf_optimizer(warmup_cosine_lr(1e-3, 100, 10000), 0.9, 1e-5)
    state = TrainState.create({"params": variables["params"],
                               "batch_stats": variables["batch_stats"]}, tx)
    loss_cfg = LossConfig(nclasses=20, alpha=tuple([0.0] + [1.0] * 19))
    step = make_pmf_train_step(model, tx, loss_cfg, donate=False)
    # donate=False: these probes wrap/reuse the same state across
    # variants; the outer jits donate where it matters

    key = jax.random.PRNGKey(0)

    def preproc(acc, *a):
        f, m, l = build_batch(key, a[0] + acc, *a[1:], cfg, True)
        return f[0, 0, 0, 0] * 0

    feat, mask, lab, pts = jax.jit(
        lambda *a: build_batch(key, *a, cfg, True, return_points=True))(*args)
    feat = jax.block_until_ready(feat)

    from pmf_tpu.train.steps import pmf_losses

    def fwd(acc, f, l):
        (lidar, cam), _ = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            f[..., :5] + acc, f[..., 5:8], train=True,
            rngs={"dropout": key}, mutable=["batch_stats"])
        return lidar[0, 0, 0, 0].astype(jnp.float32) * 0

    def grads(acc, f, l):
        def loss_fn(params):
            (lidar, cam), upd = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                f[..., :5] + acc, f[..., 5:8], train=True,
                rngs={"dropout": key}, mutable=["batch_stats"])
            total, aux = pmf_losses(lidar, cam, l, loss_cfg, points=pts)
            return total, (aux, upd)
        (tl, _), g = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        # depend on every grad leaf — otherwise XLA DCEs the whole backward
        gdep = sum(x.ravel()[0].astype(jnp.float32)
                   for x in jax.tree_util.tree_leaves(g))
        return tl * 0 + gdep * 0

    def timed_step():
        # Honest full-step timing: thread state through with donation,
        # exactly like the real trainer loop — no extra live buffers.
        jstep = jax.jit(lambda st, f, l: step(st, f, l, key, pts),
                        donate_argnums=(0,))
        t0 = time.perf_counter()
        st, aux = jstep(state, feat, lab)
        np.asarray(aux["loss"])
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _ in range(N_ITERS):
            st, aux = jstep(st, feat, lab)
        np.asarray(aux["loss"])
        dt = (time.perf_counter() - t0) / N_ITERS * 1000
        print(f"{'step':28s} {dt:8.2f} ms/batch  {dt / BATCH:7.2f} ms/scan"
              f"   (compile {compile_s:.1f}s)")

    table = {"preproc": (preproc, args),
             "fwd": (fwd, (feat, lab)),
             "grads": (grads, (feat, lab))}
    for s in stages:
        if s == "step":
            timed_step()
        else:
            fn, a = table[s]
            timed(s, fn, a)


if __name__ == "__main__":
    main()
