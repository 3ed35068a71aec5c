"""Isolate the slow backward: model-vs-loss, packed-vs-unpacked.

Stages:
  g_mean_packed    grads of mean(logits), packed model
  g_mean_unpacked  grads of mean(logits), unpacked model
  loss_fwd         pmf_losses forward only (on fixed logits)
  g_loss_only      grads of pmf_losses wrt logits (no model)
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

BATCH = int(os.environ.get("PROF_BATCH", "8"))
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
          f"   (compile {compile_s:.1f}s)", flush=True)
    return dt


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from pmf_tpu.models import PMFNet
    from pmf_tpu.train import LossConfig
    from pmf_tpu.train.steps import pmf_losses

    stages = sys.argv[1:] or ["g_mean_packed", "g_mean_unpacked",
                              "loss_fwd", "g_loss_only"]
    rng = np.random.default_rng(0)
    feat = jnp.asarray(rng.random((BATCH, HT, WT, 8), np.float32))
    lab = jnp.asarray(rng.integers(0, 20, (BATCH, HT, WT)).astype(np.int32))
    logits = jnp.asarray(rng.random((BATCH, HT, WT, 20), np.float32))
    loss_cfg = LossConfig(nclasses=20, alpha=tuple([0.0] + [1.0] * 19))
    key = jax.random.PRNGKey(0)

    def make_model(packed):
        model = PMFNet(nclasses=20, base_channels=32,
                       image_backbone="resnet34", dtype=jnp.bfloat16,
                       use_packed=packed)

        @jax.jit
        def init_fn(k):
            return model.init(
                {"params": k, "dropout": jax.random.PRNGKey(1)},
                jnp.zeros((1, 64, 80, 5)), jnp.zeros((1, 64, 80, 3)),
                train=False)
        return model, init_fn(jax.random.PRNGKey(0))

    def g_mean(packed):
        model, variables = make_model(packed)

        def fn(acc, f, l):
            def loss_fn(params):
                (lidar, cam), upd = model.apply(
                    {"params": params,
                     "batch_stats": variables["batch_stats"]},
                    f[..., :5] + acc, f[..., 5:8], train=True,
                    rngs={"dropout": key}, mutable=["batch_stats"])
                return (jnp.mean(lidar.astype(jnp.float32))
                        + jnp.mean(cam.astype(jnp.float32)))
            g = jax.grad(loss_fn)(variables["params"])
            # force EVERY grad leaf: returning one leaf lets XLA DCE most
            # of the backward (measured 21 ms vs the honest number)
            return jax.tree_util.tree_reduce(
                lambda a, b: a + b.astype(jnp.float32).sum(), g, 0.0) * 0
        return fn

    def loss_fwd(acc, lg, l):
        total, aux = pmf_losses(lg + acc, lg, l, loss_cfg)
        return total * 0

    def g_loss_only(acc, lg, l):
        def loss_fn(x):
            total, _ = pmf_losses(x, x, l, loss_cfg)
            return total
        return jax.grad(loss_fn)(lg + acc)[0, 0, 0, 0] * 0

    for s in stages:
        if s == "g_mean_packed":
            timed(s, g_mean(True), (feat, lab))
        elif s == "g_mean_unpacked":
            timed(s, g_mean(False), (feat, lab))
        elif s == "loss_fwd":
            timed(s, loss_fwd, (logits, lab))
        elif s == "g_loss_only":
            timed(s, g_loss_only, (logits, lab))


if __name__ == "__main__":
    main()
