"""Micro-profile the pmf loss pieces on TPU (bs8 256x1024 train config).

Stages: pts_sort pts_raster pts_lovasz full_lovasz focal kl entropy
        loss_pts g_loss_pts
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

BATCH = int(os.environ.get("PROF_BATCH", "8"))
N = 32768
HT, WT = 256, 1024
C = 20
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
    print(f"{name:18s} {dt:8.2f} ms/batch  {dt / BATCH:7.2f} ms/scan"
          f"   (compile {compile_s:.1f}s)", flush=True)
    return dt


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from pmf_tpu.losses import (focal_softmax_loss, lovasz_softmax_loss,
                                lovasz_softmax_loss_points,
                                normalized_entropy,
                                perception_aware_losses)
    from pmf_tpu.ops.scatter import rasterize_unique, rasterize_zbuffer
    from pmf_tpu.train import LossConfig
    from pmf_tpu.train.steps import pmf_losses

    stages = sys.argv[1:] or ["pts_sort", "pts_raster", "pts_lovasz",
                              "focal", "kl", "entropy",
                              "loss_pts", "g_loss_pts"]
    rng = np.random.default_rng(0)
    HW = HT * WT
    logits = jnp.asarray(rng.normal(size=(BATCH, HT, WT, C))
                         .astype(np.float32))
    probs = jax.nn.softmax(logits, -1)
    probs2 = jax.nn.softmax(logits * 0.9 + 0.1, -1)
    # ~70% of points valid winners at distinct pixels
    pix_np = np.stack([rng.choice(HW, N, replace=False) for _ in
                       range(BATCH)])
    won_np = rng.random((BATCH, N)) < 0.7
    lab_np = rng.integers(0, C, (BATCH, N)).astype(np.int32)
    pix = jnp.asarray(pix_np.astype(np.int32))
    won = jnp.asarray(won_np)
    plab = jnp.asarray(lab_np)
    limg_np = np.zeros((BATCH, HW), np.int32)
    for b in range(BATCH):
        limg_np[b, pix_np[b][won_np[b]]] = lab_np[b][won_np[b]]
    limg = jnp.asarray(limg_np.reshape(BATCH, HT, WT))
    wvals = jnp.asarray(rng.random((BATCH, N, C)).astype(np.float32))
    alpha = jnp.asarray([0.0] + [1.0] * (C - 1), jnp.float32)
    loss_cfg = LossConfig(nclasses=C, alpha=tuple([0.0] + [1.0] * (C - 1)))

    def pts_sort(acc, p, l):
        # the [C, B*N] two-sort weight computation alone
        p_pts = jnp.take_along_axis(
            (p + acc).reshape(BATCH, HW, C),
            jnp.minimum(pix, HW - 1)[..., None], axis=1)
        ok = won & (plab != 0)
        okf = ok.astype(jnp.float32)
        fg = jax.nn.one_hot(plab, C, dtype=jnp.float32) * okf[..., None]
        err = jnp.abs(fg - p_pts) * okf[..., None]
        P = BATCH * N
        errT = err.reshape(P, C).T
        fgT = fg.reshape(P, C).T
        idx = jnp.broadcast_to(
            jax.lax.broadcasted_iota(jnp.int32, (1, P), 1), errT.shape)
        packed = idx * 2 + fgT.astype(jnp.int32)
        _, packed_s = jax.lax.sort((-errT, packed), num_keys=1)
        fg_s = (packed_s & 1).astype(jnp.float32)
        _, g_uns = jax.lax.sort((packed_s >> 1, fg_s), num_keys=1)
        return g_uns[0, 0] * 0

    def pts_raster(acc, v):
        out, _ = jax.vmap(
            lambda px, k, vv: rasterize_zbuffer(
                px // WT, px % WT, jnp.zeros((N,), jnp.float32), k, vv,
                HT, WT))(pix, won, v + acc)
        return out[0, 0, 0, 0] * 0

    def pts_raster_uniq(acc, v):
        out, _ = jax.vmap(
            lambda px, k, vv: rasterize_unique(px, k, vv, HT, WT)
        )(pix, won, v + acc)
        return out[0, 0, 0, 0] * 0

    def pts_lovasz(acc, p):
        return lovasz_softmax_loss_points(p + acc, limg, pix, plab, won) * 0

    def full_lovasz(acc, p):
        return lovasz_softmax_loss(p + acc, limg) * 0

    def focal(acc, p):
        return focal_softmax_loss(p + acc, limg, alpha,
                                  mask=limg > 0) * 0

    def kl(acc, p, q):
        a, b, _, _ = perception_aware_losses(p + acc, q, 0.7)
        return (a + b) * 0

    def entropy(acc, p):
        lg = jnp.log(jnp.clip(p + acc, 1e-8))
        return normalized_entropy(p + acc, lg).mean() * 0

    def loss_pts(acc, p, q):
        total, _ = pmf_losses(p + acc, q, limg, loss_cfg,
                              points=(pix, plab, won))
        return total * 0

    def g_loss_pts(acc, p, q):
        def f(x):
            total, _ = pmf_losses(x, q, limg, loss_cfg,
                                  points=(pix, plab, won))
            return total
        return jax.grad(f)(p + acc)[0, 0, 0, 0] * 0

    table = {"pts_sort": (pts_sort, (probs, limg)),
             "pts_raster": (pts_raster, (wvals,)),
             "pts_raster_uniq": (pts_raster_uniq, (wvals,)),
             "pts_lovasz": (pts_lovasz, (probs,)),
             "full_lovasz": (full_lovasz, (probs,)),
             "focal": (focal, (probs,)),
             "kl": (kl, (probs, probs2)),
             "entropy": (entropy, (probs,)),
             "loss_pts": (loss_pts, (probs, probs2)),
             "g_loss_pts": (g_loss_pts, (probs, probs2))}
    for s in stages:
        fn, a = table[s]
        timed(s, fn, a)


if __name__ == "__main__":
    main()
