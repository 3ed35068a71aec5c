"""Microbench: materializing the z-buffer canvas — scatter-add of winner
rows (fill_canvas) vs. per-pixel row gather (scatter_to_image).

The z-buffer scatter-min itself measures ~0.45 ms/scan at bs8; the
fill is the preproc hotspot (~3.7 ms/scan). Run on the real chip:
    python scripts/fill_microbench.py
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

BATCH = 8
N = 32768
H, W = 384, 1232
F = 6
N_ITERS = 20


def timed(name, fn, args):
    import jax
    import jax.numpy as jnp

    jfn = jax.jit(lambda acc, *a: fn(acc * 0.0 + 1.0, *a))
    zero = jnp.float32(0.0)
    t0 = time.perf_counter()
    out = jfn(zero, *args)
    np.asarray(out)
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    acc = zero
    for _ in range(N_ITERS):
        acc = jfn(acc, *args)
    val = float(np.asarray(acc))
    dt = (time.perf_counter() - t0) / N_ITERS
    print(f"{name:14s} {dt * 1e3 / BATCH:8.3f} ms/scan  (batch {BATCH}: "
          f"{dt * 1e3:7.2f} ms, compile {compile_s:.0f}s, out={val:.4f})",
          flush=True)


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from pmf_tpu.ops.scatter import (fill_canvas, scatter_to_image,
                                     zbuffer_scatter_packed)

    rng = np.random.default_rng(0)
    rows = jnp.asarray(rng.integers(0, H, (BATCH, N)).astype(np.int32))
    cols = jnp.asarray(rng.integers(0, W, (BATCH, N)).astype(np.int32))
    depth = jnp.asarray(rng.uniform(2, 70, (BATCH, N)).astype(np.float32))
    keep = jnp.asarray(rng.random((BATCH, N)) < 0.8)
    vals = jnp.asarray(rng.random((BATCH, N, F)).astype(np.float32))

    def zbuf_only(eps, rows, cols, depth, keep):
        def one(r, c, d, k):
            w, m = zbuffer_scatter_packed(r, c, d + eps, k, H, W)
            return w.astype(jnp.float32).mean()
        return jax.vmap(one)(rows, cols, depth, keep).mean()
    timed("zbuf", zbuf_only, (rows, cols, depth, keep))

    def fill_scatter(eps, rows, cols, depth, keep, vals):
        def one(r, c, d, k, v):
            w, m = zbuffer_scatter_packed(r, c, d + eps, k, H, W)
            canvas = fill_canvas(v, r, c, k, w, m)
            return canvas.mean()
        return jax.vmap(one)(rows, cols, depth, keep, vals).mean()
    timed("fill/scatter", fill_scatter, (rows, cols, depth, keep, vals))

    def fill_gather(eps, rows, cols, depth, keep, vals):
        def one(r, c, d, k, v):
            w, m = zbuffer_scatter_packed(r, c, d + eps, k, H, W)
            canvas = scatter_to_image(v, w, m)
            return canvas.mean()
        return jax.vmap(one)(rows, cols, depth, keep, vals).mean()
    timed("fill/gather", fill_gather, (rows, cols, depth, keep, vals))

    def fill_gather8(eps, rows, cols, depth, keep, vals):
        # pad the value table to 8 lanes (power of two rows)
        def one(r, c, d, k, v):
            w, m = zbuffer_scatter_packed(r, c, d + eps, k, H, W)
            v8 = jnp.pad(v, ((0, 0), (0, 8 - F)))
            canvas = scatter_to_image(v8, w, m)
            return canvas.mean()
        return jax.vmap(one)(rows, cols, depth, keep, vals).mean()
    timed("fill/gather8", fill_gather8, (rows, cols, depth, keep, vals))

    def fill_flat6(eps, rows, cols, depth, keep, vals):
        # six independent flat [N]→[H*W] scatter-adds (no row payloads)
        def one(r, c, d, k, v):
            w, m = zbuffer_scatter_packed(r, c, d + eps, k, H, W)
            pix = jnp.where(k, jnp.clip(r, 0, H - 1) * W +
                            jnp.clip(c, 0, W - 1), H * W)
            idx = jax.lax.broadcasted_iota(jnp.int32, (N, 1), 0).squeeze(-1)
            won = k & (w.reshape(-1)[jnp.minimum(pix, H * W - 1)] == idx)
            outs = []
            for f in range(F):
                upd = jnp.where(won, v[:, f], 0.0)
                img = jnp.zeros((H * W + 1,), jnp.float32).at[pix].add(upd)
                outs.append(img[: H * W].reshape(H, W))
            return jnp.stack(outs, -1).mean()
        return jax.vmap(one)(rows, cols, depth, keep, vals).mean()
    timed("fill/flat6", fill_flat6, (rows, cols, depth, keep, vals))


if __name__ == "__main__":
    main()


def bench_rasterize():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    from pmf_tpu.ops.scatter import rasterize_zbuffer

    rng = np.random.default_rng(0)
    rows = jnp.asarray(rng.integers(0, H, (BATCH, N)).astype(np.int32))
    cols = jnp.asarray(rng.integers(0, W, (BATCH, N)).astype(np.int32))
    depth = jnp.asarray(rng.uniform(2, 70, (BATCH, N)).astype(np.float32))
    keep = jnp.asarray(rng.random((BATCH, N)) < 0.8)
    vals = jnp.asarray(rng.random((BATCH, N, F)).astype(np.float32))

    def raster(eps, rows, cols, depth, keep, vals):
        def one(r, c, d, k, v):
            canvas, m = rasterize_zbuffer(r, c, d + eps, k, v, H, W)
            return canvas.mean()
        return jax.vmap(one)(rows, cols, depth, keep, vals).mean()
    timed("rasterize", raster, (rows, cols, depth, keep, vals))
