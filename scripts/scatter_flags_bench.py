"""Microbench: do unique_indices / indices_are_sorted change TPU scatter
cost? Plus: cost of sorting 32k keys (feasibility of a sort-based fill).
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

BATCH = 8
N = 32768
H, W = 384, 1232
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
    print(f"{name:16s} {dt * 1e3 / BATCH:8.3f} ms/scan  (out={val:.4f}, "
          f"compile {compile_s:.0f}s)", flush=True)


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    rng = np.random.default_rng(0)
    # unique pixel targets per point (permutation-like): sample without
    # replacement from H*W
    uniq = np.stack([rng.choice(H * W, N, replace=False)
                     for _ in range(BATCH)]).astype(np.int32)
    uniq_sorted = np.sort(uniq, axis=1)
    vals = jnp.asarray(rng.random((BATCH, N)).astype(np.float32))
    pix = jnp.asarray(uniq)
    pix_s = jnp.asarray(uniq_sorted)
    keys = jnp.asarray(rng.integers(0, 2**30, (BATCH, N)).astype(np.int32))

    def scat_base(eps, pix, vals):
        def one(p, v):
            return jnp.zeros((H * W,), jnp.float32).at[p].add(v + eps).mean()
        return jax.vmap(one)(pix, vals).mean()
    timed("add", scat_base, (pix, vals))

    def scat_uni(eps, pix, vals):
        def one(p, v):
            return jnp.zeros((H * W,), jnp.float32).at[p].set(
                v + eps, unique_indices=True).mean()
        return jax.vmap(one)(pix, vals).mean()
    timed("set+unique", scat_uni, (pix, vals))

    def scat_uni_sorted(eps, pix, vals):
        def one(p, v):
            return jnp.zeros((H * W,), jnp.float32).at[p].set(
                v + eps, unique_indices=True, indices_are_sorted=True).mean()
        return jax.vmap(one)(pix_s, vals).mean()
    timed("set+uniq+sort", scat_uni_sorted, (pix_s, vals))

    def sort_cost(eps, keys, vals):
        def one(k, v):
            sk, sv = jax.lax.sort([k, v + eps], num_keys=1)
            return sv[0] + sk[-1].astype(jnp.float32)
        return jax.vmap(one)(keys, vals).mean()
    timed("sort32k_2op", sort_cost, (keys, vals))

    def sort_cost6(eps, keys, vals):
        def one(k, v):
            ops = [k] + [v + eps + i for i in range(6)]
            out = jax.lax.sort(ops, num_keys=1)
            return sum(o[0].astype(jnp.float32) for o in out)
        return jax.vmap(one)(keys, vals).mean()
    timed("sort32k_7op", sort_cost6, (keys, vals))


if __name__ == "__main__":
    main()
