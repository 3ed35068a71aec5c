"""Microbenchmark packed-conv formulations at the real model shapes.

Explores the FLOP-waste/lane-utilization tradeoff: the blockfull packed
kernel does 4x the original FLOPs at ~full MXU; per-phase decomposition
cuts FLOPs (16/9 for dil-1 3x3, exactly 1x for dil-2) at narrower output.
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

B, HP, WP = 8, 192, 616


def timeit(name, fn, *args, iters=20, flops=None):
    import jax
    import jax.numpy as jnp

    jfn = jax.jit(lambda acc, *a: fn(
        a[0] + (acc * 0.0).astype(a[0].dtype), *a[1:]).mean()
        .astype(jnp.float32))
    acc = jnp.float32(0.0)
    np.asarray(jfn(acc, *args))
    t0 = time.perf_counter()
    for _ in range(iters):
        acc = jfn(acc, *args)
    np.asarray(acc)
    dt = (time.perf_counter() - t0) / iters
    eff = f"  {flops / dt / 1e12:6.1f} TF/s" if flops else ""
    print(f"{name:34s} {dt * 1e3:8.3f} ms{eff}", flush=True)


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    rng = np.random.default_rng(0)
    ci = co = 64  # features=64: resBlock1 / camera layer1 width
    xp = jnp.asarray(rng.standard_normal((B, HP, WP, 4 * ci)),
                     dtype=jnp.bfloat16)
    xu = jnp.asarray(rng.standard_normal((B, HP * 2, WP * 2, ci)),
                     dtype=jnp.bfloat16)

    dn = ("NHWC", "HWIO", "NHWC")
    base_flops = B * HP * 2 * WP * 2 * 9 * ci * co * 2  # the original conv

    def conv(x, w, pads, groups=1):
        return lax.conv_general_dilated(x, w, (1, 1), pads,
                                        dimension_numbers=dn,
                                        feature_group_count=groups)

    # 0. unpacked full-res 3x3 (what the reference formulation would do)
    w0 = jnp.asarray(rng.standard_normal((3, 3, ci, co)), jnp.bfloat16)
    timeit("unpacked 3x3 full-res", lambda x: conv(x, w0, ((1, 1), (1, 1))),
           xu, flops=base_flops)

    # 1. blockfull dil-1 3x3 (current): [3,3,4ci,4co], 4x FLOPs
    w1 = jnp.asarray(rng.standard_normal((3, 3, 4 * ci, 4 * co)),
                     jnp.bfloat16)
    timeit("blockfull dil1 [3,3,4ci,4co]",
           lambda x: conv(x, w1, ((1, 1), (1, 1))), xp, flops=base_flops)

    # 2. per-phase dil-1: 4 convs [2,2,4ci,co], 16/9 FLOPs
    w2 = jnp.asarray(rng.standard_normal((4, 2, 2, 4 * ci, co)),
                     jnp.bfloat16)

    def perphase_dil1(x, w):
        outs = []
        for q, pads in enumerate([((1, 0), (1, 0)), ((1, 0), (0, 1)),
                                  ((0, 1), (1, 0)), ((0, 1), (0, 1))]):
            outs.append(conv(x, w[q], pads))
        return jnp.concatenate(outs, -1)
    timeit("per-phase dil1 4x[2,2,4ci,co]", lambda x: perphase_dil1(x, w2),
           xp, flops=base_flops)

    # 2b. per-phase dil-1 paired: 2 convs [2,3,4ci,2co]
    w2b = jnp.asarray(rng.standard_normal((2, 2, 3, 4 * ci, 2 * co)),
                      jnp.bfloat16)

    def pairphase_dil1(x, w):
        outs = [conv(x, w[0], ((1, 0), (1, 1))),
                conv(x, w[1], ((0, 1), (1, 1)))]
        return jnp.concatenate(outs, -1)
    timeit("pair-phase dil1 2x[2,3,4ci,2co]", lambda x: pairphase_dil1(x, w2b),
           xp, flops=base_flops)

    # 3. blockfull dil-2 3x3 (current conv3): [3,3,4ci,4co]
    timeit("blockfull dil2 [3,3,4ci,4co]",
           lambda x: conv(x, w1, ((1, 1), (1, 1))), xp, flops=base_flops)

    # 4. sliced per-phase dil-2: 4 convs [3,3,ci,co] on phase slices (1x)
    w4 = jnp.asarray(rng.standard_normal((4, 3, 3, ci, co)), jnp.bfloat16)

    def perphase_dil2(x, w):
        outs = []
        for q in range(4):
            outs.append(conv(x[..., q * ci:(q + 1) * ci], w[q],
                             ((1, 1), (1, 1))))
        return jnp.concatenate(outs, -1)
    timeit("sliced per-phase dil2 4x[3,3,ci,co]",
           lambda x: perphase_dil2(x, w4), xp, flops=base_flops)

    # 5. grouped dil-2: one conv, feature_group_count=4 (1x FLOPs)
    w5 = jnp.asarray(rng.standard_normal((3, 3, ci, 4 * co)), jnp.bfloat16)
    timeit("grouped dil2 [3,3,ci,4co] g=4",
           lambda x: conv(x, w5, ((1, 1), (1, 1)), groups=4), xp,
           flops=base_flops)

    # 6. wide-channel control at 256 (the 8bc stages)
    ci2 = co2 = 256
    xq = jnp.asarray(rng.standard_normal((B, HP, WP, ci2)), jnp.bfloat16)
    w6 = jnp.asarray(rng.standard_normal((3, 3, ci2, co2)), jnp.bfloat16)
    timeit("dense half-res [3,3,256,256]",
           lambda x: conv(x, w6, ((1, 1), (1, 1))), xq,
           flops=B * HP * WP * 9 * ci2 * co2 * 2)


if __name__ == "__main__":
    main()
