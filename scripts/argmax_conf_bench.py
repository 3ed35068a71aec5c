"""Microbench: variadic-argmax + einsum confusion vs argmax_last + MXU dot.

Shapes = flagship train step ([8,256,1024,20] bf16 probs).
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

from pmf_tpu.metrics.iou import confusion_matrix
from pmf_tpu.ops.reduce import argmax_last

B, H, W, C = 8, 256, 1024, 20
rng = np.random.default_rng(0)
probs = jnp.asarray(rng.random((B, H, W, C), np.float32), jnp.bfloat16)
label = jnp.asarray(rng.integers(0, C, (B, H, W)), jnp.int32)


@jax.jit
def old_path(p, l):
    pred = jnp.argmax(p, -1)
    oh_pred = jax.nn.one_hot(pred.reshape(-1), C, dtype=jnp.float32)
    oh_tgt = jax.nn.one_hot(l.reshape(-1), C, dtype=jnp.float32)
    w = jnp.ones((B * H * W,), jnp.float32)
    return jnp.einsum("pc,pk,p->ck", oh_pred, oh_tgt, w,
                      preferred_element_type=jnp.float32)


@jax.jit
def new_path(p, l):
    return confusion_matrix(argmax_last(p), l, C)


def timeit(f, *a, n=20):
    out = f(*a)
    np.asarray(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = f(*a)
    np.asarray(out)
    return (time.perf_counter() - t0) / n * 1e3


a = np.asarray(old_path(probs, label))
b = np.asarray(new_path(probs, label))
print("match:", np.array_equal(a, b))
print(f"old: {timeit(old_path, probs, label):8.2f} ms")
print(f"new: {timeit(new_path, probs, label):8.2f} ms")
