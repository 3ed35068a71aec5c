"""Capture a device trace of the full eval pipeline (perfetto JSON)."""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

BATCH = int(__import__("os").environ.get("TRACE_BATCH", "8"))
N_POINTS = 32768
H, W = 384, 1232


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from pmf_tpu.models import PMFNet

    rng = np.random.default_rng(0)
    model = PMFNet(nclasses=20, base_channels=32, image_backbone="resnet34",
                   dtype=jnp.bfloat16, use_packed=True)
    variables = jax.jit(lambda k: model.init(
        {"params": k, "dropout": jax.random.PRNGKey(1)},
        jnp.zeros((1, 64, 80, 5)), jnp.zeros((1, 64, 80, 3)),
        train=False))(jax.random.PRNGKey(0))
    pcd = jnp.asarray(rng.random((BATCH, H, W, 5)).astype(np.float32))
    img = jnp.asarray(rng.random((BATCH, H, W, 3)).astype(np.float32))

    @jax.jit
    def run(acc, pcd, img):
        lidar, cam = model.apply(variables, pcd + acc * 0.0, img, train=False)
        return lidar.mean()

    acc = jnp.float32(0.0)
    np.asarray(run(acc, pcd, img))  # compile
    with jax.profiler.trace("/tmp/jtrace", create_perfetto_trace=True):
        for _ in range(3):
            acc = run(acc, pcd, img)
        np.asarray(acc)
    print("trace done")


if __name__ == "__main__":
    main()
