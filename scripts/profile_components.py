"""Component-level TPU timing for the flagship eval config.

Times each stage of the PMF-ResNet34 384x1232 pipeline in isolation with
relay-safe methodology (N chained pipelined calls, then one np.asarray
fetch — block_until_ready does not reliably block through the axon
relay).

Usage: python scripts/profile_components.py [component ...]
Components: preproc camera decoder lidar full salsa
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

BATCH = int(os.environ.get("PROF_BATCH", "2"))
N_POINTS = 32768
H, W = 384, 1232
N_ITERS = 20


def timed(name, fn, args):
    """Relay-safe timing: no eager ops in the loop (the epsilon-chaining
    happens INSIDE the jit), constant device args, N pipelined dispatches,
    one np.asarray fetch at the end (device execution is in-order, so the
    last result completing implies all N executed)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

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
    val = float(np.asarray(acc))
    dt = (time.perf_counter() - t0) / N_ITERS
    print(f"{name:10s} {dt * 1e3 / BATCH:8.2f} ms/scan   "
          f"(batch {BATCH}: {dt * 1e3:7.2f} ms, compile {compile_s:.0f}s, "
          f"out={val:.4f})", flush=True)
    return dt


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from pmf_tpu.data import PVConfig, build_batch
    from pmf_tpu.models import PMFNet
    from pmf_tpu.models.pmf import RGBDecoder, SalsaNextFusion
    from pmf_tpu.models.resnet import ResNetEncoder
    from pmf_tpu.models.salsanext import SalsaNext

    which = set(sys.argv[1:]) or {"preproc", "camera", "decoder", "lidar",
                                  "full"}

    cfg = PVConfig(canvas_h=H, canvas_w=W + 16, proj_h=H, proj_w=W,
                   h_pad=7, w_pad=3, n_points=N_POINTS)
    rng = np.random.default_rng(0)
    pts = np.zeros((BATCH, N_POINTS, 4), np.float32)
    pts[..., 0] = rng.uniform(2, 70, (BATCH, N_POINTS))
    pts[..., 1] = rng.uniform(-20, 20, (BATCH, N_POINTS))
    pts[..., 2] = rng.uniform(-2, 1, (BATCH, N_POINTS))
    pts[..., 3] = rng.uniform(0, 1, (BATCH, N_POINTS))
    labels = rng.integers(0, 20, (BATCH, N_POINTS)).astype(np.int32)
    valid = np.ones((BATCH, N_POINTS), bool)
    fx = 720.0
    proj = np.tile(np.array(
        [[fx, -fx, 0, W * fx / 2], [0, 0, -fx, H * fx / 2], [1, 0, 0, 0]],
        np.float32)[None], (BATCH, 1, 1))
    image = rng.random((BATCH, H, W + 16, 3)).astype(np.float32)
    img_h = np.full((BATCH,), H, np.int32)
    img_w = np.full((BATCH,), W, np.int32)
    dev = lambda *xs: tuple(map(jnp.asarray, xs))
    raw = dev(pts, labels, valid, proj, image, img_h, img_w)

    use_packed = os.environ.get("PROF_UNPACKED", "") != "1"
    model = PMFNet(nclasses=20, base_channels=32, image_backbone="resnet34",
                   dtype=jnp.bfloat16, use_packed=use_packed)
    variables = jax.jit(lambda k: model.init(
        {"params": k, "dropout": jax.random.PRNGKey(1)},
        jnp.zeros((1, 64, 80, 5)), jnp.zeros((1, 64, 80, 3)),
        train=False))(jax.random.PRNGKey(0))

    pcd = jnp.asarray(rng.random((BATCH, H, W, 5)).astype(np.float32))
    img = jnp.asarray(rng.random((BATCH, H, W, 3)).astype(np.float32))
    feats_shape = [(BATCH, H // 2, W // 2, 64), (BATCH, H // 4, W // 4, 128),
                   (BATCH, H // 8, W // 8, 256), (BATCH, H // 16, W // 16, 512)]
    feats = tuple(jnp.asarray(
        rng.random(s).astype(np.float32), dtype=jnp.bfloat16)
        for s in feats_shape)

    if "preproc" in which:
        def run_preproc(eps, points, labels, valid, pm, image, ih, iw):
            f, m, l = build_batch(jax.random.PRNGKey(0), points + eps, labels,
                                  valid, pm, image, ih, iw, cfg, False)
            return f.mean()
        timed("preproc", run_preproc, raw)

    if "scatter" in which:
        from pmf_tpu.ops.scatter import fill_canvas, zbuffer_scatter_packed
        from pmf_tpu.ops.projection import perspective_project

        def run_zbuf(eps, points, labels, valid, pm, image, ih, iw):
            def one(pts, val, P, h, w):
                rows, cols, keep = perspective_project(pts[:, :3] + eps, P,
                                                       h, w, val)
                depth = jnp.linalg.norm(pts[:, :3], axis=-1)
                winner, mask = zbuffer_scatter_packed(
                    rows.astype(jnp.int32), cols.astype(jnp.int32), depth,
                    keep, H, W)
                return winner.astype(jnp.float32).mean()
            return jax.vmap(one)(points, valid, pm, ih, iw).mean()
        timed("zbuf", run_zbuf, raw)

        def run_scatter_fill(eps, points, labels, valid, pm, image, ih, iw):
            def one(pts, lab, val, P, h, w):
                rows, cols, keep = perspective_project(pts[:, :3] + eps, P,
                                                       h, w, val)
                depth = jnp.linalg.norm(pts[:, :3], axis=-1)
                ri = rows.astype(jnp.int32)
                ci = cols.astype(jnp.int32)
                winner, mask = zbuffer_scatter_packed(ri, ci, depth, keep,
                                                      H, W)
                vals = jnp.concatenate(
                    [depth[:, None], pts[:, :4],
                     lab[:, None].astype(jnp.float32)], axis=-1)
                canvas = fill_canvas(vals, ri, ci, keep, winner, mask)
                return canvas.mean()
            return jax.vmap(one)(points, labels, valid, pm, ih, iw).mean()
        timed("zbuf+fill", run_scatter_fill, raw)

    if "camera" in which:
        enc = ResNetEncoder(backbone="resnet34", dtype=jnp.bfloat16,
                            packed_stem=True)
        vs = jax.jit(lambda k: enc.init(
            {"params": k, "dropout": jax.random.PRNGKey(1)},
            jnp.zeros((1, 64, 80, 3)), train=False))(jax.random.PRNGKey(0))

        def run_camera(eps, img):
            fs = enc.apply(vs, img + eps, train=False)
            return sum(f.mean().astype(jnp.float32) for f in fs)
        timed("camera", run_camera, (img,))

    if "decoder" in which:
        dec = RGBDecoder(nclasses=20, base_channels=16, dtype=jnp.bfloat16)
        vs = jax.jit(lambda k: dec.init(
            {"params": k}, [jnp.zeros((1, s[1] // 6, s[2] // 6, s[3]))
                            for s in feats_shape], train=False)
        )(jax.random.PRNGKey(0))

        def run_decoder(eps, *fs):
            return dec.apply(vs, [fs[0] + eps, *fs[1:]], train=False).mean()
        timed("decoder", run_decoder, feats)

    if "lidar" in which:
        lid = SalsaNextFusion(nclasses=20, base_channels=32,
                              dtype=jnp.bfloat16, use_packed=True)
        vs = jax.jit(lambda k: lid.init(
            {"params": k, "dropout": jax.random.PRNGKey(1)},
            jnp.zeros((1, 64, 80, 5)),
            [jnp.zeros((1, 32, 40, 64)), jnp.zeros((1, 16, 20, 128)),
             jnp.zeros((1, 8, 10, 256)), jnp.zeros((1, 4, 5, 512))],
            train=False))(jax.random.PRNGKey(0))

        def run_lidar(eps, pcd, *fs):
            return lid.apply(vs, pcd + eps, list(fs), train=False).mean()
        timed("lidar", run_lidar, (pcd,) + feats)

    if "salsa" in which:
        sal = SalsaNext(nclasses=20, base_channels=32, dtype=jnp.bfloat16)
        vs = jax.jit(lambda k: sal.init(
            {"params": k, "dropout": jax.random.PRNGKey(1)},
            jnp.zeros((1, 64, 2048 // 32, 5)), train=False)
        )(jax.random.PRNGKey(0))
        rimg = jnp.asarray(rng.random((BATCH, 64, 2048, 5)).astype(np.float32))

        def run_salsa(eps, x):
            return sal.apply(vs, x + eps, train=False).mean()
        timed("salsa", run_salsa, (rimg,))

    if "full" in which:
        def run_full(eps, pcd, img):
            lidar, cam = model.apply(variables, pcd + eps, img, train=False)
            return lidar.mean()
        timed("full", run_full, (pcd, img))

    if "pipeline" in which:
        # bench.py-identical: preproc + forward + argmax
        def run_pipeline(eps, points, labels, valid, pm, image, ih, iw):
            f, m, l = build_batch(jax.random.PRNGKey(0), points + eps,
                                  labels, valid, pm, image, ih, iw, cfg,
                                  False)
            lidar, cam = model.apply(variables, f[..., :5], f[..., 5:8],
                                     train=False)
            pred = jnp.argmax(lidar, -1)
            # non-foldable scalar: keeps the whole graph live (a *0
            # output lets XLA DCE everything upstream)
            return pred.astype(jnp.float32).mean()
        timed("pipeline", run_pipeline, raw)

    if "nopre" in which:
        # forward + argmax on fixed inputs (isolates preproc)
        def run_nopre(eps, pcd, img):
            lidar, cam = model.apply(variables, pcd + eps, img, train=False)
            pred = jnp.argmax(lidar, -1)
            return pred.astype(jnp.float32).mean()
        timed("nopre", run_nopre, (pcd, img))


if __name__ == "__main__":
    main()
