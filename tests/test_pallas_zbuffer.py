"""Pallas z-buffer kernel vs the XLA packed scatter (interpret mode on CPU)."""
import numpy as np
import jax.numpy as jnp

from pmf_tpu.ops.pallas.zbuffer import zbuffer_pallas


def test_pallas_zbuffer_matches_scatter_min():
    rng = np.random.default_rng(0)
    N, H, W = 500, 24, 40
    pix = rng.integers(0, H * W + 1, N).astype(np.int32)  # incl. sentinel
    key = rng.integers(0, 1 << 30, N).astype(np.int32)
    key[pix == H * W] = 2147483647

    got = np.asarray(zbuffer_pallas(jnp.asarray(pix), jnp.asarray(key),
                                    H, W, interpret=True)).reshape(-1)
    want = np.full((H * W,), 2147483647, np.int64)
    valid = pix < H * W
    np.minimum.at(want, pix[valid], key[valid])
    np.testing.assert_array_equal(got, want)


def test_tile_fill_rasterizer_matches_scatter_path():
    """Pallas sorted-winner tile rasterizer (interpret mode) ==
    scatter-min z-buffer + fill, bit-exact, batched, W % 128 != 0."""
    import jax.numpy as jnp
    import numpy as np

    from pmf_tpu.ops import fill_canvas, zbuffer_scatter_packed
    from pmf_tpu.ops.pallas.tile_fill import rasterize_zbuffer_pallas

    rng = np.random.default_rng(5)
    B, N, H, W, F = 2, 3000, 48, 200, 6
    rows = rng.integers(0, H, (B, N)).astype(np.int32)
    cols = rng.integers(0, W, (B, N)).astype(np.int32)
    depth = rng.uniform(1, 80, (B, N)).astype(np.float32)
    keep = rng.random((B, N)) > 0.2
    vals = rng.normal(size=(B, N, F)).astype(np.float32)
    vals[..., 5] = rng.integers(0, 20, (B, N))

    canvas, mask = rasterize_zbuffer_pallas(
        jnp.asarray(rows), jnp.asarray(cols), jnp.asarray(depth),
        jnp.asarray(keep), jnp.asarray(vals), H, W, interpret=True)

    for b in range(B):
        w, m = zbuffer_scatter_packed(
            jnp.asarray(rows[b]), jnp.asarray(cols[b]),
            jnp.asarray(depth[b]), jnp.asarray(keep[b]), H, W)
        ref = np.asarray(fill_canvas(
            jnp.asarray(vals[b]), jnp.asarray(rows[b]),
            jnp.asarray(cols[b]), jnp.asarray(keep[b]), w, m))
        np.testing.assert_array_equal(np.asarray(mask[b]), np.asarray(m))
        np.testing.assert_array_equal(np.asarray(canvas[b]), ref)
