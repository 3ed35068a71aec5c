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
