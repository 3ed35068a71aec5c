"""Unit tests for the analytic matmul/conv FLOP counter (utils/flops.py)."""
import jax
import jax.numpy as jnp
import pytest

from pmf_tpu.utils.flops import count_flops, jaxpr_flops

@pytest.mark.smoke
def test_dense_matmul():
    def f(x, w):
        return x @ w

    x = jnp.zeros((8, 32))
    w = jnp.zeros((32, 64))
    assert count_flops(f, x, w) == 2 * 8 * 32 * 64


@pytest.mark.smoke
def test_conv2d_same():
    from jax import lax

    def f(x, k):
        return lax.conv_general_dilated(
            x, k, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    x = jnp.zeros((2, 16, 20, 3))
    k = jnp.zeros((3, 3, 3, 8))
    # out 2*16*20*8 elements, each a 3*3*3 dot
    assert count_flops(f, x, k) == 2 * (2 * 16 * 20 * 8) * (3 * 3 * 3)


@pytest.mark.smoke
def test_grouped_conv_counts_per_group_cin():
    from jax import lax

    def f(x, k):
        return lax.conv_general_dilated(
            x, k, (1, 1), "SAME", feature_group_count=4,
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    x = jnp.zeros((1, 8, 8, 16))
    k = jnp.zeros((3, 3, 4, 16))  # cin/group = 4
    assert count_flops(f, x, k) == 2 * (1 * 8 * 8 * 16) * (3 * 3 * 4)


@pytest.mark.smoke
def test_recurses_into_jit_and_grad():
    def f(x, w):
        return (x @ w).sum()

    x = jnp.zeros((4, 16))
    w = jnp.zeros((16, 16))
    fwd = count_flops(jax.jit(f), x, w)
    assert fwd == 2 * 4 * 16 * 16
    # grad adds dL/dx = g @ w.T and dL/dw = x.T @ g
    fwdbwd = count_flops(jax.jit(jax.grad(f, argnums=(0, 1))), x, w)
    assert fwdbwd == 3 * fwd


@pytest.mark.smoke
def test_scan_multiplies_by_length():
    def f(x):
        def body(c, _):
            return c @ c, None

        out, _ = jax.lax.scan(body, x, None, length=5)
        return out

    x = jnp.zeros((8, 8))
    assert count_flops(f, x) == 5 * 2 * 8 * 8 * 8


def test_model_forward_positive_and_static():
    """PMFNet forward has a well-defined static count ~ tens of GFLOPs."""
    from pmf_tpu.models import PMFNet

    model = PMFNet(nclasses=20, base_channels=8, image_backbone="resnet34")
    x5 = jnp.zeros((1, 64, 96, 5))
    x3 = jnp.zeros((1, 64, 96, 3))
    variables = model.init(
        {"params": jax.random.PRNGKey(0),
         "dropout": jax.random.PRNGKey(1)}, x5, x3, train=False)

    def fwd(v, a, b):
        return model.apply(v, a, b, train=False)

    n = count_flops(fwd, variables, x5, x3)
    assert n > 1e8
    assert n == count_flops(fwd, variables, x5, x3)  # deterministic
