"""Analytic FLOP accounting for the static-shape conv programs.

The reference publishes no throughput numbers (BASELINE.md), so the
only defensible efficiency claim is MFU against the chip's known peak.
Every pmf_tpu program is static-shape, so an exact matmul/conv FLOP
count is available by walking the jaxpr: we trace the *measured*
function (no compilation, no device work — seconds on the 1-core host)
and sum 2·MACs over every `conv_general_dilated` and `dot_general`
primitive, recursing through pjit / custom_vjp / remat / scan call
graphs. Elementwise, sort, gather and reduction work is deliberately
excluded — on these conv nets it is HBM-bound, not MXU-bound, and
counting it would inflate "useful FLOPs". This mirrors how the scaling
literature defines MFU (model FLOPs / peak FLOPs), cf. PaLM appendix B.

Peak used for MFU: TPU v5e ≈ 197 TFLOP/s bf16 (394 int8). The counter
itself is backend-free and is unit-tested on CPU against hand-computed
conv/dense counts (tests/test_flops.py).
"""
from __future__ import annotations

import math

V5E_BF16_PEAK_FLOPS = 197e12


def _conv_flops(eqn) -> int:
    """2 * out_elems * (spatial kernel * cin / feature_groups).

    Matches the standard conv cost: each output element is a dot
    product of length kh*kw*cin_per_group; batch_group_count divides
    the lhs batch, which is already reflected in the output shape.
    """
    out = eqn.outvars[0].aval.shape
    rhs = eqn.invars[1].aval.shape
    dnums = eqn.params["dimension_numbers"]
    fgc = eqn.params.get("feature_group_count", 1)
    # rhs layout: dnums.rhs_spec = (out_c, in_c, *spatial)
    rhs_spec = dnums.rhs_spec
    kernel_spatial = math.prod(rhs[d] for d in rhs_spec[2:])
    cin_per_group = rhs[rhs_spec[1]]
    del fgc  # grouping already encoded in rhs's per-group cin
    out_elems = math.prod(out)
    return 2 * out_elems * kernel_spatial * cin_per_group


def _dot_flops(eqn) -> int:
    lhs = eqn.invars[0].aval.shape
    rhs = eqn.invars[1].aval.shape
    (lc, rc), (lb, rb) = eqn.params["dimension_numbers"]
    batch = math.prod(lhs[d] for d in lb)
    contract = math.prod(lhs[d] for d in lc)
    m = math.prod(lhs[d] for d in range(len(lhs))
                  if d not in set(lc) | set(lb))
    n = math.prod(rhs[d] for d in range(len(rhs))
                  if d not in set(rc) | set(rb))
    return 2 * batch * m * n * contract


def jaxpr_flops(jaxpr) -> int:
    """Sum matmul/conv FLOPs over a (possibly nested) jaxpr."""
    total = 0
    for eqn in jaxpr.eqns:
        prim = eqn.primitive.name
        if prim == "conv_general_dilated":
            total += _conv_flops(eqn)
        elif prim == "dot_general":
            total += _dot_flops(eqn)
        elif prim == "scan":
            total += eqn.params["length"] * jaxpr_flops(
                eqn.params["jaxpr"].jaxpr)
        elif prim == "while":
            # trip count unknowable statically; count one body pass
            total += jaxpr_flops(eqn.params["body_jaxpr"].jaxpr)
        elif prim == "cond":
            total += max((jaxpr_flops(b.jaxpr)
                          for b in eqn.params["branches"]), default=0)
        else:
            for key in ("jaxpr", "call_jaxpr", "fun_jaxpr"):
                sub = eqn.params.get(key) if eqn.params else None
                if sub is not None:
                    total += jaxpr_flops(getattr(sub, "jaxpr", sub))
                    break
    return total


def count_flops(fn, *args, **kwargs) -> int:
    """Trace fn(*args, **kwargs) and return its matmul/conv FLOPs.

    Pure tracing — no compile, no device execution; safe on the bench
    host even when the TPU relay is flaky.
    """
    import jax

    jaxpr = jax.make_jaxpr(fn, **({"static_argnums": kwargs.pop(
        "static_argnums")} if "static_argnums" in kwargs else {}))(
        *args, **kwargs)
    return jaxpr_flops(jaxpr.jaxpr)


def mfu(flops_per_sec: float, peak: float = V5E_BF16_PEAK_FLOPS) -> float:
    return flops_per_sec / peak
