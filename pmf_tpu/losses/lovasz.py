"""Lovász-softmax loss, exact masked formulation for static shapes.

Parity: pc_processor/loss/lovasz_softmax.py (Berman's Lovász extension,
`classes='present'`, `ignore` filtering).

TPU-native design: the reference *removes* ignored pixels (dynamic
shapes). XLA needs static shapes, so we use an exact masked equivalent:
for ignored pixels set fg=0 and error=0. Zero-error entries sort to the
tail and contribute error*grad = 0 to the dot product, and — because
fg=0 — they do not perturb the intersection/union prefix sums of any
entry ranked before them. 'present' class averaging becomes a weighted
mean over classes with fg.sum() > 0. Sorting runs as one batched
[C, P] descending sort on device.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def _lovasz_grad_batched(fg_sorted: jax.Array) -> jax.Array:
    """Gradient of the Lovász extension w.r.t. sorted errors, per class.

    fg_sorted: [C, P] {0,1} foreground indicators in sorted-error order.
    Returns [C, P] jaccard-difference weights (Alg. 1 of Berman et al.).
    """
    gts = fg_sorted.sum(axis=1, keepdims=True)
    intersection = gts - jnp.cumsum(fg_sorted, axis=1)
    union = gts + jnp.cumsum(1.0 - fg_sorted, axis=1)
    jaccard = 1.0 - intersection / jnp.maximum(union, 1e-12)
    return jnp.concatenate(
        [jaccard[:, :1], jaccard[:, 1:] - jaccard[:, :-1]], axis=1)


def lovasz_softmax_loss(probs: jax.Array, labels: jax.Array,
                        ignore: int | None = 0,
                        valid: jax.Array | None = None) -> jax.Array:
    """Multi-class Lovász-softmax loss.

    Args:
      probs: [..., C] class probabilities in [0, 1] (post-softmax).
      labels: [...] integer ground truth.
      ignore: label id excluded from the loss (ref default ignore=0 via
        tasks/pmf/trainer.py:190); None disables.
      valid: optional extra [...] boolean mask.

    Returns: scalar loss, mean over classes present in the labels.
    """
    C = probs.shape[-1]
    p = probs.reshape(-1, C).astype(jnp.float32)
    y = labels.reshape(-1)
    P = p.shape[0]

    ok = jnp.ones(y.shape, dtype=bool)
    if ignore is not None:
        ok &= y != ignore
    if valid is not None:
        ok &= valid.reshape(-1)

    # [C, P]: per-class foreground and |fg - p_c| errors, masked-exact.
    fg = (jax.nn.one_hot(y, C, dtype=jnp.float32) * ok[:, None].astype(jnp.float32)).T
    err = jnp.abs(fg - p.T) * ok[None, :].astype(jnp.float32)

    # TPU-native gradient construction: differentiating through the sort
    # would emit a huge scatter in the backward pass (sort VJP), ~10×
    # the forward cost. The reference itself detaches the Jaccard
    # weights (lovasz_softmax.py:119 wraps them in Variable), so the
    # exact gradient is d loss/d err_i = jaccard[rank_i]. We compute the
    # rank-ordered weights under stop_gradient and UNSORT them with a
    # second sort keyed by the permutation (sorts are fast on TPU,
    # scatters are not); the loss is then an elementwise dot.
    def weights(err):
        idx = jnp.broadcast_to(
            jax.lax.broadcasted_iota(jnp.int32, (1, P), 1), err.shape)
        _, fg_sorted, perm = jax.lax.sort((-err, fg, idx), num_keys=1)
        grad = _lovasz_grad_batched(fg_sorted)
        _, g_unsorted = jax.lax.sort((perm, grad), num_keys=1)
        return g_unsorted

    g = jax.lax.stop_gradient(weights(err))
    per_class = (err * g).sum(axis=1)

    present = (fg.sum(axis=1) > 0).astype(jnp.float32)
    return (per_class * present).sum() / jnp.maximum(present.sum(), 1.0)
