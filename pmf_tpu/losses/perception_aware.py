"""Perception-aware (entropy-gated bidirectional KL) loss.

Parity: tasks/pmf/trainer.py:231-252 (_computePerceptionAwareLoss) and
the entropy maps at trainer.py:305-319.

  entropy      = -sum_c p log p / log(C)              (normalized to [0,1))
  confidence   = 1 - entropy
  importance   = conf_pcd - conf_img
  pcd_guide_w  = [importance > 0] * |importance| * [conf_pcd >= tau]
  img_guide_w  = [importance < 0] * |importance| * [conf_img >= tau]
  loss         = mean(KL(pcd_log || img) * img_guide_w)
               + mean(KL(img_log || pcd) * pcd_guide_w)
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .kl import kl_div


def normalized_entropy(probs: jax.Array, log_probs: jax.Array) -> jax.Array:
    """Per-pixel entropy of [..., C] probabilities, normalized by log C."""
    C = probs.shape[-1]
    return -(probs * log_probs).sum(axis=-1) / jnp.log(jnp.asarray(C, probs.dtype))


def perception_aware_losses(pcd_probs: jax.Array, img_probs: jax.Array,
                            tau: float = 0.7):
    """Split variant returning (loss_per_pcd, loss_per_img, weights) —
    the EPMF trainer consumes the two KL terms separately
    (tasks/epmf/trainer.py:290-315)."""
    pcd_log = jnp.log(jnp.clip(pcd_probs, 1e-8))
    img_log = jnp.log(jnp.clip(img_probs, 1e-8))

    pcd_conf = 1.0 - normalized_entropy(pcd_probs, pcd_log)
    img_conf = 1.0 - normalized_entropy(img_probs, img_log)
    importance = pcd_conf - img_conf

    pcd_guide = (importance > 0) * jnp.abs(importance) * (pcd_conf >= tau)
    img_guide = (importance < 0) * jnp.abs(importance) * (img_conf >= tau)

    loss_pcd = (kl_div(pcd_log, img_probs) * img_guide[..., None]).mean()
    loss_img = (kl_div(img_log, pcd_probs) * pcd_guide[..., None]).mean()
    return loss_pcd, loss_img, pcd_guide, img_guide


def perception_aware_loss(pcd_probs: jax.Array, img_probs: jax.Array,
                          tau: float = 0.7):
    """Bidirectional entropy-gated KL between the two stream predictions.

    Args:
      pcd_probs, img_probs: [..., C] post-softmax predictions.
      tau: confidence threshold (config `tau`, config_server_kitti.yaml:31).

    Returns:
      (loss, pcd_guide_weight, img_guide_weight) — weights returned for
      observability parity (tensorboard panels, trainer.py:515-517).
    """
    pcd_log = jnp.log(jnp.clip(pcd_probs, 1e-8))
    img_log = jnp.log(jnp.clip(img_probs, 1e-8))

    pcd_conf = 1.0 - normalized_entropy(pcd_probs, pcd_log)
    img_conf = 1.0 - normalized_entropy(img_probs, img_log)
    importance = pcd_conf - img_conf

    pcd_guide = (importance > 0) * jnp.abs(importance) * (pcd_conf >= tau)
    img_guide = (importance < 0) * jnp.abs(importance) * (img_conf >= tau)

    loss_pcd = (kl_div(pcd_log, img_probs) * img_guide[..., None]).mean()
    loss_img = (kl_div(img_log, pcd_probs) * pcd_guide[..., None]).mean()
    return loss_pcd + loss_img, pcd_guide, img_guide
