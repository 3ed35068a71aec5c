"""Jitted train / eval steps for the fusion models.

Parity: tasks/pmf/trainer.py run() (:254-433):
  loss = focal(lidar) + λ·lovász(lidar) + focal(cam) + λ·lovász(cam)
       + γ·perception_aware(lidar, cam)
with per-pixel label_mask = label > 0 on the focal terms, per-iteration
LR schedule, and per-batch confusion-matrix metrics for both streams.

TPU-native: one jit compiles forward+losses+backward+update+metrics into
a single XLA program over the *global* sharded batch — gradient
all-reduce, SyncBN statistics and metric reduction are all emitted by
XLA onto ICI. The two reference optimizers become one multi_transform
update.
"""
from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp

from ..losses import (
    explog_dice_loss, focal_softmax_loss, lovasz_softmax_loss,
    lovasz_softmax_loss_points, lovasz_softmax_loss_points_pair,
    perception_aware_loss, perception_aware_losses, multi_task_loss,
    normalized_entropy,
)
from ..metrics.iou import confusion_matrix
from ..ops.reduce import argmax_last
from .state import TrainState


@dataclass(frozen=True)
class LossConfig:
    nclasses: int = 20
    alpha: tuple = ()          # per-class focal alpha
    gamma_focal: float = 2.0
    lambda_: float = 1.0       # lovász weight
    gamma: float = 0.5         # perception-aware weight
    tau: float = 0.7           # confidence gate
    lovasz_ignore: int = 0
    use_mtloss: bool = False   # EPMF learned uncertainty weighting
    use_dice: bool = False     # SensatUrban adds ExpLogDice to focal
                               # (tasks/sensat_urban/pmf/trainer.py:205-215)


def pmf_losses(lidar_pred, camera_pred, label, cfg: LossConfig,
               mt_sigma=None, points=None):
    """Full PMF/EPMF loss composition; returns (total, aux dict).

    With cfg.use_mtloss the six terms are weighted by the learned
    uncertainty sigma (tasks/epmf/trainer.py:408-431, order
    [foc_img, lov_img, per_img, per_pcd, foc, lov]); otherwise the plain
    weighted sum (tasks/pmf/trainer.py:330-332).

    points: optional (pt_pix, pt_label, pt_won) [B, N] arrays from the
    rasterizer (build_batch return_points=True) — switches Lovász to the
    exact point-domain formulation (losses/lovasz.py), whose sort runs
    over the winner points instead of all pixels (~10× cheaper at the
    flagship train config).
    """
    alpha = jnp.asarray(cfg.alpha, jnp.float32)
    label_mask = label > 0

    if points is not None:
        # both streams share masks/fg/pixel keys — fuse the two Lovász
        # computations into one stacked sort + one 2C-channel raster
        pt_pix, pt_label, pt_won = points
        loss_lov, loss_lov_cam = lovasz_softmax_loss_points_pair(
            lidar_pred, camera_pred, label, pt_pix, pt_label, pt_won,
            ignore=cfg.lovasz_ignore)
    else:
        lovasz = functools.partial(lovasz_softmax_loss, labels=label,
                                   ignore=cfg.lovasz_ignore)
        loss_lov = lovasz(lidar_pred)
        loss_lov_cam = lovasz(camera_pred)

    loss_foc = focal_softmax_loss(lidar_pred, label, alpha,
                                  gamma=cfg.gamma_focal, mask=label_mask)
    loss_foc_cam = focal_softmax_loss(camera_pred, label, alpha,
                                      gamma=cfg.gamma_focal, mask=label_mask)
    if cfg.use_dice:
        loss_foc = loss_foc + explog_dice_loss(lidar_pred, label, label_mask)
        loss_foc_cam = loss_foc_cam + explog_dice_loss(camera_pred, label,
                                                       label_mask)
    loss_per_pcd, loss_per_img, _, _ = perception_aware_losses(
        lidar_pred, camera_pred, cfg.tau)
    loss_per = loss_per_pcd + loss_per_img

    if cfg.use_mtloss:
        assert mt_sigma is not None, "use_mtloss requires mt_sigma params"
        total = multi_task_loss(mt_sigma, [
            loss_foc_cam, loss_lov_cam, loss_per_img, loss_per_pcd,
            loss_foc, loss_lov])
    else:
        total = (loss_foc + loss_lov * cfg.lambda_ +
                 loss_foc_cam + loss_lov_cam * cfg.lambda_ +
                 loss_per * cfg.gamma)

    lidar_log = jnp.log(jnp.clip(lidar_pred, 1e-8))
    cam_log = jnp.log(jnp.clip(camera_pred, 1e-8))
    aux = {
        "loss": total,
        "loss_focal": loss_foc,
        "loss_lovasz": loss_lov,
        "loss_focal_cam": loss_foc_cam,
        "loss_lovasz_cam": loss_lov_cam,
        "loss_perception": loss_per,
        "entropy": normalized_entropy(lidar_pred, lidar_log).mean(),
        "entropy_cam": normalized_entropy(camera_pred, cam_log).mean(),
    }
    return total, aux


def make_pmf_train_step(model, tx, cfg: LossConfig, donate: bool = True,
                        remat: bool = False):
    """Build the jitted fused train step.

    step(state, feature [B,H,W,8], label [B,H,W], key) →
      (new_state, metrics) where metrics holds scalar losses and the
      [C,C] confusion matrices of both streams.

    donate=True donates the input TrainState buffers (params + optimizer
    moments + batch_stats — hundreds of MB at ResNet34 f32) so XLA
    updates them in place instead of double-buffering every step; the
    caller must not reuse the state it passed in (the trainer's
    `self.state, _ = step(self.state, ...)` pattern is safe).

    remat=True wraps the forward in jax.checkpoint: the backward
    recomputes activations instead of keeping them live — trades ~1/3
    extra forward FLOPs for a much smaller live set (the default-effort
    backward holds 15.7 GB of temps at the flagship shape, deep in
    spill territory).
    """

    def apply_fn(model_params, batch_stats, pcd, img, key):
        return model.apply(
            {"params": model_params, "batch_stats": batch_stats},
            pcd, img, train=True,
            rngs={"dropout": key}, mutable=["batch_stats"])

    if remat:
        apply_fn = jax.checkpoint(apply_fn)

    @functools.partial(jax.jit, donate_argnums=(0,) if donate else ())
    def train_step(state: TrainState, feature, label, key, points=None):
        pcd = feature[..., 0:5]
        img = feature[..., 5:8]

        def loss_fn(params):
            mt_sigma = params.get("mt_sigma") if isinstance(params, dict) else None
            model_params = {k: v for k, v in params.items() if k != "mt_sigma"} \
                if mt_sigma is not None else params
            (lidar_pred, camera_pred), mutated = apply_fn(
                model_params, state.batch_stats, pcd, img, key)
            total, aux = pmf_losses(lidar_pred, camera_pred, label, cfg,
                                    mt_sigma, points)
            return total, (mutated["batch_stats"], aux, lidar_pred, camera_pred)

        grads, (new_bs, aux, lidar_pred, camera_pred) = jax.grad(
            loss_fn, has_aux=True)(state.params)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = jax.tree_util.tree_map(
            lambda p, u: p + u, state.params, updates)
        new_state = state.replace(step=state.step + 1, params=new_params,
                                  batch_stats=new_bs, opt_state=new_opt)

        aux["conf"] = confusion_matrix(
            argmax_last(lidar_pred), label, cfg.nclasses)
        aux["conf_cam"] = confusion_matrix(
            argmax_last(camera_pred), label, cfg.nclasses)
        return new_state, aux

    return train_step


def make_pmf_eval_step(model, cfg: LossConfig):
    @jax.jit
    def eval_step(state: TrainState, feature, label, sample_valid=None,
                  points=None):
        pcd = feature[..., 0:5]
        img = feature[..., 5:8]
        params = state.params
        mt_sigma = params.get("mt_sigma") if isinstance(params, dict) else None
        if mt_sigma is not None:
            params = {k: v for k, v in params.items() if k != "mt_sigma"}
        lidar_pred, camera_pred = model.apply(
            {"params": params, "batch_stats": state.batch_stats},
            pcd, img, train=False)
        _, aux = pmf_losses(lidar_pred, camera_pred, label, cfg, mt_sigma,
                            points)
        valid = None
        if sample_valid is not None:
            # final val batches are padded to a full batch (loader); mask
            # padded samples out of the metrics
            valid = jnp.broadcast_to(sample_valid[:, None, None], label.shape)
        aux["conf"] = confusion_matrix(
            argmax_last(lidar_pred), label, cfg.nclasses, valid)
        aux["conf_cam"] = confusion_matrix(
            argmax_last(camera_pred), label, cfg.nclasses, valid)
        return aux, lidar_pred

    return eval_step


def salsanext_losses(pred, label, cfg: LossConfig):
    """LiDAR-only composition (tasks/salsanext/trainer.py:203-213):
    focal + λ·lovász."""
    alpha = jnp.asarray(cfg.alpha, jnp.float32)
    label_mask = label > 0
    loss_foc = focal_softmax_loss(pred, label, alpha, gamma=cfg.gamma_focal,
                                  mask=label_mask)
    loss_lov = lovasz_softmax_loss(pred, label, ignore=cfg.lovasz_ignore)
    total = loss_foc + cfg.lambda_ * loss_lov
    return total, {"loss": total, "loss_focal": loss_foc,
                   "loss_lovasz": loss_lov}


def make_salsanext_train_step(model, tx, cfg: LossConfig,
                              donate: bool = True):
    @functools.partial(jax.jit, donate_argnums=(0,) if donate else ())
    def train_step(state: TrainState, feature, label, key):
        def loss_fn(params):
            pred, mutated = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                feature, train=True,
                rngs={"dropout": key}, mutable=["batch_stats"])
            total, aux = salsanext_losses(pred, label, cfg)
            return total, (mutated["batch_stats"], aux, pred)

        grads, (new_bs, aux, pred) = jax.grad(loss_fn, has_aux=True)(state.params)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = jax.tree_util.tree_map(
            lambda p, u: p + u, state.params, updates)
        new_state = state.replace(step=state.step + 1, params=new_params,
                                  batch_stats=new_bs, opt_state=new_opt)
        aux["conf"] = confusion_matrix(argmax_last(pred), label, cfg.nclasses)
        return new_state, aux

    return train_step


def make_salsanext_eval_step(model, cfg: LossConfig):
    @jax.jit
    def eval_step(state: TrainState, feature, label, sample_valid=None):
        pred = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            feature, train=False)
        _, aux = salsanext_losses(pred, label, cfg)
        valid = None
        if sample_valid is not None:
            valid = jnp.broadcast_to(sample_valid[:, None, None], label.shape)
        aux["conf"] = confusion_matrix(argmax_last(pred), label,
                                       cfg.nclasses, valid)
        return aux, pred

    return eval_step
