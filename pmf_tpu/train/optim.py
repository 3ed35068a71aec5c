"""Optimizer construction.

Parity: tasks/pmf/trainer.py:80-98 — the PMF hybrid optimizer:
  * AdamW on the lidar stream (torch defaults: betas 0.9/0.999,
    eps 1e-8, weight_decay 0.01);
  * SGD with Nesterov momentum + coupled L2 weight decay on the two
    camera streams.
Expressed as one optax.multi_transform keyed on the top-level parameter
collection name, so a single update call drives both streams (the
reference stepped two optimizers; here both live in one opt_state that
checkpoints and restores atomically).
"""
from __future__ import annotations

from typing import Callable

import optax


def adamw(lr_schedule, amsgrad: bool = False) -> optax.GradientTransformation:
    if amsgrad:
        return adamw_amsgrad(lr_schedule)
    return optax.adamw(lr_schedule, b1=0.9, b2=0.999, eps=1e-8,
                       weight_decay=0.01)


def sgd_nesterov(lr_schedule, momentum: float, weight_decay: float
                 ) -> optax.GradientTransformation:
    """torch SGD semantics: grad += wd·param, then Nesterov momentum."""
    return optax.chain(
        optax.add_decayed_weights(weight_decay),
        optax.sgd(lr_schedule, momentum=momentum, nesterov=True),
    )


def hybrid_pmf_optimizer(lr_schedule, momentum: float, weight_decay: float,
                         camera_keys=("camera_stream_encoder",
                                      "camera_stream_decoder"),
                         lidar_keys=("lidar_stream",),
                         amsgrad: bool = False,
                         ) -> optax.GradientTransformation:
    """AdamW(lidar) + SGD-Nesterov(camera), routed by top-level param key.

    Any other top-level key (e.g. multi-task sigma) goes to AdamW like the
    reference's aux params (tasks/epmf/trainer.py:47-49 wrapped them in
    the Adam group).
    """
    def label_fn(params):
        def label_of(k):
            if k in camera_keys:
                return "sgd"
            return "adamw"

        return {k: label_of(k) for k in params.keys()}

    return optax.multi_transform(
        {"adamw": adamw(lr_schedule, amsgrad=amsgrad),
         "sgd": sgd_nesterov(lr_schedule, momentum, weight_decay)},
        label_fn)


def adamw_amsgrad(lr_schedule) -> optax.GradientTransformation:
    """AdamW(amsgrad=True) used by the SensatUrban task
    (tasks/sensat_urban/pmf/trainer.py:84)."""
    return optax.chain(
        optax.scale_by_amsgrad(),
        optax.add_decayed_weights(0.01),
        optax.scale_by_learning_rate(lr_schedule),
    )
