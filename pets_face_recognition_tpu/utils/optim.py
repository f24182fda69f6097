"""Optimizer factories: param-group SGD + MultiStep schedule.

The reference FE configs build a 3-group torch SGD — backbone at ``lr/2``, the
embedding ``fc`` at ``lr``, the margin head at ``lr`` with weight decay 1e-4 —
stepped by ``MultiStepLR`` (``configs/cat_fe/cat_fe_head.py:111-124``). This module
expresses the same as an optax ``multi_transform`` keyed on the param path, with a
piecewise-constant schedule in *epochs* converted to steps.
"""

from __future__ import annotations

from typing import Sequence

import jax
import optax


def multistep_schedule(base_lr: float, milestones_steps: Sequence[int],
                       gamma: float = 0.1) -> optax.Schedule:
    """torch MultiStepLR: multiply by gamma at each milestone (in steps)."""
    boundaries = {int(m): gamma for m in milestones_steps}
    return optax.piecewise_constant_schedule(base_lr, boundaries)


def _label_fn(params):
    """Classify each param: margin head / embedding fc / backbone."""

    def label(path):
        keys = [getattr(p, "key", "") for p in path]
        if "add_margin" in keys:
            return "margin"
        if "fc" in keys and "backbone" not in keys:
            return "fc"
        return "backbone"

    return jax.tree_util.tree_map_with_path(lambda p, _: label(p), params)


def fe_sgd_optimizer(
    lr: float = 1e-2,
    momentum: float = 0.9,
    margin_weight_decay: float = 1e-4,
    milestones_steps: Sequence[int] = (),
    gamma: float = 0.1,
) -> optax.GradientTransformation:
    """The reference FE SGD recipe (backbone lr/2, fc lr, margin lr + wd)."""

    def sgd(base):
        sched = multistep_schedule(base, milestones_steps, gamma)
        return optax.sgd(sched, momentum=momentum)

    def sgd_wd(base):
        sched = multistep_schedule(base, milestones_steps, gamma)
        return optax.chain(
            optax.add_decayed_weights(margin_weight_decay),
            optax.sgd(sched, momentum=momentum),
        )

    return optax.multi_transform(
        {"backbone": sgd(lr / 2), "fc": sgd(lr), "margin": sgd_wd(lr)},
        _label_fn,
    )


def fe_adamw_optimizer(
    lr: float = 1e-4,
    weight_decay: float = 1e-4,
    milestones_steps: Sequence[int] = (),
    gamma: float = 0.1,
) -> optax.GradientTransformation:
    """The reference's AdamW FE variant (``configs/*/simple_fe_*.py``)."""
    sched = multistep_schedule(lr, milestones_steps, gamma)
    return optax.adamw(sched, weight_decay=weight_decay)


def detection_sgd_optimizer(
    lr: float = 5e-3,
    momentum: float = 0.9,
    weight_decay: float = 1e-4,
    milestones_steps: Sequence[int] = (),
    gamma: float = 0.1,
) -> optax.GradientTransformation:
    """Plain SGD for the R-CNN configs."""
    sched = multistep_schedule(lr, milestones_steps, gamma)
    return optax.chain(
        optax.add_decayed_weights(weight_decay),
        optax.sgd(sched, momentum=momentum),
    )


def wrap_gradient_transform(
    tx: optax.GradientTransformation,
    gradient_clip_val: float | None = None,
    accumulate_grad_batches: int = 1,
) -> optax.GradientTransformation:
    """PL-parity training knobs applied around a config's optimizer
    (reference ``Trainer(gradient_clip_val=..., accumulate_grad_batches=...)``,
    stock args re-declared by the fork at ``engine/trainer.py:64-120``):
    global-norm clipping before the update, gradient accumulation via
    ``optax.MultiSteps`` (the inner update applies every k-th step)."""
    if gradient_clip_val:
        tx = optax.chain(
            optax.clip_by_global_norm(float(gradient_clip_val)), tx
        )
    if accumulate_grad_batches and int(accumulate_grad_batches) > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=int(accumulate_grad_batches))
    return tx
