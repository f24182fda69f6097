"""Metric-learning task wrappers + loss zoo.

Parity target: reference ``SoftmaxBasedMetricLearning``
(``/root/reference/losses/__init__.py:37-46``): wraps a backbone so that
``forward(x)`` returns embeddings (eval) and ``forward(x, labels)`` returns
``{'loss', 'emb', 'logits'}`` (train), with a selectable Arc/Add margin head and
focal-vs-CE loss.
"""

from __future__ import annotations

from typing import Any, Literal

import flax.linen as nn
import jax.numpy as jnp

from .large_margin import AddMarginProduct, ArcMarginProduct
from .losses import (
    FocalLoss,
    binary_focal_sigmoid,
    cross_entropy,
    focal_loss,
    optax_sigmoid_ce,
    smooth_l1,
)

__all__ = [
    "ArcMarginProduct",
    "AddMarginProduct",
    "FocalLoss",
    "focal_loss",
    "cross_entropy",
    "binary_focal_sigmoid",
    "optax_sigmoid_ce",
    "smooth_l1",
    "SoftmaxBasedMetricLearning",
    "SumDetectionLoss",
    "DummyWrapper",
]


class SoftmaxBasedMetricLearning(nn.Module):
    """Backbone + large-margin head + (focal | CE) loss.

    ``__call__(x)``              → ``(B, emb_dim)`` embeddings.
    ``__call__(x, labels)``      → dict with ``loss`` (scalar), ``emb``, ``logits``.

    ``margin_type``: 'arc' (ArcFace) or 'add' (CosFace) — the reference selects this
    per config (``losses/__init__.py:20-35``).
    """

    model: nn.Module
    emb_size: int = 512
    num_classes: int = 1000
    margin_type: Literal["arc", "add"] = "arc"
    # reference wrapper defaults (ref ``losses/__init__.py:13-16``): s=64.0;
    # and its FocalLoss defaults to gamma=0 (ref ``losses/losses.py:8``) with
    # no config overriding it — the production "focal" loss is plain CE
    s: float = 64.0
    m: float = 0.5
    easy_margin: bool = False
    use_focal: bool = True
    focal_gamma: float = 0.0

    @nn.compact
    def __call__(self, x, labels: jnp.ndarray | None = None, train: bool = False,
                 weights: jnp.ndarray | None = None):
        emb = self.model(x, train=train)
        if labels is None:
            return emb
        if self.margin_type == "arc":
            head = ArcMarginProduct(
                self.emb_size, self.num_classes, s=self.s, m=self.m,
                easy_margin=self.easy_margin, name="add_margin",
            )
        else:
            head = AddMarginProduct(
                self.emb_size, self.num_classes, s=self.s, m=self.m,
                name="add_margin",
            )
        logits = head(emb, labels)
        if self.use_focal:
            loss = focal_loss(logits, labels, gamma=self.focal_gamma,
                              weights=weights)
        else:
            loss = cross_entropy(logits, labels, weights=weights)
        return {"loss": loss, "emb": emb, "logits": logits}


class SumDetectionLoss(nn.Module):
    """R-CNN loss wrapper: train returns ``{'loss': sum(dict), **dict}``, eval
    passes detections through.

    Parity with the per-config detection loss classes that sum the torchvision loss
    dict (``configs/mask/mask_rcnn_config.py:82-97``).
    """

    model: nn.Module

    @nn.compact
    def __call__(self, images, targets=None, train: bool = False):
        out = self.model(images, targets, train=train)
        if train:
            total = sum(out.values())
            return {"loss": total, **out}
        return out


class DummyWrapper(nn.Module):
    """Pass-through wrapper (reference ``losses/__init__.py:49-55``)."""

    model: nn.Module

    @nn.compact
    def __call__(self, x, labels: Any = None, train: bool = False, **_):
        return self.model(x, train=train)
