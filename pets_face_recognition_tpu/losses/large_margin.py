"""Large-margin softmax heads: ArcFace and CosFace.

Math parity with the reference (``/root/reference/losses/large_margin.py``):

- ``ArcMarginProduct`` (ArcFace, lines 44-84): ``cos θ`` from normalized features ×
  normalized weights; ``phi = cos θ cos m − sin θ sin m`` (= cos(θ + m)); easy-margin
  keeps ``phi`` only where ``cos θ > 0``, hard margin falls back to
  ``cos θ − m·sin(m)`` where ``cos θ <= cos(π − m)`` (the monotonicity fix); one-hot
  blend; scale ``s``.
- ``AddMarginProduct`` (CosFace, lines 10-40): ``phi = cos θ − m``, scaled.

Implemented as flax modules holding one ``(num_classes, in_features)`` weight,
initialized Xavier-uniform like torch's default for these heads.
"""

from __future__ import annotations

import math
from typing import Any

import flax.linen as nn
import jax.numpy as jnp


def _cosine_logits(features: jnp.ndarray, weight: jnp.ndarray) -> jnp.ndarray:
    """cos θ between l2-normalized features (B, D) and class weights (C, D)."""
    f = features / jnp.maximum(
        jnp.linalg.norm(features, axis=-1, keepdims=True), 1e-12
    )
    w = weight / jnp.maximum(jnp.linalg.norm(weight, axis=-1, keepdims=True), 1e-12)
    return jnp.dot(f, w.T, preferred_element_type=jnp.float32)


class ArcMarginProduct(nn.Module):
    """ArcFace margin head (additive *angular* margin)."""

    in_features: int
    out_features: int
    s: float = 30.0
    m: float = 0.50
    easy_margin: bool = False

    @nn.compact
    def __call__(self, features: jnp.ndarray, labels: jnp.ndarray | None = None):
        weight = self.param(
            "weight",
            nn.initializers.xavier_uniform(),
            (self.out_features, self.in_features),
            jnp.float32,
        )
        cosine = _cosine_logits(features.astype(jnp.float32), weight)
        if labels is None:
            return cosine * self.s

        sine = jnp.sqrt(jnp.clip(1.0 - cosine**2, 0.0, 1.0))
        cos_m = math.cos(self.m)
        sin_m = math.sin(self.m)
        phi = cosine * cos_m - sine * sin_m  # cos(θ + m)
        if self.easy_margin:
            phi = jnp.where(cosine > 0, phi, cosine)
        else:
            th = math.cos(math.pi - self.m)
            mm = math.sin(math.pi - self.m) * self.m
            phi = jnp.where(cosine > th, phi, cosine - mm)

        one_hot = jnp.zeros_like(cosine).at[
            jnp.arange(features.shape[0]), labels
        ].set(1.0)
        return (one_hot * phi + (1.0 - one_hot) * cosine) * self.s


class AddMarginProduct(nn.Module):
    """CosFace margin head (additive *cosine* margin)."""

    in_features: int
    out_features: int
    s: float = 30.0
    m: float = 0.40

    @nn.compact
    def __call__(self, features: jnp.ndarray, labels: jnp.ndarray | None = None):
        weight = self.param(
            "weight",
            nn.initializers.xavier_uniform(),
            (self.out_features, self.in_features),
            jnp.float32,
        )
        cosine = _cosine_logits(features.astype(jnp.float32), weight)
        if labels is None:
            return cosine * self.s
        phi = cosine - self.m
        one_hot = jnp.zeros_like(cosine).at[
            jnp.arange(features.shape[0]), labels
        ].set(1.0)
        return (one_hot * phi + (1.0 - one_hot) * cosine) * self.s
