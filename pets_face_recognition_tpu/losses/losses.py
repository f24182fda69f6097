"""Classification losses.

Parity target: reference ``FocalLoss`` (``/root/reference/losses/losses.py:7-28``):
``(1 - p)^gamma * CE`` with optional learnable per-class alpha. Implemented
functionally (and as a flax module for the learnable-alpha variant).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp


def cross_entropy(logits: jnp.ndarray, labels: jnp.ndarray,
                  weights: jnp.ndarray | None = None) -> jnp.ndarray:
    """Mean softmax cross entropy over the batch. ``weights`` masks/reweights rows."""
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, labels[:, None], axis=-1)[:, 0]
    if weights is not None:
        return jnp.sum(nll * weights) / jnp.maximum(jnp.sum(weights), 1e-8)
    return nll.mean()


def focal_loss(logits: jnp.ndarray, labels: jnp.ndarray, gamma: float = 0.0,
               alpha: jnp.ndarray | None = None,
               weights: jnp.ndarray | None = None) -> jnp.ndarray:
    """Focal loss: ``(1 - p_t)^gamma * (-log p_t)``, optional learnable
    per-class alpha.

    Matches the reference formulation exactly (``losses/losses.py:22-28``):
    ``gamma`` defaults to 0 (the production configs never override it, so the
    reference's "focal" is plain CE), and ``alpha`` SCALES THE LOGITS before
    the cross entropy (``input = self.alpha * input``, ref ``:24``) — it is a
    per-class logit temperature, not a loss weight. Oracle-pinned against the
    reference torch module in ``tests/test_losses_reference_parity.py``.
    """
    logits = logits.astype(jnp.float32)
    if alpha is not None:
        logits = logits * alpha[None, :]
    logp = jax.nn.log_softmax(logits, axis=-1)
    logp_t = jnp.take_along_axis(logp, labels[:, None], axis=-1)[:, 0]
    p_t = jnp.exp(logp_t)
    loss = -((1.0 - p_t) ** gamma) * logp_t
    if weights is not None:
        return jnp.sum(loss * weights) / jnp.maximum(jnp.sum(weights), 1e-8)
    return loss.mean()


class FocalLoss(nn.Module):
    """Module form with optionally learnable per-class alpha (reference
    ``losses/losses.py:7-20`` makes alpha an ``nn.Parameter``, init ones,
    when requested; it multiplies the logits before CE)."""

    gamma: float = 0.0
    num_classes: int = 0
    learnable_alpha: bool = False

    @nn.compact
    def __call__(self, logits, labels, weights=None):
        alpha = None
        if self.learnable_alpha:
            assert self.num_classes > 0
            alpha = self.param(
                "alpha", nn.initializers.ones, (self.num_classes,), jnp.float32
            )
        return focal_loss(logits, labels, self.gamma, alpha, weights)


def binary_focal_sigmoid(logits: jnp.ndarray, targets: jnp.ndarray,
                         gamma: float = 2.0, alpha: float = 0.25) -> jnp.ndarray:
    """Element-wise sigmoid focal loss (RetinaNet form) — used by detection heads."""
    p = jax.nn.sigmoid(logits)
    ce = optax_sigmoid_ce(logits, targets)
    p_t = p * targets + (1 - p) * (1 - targets)
    a_t = alpha * targets + (1 - alpha) * (1 - targets)
    return a_t * ((1 - p_t) ** gamma) * ce


def optax_sigmoid_ce(logits, targets):
    """Numerically-stable sigmoid BCE (log1p formulation)."""
    return jnp.maximum(logits, 0) - logits * targets + jnp.log1p(
        jnp.exp(-jnp.abs(logits))
    )


def smooth_l1(pred: jnp.ndarray, target: jnp.ndarray, beta: float = 1.0 / 9.0):
    """Smooth-L1 (Huber) — torchvision RPN/box-head regression loss."""
    diff = jnp.abs(pred - target)
    return jnp.where(diff < beta, 0.5 * diff**2 / beta, diff - 0.5 * beta)
