"""Differential parity: our margin/focal losses vs the REAL reference code.

`/root/reference/losses/large_margin.py` and `losses/losses.py` are pure
torch (CPU torch is in this image), so every loss is pinned against the
actual reference module with shared weights — stronger than the formula-level
checks in ``test_losses.py``. This caught two production drifts when first
written: ``SoftmaxBasedMetricLearning``'s scale is s=64 (not the margin
heads' s=30 default), and the reference "focal" loss is gamma=0 (plain CE)
with learnable alpha acting as a per-class LOGIT scale, not a loss weight.
"""

import importlib.util
import math
import sys
from pathlib import Path

import jax.numpy as jnp
import numpy as np
import pytest
import torch

from pets_face_recognition_tpu.losses import (
    AddMarginProduct,
    ArcMarginProduct,
    FocalLoss,
    focal_loss,
)

REF_LOSSES = Path("/root/reference/losses")

pytestmark = pytest.mark.skipif(
    not REF_LOSSES.exists(), reason="reference losses not present"
)


def _load(name):
    spec = importlib.util.spec_from_file_location(
        f"ref_losses_{name}", REF_LOSSES / f"{name}.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _rand(shape, seed, scale=1.0):
    return (np.random.RandomState(seed).randn(*shape) * scale).astype(np.float32)


@pytest.mark.parametrize("easy_margin", [False, True])
@pytest.mark.parametrize("s,m", [(64.0, 0.5), (30.0, 0.35)])
def test_arc_margin_matches_reference(easy_margin, s, m):
    ref = _load("large_margin")
    B, D, C = 16, 64, 10
    feats = _rand((B, D), 0, 2.0)
    weight = _rand((C, D), 1)
    labels = np.random.RandomState(2).randint(0, C, B)

    head = ref.ArcMarginProduct(D, C, s=s, m=m, easy_margin=easy_margin)
    with torch.no_grad():
        head.weight.copy_(torch.from_numpy(weight))
        ref_out = head(torch.from_numpy(feats), torch.from_numpy(labels)).numpy()

    ours = ArcMarginProduct(D, C, s=s, m=m, easy_margin=easy_margin).apply(
        {"params": {"weight": jnp.asarray(weight)}},
        jnp.asarray(feats), jnp.asarray(labels),
    )
    np.testing.assert_allclose(np.asarray(ours), ref_out, rtol=0, atol=2e-5)


@pytest.mark.parametrize("s,m", [(64.0, 0.5), (30.0, 0.4)])
def test_add_margin_matches_reference(s, m):
    ref = _load("large_margin")
    B, D, C = 16, 64, 10
    feats = _rand((B, D), 3, 2.0)
    weight = _rand((C, D), 4)
    labels = np.random.RandomState(5).randint(0, C, B)

    head = ref.AddMarginProduct(D, C, s=s, m=m)
    with torch.no_grad():
        head.weight.copy_(torch.from_numpy(weight))
        ref_out = head(torch.from_numpy(feats), torch.from_numpy(labels)).numpy()

    ours = AddMarginProduct(D, C, s=s, m=m).apply(
        {"params": {"weight": jnp.asarray(weight)}},
        jnp.asarray(feats), jnp.asarray(labels),
    )
    np.testing.assert_allclose(np.asarray(ours), ref_out, rtol=0, atol=2e-5)


@pytest.mark.parametrize("gamma", [0.0, 2.0])
def test_focal_loss_matches_reference(gamma):
    ref = _load("losses")
    B, C = 32, 12
    logits = _rand((B, C), 6, 5.0)
    labels = np.random.RandomState(7).randint(0, C, B)

    ref_loss = ref.FocalLoss(num_class=C, gamma=gamma)(
        torch.from_numpy(logits), torch.from_numpy(labels)
    ).item()
    ours = float(focal_loss(jnp.asarray(logits), jnp.asarray(labels), gamma=gamma))
    assert math.isclose(ref_loss, ours, rel_tol=1e-5), (ref_loss, ours)


def test_focal_loss_learnable_alpha_matches_reference():
    """alpha is a per-class LOGIT scale applied before CE (ref losses.py:24)."""
    ref = _load("losses")
    B, C = 32, 12
    logits = _rand((B, C), 8, 5.0)
    labels = np.random.RandomState(9).randint(0, C, B)
    alpha = np.abs(_rand((C,), 10)) + 0.5

    ref_mod = ref.FocalLoss(num_class=C, gamma=2.0, alpha=True)
    with torch.no_grad():
        ref_mod.alpha.copy_(torch.from_numpy(alpha))
        ref_loss = ref_mod(torch.from_numpy(logits), torch.from_numpy(labels)).item()

    ours_fn = float(focal_loss(jnp.asarray(logits), jnp.asarray(labels),
                               gamma=2.0, alpha=jnp.asarray(alpha)))
    assert math.isclose(ref_loss, ours_fn, rel_tol=1e-5), (ref_loss, ours_fn)

    ours_mod = float(FocalLoss(gamma=2.0, num_classes=C, learnable_alpha=True).apply(
        {"params": {"alpha": jnp.asarray(alpha)}},
        jnp.asarray(logits), jnp.asarray(labels),
    ))
    assert math.isclose(ref_loss, ours_mod, rel_tol=1e-5), (ref_loss, ours_mod)


def test_metric_learning_wrapper_defaults_match_reference():
    """The production loss chain: embeddings → ArcMargin(s=64, m=0.5) →
    gamma=0 'focal' (== CE), composed exactly like the reference wrapper
    (ref ``losses/__init__.py:13-46``) with its defaults."""
    ref_lm = _load("large_margin")
    ref_l = _load("losses")
    B, D, C = 8, 32, 6
    emb = _rand((B, D), 11, 2.0)
    weight = _rand((C, D), 12)
    labels = np.random.RandomState(13).randint(0, C, B)

    head = ref_lm.ArcMarginProduct(D, C, s=64.0, m=0.5, easy_margin=False)
    with torch.no_grad():
        head.weight.copy_(torch.from_numpy(weight))
        logits_t = head(torch.from_numpy(emb), torch.from_numpy(labels))
        ref_loss = ref_l.FocalLoss(num_class=C)(  # gamma=0 default
            logits_t, torch.from_numpy(labels)
        ).item()

    from pets_face_recognition_tpu.losses import SoftmaxBasedMetricLearning
    import flax.linen as nn

    class _Identity(nn.Module):
        @nn.compact
        def __call__(self, x, train=False):
            return x

    wrapper = SoftmaxBasedMetricLearning(model=_Identity(), emb_size=D,
                                         num_classes=C)  # all defaults
    out = wrapper.apply(
        {"params": {"add_margin": {"weight": jnp.asarray(weight)}}},
        jnp.asarray(emb), jnp.asarray(labels),
    )
    assert math.isclose(float(out["loss"]), ref_loss, rel_tol=1e-5)
    np.testing.assert_allclose(np.asarray(out["emb"]), emb, atol=1e-6)
