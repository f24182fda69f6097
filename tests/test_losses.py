"""Margin heads + focal loss vs independent numpy math (reference formulas)."""

import math

import numpy as np
import jax
import jax.numpy as jnp

from pets_face_recognition_tpu.losses import (
    AddMarginProduct,
    ArcMarginProduct,
    cross_entropy,
    focal_loss,
    smooth_l1,
)


def _np_softmax(x):
    e = np.exp(x - x.max(-1, keepdims=True))
    return e / e.sum(-1, keepdims=True)


def _cosine(feats, w):
    f = feats / np.linalg.norm(feats, axis=-1, keepdims=True)
    ww = w / np.linalg.norm(w, axis=-1, keepdims=True)
    return f @ ww.T


def test_arcface_math(rng):
    B, D, C = 6, 16, 10
    feats = rng.randn(B, D).astype(np.float32)
    labels = rng.randint(0, C, B)
    head = ArcMarginProduct(D, C, s=30.0, m=0.5)
    variables = head.init(jax.random.PRNGKey(0), jnp.asarray(feats))
    w = np.asarray(variables["params"]["weight"])

    got = np.asarray(
        head.apply(variables, jnp.asarray(feats), jnp.asarray(labels))
    )

    cos = _cosine(feats, w)
    sin = np.sqrt(np.clip(1 - cos**2, 0, 1))
    phi = cos * math.cos(0.5) - sin * math.sin(0.5)
    th = math.cos(math.pi - 0.5)
    mm = math.sin(math.pi - 0.5) * 0.5
    phi = np.where(cos > th, phi, cos - mm)
    want = cos.copy()
    want[np.arange(B), labels] = phi[np.arange(B), labels]
    want *= 30.0
    np.testing.assert_allclose(got, want, atol=1e-4)

    # eval mode (no labels): plain scaled cosine
    got_eval = np.asarray(head.apply(variables, jnp.asarray(feats)))
    np.testing.assert_allclose(got_eval, cos * 30.0, atol=1e-4)


def test_cosface_math(rng):
    B, D, C = 5, 8, 7
    feats = rng.randn(B, D).astype(np.float32)
    labels = rng.randint(0, C, B)
    head = AddMarginProduct(D, C, s=30.0, m=0.4)
    variables = head.init(jax.random.PRNGKey(1), jnp.asarray(feats))
    w = np.asarray(variables["params"]["weight"])
    got = np.asarray(head.apply(variables, jnp.asarray(feats), jnp.asarray(labels)))
    cos = _cosine(feats, w)
    want = cos.copy()
    want[np.arange(B), labels] -= 0.4
    want *= 30.0
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_focal_equals_ce_at_gamma0(rng):
    logits = rng.randn(8, 5).astype(np.float32)
    labels = rng.randint(0, 5, 8)
    f = float(focal_loss(jnp.asarray(logits), jnp.asarray(labels), gamma=0.0))
    c = float(cross_entropy(jnp.asarray(logits), jnp.asarray(labels)))
    np.testing.assert_allclose(f, c, rtol=1e-5)


def test_focal_downweights_easy(rng):
    logits = rng.randn(8, 5).astype(np.float32)
    labels = rng.randint(0, 5, 8)
    p = _np_softmax(logits)
    pt = p[np.arange(8), labels]
    want = (-((1 - pt) ** 2) * np.log(pt)).mean()
    got = float(focal_loss(jnp.asarray(logits), jnp.asarray(labels), gamma=2.0))
    np.testing.assert_allclose(got, want, rtol=1e-4)
    assert got < float(cross_entropy(jnp.asarray(logits), jnp.asarray(labels)))


def test_smooth_l1():
    pred = jnp.asarray([0.0, 0.05, 1.0])
    tgt = jnp.asarray([0.0, 0.0, 0.0])
    beta = 1.0 / 9.0
    out = np.asarray(smooth_l1(pred, tgt, beta))
    np.testing.assert_allclose(out[0], 0.0, atol=1e-7)
    np.testing.assert_allclose(out[1], 0.5 * 0.05**2 / beta, rtol=1e-5)  # quadratic
    np.testing.assert_allclose(out[2], 1.0 - 0.5 * beta, rtol=1e-5)  # linear
