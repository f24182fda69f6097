"""Verification metrics vs sklearn / naive loops (reference controller semantics)."""

import numpy as np
import jax.numpy as jnp
from sklearn.metrics import roc_auc_score

from pets_face_recognition_tpu.engine.metrics import (
    cosine_pair_scores,
    recall_at_k,
    verification_metrics,
)


def test_cosine_pair_scores(rng):
    emb = rng.randn(10, 8).astype(np.float32)
    pairs = np.array([[0, 1], [2, 3], [4, 4]])
    got = np.asarray(cosine_pair_scores(jnp.asarray(emb), pairs))
    for k, (i, j) in enumerate(pairs):
        cos = emb[i] @ emb[j] / (np.linalg.norm(emb[i]) * np.linalg.norm(emb[j]))
        np.testing.assert_allclose(got[k], (cos + 1) / 2, rtol=1e-5)
    assert abs(got[2] - 1.0) < 1e-5  # self-similarity


def test_verification_metrics_sane(rng):
    # well-separated scores -> near-perfect metrics
    pos = rng.uniform(0.7, 1.0, 200)
    neg = rng.uniform(0.0, 0.3, 200)
    scores = np.concatenate([pos, neg])
    labels = np.concatenate([np.ones(200), np.zeros(200)]).astype(int)
    m = verification_metrics(scores, labels, thrs=(0.5,), far_thrs=(0.1,))
    assert m["ROC AUC"] == 1.0
    # opt_thr lands exactly on the lowest positive score; the reference's strict
    # `score > thr` rule (controller.py:210) then misses that one sample.
    assert m["Accuracy"] >= 1.0 - 1.0 / 400
    assert m["Accuracy thr=0.5"] == 1.0
    assert m["TAR@FAR=0.1"] == 1.0
    assert 0.3 <= m["Opt thr"] <= 0.71  # lands on the boundary positive score


def test_verification_metrics_auroc_matches_sklearn(rng):
    scores = rng.uniform(0, 1, 500)
    labels = (rng.uniform(0, 1, 500) < scores).astype(int)  # correlated
    m = verification_metrics(scores, labels)
    np.testing.assert_allclose(m["ROC AUC"], roc_auc_score(labels, scores), rtol=1e-9)


def _naive_recall_at_k(emb, classes, ks):
    """Reference controller.py:143-160 leave-one-out loop, re-written naively."""
    n = len(emb)
    e = emb / np.linalg.norm(emb, axis=1, keepdims=True)
    out = {}
    for k in ks:
        num = den = 0
        for j in range(n):
            others = [i for i in range(n) if i != j]
            sims = e[others] @ e[j]
            order = np.argsort(-sims, kind="stable")
            ranked_classes = classes[np.asarray(others)][order]
            num += int((ranked_classes[:k] == classes[j]).any())
            den += int((ranked_classes == classes[j]).any())
        out[f"Recall@K={k}"] = num / den
    return out


def test_recall_at_k_matches_naive_loop(rng):
    emb = rng.randn(40, 16).astype(np.float32)
    classes = rng.randint(0, 8, 40)
    got = recall_at_k(jnp.asarray(emb), jnp.asarray(classes), (1, 5, 10))
    want = _naive_recall_at_k(emb, classes, (1, 5, 10))
    for k in want:
        np.testing.assert_allclose(got[k], want[k], atol=1e-9, err_msg=k)


def test_recall_at_k_perfect_clusters(rng):
    # two tight clusters -> Recall@1 = 1
    emb = np.concatenate(
        [rng.randn(5, 8) * 0.01 + 10, rng.randn(5, 8) * 0.01 - 10]
    ).astype(np.float32)
    classes = np.array([0] * 5 + [1] * 5)
    got = recall_at_k(jnp.asarray(emb), jnp.asarray(classes), (1,))
    assert got["Recall@K=1"] == 1.0
