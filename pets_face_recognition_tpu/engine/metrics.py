"""Verification / retrieval metrics for the feature extractors.

Definition parity with the reference ``Controller._evaluate`` / ``test_epoch_end``
(``/root/reference/engine/controller.py:95-211``):

- scores are pair similarities (config ``similarity_f``, production
  ``(cosine + 1) / 2``), labels 1 = same identity;
- ``opt_thr`` = ROC threshold minimizing ``fpr + (1 - tpr)``;
- ``Accuracy`` = fraction of pairs classified correctly at that threshold with the
  decision rule ``score > thr`` (``controller.py:205-211``);
- ``Recall@K`` (the README's candR@K) is leave-one-out retrieval: numerator counts
  samples whose top-K most-similar *other* samples contain the true identity,
  denominator counts samples whose identity appears at all among the others
  (``controller.py:143-160``);
- ``TAR@FAR`` picks the threshold at the FAR-quantile of negative scores
  (``controller.py:162-173``).

TPU-first: the reference computes Recall@K with an O(N²) eager CPU loop; here it is
one ``(N, D) × (D, N)`` matmul + ``lax.top_k`` on device.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from sklearn.metrics import average_precision_score, roc_auc_score, roc_curve


def cosine_pair_scores(emb: jnp.ndarray, pairs: np.ndarray) -> jnp.ndarray:
    """Similarity of ``pairs (P, 2)`` index pairs: ``(cos + 1) / 2``.

    Production ``similarity_f`` (``generate_tsv_to_reproduce1.py:63-67``,
    ``configs/cat_fe/cat_fe_head.py``).
    """
    e = emb / jnp.maximum(jnp.linalg.norm(emb, axis=-1, keepdims=True), 1e-12)
    a = e[pairs[:, 0]]
    b = e[pairs[:, 1]]
    return (jnp.sum(a * b, axis=-1) + 1.0) / 2.0


def verification_metrics(
    scores: np.ndarray,
    labels: np.ndarray,
    thrs: tuple[float, ...] = (),
    far_thrs: tuple[float, ...] = (),
    frr_thrs: tuple[float, ...] = (),
) -> dict[str, float]:
    """Pairwise verification metric suite (host-side numpy; N pairs is small)."""
    scores = np.asarray(scores, np.float64)
    labels = np.asarray(labels).astype(np.int64)
    out: dict[str, float] = {}

    out["ROC AUC"] = float(roc_auc_score(labels, scores))
    out["AveragePrecision"] = float(average_precision_score(labels, scores))

    fpr, tpr, thresholds = roc_curve(labels, scores)
    fnr = 1.0 - tpr
    opt_idx = int(np.argmin(fpr + fnr))
    opt_thr = float(thresholds[opt_idx])
    out["Opt thr"] = opt_thr

    gen = scores[labels == 1]
    imp = scores[labels == 0]
    n_true = int((gen > opt_thr).sum()) + int((imp <= opt_thr).sum())
    out["Accuracy"] = n_true / (len(gen) + len(imp))

    for thr in thrs:
        pred = scores > thr
        tp = int((pred & (labels == 1)).sum())
        fp = int((pred & (labels == 0)).sum())
        fn = int((~pred & (labels == 1)).sum())
        tn = int((~pred & (labels == 0)).sum())
        out[f"Accuracy thr={thr}"] = (tp + tn) / len(scores)
        out[f"Precision thr={thr}"] = tp / max(tp + fp, 1)
        out[f"Recall thr={thr}"] = tp / max(tp + fn, 1)

    # TAR@FAR / TRR@FRR: thresholds at score quantiles (controller.py:162-180).
    neg_sorted = np.sort(imp)
    pos_sorted = np.sort(gen)
    for far in far_thrs:
        k = int(len(neg_sorted) * far)
        if k == 0:
            continue
        thr = neg_sorted[-k]
        if thr in (0.0, 1.0):
            continue
        tar = int((gen >= thr).sum()) / max(len(gen), 1)
        out[f"TAR@FAR={far}"] = tar
        out[f"TH@FAR={far}"] = float(thr)
    for frr in frr_thrs:
        thr = pos_sorted[int(len(pos_sorted) * frr)]
        if thr in (0.0, 1.0):
            continue
        trr = int((imp < thr).sum()) / max(len(imp), 1)
        out[f"TRR@FRR={frr}"] = trr
        out[f"TH@FRR={frr}"] = float(thr)
    return out


def recall_at_k(
    emb: jnp.ndarray,
    classes: jnp.ndarray,
    ks: tuple[int, ...],
) -> dict[str, float]:
    """Leave-one-out Recall@K via one similarity matmul + top-k (device-side).

    Matches ``controller.py:143-160``: numerator = #samples with a same-class hit in
    the top-K others; denominator = #samples whose class occurs among the others.
    """
    if not ks:
        return {}
    n = emb.shape[0]
    max_k = min(max(ks), n - 1)

    @jax.jit
    def _topk_classes(e, c):
        e = e / jnp.maximum(jnp.linalg.norm(e, axis=-1, keepdims=True), 1e-12)
        sim = jnp.dot(e, e.T, preferred_element_type=jnp.float32)
        sim = sim - 2.0 * jnp.eye(n, dtype=sim.dtype)  # exclude self
        _, idx = jax.lax.top_k(sim, max_k)
        same = c[idx] == c[:, None]  # (N, max_k)
        # denominator: does the class appear among the other samples at all?
        counts = jnp.sum(c[None, :] == c[:, None], axis=1) - 1
        return same, counts > 0

    same, has_other = _topk_classes(
        jnp.asarray(emb, jnp.float32), jnp.asarray(classes)
    )
    same = np.asarray(same)
    has_other = np.asarray(has_other)
    denom = int(has_other.sum())
    out = {}
    for k in ks:
        kk = min(k, max_k)
        hits = int((same[:, :kk].any(axis=1) & has_other).sum())
        out[f"Recall@K={k}"] = hits / max(denom, 1)
    return out
