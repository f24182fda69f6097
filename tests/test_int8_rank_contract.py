"""int8 PTQ rank contract at the retrieval level (VERDICT r3 #1/#3).

The BASELINE contract is a rank-identical tsv; exact identity under
quantization cannot be guaranteed in the presence of near-ties, so the
shippable contract is: **int8 may only flip pairs whose float score gap is
below the measured int8 score drift** ("near-tie flips"). This test pins that
on the WORST case for PTQ — a random-init ResNet-50 embedder (trained nets
have more peaked activations, CLAUDE.md / models/quant.py) — over a hard-
corpus-style gallery of near-duplicate identities:

1. embed gallery+query crops float and int8 (models/ptq.py workflow);
2. score with the production mean-strategy centroid matmul
   (retrieval.pairwise_card_scores);
3. assert the global int8 score drift is small, and EVERY rank inversion
   between the float and int8 orderings is a near-tie under float scoring.

The end-to-end tsv-level drive on trained checkpoints + real TPU is
tools/rank_safety_drive.sh (results recorded in PERF.md).
"""

import jax
import jax.numpy as jnp
import numpy as np

from pets_face_recognition_tpu.models import ptq
from pets_face_recognition_tpu.models.embedder import resnet50_embedder
from pets_face_recognition_tpu.retrieval import pairwise_card_scores

SIZE = 112
N_GALLERY, N_QUERY, N_IMGS = 40, 8, 2


def _hard_crops(rng, n_cards, n_imgs):
    """Near-duplicate tinted crops (hard-corpus construction, small)."""
    centers = rng.uniform(0.2, 0.6, (6, 3))
    crops = np.zeros((n_cards, n_imgs, SIZE, SIZE, 3), np.float32)
    for c in range(n_cards):
        tint = np.clip(centers[rng.randint(6)] + rng.normal(0, 0.02, 3),
                       0, 1)
        for j in range(n_imgs):
            img = np.clip(
                tint + rng.normal(0, 0.03, 3) + rng.normal(
                    0, 0.05, (SIZE, SIZE, 3)), 0, 1)
            cx, cy = rng.randint(SIZE // 3, 2 * SIZE // 3, 2)
            d = rng.randint(12, 20)
            yy, xx = np.mgrid[:SIZE, :SIZE]
            for (x, y) in ((cx - d, cy), (cx + d, cy), (cx, cy + d)):
                img[(xx - x) ** 2 + (yy - y) ** 2 < 9] = 1.0
            crops[c, j] = img
    return crops


def _embed_all(fn, crops, batch=16):
    flat = crops.reshape(-1, SIZE, SIZE, 3)
    pad = (-len(flat)) % batch
    if pad:
        flat = np.concatenate([flat, np.zeros((pad, SIZE, SIZE, 3),
                                              np.float32)])
    outs = [np.asarray(fn(jnp.asarray(flat[i:i + batch])))
            for i in range(0, len(flat), batch)]
    emb = np.concatenate(outs)[: crops.shape[0] * crops.shape[1]]
    emb = emb / np.maximum(np.linalg.norm(emb, axis=-1, keepdims=True), 1e-12)
    return emb.reshape(crops.shape[0], crops.shape[1], -1).mean(1)


def test_int8_only_flips_near_ties(tmp_path):
    rng = np.random.RandomState(0)
    gallery = _hard_crops(rng, N_GALLERY, N_IMGS)
    queries = _hard_crops(rng, N_QUERY, N_IMGS)

    model = resnet50_embedder(embedding_dim=64)
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.zeros((1, SIZE, SIZE, 3), jnp.float32))
    float_fn = jax.jit(lambda x: model.apply(variables, x, train=False))

    runner = ptq.PTQServing(
        "emb", lambda m: resnet50_embedder(embedding_dim=64, quant=m),
        variables["params"], variables.get("batch_stats", {}),
        example=np.zeros((1, SIZE, SIZE, 3), np.float32))
    # calibrate on the gallery (the corpus IS the calibration set in
    # tools/rank_safety_drive.sh's calibrate pass)
    _embed_all(runner.calibrate, gallery)
    int8_fn = runner.serve_fn()

    gf, gq = _embed_all(float_fn, gallery), _embed_all(float_fn, queries)
    g8, q8 = _embed_all(int8_fn, gallery), _embed_all(int8_fn, queries)

    s_f = pairwise_card_scores(gq, gf)   # (Q, G) float scores
    s_8 = pairwise_card_scores(q8, g8)

    drift = np.abs(s_f - s_8).max()
    assert drift < 0.01, f"int8 score drift {drift} too large"

    near_tie_budget = 2.0 * drift
    for q in range(N_QUERY):
        order_f = np.argsort(-s_f[q], kind="stable")
        order_8 = np.argsort(-s_8[q], kind="stable")
        if (order_f == order_8).all():
            continue
        # every inversion must be a float near-tie: the pair (a, b) appears
        # in opposite orders in the two rankings only if |s_f[a] - s_f[b]|
        # is within the quantization drift
        pos_f = np.empty(N_GALLERY, np.int64)
        pos_f[order_f] = np.arange(N_GALLERY)
        pos_8 = np.empty(N_GALLERY, np.int64)
        pos_8[order_8] = np.arange(N_GALLERY)
        for a in range(N_GALLERY):
            for b in range(a + 1, N_GALLERY):
                inverted = (pos_f[a] - pos_f[b]) * (pos_8[a] - pos_8[b]) < 0
                if inverted:
                    gap = abs(float(s_f[q, a]) - float(s_f[q, b]))
                    assert gap <= near_tie_budget, (
                        f"query {q}: int8 flipped a NON-near-tie pair "
                        f"(gap {gap} > budget {near_tie_budget})")
