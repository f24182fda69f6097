"""Retrieval scoring vs a naive reimplementation of the reference CPU loop."""

import numpy as np
import pandas as pd
import pytest

from pets_face_recognition_tpu.retrieval import (
    ENSEMBLE_BODY_THRESHOLDS,
    CardRecord,
    backfill_missing,
    build_card_matrix,
    calc_scores,
    create_table,
    ensemble_scores,
    pairwise_card_scores,
    write_tsv,
)


def _naive_mean_strategy(v1, v2):
    """Reference mean_strategy_cal_scores (generate_tsv_to_reproduce1.py:70-79)."""
    scores = []
    for a in v1:
        for b in v2:
            cos = a @ b / (np.linalg.norm(a) * np.linalg.norm(b))
            scores.append((cos + 1) / 2)
    return max(float(np.mean(scores)), 0.0)


def _naive_calc_scores(init_cards, extra_cards, thr_table):
    """Reference calc_scores loop (generate_tsv_to_reproduce1.py:90-124)."""
    rows = []
    for q in init_cards:
        l = []
        for g in extra_cards:
            if g.type != q.type:
                continue
            score = {0: 0, 1: 0}
            if q.has_head and g.has_head:
                score[0] = _naive_mean_strategy(q.head_vectors, g.head_vectors)
            if q.has_body and g.has_body:
                score[1] = _naive_mean_strategy(q.body_vectors, g.body_vectors)
            if sum(score.values()) == 0:
                continue
            s = score[1] if (not q.has_head) or (
                score[0] == 0 and score[1] > thr_table[q.type - 1]
            ) else score[0]
            l.append((g.name, s))
        l = sorted(l, key=lambda x: x[1], reverse=True)
        if l:
            answer = [l[i][0] for i in range(min(100, len(l)))]
            rows.append((
                q.name, l[0][1],
                np.mean([l[i][1] for i in range(min(3, len(l)))]),
                np.mean([l[i][1] for i in range(min(10, len(l)))]),
                ",".join(answer),
            ))
    return rows


def _random_cards(rng, n, prefix, types=(1, 2), p_head=0.8, p_body=0.7, dim=16):
    cards = []
    for i in range(n):
        nh = rng.randint(1, 4) if rng.rand() < p_head else 0
        nb = rng.randint(1, 4) if rng.rand() < p_body else 0
        cards.append(CardRecord(
            name=f"{prefix}{i}",
            type=int(types[rng.randint(len(types))]),
            head_vectors=rng.randn(nh, dim).astype(np.float32),
            body_vectors=rng.randn(nb, dim).astype(np.float32),
        ))
    # drop cards with neither modality (process_base would not emit them)
    return [c for c in cards if c.has_head or c.has_body]


def test_centroid_matmul_equals_pairloop(rng):
    q = _random_cards(rng, 12, "q", dim=16)
    g = _random_cards(rng, 20, "g", dim=16)
    rows = calc_scores(q, g, dim=16)
    want = _naive_calc_scores(q, g, ENSEMBLE_BODY_THRESHOLDS)

    got = {r[0]: r for r in rows}
    expect = {r[0]: r for r in want}
    assert set(got) == set(expect)
    for k in expect:
        np.testing.assert_allclose(got[k][1], expect[k][1], atol=1e-5)
        np.testing.assert_allclose(got[k][2], expect[k][2], atol=1e-5)
        np.testing.assert_allclose(got[k][3], expect[k][3], atol=1e-5)
        assert got[k][4] == expect[k][4], f"rank order differs for {k}"


def test_ensemble_rule_cases():
    # one query, three gallery cards exercising each branch of the rule
    hs = np.array([[0.95, 0.0, 0.5]])
    bs = np.array([[0.3, 0.99, 0.0]])
    q_hh = np.array([True]); q_hb = np.array([True])
    g_hh = np.array([True, False, True])
    g_hb = np.array([True, True, False])
    scores, include = ensemble_scores(hs, bs, q_hh, g_hh, q_hb, g_hb, 1)
    # card0: head present -> head score
    assert scores[0, 0] == 0.95
    # card1: head missing, body 0.99 > dog thr 0.9069 -> body
    assert scores[0, 1] == 0.99
    # card2: head present -> head
    assert scores[0, 2] == 0.5
    assert include.all()

    # query with no head at all -> body used everywhere body exists
    scores2, _ = ensemble_scores(hs * 0, bs, np.array([False]), g_hh,
                                 q_hb, g_hb, 1)
    assert scores2[0, 0] == 0.3


def test_pairwise_card_scores_clamped(rng):
    q = rng.randn(3, 8).astype(np.float32)
    g = -q.copy()  # anti-parallel rows -> raw score < 0.5, some exactly 0
    s = pairwise_card_scores(q / np.linalg.norm(q, axis=1, keepdims=True),
                             g / np.linalg.norm(g, axis=1, keepdims=True))
    assert (s >= 0).all()
    np.testing.assert_allclose(np.diag(s), 0.0, atol=1e-6)


def test_create_table_and_tsv_roundtrip(rng, tmp_path):
    q = _random_cards(rng, 5, "q", dim=8)
    g = _random_cards(rng, 7, "g", dim=8)
    df = create_table({"found": (q, g)})
    assert list(df.columns) == ["query", "matched_1", "matched_3",
                                "matched_10", "answer"]
    out = tmp_path / "pred.tsv"
    write_tsv(df, out)
    df2 = pd.read_csv(out, sep="\t")
    assert len(df2) == len(df)


def test_backfill_missing(tmp_path, rng):
    df = pd.DataFrame({"query": ["a"], "matched_1": [0.9], "matched_3": [0.8],
                       "matched_10": [0.7], "answer": ["x,y"]})
    stock = pd.DataFrame({"query": ["a", "b"], "matched_1": [0.5, 0.4],
                          "matched_3": [0.5, 0.4], "matched_10": [0.5, 0.4],
                          "answer": ["m", "n"]})
    stock_path = tmp_path / "preds.tsv"
    stock.to_csv(stock_path, sep="\t", index=False)
    merged = backfill_missing(df, stock_path)
    assert len(merged) == 2
    # original row for 'a' wins; 'b' backfilled from stock
    assert merged[merged["query"] == "a"].iloc[0]["matched_1"] == 0.9
    assert merged[merged["query"] == "b"].iloc[0]["answer"] == "n"


def test_sharded_gallery_matches_single_device(rng, eight_devices):
    from pets_face_recognition_tpu.parallel import create_mesh

    mesh = create_mesh()
    q = rng.randn(4, 16).astype(np.float32)
    g = rng.randn(24, 16).astype(np.float32)  # divisible by 8
    plain = pairwise_card_scores(q, g)
    sharded = pairwise_card_scores(q, g, mesh=mesh)
    np.testing.assert_allclose(plain, sharded, atol=1e-6)


def test_sharded_topk_matches_dense(rng, eight_devices):
    from pets_face_recognition_tpu.parallel import create_mesh
    from pets_face_recognition_tpu.retrieval import sharded_topk_scores

    mesh = create_mesh()
    q = rng.randn(5, 16).astype(np.float32)
    g = rng.randn(103, 16).astype(np.float32)  # NOT divisible by 8: pad path
    k = 10
    scores, idx = sharded_topk_scores(q, g, k, mesh)
    dense = np.maximum((q @ g.T + 1.0) / 2.0, 0.0)
    for qi in range(5):
        want_order = np.argsort(-dense[qi], kind="stable")[:k]
        np.testing.assert_allclose(
            np.sort(scores[qi])[::-1], np.sort(dense[qi][want_order])[::-1],
            atol=1e-5,
        )
        # indices recover the same score set
        np.testing.assert_allclose(
            np.sort(dense[qi][idx[qi]]), np.sort(dense[qi][want_order]),
            atol=1e-5,
        )


def test_scores_dump_and_near_tie_contract(tmp_path, monkeypatch):
    """PFR_SCORES_DUMP persists every query's full per-gallery score row, and
    tools/verify_near_tie_contract.py certifies a pair of dumps: identical
    dumps are NEAR-TIE-SAFE; a confidently-ordered pair flip is VIOLATED."""
    import sys

    import numpy as np

    sys.path.insert(0, "tools")
    import importlib

    vntc = importlib.import_module("verify_near_tie_contract")
    from pets_face_recognition_tpu import retrieval as R

    rng = np.random.RandomState(0)

    def card(name, t=1):
        return R.CardRecord(name=name, type=t,
                            head_vectors=rng.randn(2, 16).astype(np.float32),
                            body_vectors=np.zeros((0,)))

    queries = [card(f"q{i}") for i in range(3)]
    gallery = [card(f"g{i}") for i in range(6)]

    dump_a = tmp_path / "a.npz"
    monkeypatch.setenv("PFR_SCORES_DUMP", str(dump_a))
    R._SCORES_DUMP.clear()
    R.calc_scores(queries, gallery, dim=16)
    R.flush_scores_dump()
    R._SCORES_DUMP.clear()

    a = vntc.load_dump(dump_a)
    assert sorted(a) == ["q0", "q1", "q2"]
    assert a["q0"]["scores"].shape == (6,)

    # identical dumps: zero drift, zero flips
    rep = vntc.compare(a, a)
    assert rep["max_score_drift"] == 0.0
    assert rep["n_flipped_pairs"] == 0

    # flip two CONFIDENTLY separated cards in b -> contract violated
    b = {q: {k: v.copy() for k, v in d.items()} for q, d in a.items()}
    s = b["q0"]["scores"]
    top2 = np.argsort(-s)[:2]
    gap = abs(float(s[top2[0]] - s[top2[1]]))
    s[top2[0]], s[top2[1]] = s[top2[1]], s[top2[0]]
    rep2 = vntc.compare(a, b)
    assert rep2["n_flipped_pairs"] >= 1
    assert rep2["max_flip_float_gap"] >= gap * 0.99
