"""Shipping int8 rank contract over the CHECKED-IN 120-query hard-corpus
artifacts (VERDICT r4 #1/#6).

``tools/rank_safety_hard.sh`` drives the full detect→align→embed→score chain
on the real chip twice (float, shipping int8 = embedder+kp_head) over the
120-identity hard corpus and persists every query's full per-gallery score
row (``PFR_SCORES_DUMP``). The round-5 artifacts live in
``tests/golden/rank_hard/``; this test re-validates the declared contract
against them, so regenerating the artifacts from a regressed build fails
here:

1. bounded drift: max |float − int8| score ≤ 2e-3 (measured 5.8e-4 round 5
   — an order-of-magnitude regression fails);
2. near-tie flips only: every rank inversion's float gap ≤ 2× the measured
   max drift (the theoretical bound — a pair can only invert if each score
   moved toward the other, so gap < drift_a + drift_b);
3. membership churn pinned: exactly the 3 known queries and 8+8 gallery
   cards at the landmark-geometry validity floor (PERF.md round-5;
   mechanism attributed by tools/probe_row_drop.py).

Round-4's "rank-identical, drift 2.2e-5" smoke-split claim was a 2-query
anecdote; at this denominator the honest contract is the above (the hard
corpus is near-ties BY CONSTRUCTION, so rank lists shuffle within the drift
band while candR@K stays level — the quality grid in
``tests/golden/rank_hard/quality_table.json`` / PERF.md round-5).
"""

import json
import sys
from pathlib import Path

GOLDEN = Path(__file__).parent / "golden" / "rank_hard"
sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))

DRIFT_BUDGET = 2e-3           # measured 5.8e-4 (round 5); 10x growth fails
EXPECTED_QUERY_DROPS = ["rl900006", "rl900077", "rl900105"]
EXPECTED_GALLERY_CHURN = 8    # cards each way, landmark-floor near-ties


def _report():
    from verify_near_tie_contract import compare, load_dump

    return compare(load_dump(GOLDEN / "scores_float.npz"),
                   load_dump(GOLDEN / "scores_int8ship.npz"))


def test_shipping_drift_bounded():
    r = _report()
    assert 0 < r["max_score_drift"] <= DRIFT_BUDGET, r["max_score_drift"]


def test_shipping_flips_are_near_ties():
    r = _report()
    assert r["n_flipped_pairs"] > 0  # the hard corpus guarantees near-ties
    assert r["max_flip_float_gap"] <= 2 * r["max_score_drift"], (
        f"a confidently-ordered pair flipped: gap "
        f"{r['max_flip_float_gap']} > 2x drift {2 * r['max_score_drift']}")


def test_shipping_membership_churn_pinned():
    r = _report()
    assert r["only_a"] == EXPECTED_QUERY_DROPS
    assert r["only_b"] == []
    assert len(r["gallery_only_a"]) == EXPECTED_GALLERY_CHURN
    assert len(r["gallery_only_b"]) == EXPECTED_GALLERY_CHURN


def test_quality_grid_shipping_row_is_quality_neutral():
    """The recorded grid: shipping int8 within one query of float at
    candR@1 and identical at candR@100; all-components int8 is NOT (the
    reason detector quant stays opt-in)."""
    grid = json.loads((GOLDEN / "quality_table.json").read_text())
    fl, ship = grid["float_resnet50_f32"], grid["int8ship_resnet50_f32"]
    full = grid["int8_resnet50_f32"]
    # one query of slack plus the grid's 4-decimal rounding
    assert abs(fl["candR@1"] - ship["candR@1"]) <= 1 / 120 + 1e-3
    assert ship["candR@100"] == fl["candR@100"]
    assert full["candR@1"] < fl["candR@1"] - 2 / 120  # detector quant harm
