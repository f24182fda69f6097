"""Near-tie rank contract between two PFR_SCORES_DUMP files (VERDICT r4 #1).

The BASELINE "rank-identical tsv" contract is exact only when float score
gaps exceed the quantization drift. On a hard corpus of near-duplicate
identities (tools/make_smoke_datasets.py::make_kashtanka_hard) most gaps are
BELOW the drift, so the shippable contract is:

1. the int8-vs-float score drift is bounded (``--drift-budget``);
2. every rank inversion between the float and int8 orderings happens across
   a float score gap smaller than ``--flip-budget`` (near-ties only — no
   confidently-ordered pair may flip).

Usage (after two chain passes with PFR_SCORES_DUMP set):
  python tools/verify_near_tie_contract.py float.npz int8.npz \
      --drift-budget 5e-4 --flip-budget 5e-4
Prints a JSON summary; exit 0 iff both budgets hold on every shared query.
Queries present in only one dump are reported (membership is a separate
contract — detection/validity flips, not ranking).
"""

from __future__ import annotations

import argparse
import json
import sys

import numpy as np


def load_dump(path: str) -> dict[str, dict]:
    z = np.load(path, allow_pickle=False)
    out: dict[str, dict] = {}
    for key in z.files:
        q, field = key.rsplit("/", 1)
        out.setdefault(q, {})[field] = z[key]
    return out


def compare(a: dict, b: dict) -> dict:
    shared = sorted(set(a) & set(b))
    report = {
        "queries_a": len(a), "queries_b": len(b),
        "only_a": sorted(set(a) - set(b)), "only_b": sorted(set(b) - set(a)),
        "n_shared": len(shared),
    }
    max_drift = 0.0
    max_flip_gap = 0.0
    worst_flip = None
    n_flipped_pairs = 0
    n_queries_with_flips = 0
    gal_only_a: set = set()
    gal_only_b: set = set()
    for q in shared:
        ga, gb = a[q]["gallery"], b[q]["gallery"]
        # the GALLERY cards also ride the detect pipeline, so quantization
        # can change gallery membership exactly like query membership —
        # compare scores over the by-name intersection and report the
        # membership diff separately
        ga_l, gb_l = [str(x) for x in ga], [str(x) for x in gb]
        common = sorted(set(ga_l) & set(gb_l))
        gal_only_a |= set(ga_l) - set(gb_l)
        gal_only_b |= set(gb_l) - set(ga_l)
        if not common:
            continue
        ia = [ga_l.index(n) for n in common]
        ib = [gb_l.index(n) for n in common]
        inc = a[q]["include"][ia] & b[q]["include"][ib]
        idx = np.nonzero(inc)[0]
        if len(idx) == 0:
            continue
        ga = ga[ia]
        s_f = a[q]["scores"][ia][idx].astype(np.float64)
        s_8 = b[q]["scores"][ib][idx].astype(np.float64)
        max_drift = max(max_drift, float(np.abs(s_f - s_8).max()))
        order_f = np.argsort(-s_f, kind="stable")
        order_8 = np.argsort(-s_8, kind="stable")
        if np.array_equal(order_f, order_8):
            continue
        n = len(idx)
        pos_f = np.empty(n, np.int64)
        pos_f[order_f] = np.arange(n)
        pos_8 = np.empty(n, np.int64)
        pos_8[order_8] = np.arange(n)
        # a pair (i, j) is inverted iff its relative order differs
        d_f = pos_f[:, None] - pos_f[None, :]
        d_8 = pos_8[:, None] - pos_8[None, :]
        inverted = (d_f * d_8) < 0
        iu = np.triu_indices(n, 1)
        inv_mask = inverted[iu]
        if not inv_mask.any():
            continue
        n_queries_with_flips += 1
        gaps = np.abs(s_f[iu[0][inv_mask]] - s_f[iu[1][inv_mask]])
        n_flipped_pairs += int(inv_mask.sum())
        gmax = float(gaps.max())
        if gmax > max_flip_gap:
            max_flip_gap = gmax
            k = int(np.argmax(gaps))
            worst_flip = {
                "query": q,
                "card_a": str(ga[idx[iu[0][inv_mask][k]]]),
                "card_b": str(ga[idx[iu[1][inv_mask][k]]]),
                "float_gap": gmax,
            }
    report.update(
        gallery_only_a=sorted(gal_only_a),
        gallery_only_b=sorted(gal_only_b),
        max_score_drift=max_drift,
        n_flipped_pairs=n_flipped_pairs,
        n_queries_with_flips=n_queries_with_flips,
        max_flip_float_gap=max_flip_gap,
        worst_flip=worst_flip,
    )
    return report


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("dump_float")
    ap.add_argument("dump_int8")
    ap.add_argument("--drift-budget", type=float, default=5e-4)
    ap.add_argument("--flip-budget", type=float, default=5e-4)
    args = ap.parse_args()
    report = compare(load_dump(args.dump_float), load_dump(args.dump_int8))
    report["drift_budget"] = args.drift_budget
    report["flip_budget"] = args.flip_budget
    # membership (query/gallery only_a/only_b) is a SEPARATE contract —
    # detection/validity flips, reported above, judged by the caller
    ok = (report["max_score_drift"] <= args.drift_budget
          and report["max_flip_float_gap"] <= args.flip_budget)
    report["contract"] = "NEAR-TIE-SAFE" if ok else "VIOLATED"
    print(json.dumps(report, indent=2))
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
