"""Diff two retrieval tsv outputs for rank safety.

The BASELINE contract is a *rank-identical tsv* (``query, matched_1,
matched_3, matched_10, answer`` — ref ``generate_tsv_to_reproduce1.py:127-141``;
``answer`` is the comma-joined top-100 gallery rank list, so comparing it
compares the full ranking). Used by ``tools/rank_safety_drive.sh`` to prove
the int8 PTQ serving path (``models/ptq.py``) preserves the float ranking.

Exit status: 0 iff every query's rank list is identical and the matched_*
columns agree within ``--score-tol`` (default 1e-6; int8 comparisons pass
``--score-tol`` explicitly to allow quantization-level score drift while
still requiring IDENTICAL ranks).

Usage: ``python tools/diff_tsv_ranks.py a.tsv b.tsv [--score-tol 1e-3]``
"""

from __future__ import annotations

import argparse
import sys

import pandas as pd


def compare(path_a: str, path_b: str, score_tol: float = 1e-6) -> dict:
    a = pd.read_csv(path_a, sep="\t").set_index("query").sort_index()
    b = pd.read_csv(path_b, sep="\t").set_index("query").sort_index()

    report: dict = {"queries_a": len(a), "queries_b": len(b)}
    if set(a.index) != set(b.index):
        # report the membership diff, then still compare the SHARED queries —
        # "which queries detected" and "how shared queries rank" are separate
        # contracts (PERF.md round-5: kp_head int8 can flip borderline crop
        # validity without touching any surviving query's ranking)
        only_a = sorted(set(a.index) - set(b.index))
        only_b = sorted(set(b.index) - set(a.index))
        report.update(query_set_equal=False, only_a=only_a, only_b=only_b)
        shared = sorted(set(a.index) & set(b.index))
        if not shared:
            return report
        a, b = a.loc[shared], b.loc[shared]
        report["n_shared_compared"] = len(shared)
    else:
        report["query_set_equal"] = True

    # full rank lists
    rank_mismatch, first_div, top10_set_diff, top1_diff = [], {}, [], []
    for q in a.index:
        ra = str(a.loc[q, "answer"]).split(",")
        rb = str(b.loc[q, "answer"]).split(",")
        if ra == rb:
            continue
        rank_mismatch.append(q)
        div = next((i for i, (x, y) in enumerate(zip(ra, rb)) if x != y),
                   min(len(ra), len(rb)))
        first_div[q] = div
        if ra[:1] != rb[:1]:
            top1_diff.append(q)
        if set(ra[:10]) != set(rb[:10]):
            top10_set_diff.append(q)

    # matched_{1,3,10} score columns
    score_max_delta = {}
    for col in ("matched_1", "matched_3", "matched_10"):
        score_max_delta[col] = float((a[col] - b[col]).abs().max())

    report.update(
        rank_identical=not rank_mismatch,
        n_rank_mismatch=len(rank_mismatch),
        rank_mismatch_queries=rank_mismatch[:20],
        first_divergence_rank=dict(sorted(first_div.items())[:20]),
        n_top1_changed=len(top1_diff),
        n_top10_set_changed=len(top10_set_diff),
        score_max_delta=score_max_delta,
        score_within_tol=all(v <= score_tol
                             for v in score_max_delta.values()),
    )
    return report


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("tsv_a")
    ap.add_argument("tsv_b")
    ap.add_argument("--score-tol", type=float, default=1e-6,
                    help="max allowed |delta| on matched_{1,3,10} columns "
                         "(ranks must ALWAYS be identical)")
    args = ap.parse_args()
    report = compare(args.tsv_a, args.tsv_b, args.score_tol)
    for k, v in report.items():
        print(f"{k}: {v}")
    ok = (report.get("query_set_equal") and report.get("rank_identical")
          and report.get("score_within_tol"))
    print("RANK-SAFE" if ok else "RANK-DIVERGED")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
