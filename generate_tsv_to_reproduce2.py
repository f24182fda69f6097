"""Head-only retrieval → ``pred_scores_test2.tsv``.

Behavioral rebuild of ``/root/reference/generate_tsv_to_reproduce2.py``: identical
to the ensemble script with the body path removed (the reference diff is exactly
that — SURVEY.md §2.1).
"""

import generate_tsv_to_reproduce1 as base

base.OUTPUT = "pred_scores_test2.tsv"

if __name__ == "__main__":
    base.main(body=False)
