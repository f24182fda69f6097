"""Full retrieval pipeline (dev variant of the reproduce scripts).

Reference ``generate_tsv.py``: same detect→embed→score→rank flow as
``generate_tsv_to_reproduce1.py`` but pointed at development checkpoints and with
an embedding-DB pickle cache (``scores3.pickle``, ref ``:253-260``). Here it is the
reproduce script with caching on by default.
"""

import sys
from pathlib import Path

import generate_tsv_to_reproduce1 as base

base.OUTPUT = "pred_scores_test4.tsv"

if __name__ == "__main__":
    if "--cache" not in sys.argv:
        sys.argv += ["--cache", str(Path("scores3.pickle"))]
    base.main(body=True)
