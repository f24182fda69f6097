"""Full retrieval pipeline — dev variant (``pred_scores_test4.tsv``).

Behavioral rebuild of ``/root/reference/generate_tsv.py``: the same
detect→embed→score→rank flow as ``generate_tsv_to_reproduce1.py`` but with

- the 4 FE models loaded from DEVELOPMENT checkpoints
  (``configs/retrieval_config_dev.py``; ref ``:157-226``),
- the embedding DB cached in ``scores3.pickle`` by default — a cache hit skips
  detection+embedding entirely (ref ``:253-260``),
- a stock-preds merge step replicating the reference ``__main__`` block
  (ref ``:267-280``): the merged table is ordered by the STOCK preds' query
  order and restricted to its query set, taking our row when the query was
  scored and the stock row otherwise (unlike ``backfill_missing``, which
  appends stock rows for missing queries after ours).

The CPU similarity loop is replaced by the centroid matmul in
``pets_face_recognition_tpu.retrieval`` (exact same scores).
"""

import argparse
from pathlib import Path

import pandas as pd

import generate_tsv_to_reproduce1 as base
from pets_face_recognition_tpu.retrieval import create_table, write_tsv
from pets_face_recognition_tpu.utils import get_dict_wrapper

OUTPUT = "pred_scores_test4.tsv"


def merge_with_stock(df: pd.DataFrame, stock_tsv: str | Path) -> pd.DataFrame:
    """Reference ``generate_tsv.py`` __main__ merge (ref ``:267-280``): iterate
    the stock preds' queries in order, preferring our row when present."""
    stock = pd.read_csv(stock_tsv, sep="\t")
    ours = {row["query"]: row for _, row in df.iterrows()}
    rows = [
        ours.get(row["query"], row) for _, row in stock.iterrows()
    ]
    return pd.DataFrame(rows, columns=df.columns).reset_index(drop=True)


def main(body: bool = True):
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", type=Path,
                        default=Path("configs/retrieval_config_dev.py"))
    parser.add_argument("--data", type=Path,
                        default=Path("../pets_datasets/test"))
    parser.add_argument("--stock-preds", type=Path, default=Path("preds.tsv"))
    parser.add_argument("--cache", type=Path, default=Path("scores3.pickle"),
                        help="embedding-DB pickle cache (ref scores3.pickle; "
                             "a cache hit skips detection+embedding)")
    parser.add_argument("--no-cache", action="store_true")
    parser.add_argument("--output", default=OUTPUT)
    parser.add_argument("--merged-output", default=None,
                        help="stock-merged tsv (default: <output> with a "
                             "_merged suffix when --stock-preds exists)")
    args = parser.parse_args()

    cfg = get_dict_wrapper(args.config)
    head_pipeline = cfg.head_pipeline
    body_pipeline = cfg.body_pipeline if body else None

    cache = None if args.no_cache else args.cache
    db = base.prepare_data(args.data.resolve(), head_pipeline, body_pipeline,
                           cache)
    df = create_table(db)
    write_tsv(df, args.output)
    print(f"wrote {args.output} ({len(df)} rows)")

    if args.stock_preds.exists():
        merged = merge_with_stock(df, args.stock_preds)
        merged_out = args.merged_output or str(
            Path(args.output).with_suffix("")
        ) + "_merged.tsv"
        write_tsv(merged, merged_out)
        print(f"wrote {merged_out} ({len(merged)} rows, stock-ordered)")


if __name__ == "__main__":
    main(body=True)
