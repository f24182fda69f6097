"""Ensemble (head+body) retrieval → ``pred_scores_test1.tsv``.

Behavioral rebuild of ``/root/reference/generate_tsv_to_reproduce1.py``: walk the
kashtanka test split (``test/{found,lost}/{initial,extra}``), embed every card image
through the head (detect→align→embed) and body (detect→crop→embed) pipelines, score
query cards against gallery cards with the mean-pair-cosine strategy + ensemble
rule, keep top-100, write the tsv, and backfill queries without predictions from a
stock ``preds.tsv`` (ref ``:233-245``).

The CPU similarity loop is replaced by the centroid matmul in
``pets_face_recognition_tpu.retrieval`` (exact same scores — see that module's
docstring for the math).

Pipelines come from ``--config`` (default ``configs/retrieval_config.py``), which
must expose ``head_pipeline(img, animal_type) -> 512-d np.ndarray | None`` and
``body_pipeline(img, animal_type) -> 512-d np.ndarray | None``.
"""

import argparse
import json
import pickle
from pathlib import Path

import numpy as np
import pandas as pd
from PIL import Image
from tqdm import tqdm

from pets_face_recognition_tpu.retrieval import (
    CardRecord,
    backfill_missing,
    create_table,
    write_tsv,
)
from pets_face_recognition_tpu.utils import get_dict_wrapper

OUTPUT = "pred_scores_test1.tsv"


def process_base(base: Path, head_pipeline, body_pipeline) -> list[CardRecord]:
    """Per card folder: embed every image, keep non-None vectors (ref ``:20-44``)."""
    records = []
    for folder in tqdm(sorted(base.iterdir())):
        if not folder.is_dir():
            continue
        image_paths = [p for p in folder.iterdir() if p.name != "card.json"]
        type_ = int(json.loads((folder / "card.json").read_text())["animal"])
        head, body = [], []
        for p in image_paths:
            img = np.array(Image.open(p).convert("RGB"))
            if head_pipeline is not None:
                v = head_pipeline(img, type_)
                if v is not None:
                    head.append(np.asarray(v))
            if body_pipeline is not None:
                v = body_pipeline(img, type_)
                if v is not None:
                    body.append(np.asarray(v))
        if head or body:
            records.append(CardRecord(
                name=str(folder.name), type=type_,
                head_vectors=np.stack(head) if head else np.zeros((0, 512)),
                body_vectors=np.stack(body) if body else np.zeros((0, 512)),
            ))
    print(len(records))
    return records


def prepare_data(path: Path, head_pipeline, body_pipeline, cache: Path | None = None):
    """Walk ``test/{found,lost}/{initial,extra}`` galleries (ref ``:47-60``)."""
    if cache is not None and cache.exists():
        with open(cache, "rb") as f:
            return pickle.load(f)
    assert (path / "found").exists() and (path / "lost").exists()
    db = {}
    for big_folder in ((path / "found").resolve(), (path / "lost").resolve()):
        initial_base = big_folder / str(big_folder.name)
        extra_base = [
            p for p in big_folder.iterdir() if p.resolve() != initial_base
        ][0]
        db[big_folder.resolve()] = (
            process_base(initial_base, head_pipeline, body_pipeline),
            process_base(extra_base, head_pipeline, body_pipeline),
        )
    if cache is not None:
        with open(cache, "wb") as f:
            pickle.dump(db, f)
    return db


def main(body: bool = True):
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", type=Path,
                        default=Path("configs/retrieval_config.py"))
    parser.add_argument("--data", type=Path, default=Path("../pets_datasets/test"))
    parser.add_argument("--stock-preds", type=Path, default=Path("preds.tsv"))
    parser.add_argument("--cache", type=Path, default=None,
                        help="pickle cache for the embedding DB (ref scores3.pickle)")
    parser.add_argument("--output", default=OUTPUT)
    args = parser.parse_args()

    cfg = get_dict_wrapper(args.config)
    head_pipeline = cfg.head_pipeline
    body_pipeline = cfg.body_pipeline if body else None

    db = prepare_data(args.data.resolve(), head_pipeline, body_pipeline,
                      args.cache)
    df = create_table(db)
    if args.stock_preds.exists():
        df = backfill_missing(df, args.stock_preds)
    write_tsv(df, args.output)
    print(f"wrote {args.output} ({len(df)} rows)")


if __name__ == "__main__":
    main(body=True)
