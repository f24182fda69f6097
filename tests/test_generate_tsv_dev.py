"""Dev retrieval entry point: DB cache round-trip + stock-merge semantics
(``generate_tsv.py``, ref ``/root/reference/generate_tsv.py:253-280``)."""

import sys
from pathlib import Path

import numpy as np
import pandas as pd
from PIL import Image

sys.path.insert(0, str(Path(__file__).parent.parent))

import generate_tsv


def _make_test_tree(root: Path, n_cards=3):
    rng = np.random.RandomState(0)
    for side in ("found", "lost"):
        for sub in (side, "extra"):
            base = root / side / sub
            for i in range(n_cards):
                card = base / f"{side[0]}{sub[0]}{i}"
                card.mkdir(parents=True)
                (card / "card.json").write_text(
                    '{"animal": %d}' % (1 + (i % 2))
                )
                for j in range(2):
                    img = rng.randint(0, 255, (16, 16, 3), np.uint8)
                    Image.fromarray(img).save(card / f"{j}.png")
    return root


FAKE_CONFIG = """
import numpy as np

def head_pipeline(img, animal_type):
    seed = int(np.asarray(img, np.float64).sum()) % 100000
    return np.random.RandomState(seed).randn(512).astype(np.float32)

def body_pipeline(img, animal_type):
    seed = (int(np.asarray(img, np.float64).sum()) + 7) % 100000
    return np.random.RandomState(seed).randn(512).astype(np.float32)
"""

POISONED_CONFIG = """
def head_pipeline(img, animal_type):
    raise RuntimeError("embedding ran despite a warm cache")

def body_pipeline(img, animal_type):
    raise RuntimeError("embedding ran despite a warm cache")
"""


def _run(tmp_path, config_text, monkeypatch, stock=None):
    cfg = tmp_path / "cfg.py"
    cfg.write_text(config_text)
    out = tmp_path / "out.tsv"
    argv = [
        "generate_tsv.py", "--config", str(cfg),
        "--data", str(tmp_path / "test"),
        "--cache", str(tmp_path / "scores3.pickle"),
        "--output", str(out),
        "--stock-preds", str(stock if stock else tmp_path / "missing.tsv"),
    ]
    monkeypatch.setattr(sys, "argv", argv)
    generate_tsv.main(body=True)
    return out


def test_db_cache_skips_embedding(tmp_path, monkeypatch):
    _make_test_tree(tmp_path / "test")
    out = _run(tmp_path, FAKE_CONFIG, monkeypatch)
    first = out.read_text()
    assert (tmp_path / "scores3.pickle").exists(), "DB cache not written"
    assert len(pd.read_csv(out, sep="\t")) > 0

    # second run: pipelines raise if ever called -> must succeed via the cache
    out2 = _run(tmp_path, POISONED_CONFIG, monkeypatch)
    assert out2.read_text() == first


def test_stock_merge_is_stock_ordered(tmp_path, monkeypatch):
    _make_test_tree(tmp_path / "test")
    out = _run(tmp_path, FAKE_CONFIG, monkeypatch)
    ours = pd.read_csv(out, sep="\t")
    assert len(ours) >= 2

    # stock preds: one unknown query first, then one of ours (different answer)
    stock = pd.DataFrame(
        [
            {"query": "zz_unknown", "matched_1": "s1", "matched_3": "s3",
             "matched_10": "s10", "answer": "stock"},
            {"query": ours.iloc[0]["query"], "matched_1": "x", "matched_3": "x",
             "matched_10": "x", "answer": "stock"},
        ]
    )
    stock_path = tmp_path / "preds.tsv"
    stock.to_csv(stock_path, sep="\t", index=False)

    merged = generate_tsv.merge_with_stock(ours, stock_path)
    # ordered by the stock file's query order, restricted to its query set
    assert merged["query"].tolist() == ["zz_unknown", ours.iloc[0]["query"]]
    assert merged.iloc[0]["answer"] == "stock"          # unknown -> stock row
    assert merged.iloc[1]["answer"] == ours.iloc[0]["answer"]  # known -> ours
