"""Golden-file test for the retrieval tsv contract.

The tsv interface is the behavioral test surface of the whole stack (SURVEY.md
§4.3): rank order, score columns, and formatting must stay stable across
refactors. Deterministic synthetic embeddings → ``create_table`` → byte-compare
against a checked-in golden file (regenerate with
``python tests/test_tsv_golden.py`` when an *intentional* change lands).
"""

from pathlib import Path

import numpy as np

from pets_face_recognition_tpu.retrieval import CardRecord, create_table, write_tsv

GOLDEN = Path(__file__).parent / "golden" / "pred_scores_synth.tsv"


def _synthetic_db():
    rng = np.random.RandomState(2024)
    dim = 32

    def cards(prefix, n):
        out = []
        for i in range(n):
            nh = rng.randint(0, 4)
            nb = rng.randint(0, 4)
            out.append(CardRecord(
                name=f"{prefix}{i}",
                type=int(rng.randint(1, 3)),
                head_vectors=rng.randn(nh, dim).astype(np.float32),
                body_vectors=rng.randn(nb, dim).astype(np.float32),
            ))
        return [c for c in out if c.has_head or c.has_body]

    return {
        "found": (cards("fq", 10), cards("fg", 25)),
        "lost": (cards("lq", 8), cards("lg", 20)),
    }


def _build_tsv(path):
    df = create_table(_synthetic_db())
    write_tsv(df, path)


def test_tsv_matches_golden(tmp_path):
    out = tmp_path / "pred.tsv"
    _build_tsv(out)
    assert GOLDEN.exists(), (
        "golden file missing — run `python tests/test_tsv_golden.py`"
    )
    assert out.read_text() == GOLDEN.read_text(), (
        "retrieval tsv output changed — if intentional, regenerate the golden "
        "file with `python tests/test_tsv_golden.py`"
    )


if __name__ == "__main__":
    import jax

    # the golden file is defined on the CPU backend (tests force CPU; TPU matmul
    # rounding differs at the last ulp)
    jax.config.update("jax_platforms", "cpu")
    GOLDEN.parent.mkdir(exist_ok=True)
    _build_tsv(GOLDEN)
    print(f"regenerated {GOLDEN}")
