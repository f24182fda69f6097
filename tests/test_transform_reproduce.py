"""transform_reproduce script semantics: batched/single drop-set parity,
skip-already-done, the >300x400 re-encode rule, and the exclusion lists
(ref ``/root/reference/transform_reproduce.py:20-53,58-105,143-170``)."""

import sys
from pathlib import Path

import numpy as np
from PIL import Image

sys.path.insert(0, str(Path(__file__).parent.parent))

import transform_reproduce as tr
from tools.make_smoke_datasets import make_data25, make_petfinder_extras


class StubPreproc:
    """Deterministic preproc: fails images whose mean is below ``fail_below``
    (the batched analog of the reference's assert-and-skip, ref ``:41``)."""

    def __init__(self, fail_below=85.0, out_shape=(64, 64, 3)):
        self.fail_below = fail_below
        self.out_shape = out_shape

    def _ok(self, img):
        return float(np.asarray(img, np.float64).mean()) >= self.fail_below

    def __call__(self, img):
        assert self._ok(img), "stub: low-quality image"
        return np.full(self.out_shape, int(np.asarray(img).mean()), np.uint8)

    def batch(self, images):
        outs, valid = [], []
        for img in images:
            ok = self._ok(img)
            valid.append(ok)
            outs.append(self.__call__(img) if ok else None)
        return outs, np.asarray(valid), {}


class SingleOnly:
    """Strips the .batch attr so transform_dataset takes the per-image path."""

    def __init__(self, inner):
        self._inner = inner

    def __call__(self, img):
        return self._inner(img)


def _corpus(root: Path, n=10, seed=0):
    rng = np.random.RandomState(seed)
    for i in range(n):
        d = root / f"card{i}"
        d.mkdir(parents=True, exist_ok=True)
        # alternate bright/dark so the stub drops a deterministic subset
        level = 120 if i % 3 else 40
        img = rng.randint(level - 30, level + 30, (48, 48, 3), np.uint8)
        Image.fromarray(img).save(d / f"{i}.jpg", quality=95)


def _written(root: Path):
    return sorted(str(p.relative_to(root)) for p in root.rglob("*.jpg"))


def test_batched_and_single_paths_drop_the_same_set(tmp_path):
    src = tmp_path / "src"
    _corpus(src)
    out_b = tmp_path / "out_batched"
    out_s = tmp_path / "out_single"

    pre = StubPreproc()
    tr.transform_dataset(src, pre, out_b, batch_size=4)
    tr.transform_dataset(src, SingleOnly(pre), out_s, batch_size=4)

    wb, ws = _written(out_b), _written(out_s)
    assert wb == ws, f"drop-set mismatch: {wb} vs {ws}"
    assert 0 < len(wb) < 10, "expected a partial drop-set"


def test_already_transformed_entries_are_skipped(tmp_path):
    src = tmp_path / "src"
    _corpus(src)
    out = tmp_path / "out"
    pre = StubPreproc()
    tr.transform_dataset(src, pre, out, batch_size=4)
    stamps = {p: p.stat().st_mtime_ns for p in out.rglob("*.jpg")}
    tr.transform_dataset(src, pre, out, batch_size=4)  # second pass: no-op
    assert {p: p.stat().st_mtime_ns for p in out.rglob("*.jpg")} == stamps


def test_large_outputs_reencode_as_jpg(tmp_path):
    src = tmp_path / "src"
    d = src / "c"
    d.mkdir(parents=True)
    Image.fromarray(np.full((48, 48, 3), 200, np.uint8)).save(d / "x.png")
    out = tmp_path / "out"
    # 350*400 > 300*400 -> the .png output re-encodes as .jpg (ref :51-53)
    tr.transform_dataset(src, StubPreproc(out_shape=(350, 400, 3)), out)
    assert (out / "c" / "x.jpg").exists()
    assert not (out / "c" / "x.png").exists()
    # and stays skipped on rerun (the .jpg satisfies the already-done check)
    stamp = (out / "c" / "x.jpg").stat().st_mtime_ns
    tr.transform_dataset(src, StubPreproc(out_shape=(350, 400, 3)), out)
    assert (out / "c" / "x.jpg").stat().st_mtime_ns == stamp


def test_data25_exclusion_list_and_petfinder_excludes(tmp_path, monkeypatch):
    root = make_data25(tmp_path).parent
    make_petfinder_extras(tmp_path)
    monkeypatch.setattr(tr, "DATA_ROOT", root)
    monkeypatch.setattr(tr, "v", "vtest")

    pre = StubPreproc(fail_below=0.0)  # accept everything detectable
    tr.data_25(pre, 1)
    out = root / "data_25_transformed_vtest_dogs"
    written = _written(out)
    assert written, "no dog crops written"
    assert "rl131336/216319.jpg" not in written, "excluded image transformed"
    assert not (out / "rl378360").exists(), "card with only excluded images"

    tr.extra_petfinder(pre, "dog")
    pf = root / "petfinder_extra_dogs_transformed_vtest"
    pf_written = sorted(str(p.relative_to(pf)) for p in pf.rglob("*.*"))
    assert pf_written, "no petfinder crops written"
    assert not any(s.startswith(("48683845", "45528036")) for s in pf_written)
    assert "48009947/3.png" not in pf_written
    assert "48009947/3.jpg" not in pf_written


def test_transform_dataset_cli_head_bbox(tmp_path, monkeypatch):
    """Drive the transform_dataset.py CLI end-to-end with a stubbed pipeline
    (arg parsing, pipelines-config load, pipeline dispatch, transform run)."""
    import transform_dataset as td

    src = tmp_path / "src"
    _corpus(src)
    out = tmp_path / "out"
    cfg = tmp_path / "pipelines.py"
    cfg.write_text("keypoint_pipeline = 'stub-kp'\nmask_pipeline = 'stub-mask'\n")

    seen = {}

    def fake_preproc6(loader, thr, serve_batch):
        seen.update(loader=loader, thr=thr, serve_batch=serve_batch)
        return StubPreproc()

    monkeypatch.setattr(td, "Preproc6", fake_preproc6)
    monkeypatch.setattr(sys, "argv", [
        "transform_dataset.py", "--input", str(src), "--output", str(out),
        "--pipeline", "head_bbox", "--pipelines-config", str(cfg),
        "--batch-size", "4", "--thr", "0.8",
    ])
    td.main()
    assert seen == dict(loader="stub-kp", thr=0.8, serve_batch=4)
    assert 0 < len(_written(out)) < 10  # stub drop-set applied
