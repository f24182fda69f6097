"""Offline drives of the two download entry points.

The image has zero network egress, so these tests monkeypatch
``urlretrieve`` to serve synthetic archives from disk and exercise every
other behavior of the scripts: download-into-layout, md5 verification,
zip/tar extraction, archive cleanup, bare-file copy, and the
skip-when-present fast path (reference ``download_datasets.py:131-154``,
``download_models.py:5-23``).
"""

import hashlib
import shutil
import tarfile
import zipfile
from pathlib import Path

import pytest

import download_datasets as dd
import download_models as dm


def _make_zip(path: Path, names) -> Path:
    path.parent.mkdir(parents=True, exist_ok=True)
    with zipfile.ZipFile(path, "w") as z:
        for name in names:
            z.writestr(name, f"payload:{name}")
    return path


def _make_targz(path: Path, names) -> Path:
    path.parent.mkdir(parents=True, exist_ok=True)
    stage = path.parent / "_stage"
    for name in names:
        p = stage / name
        p.parent.mkdir(parents=True, exist_ok=True)
        p.write_text(f"payload:{name}")
    with tarfile.open(path, "w:gz") as t:
        for name in names:
            t.add(stage / name, arcname=name)
    shutil.rmtree(stage)
    return path


@pytest.fixture
def fake_fetch(tmp_path, monkeypatch):
    """Patch urlretrieve in both modules to copy from a local fixture dir."""
    fixtures = tmp_path / "fixtures"
    fixtures.mkdir()

    def fetch(url, out):
        name = url.split("/")[-1].split("?")[0]
        src = fixtures / name
        assert src.exists(), f"no fixture for {url}"
        shutil.copy2(src, out)

    monkeypatch.setattr(dd, "urlretrieve", fetch)
    monkeypatch.setattr(dm, "urlretrieve", fetch)
    return fixtures


def test_download_md5_pass_and_mismatch(tmp_path, fake_fetch):
    payload = _make_zip(fake_fetch / "blob.zip", ["a.txt"]).read_bytes()
    good = hashlib.md5(payload).hexdigest()
    out = dd._download("http://x/blob.zip", tmp_path / "d", md5=good)
    assert out.read_bytes() == payload
    with pytest.raises(AssertionError, match="md5 mismatch"):
        dd._download("http://x/blob.zip", tmp_path / "d2", md5="0" * 32)


def test_download_reuses_existing_file(tmp_path, fake_fetch):
    # a pre-existing file short-circuits the fetch (resume-friendly behavior)
    dest = tmp_path / "d"
    dest.mkdir()
    (dest / "blob.zip").write_bytes(b"already here")
    out = dd._download("http://x/blob.zip", dest)
    assert out.read_bytes() == b"already here"


def test_extract_zip_tar_and_bare_copy(tmp_path):
    zp = _make_zip(tmp_path / "a.zip", ["x/1.txt", "2.txt"])
    dd._extract(zp, tmp_path / "outz")
    assert (tmp_path / "outz/x/1.txt").read_text() == "payload:x/1.txt"
    assert not zp.exists()  # consumed archives are removed

    tp = _make_targz(tmp_path / "b.tar.gz", ["y/3.txt"])
    dd._extract(tp, tmp_path / "outt")
    assert (tmp_path / "outt/y/3.txt").exists()
    assert not tp.exists()

    bare = tmp_path / "00000003_015.jpg.cat"
    bare.write_text("188 202 ...")
    outdir = tmp_path / "outb"
    outdir.mkdir()
    dd._extract(bare, outdir)
    assert (outdir / bare.name).read_text() == "188 202 ..."
    assert bare.exists()  # bare files are copied, not consumed


def test_simple_dataset_flow_and_skip(tmp_path, fake_fetch, capsys):
    _make_targz(fake_fetch / "pet_data_25.tar.gz", ["data_25/c1/img.jpg"])
    dd.AVAILABLE["data_25"](tmp_path)
    assert (tmp_path / "data_25/c1/img.jpg").exists()
    assert not (tmp_path / "pet_data_25.tar.gz").exists()
    # second run: layout exists -> skip without touching the network
    (fake_fetch / "pet_data_25.tar.gz").unlink()
    dd.AVAILABLE["data_25"](tmp_path)
    assert "Skipping data_25" in capsys.readouterr().out


def test_cat_dataset_zip_plus_bare_landmark_file(tmp_path, fake_fetch, monkeypatch):
    _make_zip(fake_fetch / "CAT_DATASET_01.zip", ["CAT_00/00000001_000.jpg"])
    (fake_fetch / "00000003_015.jpg.cat").write_text("9 1 2 3 4 5 6")
    monkeypatch.setattr(dd, "CAT_DATASET", (
        "http://x/CAT_DATASET_01.zip", "http://x/00000003_015.jpg.cat"))
    dd.download_cat_dataset(tmp_path)
    root = tmp_path / "cats"
    assert (root / "CAT_00/00000001_000.jpg").exists()
    # the replacement landmark file lands next to the extracted archives
    assert (root / "00000003_015.jpg.cat").read_text() == "9 1 2 3 4 5 6"


def test_oxford_flow_verifies_md5(tmp_path, fake_fetch, monkeypatch):
    images = _make_targz(fake_fetch / "images.tar.gz", ["images/cat.jpg"])
    annos = _make_targz(fake_fetch / "annotations.tar.gz",
                        ["annotations/xmls/cat.xml"])
    monkeypatch.setattr(dd, "OXFORD", (
        ("http://x/images.tar.gz",
         hashlib.md5(images.read_bytes()).hexdigest()),
        ("http://x/annotations.tar.gz",
         hashlib.md5(annos.read_bytes()).hexdigest()),
    ))
    dd.download_oxford(tmp_path)
    root = tmp_path / "oxford-iiit-pet"
    assert (root / "images/cat.jpg").exists()
    assert (root / "annotations/xmls/cat.xml").exists()


def test_unknown_dataset_names_rejected():
    assert "nope" not in dd.AVAILABLE
    assert set(dd.AVAILABLE) == {
        "oxford", "cat_dataset", "data_25", "data_25_labeled",
        "kashtanka_test", "petfinder_cats", "petfinder_dogs",
    }


def test_download_models_extracts_and_skips(tmp_path, fake_fetch, monkeypatch, capsys):
    _make_zip(fake_fetch / "to_reproduce.zip",
              ["to_reproduce/cat_fe/cat_fe_head.py",
               "to_reproduce/cat_fe/epoch=58-step=43364.ckpt"])
    monkeypatch.chdir(tmp_path)
    dm.main()
    bundle = tmp_path / "configs/to_reproduce"
    assert (bundle / "cat_fe/cat_fe_head.py").exists()
    assert not (tmp_path / "configs/to_reproduce.zip").exists()
    # second run: bundle present -> no fetch (fixture removed to prove it)
    (fake_fetch / "to_reproduce.zip").unlink()
    dm.main()
    assert "done" in capsys.readouterr().out
