"""Download the 7 datasets into ``../pets_datasets`` (reference
``download_datasets.py`` URL tables + per-dataset CLI selection).

Implemented with stdlib urllib (no torchvision here); md5 verified where the
reference specifies one. NOTE: this image has zero network egress — the script is
provided for capability parity and will simply fail fast offline.
"""

import hashlib
import shutil
import sys
import tarfile
import zipfile
from pathlib import Path
from urllib.request import urlretrieve

OXFORD = (
    ("https://www.robots.ox.ac.uk/~vgg/data/pets/data/images.tar.gz",
     "5c4f3ee8e5d25df40f4fd59a7f44e54c"),
    ("https://www.robots.ox.ac.uk/~vgg/data/pets/data/annotations.tar.gz",
     "95a8c909bbe2e81eed6a22bccdf3f68f"),
)
CAT_DATASET = (
    "https://ia801607.us.archive.org/20/items/CAT_DATASET/CAT_DATASET_01.zip",
    "https://ia801607.us.archive.org/20/items/CAT_DATASET/CAT_DATASET_02.zip",
    "https://ia801607.us.archive.org/20/items/CAT_DATASET/00000003_015.jpg.cat",
)
DATA_25 = ("https://minio.k8s.grechka.family/public-shared-blobs/pet_data_25.tar.gz",)
KASHTANKA_TEST = (
    "https://minio.k8s.grechka.family/public-shared-blobs/_blip_split_v3_public.tar.gz",
)
DATA_25_LABELED = (
    "https://zenodo.org/record/6664769/files/data_25_labeled.zip?download=1",
)
PETFINDER_CATS = tuple(
    f"https://zenodo.org/record/6656292/files/petfinder_extra_cats{i}.zip?download=1"
    for i in range(1, 7)
)
PETFINDER_DOGS = tuple(
    f"https://zenodo.org/record/6660349/files/petfinder_extra_dogs{i}.zip?download=1"
    for i in range(1, 10)
)


def _download(url: str, dest: Path, md5: str | None = None) -> Path:
    # dest is the directory the archive lands in — create it, not its parent
    # (a fresh ../pets_datasets has no per-dataset subdirs yet)
    dest.mkdir(parents=True, exist_ok=True)
    name = url.split("/")[-1].split("?")[0]
    out = dest / name
    if not out.exists():
        print(f"downloading {url} -> {out}")
        urlretrieve(url, out)
    if md5:
        digest = hashlib.md5(out.read_bytes()).hexdigest()
        assert digest == md5, f"md5 mismatch for {out}: {digest} != {md5}"
    return out


def _extract(archive: Path, dest: Path, remove: bool = True) -> None:
    if archive.suffix == ".zip":
        with zipfile.ZipFile(archive) as z:
            z.extractall(dest)
    elif archive.name.endswith((".tar.gz", ".tgz", ".tar")):
        with tarfile.open(archive) as t:
            t.extractall(dest)
    else:
        shutil.copy2(archive, dest)
    if remove and archive.suffix in (".zip", ".gz", ".tar"):
        archive.unlink()


def download_oxford(path: Path):
    root = path / "oxford-iiit-pet"
    if root.exists():
        print("Skipping Oxford IIIT Pet")
        return
    for url, md5 in OXFORD:
        _extract(_download(url, root, md5), root)


def download_cat_dataset(path: Path):
    root = path / "cats"
    if root.exists():
        print("Skipping CAT_DATASET")
        return
    for url in CAT_DATASET:
        got = _download(url, root)
        if got.suffix == ".zip":
            _extract(got, root)


def _simple(name: str, urls, path: Path):
    root = path / name
    if root.exists():
        print(f"Skipping {name}")
        return
    for url in urls:
        _extract(_download(url, path), path)


AVAILABLE = {
    "oxford": download_oxford,
    "cat_dataset": download_cat_dataset,
    "data_25": lambda p: _simple("data_25", DATA_25, p),
    "data_25_labeled": lambda p: _simple("data_25_labeled", DATA_25_LABELED, p),
    "kashtanka_test": lambda p: _simple("test", KASHTANKA_TEST, p),
    "petfinder_cats": lambda p: _simple("petfinder_extra_cats", PETFINDER_CATS, p),
    "petfinder_dogs": lambda p: _simple("petfinder_extra_dogs", PETFINDER_DOGS, p),
}


if __name__ == "__main__":
    path = Path("../pets_datasets")
    path.mkdir(exist_ok=True)
    selected = sys.argv[1:] or list(AVAILABLE)
    for name in selected:
        assert name in AVAILABLE, f"unknown dataset {name}; choose from {list(AVAILABLE)}"
        AVAILABLE[name](path)
