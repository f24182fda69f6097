"""Generate tiny synthetic datasets in the reference on-disk layouts.

The image in this environment has no network egress, so the real corpora
(``download_datasets.py``) are unavailable. This tool synthesizes structurally
identical miniatures so every training entry point can be driven end-to-end
(``configs/smoke/*.py`` → ``main.py`` / ``main_detection.py`` /
``main_keypoints.py``), exercising the exact dataset parsers:

- ``smoke_fe_cats/``: identity card folders of JPEGs (``RecDataset`` layout,
  reference ``data_loading/dataset.py:57-64``) — per-identity color/texture
  signature so the FE can actually separate classes;
- ``CAT_DATASET/``: ``*.jpg`` + ``*.jpg.cat`` 9-landmark files (reference
  ``data_loading/lmd_dataset.py:48-75``), landmarks drawn as bright dots;
- ``oxford-iiit-pet/``: ``images/``, ``annotations/{trainval,test}.txt``,
  ``annotations/xmls/*.xml``, ``annotations/trimaps/*.png`` (reference
  ``data_loading/oxford.py``), with an elliptical "pet" blob whose trimap
  matches it.

Usage: ``python tools/make_smoke_datasets.py [--root /tmp/pfr_smoke]``.
Regeneration is deterministic (seeded) and idempotent.
"""

from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np
from PIL import Image


def _texture(rng: np.random.RandomState, base: np.ndarray, size: int) -> np.ndarray:
    """Identity-colored noisy texture with a few geometric features."""
    img = np.clip(
        base[None, None, :]
        + rng.normal(0, 25, (size, size, 3)), 0, 255
    ).astype(np.uint8)
    # two "eyes" and a "nose" so crops have structure
    yy, xx = np.mgrid[:size, :size]
    for cx, cy, r, col in ((size // 3, size // 3, size // 12, 0),
                           (2 * size // 3, size // 3, size // 12, 0),
                           (size // 2, 2 * size // 3, size // 10, 255)):
        m = (xx - cx) ** 2 + (yy - cy) ** 2 < r ** 2
        img[m] = col
    return img


def make_fe(root: Path, n_ids: int = 16, n_imgs: int = 6, size: int = 224,
            seed: int = 0) -> Path:
    rng = np.random.RandomState(seed)
    out = root / "smoke_fe_cats"
    for i in range(n_ids):
        d = out / f"card_{i:03d}"
        d.mkdir(parents=True, exist_ok=True)
        base = rng.uniform(40, 215, 3)
        for j in range(n_imgs):
            Image.fromarray(_texture(rng, base, size)).save(
                d / f"img_{j}.jpg", quality=92
            )
    return out


def make_cat_dataset(root: Path, n_imgs: int = 48, size: int = 320,
                     seed: int = 1) -> Path:
    rng = np.random.RandomState(seed)
    out = root / "CAT_DATASET" / "CAT_00"
    out.mkdir(parents=True, exist_ok=True)
    for i in range(n_imgs):
        img = rng.randint(30, 120, (size, size, 3), np.uint8)
        cx, cy = rng.randint(size // 3, 2 * size // 3, 2)
        d = rng.randint(30, 60)  # inter-eye half distance
        lx, ly = cx - d, cy - rng.randint(-5, 6)
        rx, ry = cx + d, cy - rng.randint(-5, 6)
        nx, ny = cx + rng.randint(-8, 9), cy + int(1.2 * d)
        pts = [(lx, ly), (rx, ry), (nx, ny)]
        # 6 filler landmarks (ears etc) to complete the 9-landmark format
        pts += [(int(np.clip(x + rng.randint(-d, d), 1, size - 2)),
                 int(np.clip(y - d + rng.randint(-10, 10), 1, size - 2)))
                for x, y in (pts[0], pts[1], pts[2])] * 2
        yy, xx = np.mgrid[:size, :size]
        for (x, y), col in zip(pts[:3], ((255, 255, 255), (255, 255, 255),
                                         (255, 128, 128))):
            m = (xx - x) ** 2 + (yy - y) ** 2 < 36
            img[m] = col
        name = f"img_{i:05d}.jpg"
        Image.fromarray(img).save(out / name, quality=92)
        coords = " ".join(f"{int(x)} {int(y)}" for x, y in pts[:9])
        (out / f"{name}.cat").write_text(f"9 {coords}")
    return out.parent


_XML = """<annotation><object><name>{name}</name><bndbox>
<xmin>{x1}</xmin><ymin>{y1}</ymin><xmax>{x2}</xmax><ymax>{y2}</ymax>
</bndbox></object></annotation>"""


def make_oxford(root: Path, n_imgs: int = 40, size: int = 320,
                seed: int = 2) -> Path:
    rng = np.random.RandomState(seed)
    base = root / "oxford-iiit-pet"
    (base / "images").mkdir(parents=True, exist_ok=True)
    (base / "annotations" / "xmls").mkdir(parents=True, exist_ok=True)
    (base / "annotations" / "trimaps").mkdir(parents=True, exist_ok=True)
    lines = {"trainval": [], "test": []}
    for i in range(n_imgs):
        species = "cat" if i % 2 == 0 else "dog"
        stem = f"{'Abyssinian' if species == 'cat' else 'beagle'}_{i + 1}"
        img = rng.randint(140, 200, (size, size, 3), np.uint8)
        cx, cy = rng.randint(size // 3, 2 * size // 3, 2)
        ax, ay = rng.randint(40, 80, 2)
        yy, xx = np.mgrid[:size, :size]
        blob = ((xx - cx) / ax) ** 2 + ((yy - cy) / ay) ** 2 < 1.0
        img[blob] = rng.randint(0, 100, 3, np.uint8)
        Image.fromarray(img).save(base / "images" / f"{stem}.jpg", quality=92)
        # trimap: 1 = fg, 2 = bg, 3 = boundary (reference: != 2 is foreground)
        tri = np.full((size, size), 2, np.uint8)
        tri[blob] = 1
        Image.fromarray(tri).save(base / "annotations" / "trimaps" / f"{stem}.png")
        # head bbox xml: top part of the blob
        x1, x2 = max(0, cx - ax // 2), min(size - 1, cx + ax // 2)
        y1, y2 = max(0, cy - ay), cy
        (base / "annotations" / "xmls" / f"{stem}.xml").write_text(
            _XML.format(name=species, x1=x1, y1=y1, x2=x2, y2=y2)
        )
        label = 1 if species == "cat" else 2
        lines["trainval" if i % 5 else "test"].append(f"{stem} {label} 1 1")
    for split, ls in lines.items():
        (base / "annotations" / f"{split}.txt").write_text("\n".join(ls) + "\n")
    return base


def _pet_image(rng: np.random.RandomState, size: int = 320,
               base: np.ndarray | None = None) -> np.ndarray:
    """Pet-like image with the eyes+nose structure the smoke keypoint detector
    is trained on (same construction as :func:`make_cat_dataset`). ``base``
    tints the background with a per-identity color signature so feature
    extractors can rank same-identity cards together."""
    if base is not None:
        img = np.clip(base[None, None, :] + rng.normal(0, 20, (size, size, 3)),
                      0, 255).astype(np.uint8)
    else:
        img = rng.randint(30, 120, (size, size, 3), np.uint8)
    cx, cy = rng.randint(size // 3, 2 * size // 3, 2)
    d = rng.randint(30, 60)
    pts = [(cx - d, cy), (cx + d, cy), (cx, cy + int(1.2 * d))]
    yy, xx = np.mgrid[:size, :size]
    for (x, y), col in zip(pts, ((255, 255, 255), (255, 255, 255),
                                 (255, 128, 128))):
        m = (xx - x) ** 2 + (yy - y) ** 2 < 36
        img[m] = col
    return img


def make_data25(root: Path, n_cards: int = 6, n_imgs: int = 3,
                seed: int = 3) -> Path:
    """``data_25`` in the kashtanka card layout (``card.json['pet']['animal']``
    + images), including two of the hard-coded bad-image names from
    ``transform_reproduce.DATA_25_EXCLUDE`` so the exclusion-list matching is
    exercised on the smoke corpus."""
    rng = np.random.RandomState(seed)
    out = root / "data_25"
    for i in range(n_cards):
        card = out / (f"rl{131336 + i}" if i % 2 == 0 else f"rf{337006 + i}")
        card.mkdir(parents=True, exist_ok=True)
        (card / "card.json").write_text(
            '{"pet": {"animal": %d}}' % (1 + i % 2)
        )
        for j in range(n_imgs):
            Image.fromarray(_pet_image(rng)).save(
                card / f"{600000 + 10 * i + j}.jpg", quality=92
            )
    # excluded names (transform_reproduce.py exclusion list)
    for rel in ("rl131336/216319.jpg", "rl378360/660074.jpg"):
        p = out / rel
        p.parent.mkdir(parents=True, exist_ok=True)
        if not (p.parent / "card.json").exists():
            (p.parent / "card.json").write_text('{"pet": {"animal": 1}}')
        Image.fromarray(_pet_image(rng)).save(p, quality=92)
    return out


def make_petfinder_extras(root: Path, n_cards: int = 3, n_imgs: int = 2,
                          seed: int = 4) -> tuple[Path, Path]:
    """``petfinder_extra_{dogs,cats}`` folder-of-folders layouts, including the
    exact excluded dirs/files ``transform_reproduce.extra_petfinder`` lists
    (``48683845``, ``45528036``, ``48009947/3.png``, ``24355557/4.png``)."""
    rng = np.random.RandomState(seed)
    dogs = root / "petfinder_extra_dogs"
    cats = root / "petfinder_extra_cats"
    for base, first in ((dogs, 48009947), (cats, 24355557)):
        for i in range(n_cards):
            d = base / str(first + i)
            d.mkdir(parents=True, exist_ok=True)
            for j in range(n_imgs):
                Image.fromarray(_pet_image(rng)).save(d / f"{j}.png")
    # excluded entries must exist (the script iterates them unconditionally)
    for d in (dogs / "48683845", dogs / "45528036"):
        d.mkdir(parents=True, exist_ok=True)
        Image.fromarray(_pet_image(rng)).save(d / "0.png")
    Image.fromarray(_pet_image(rng)).save(dogs / "48009947" / "3.png")
    Image.fromarray(_pet_image(rng)).save(cats / "24355557" / "4.png")
    return dogs, cats


def make_kashtanka_test(root: Path, n_pairs: int = 5, n_extra: int = 3,
                        n_imgs: int = 2, seed: int = 5) -> Path:
    """Kashtanka test split in the exact layout ``generate_tsv_to_reproduce*``
    walks (reference ``generate_tsv_to_reproduce1.py:47-60``):
    ``test/{found,lost}/{<same-name>,extra_*}/<card>/{card.json,*.jpg}`` with a
    top-level ``{"animal": 1|2}`` card.json (1 = dog, 2 = cat — note this
    schema differs from data_25's nested ``pet.animal``). ``n_pairs`` lost
    query cards share a per-identity color signature with their found
    counterpart so retrieval has true matches to rank; ``n_extra`` unmatched
    cards per gallery act as distractors."""
    rng = np.random.RandomState(seed)
    out = root / "test"
    bases = {}  # identity -> color signature

    def _card(d: Path, animal: int, base: np.ndarray):
        d.mkdir(parents=True, exist_ok=True)
        (d / "card.json").write_text('{"animal": %d}' % animal)
        for j in range(n_imgs):
            Image.fromarray(_pet_image(rng, base=base)).save(
                d / f"{j}.jpg", quality=92)

    # identity tints stay inside the smoke detector's training background
    # range (make_cat_dataset: randint(30, 120)) so detection scores clear thr
    for i in range(n_pairs):
        bases[i] = rng.uniform(35, 115, 3)
        animal = 1 + i % 2
        _card(out / "found" / "found" / f"rf{700000 + i}", animal, bases[i])
        _card(out / "lost" / "lost" / f"rl{800000 + i}", animal, bases[i])
    for i in range(n_extra):
        animal = 1 + i % 2
        _card(out / "found" / "extra_found" / f"rf{710000 + i}", animal,
              rng.uniform(35, 115, 3))
        _card(out / "lost" / "extra_lost" / f"rl{810000 + i}", animal,
              rng.uniform(35, 115, 3))
    return out


def make_kashtanka_hard(root: Path, n_ids: int = 120, n_clusters: int = 12,
                        n_distractors: int = 180, n_imgs: int = 3,
                        seed: int = 9) -> Path:
    """HARD retrieval corpus: near-duplicate identities as a quality
    instrument (VERDICT r3 #3).

    The easy smoke test split saturates candR@K=1.0 on separable identities,
    so it cannot measure fidelity deltas (float vs int8, detector choice,
    input dtype). This corpus makes the ranking problem genuinely hard while
    staying inside the smoke detectors' training distribution:

    - identity signatures are drawn from ``n_clusters`` appearance clusters
      with SMALL within-cluster spread — every identity has ~``n_ids /
      n_clusters`` near-duplicate confusers;
    - per-image tint jitter on the same scale as the identity spread
      (lighting), plus face position/scale variation;
    - a second identity cue besides color: the inter-eye distance ``d`` is an
      identity trait with per-image jitter, so embeddings must combine cues.

    Layout: the exact ``test/{found,lost}/{initial,extra}`` tree the
    ``generate_tsv*`` walkers consume — queries are ``lost/lost`` cards, the
    gallery is ``lost/extra_lost`` = one true-match card per query
    (same identity, fresh images) + ``n_distractors`` distractor cards from
    the same clusters. Ground truth (query → its match) lands in
    ``<root>/hard_gt.json``. A minimal ``found`` side keeps the walker happy.
    """
    import json

    rng = np.random.RandomState(seed)
    out = root / "test_hard"
    centers = rng.uniform(45, 105, (n_clusters, 3))

    def _identity():
        c = centers[rng.randint(n_clusters)]
        tint = np.clip(c + rng.normal(0, 5, 3), 35, 115)
        d_eye = rng.randint(32, 56)
        return tint, d_eye

    def _image(tint, d_eye, size=320):
        img = np.clip(tint[None, None, :]
                      + rng.normal(0, 8, 3)[None, None, :]   # lighting
                      + rng.normal(0, 12, (size, size, 3)), 0, 255
                      ).astype(np.uint8)
        cx, cy = rng.randint(size // 3, 2 * size // 3, 2)
        d = max(20, d_eye + rng.randint(-3, 4))
        pts = [(cx - d, cy), (cx + d, cy), (cx, cy + int(1.2 * d))]
        yy, xx = np.mgrid[:size, :size]
        for (x, y), col in zip(pts, ((255, 255, 255), (255, 255, 255),
                                     (255, 128, 128))):
            m = (xx - x) ** 2 + (yy - y) ** 2 < 36
            img[m] = col
        return img

    def _card(d: Path, animal: int, tint, d_eye):
        d.mkdir(parents=True, exist_ok=True)
        (d / "card.json").write_text('{"animal": %d}' % animal)
        for j in range(n_imgs):
            Image.fromarray(_image(tint, d_eye)).save(d / f"{j}.jpg",
                                                      quality=92)

    gt = {}
    for i in range(n_ids):
        tint, d_eye = _identity()
        animal = 1 + i % 2
        q, m = f"rl{900000 + i}", f"rf{950000 + i}"
        _card(out / "lost" / "lost" / q, animal, tint, d_eye)
        _card(out / "lost" / "extra_lost" / m, animal, tint, d_eye)
        gt[q] = m
    for i in range(n_distractors):
        tint, d_eye = _identity()
        _card(out / "lost" / "extra_lost" / f"rf{960000 + i}", 1 + i % 2,
              tint, d_eye)
    # minimal found side (the walker requires both big folders)
    for i in range(2):
        tint, d_eye = _identity()
        _card(out / "found" / "found" / f"rf{990000 + i}", 1 + i, tint, d_eye)
        _card(out / "found" / "extra_found" / f"rf{991000 + i}", 1 + i,
              tint, d_eye)
    (root / "hard_gt.json").write_text(json.dumps(gt, indent=0))
    return out


def main(root: str = "/tmp/pfr_smoke"):
    rootp = Path(root)
    print("fe:", make_fe(rootp))
    print("cat landmarks:", make_cat_dataset(rootp))
    print("oxford:", make_oxford(rootp))
    print("data_25:", make_data25(rootp))
    print("petfinder:", make_petfinder_extras(rootp))
    print("kashtanka test:", make_kashtanka_test(rootp))
    print("kashtanka hard:", make_kashtanka_hard(rootp))


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="/tmp/pfr_smoke")
    main(**vars(ap.parse_args()))
