"""Oxford-IIIT Pet / CatLMD / RecDataset behavior on synthetic fixture trees."""

import json
from pathlib import Path

import numpy as np
import pytest
from PIL import Image

from pets_face_recognition_tpu.data_loading import RecDataset
from pets_face_recognition_tpu.data_loading.lmd_dataset import (
    CatLMDDataset,
    CatLMDSubset,
)
from pets_face_recognition_tpu.data_loading.oxford import (
    OxfordIIITPet,
    OxfordSubset,
)
from pets_face_recognition_tpu.utils.collate import DetectionCollate


@pytest.fixture
def oxford_tree(tmp_path):
    """Minimal Oxford-IIIT layout: images + xmls + trimaps + split files."""
    base = tmp_path / "oxford-iiit-pet"
    (base / "images").mkdir(parents=True)
    (base / "annotations" / "xmls").mkdir(parents=True)
    (base / "annotations" / "trimaps").mkdir(parents=True)
    rng = np.random.RandomState(0)
    ids = []
    for i, (breed, species) in enumerate(
        [("abyssinian", "cat"), ("beagle", "dog"), ("bengal", "cat")]
    ):
        image_id = f"{breed}_{i + 1}"
        ids.append(image_id)
        img = rng.randint(0, 255, (60, 80, 3), np.uint8)
        Image.fromarray(img).save(base / "images" / f"{image_id}.jpg")
        # trimap: 2 = background elsewhere, foreground block
        tri = np.full((60, 80), 2, np.uint8)
        tri[10:50, 20:70] = 1
        Image.fromarray(tri).save(
            base / "annotations" / "trimaps" / f"{image_id}.png")
        xml = (
            f"<annotation><object><name>{species}</name><bndbox>"
            f"<xmin>25</xmin><ymin>12</ymin><xmax>60</xmax><ymax>40</ymax>"
            f"</bndbox></object></annotation>"
        )
        (base / "annotations" / "xmls" / f"{image_id}.xml").write_text(xml)
    split = "\n".join(f"{i} {n + 1} 1 1" for n, i in enumerate(ids))
    (base / "annotations" / "trainval.txt").write_text(split)
    (base / "annotations" / "test.txt").write_text("")
    return base


def test_oxford_body_bbox_from_trimap(oxford_tree):
    ds = OxfordIIITPet(oxford_tree, target_types=("body_bbox", "segmentation"))
    assert len(ds) == 3
    img, (body_bbox, seg) = ds[0]
    assert img.shape == (60, 80, 3)
    np.testing.assert_array_equal(body_bbox[0], [20, 10, 70, 50])  # trimap extents
    assert seg.shape == (60, 80) and seg.sum() == 40 * 50


def test_oxford_head_bbox_and_species(oxford_tree):
    ds = OxfordIIITPet(oxford_tree, target_types=("bbox",))
    _, (bbox,) = ds[1]
    np.testing.assert_array_equal(bbox[0], [25, 12, 60, 40])
    assert ds.big_classes == [1, 0, 1]  # cat=1, dog=0


def test_oxford_subset_collates(oxford_tree):
    ds = OxfordIIITPet(oxford_tree, target_types=("body_bbox", "segmentation"))
    sub = OxfordSubset(ds, [0, 1, 2], rotate90=True, seed=3)
    collate = DetectionCollate((64, 64), max_boxes=2, with_masks=True)
    batch = collate([sub[i] for i in range(3)])
    assert batch["images"].shape == (3, 64, 64, 3)
    assert batch["boxes"].shape == (3, 2, 4)
    assert batch["masks"].shape == (3, 2, 64, 64)
    assert batch["valid"][:, 0].all() and not batch["valid"][:, 1].any()
    # boxes stay inside the letterboxed canvas
    assert (batch["boxes"] >= 0).all() and (batch["boxes"] <= 64).all()


@pytest.fixture
def cat_lmd_tree(tmp_path):
    root = tmp_path / "cats"
    sub = root / "CAT_00"
    sub.mkdir(parents=True)
    rng = np.random.RandomState(1)
    for i in range(3):
        img = rng.randint(0, 255, (100, 120, 3), np.uint8)
        p = sub / f"img_{i}.jpg"
        Image.fromarray(img).save(p)
        # 9 landmarks; first three: left eye, right eye, nose
        pts = [40, 40, 70, 42, 55, 60] + [0] * 12
        (sub / f"img_{i}.jpg.cat").write_text("9 " + " ".join(map(str, pts)))
    return root


def test_cat_lmd_dataset(cat_lmd_tree):
    ds = CatLMDDataset(cat_lmd_tree)
    assert len(ds) == 3
    img, t = ds[0]
    assert t["keypoints"].shape == (1, 3, 3)
    np.testing.assert_array_equal(t["keypoints"][0, 0, :2], [40, 40])
    box = t["boxes"][0]
    # synthesized head bbox contains all landmarks
    for kp in t["keypoints"][0]:
        assert box[0] <= kp[0] <= box[2] and box[1] <= kp[1] <= box[3]


def test_cat_lmd_subset_rotation_keeps_consistency(cat_lmd_tree):
    ds = CatLMDDataset(cat_lmd_tree)
    sub = CatLMDSubset(ds, [0, 1, 2], rotate=20.0, seed=7)
    img, t = sub[0]
    assert img.shape == (100, 120, 3)
    kps = t["keypoints"][0]
    box = t["boxes"][0]
    for kp in kps:
        if kp[2] > 0:  # visible keypoints stay in the (enlarged) box
            assert box[0] - 2 <= kp[0] <= box[2] + 2
            assert box[1] - 2 <= kp[1] <= box[3] + 2


def test_rec_dataset_card_scan(tmp_path):
    root = tmp_path / "cards"
    rng = np.random.RandomState(0)
    for name, animal, n_imgs in [("rf1", 1, 3), ("rf2", 2, 3), ("rf3", 1, 1)]:
        d = root / name
        d.mkdir(parents=True)
        (d / "card.json").write_text(json.dumps({"pet": {"animal": animal}}))
        for i in range(n_imgs):
            Image.fromarray(
                rng.randint(0, 255, (30, 30, 3), np.uint8)
            ).save(d / f"{i}.jpg")
    ds = RecDataset(root, type_=1, min_number=3)
    # only rf1 qualifies (type 1, >= 3 images)
    assert len(ds) == 3
    assert set(p.parent.name for p in ds.index_to_path.values()) == {"rf1"}
    item = ds[0]
    assert item["x"].shape == (30, 30, 3)
    assert item["label"] == 0
