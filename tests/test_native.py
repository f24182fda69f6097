"""Native JPEG decode + letterbox vs the PIL/cv2 reference path."""

import numpy as np
import pytest
from PIL import Image

from pets_face_recognition_tpu import native
from pets_face_recognition_tpu.utils.collate import letterbox_image

pytestmark = pytest.mark.skipif(
    not native.is_available(), reason="native toolchain/libjpeg unavailable"
)


@pytest.fixture
def jpegs(tmp_path, rng):
    paths = []
    for i, (h, w) in enumerate([(480, 640), (333, 217), (64, 64)]):
        img = rng.randint(0, 255, (h, w, 3)).astype(np.uint8)
        p = tmp_path / f"{i}.jpg"
        Image.fromarray(img).save(p, quality=92)
        paths.append(p)
    return paths


def test_decode_batch_matches_letterbox(jpegs):
    imgs, ok, scales, pads = native.decode_batch(jpegs, (320, 320))
    assert ok.all()
    for i, p in enumerate(jpegs):
        ref, s, (px, py) = letterbox_image(
            np.array(Image.open(p).convert("RGB")), (320, 320)
        )
        assert abs(s - scales[i]) < 1e-6
        assert (px, py) == tuple(pads[i])
        diff = np.abs(ref.astype(float) - imgs[i].astype(float))
        assert diff.mean() < 1.0, f"image {i}: mean diff {diff.mean()}"


def test_decode_batch_flags_failures(jpegs, tmp_path):
    bad = tmp_path / "nope.jpg"
    (tmp_path / "garbage.jpg").write_bytes(b"not a jpeg")
    paths = list(jpegs) + [bad, tmp_path / "garbage.jpg"]
    imgs, ok, _, _ = native.decode_batch(paths, (128, 128))
    assert list(ok) == [True, True, True, False, False]
    assert imgs[3].sum() == 0  # failed slots zeroed


def test_decode_single(jpegs):
    img = native.decode_single(jpegs[0])
    ref = np.array(Image.open(jpegs[0]).convert("RGB"))
    assert img.shape == ref.shape
    np.testing.assert_array_equal(img, ref)
