"""Preproc4 masked path vs a live-torch oracle of the reference's code.

The oracle replicates ref ``preprocessor/__init__.py:235-250`` exactly: the
torchvision ``paste_masks_in_image`` full-resolution paste (real
``torch.nn.functional.interpolate``), strict ``> mask_thr`` binarization,
image multiply, and the row/col-extent bbox tightening — including the
``.index(False)`` ValueError on an all-zero mask (silently dropped upstream,
``transform_reproduce.py:41``).
"""

import numpy as np
import pytest
import jax.numpy as jnp

from pets_face_recognition_tpu.ops.masks import paste_mask_np
from pets_face_recognition_tpu.preprocessor import Preproc4


def _torch_paste(mask28: np.ndarray, box: np.ndarray, im_h: int, im_w: int):
    """torchvision paste_mask_in_image with real torch ops (the reference's
    mask backend: torchvision roi_heads paste, padding=1)."""
    import torch
    import torch.nn.functional as F

    pad = 1
    S = mask28.shape[0]
    mask = torch.from_numpy(mask28.astype(np.float32))[None, None]
    mask = F.pad(mask, (pad, pad, pad, pad))
    scale = (S + 2.0 * pad) / S
    cx, cy = (box[2] + box[0]) * 0.5, (box[3] + box[1]) * 0.5
    w2, h2 = (box[2] - box[0]) * 0.5 * scale, (box[3] - box[1]) * 0.5 * scale
    b = torch.tensor([cx - w2, cy - h2, cx + w2, cy + h2]).to(torch.int64)
    w = max(int(b[2] - b[0] + 1), 1)
    h = max(int(b[3] - b[1] + 1), 1)
    mask = F.interpolate(mask, size=(h, w), mode="bilinear",
                         align_corners=False)[0, 0]
    im = torch.zeros((im_h, im_w))
    x0, x1 = max(int(b[0]), 0), min(int(b[2]) + 1, im_w)
    y0, y1 = max(int(b[1]), 0), min(int(b[3]) + 1, im_h)
    im[y0:y1, x0:x1] = mask[y0 - int(b[1]):y1 - int(b[1]),
                            x0 - int(b[0]):x1 - int(b[0])]
    return im.numpy()


def _ref_masked_branch(img, box_float, mask28, mask_thr):
    """ref preprocessor/__init__.py:235-250, verbatim semantics."""
    bbox = np.round(box_float).astype(int)
    mask = (_torch_paste(mask28, box_float, *img.shape[:2]) > mask_thr
            ).astype(int)
    aimg = img * mask[:, :, None]
    bbox[0] = max(bbox[0], (mask.sum(axis=0) == 0).tolist().index(False))
    bbox[1] = max(bbox[1], (mask.sum(axis=1) == 0).tolist().index(False))
    bbox[2] = min(bbox[2],
                  mask.shape[1] - (mask.sum(axis=0) == 0).tolist()[::-1]
                  .index(False))
    bbox[3] = min(bbox[3],
                  mask.shape[0] - (mask.sum(axis=1) == 0).tolist()[::-1]
                  .index(False))
    return aimg[bbox[1]:bbox[3], bbox[0]:bbox[2]].astype(np.uint8), bbox


def _blob_mask(lo=8, hi=20, val=0.95):
    m = np.zeros((28, 28), np.float32)
    m[lo:hi, lo:hi] = val
    return m


def _fake_mask_detector(box, mask28, score=0.99):
    box = np.asarray(box, np.float32)

    def fn(images):
        b = images.shape[0]
        return {
            "scores": jnp.full((b, 1), score),
            "valid": jnp.ones((b, 1), bool),
            "boxes": jnp.broadcast_to(jnp.asarray(box)[None, None], (b, 1, 4)),
            "labels": jnp.ones((b, 1), jnp.int32),
            "masks": jnp.broadcast_to(jnp.asarray(mask28), (b, 1, 28, 28)),
        }
    return fn


def test_paste_mask_np_matches_torchvision(rng):
    for box in ([40.0, 60.0, 200.0, 240.0], [12.3, 7.9, 301.4, 288.2],
                [-5.0, 10.0, 150.0, 330.0]):  # incl. out-of-image overhang
        mask28 = rng.rand(28, 28).astype(np.float32)
        ours = paste_mask_np(mask28, np.asarray(box), 320, 320)
        torch_ref = _torch_paste(mask28, np.asarray(box, np.float64), 320, 320)
        np.testing.assert_allclose(ours, torch_ref, atol=1e-5)


@pytest.mark.parametrize("mask28,desc", [
    (_blob_mask(8, 20), "interior blob (tightens all four sides)"),
    (_blob_mask(0, 28), "full-box blob (no tightening)"),
    (_blob_mask(2, 14), "corner blob (tightens right/bottom only)"),
])
def test_preproc4_masked_matches_reference(rng, mask28, desc):
    # 320x320 image = detector input size, so letterbox scale=1 pad=0 and the
    # fake detector's box is in original coordinates directly
    img = rng.randint(0, 255, (320, 320, 3)).astype(np.uint8)
    box = np.array([41.7, 60.2, 199.6, 239.9], np.float32)
    pre = Preproc4(model_fn=_fake_mask_detector(box, mask28), thr=0.5,
                   masked=True, mask_thr=0.7, input_size=(320, 320))

    want_crop, want_bbox = _ref_masked_branch(
        img.astype(np.int64), box.astype(np.float64), mask28, 0.7)

    crops, valid, raw = pre.batch([img])
    assert valid[0], desc
    got_bbox = np.round(raw["boxes"][0]).astype(int)
    np.testing.assert_array_equal(got_bbox, want_bbox, err_msg=desc)
    got_crop = np.asarray(crops[0])
    assert got_crop.shape == want_crop.shape, desc
    np.testing.assert_allclose(got_crop, want_crop, atol=1e-4, err_msg=desc)

    # single-image compat path: return_for_metrics returns (tightened bbox,
    # scores) like the reference (ref :247-248)
    pre.return_for_metrics = True
    bbox_rm, scores_rm = pre(img)
    np.testing.assert_array_equal(bbox_rm, want_bbox, err_msg=desc)


def test_preproc4_all_zero_mask_drops_image(rng):
    # reference: `.index(False)` raises ValueError -> silently skipped image
    img = rng.randint(0, 255, (320, 320, 3)).astype(np.uint8)
    box = np.array([41.7, 60.2, 199.6, 239.9], np.float32)
    pre = Preproc4(model_fn=_fake_mask_detector(box, np.zeros((28, 28),
                                                              np.float32)),
                   thr=0.5, masked=True, mask_thr=0.7, input_size=(320, 320))
    crops, valid, _ = pre.batch([img])
    assert not valid[0]
    with pytest.raises(AssertionError):
        pre(img)


def test_preproc4_unmasked_box_not_tightened(rng):
    img = rng.randint(0, 255, (320, 320, 3)).astype(np.uint8)
    box = np.array([41.7, 60.2, 199.6, 239.9], np.float32)
    pre = Preproc4(model_fn=_fake_mask_detector(box, _blob_mask(8, 20)),
                   thr=0.5, masked=False, input_size=(320, 320))
    crops, valid, raw = pre.batch([img])
    assert valid[0]
    np.testing.assert_allclose(raw["boxes"][0], box, atol=0.51)
    # crop uses the rounded box, unmasked pixels
    bb = np.round(box).astype(int)
    np.testing.assert_allclose(
        np.asarray(crops[0]), img[bb[1]:bb[3], bb[0]:bb[2]], atol=1e-4)
