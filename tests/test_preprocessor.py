"""Preproc pipelines with fake jittable detector fns (CPU)."""

import numpy as np
import pytest
import jax.numpy as jnp

from pets_face_recognition_tpu.preprocessor import (
    IdentityPreproc,
    Preproc3,
    Preproc4,
    Preproc5,
    Preproc6,
)


def _fake_keypoint_detector(score=0.99):
    def fn(images):
        b = images.shape[0]
        return {
            "scores": jnp.full((b, 1), score),
            "valid": jnp.ones((b, 1), bool),
            "boxes": jnp.broadcast_to(
                jnp.asarray([[60.0, 60.0, 260.0, 260.0]]), (b, 1, 4)),
            "keypoints": jnp.broadcast_to(
                jnp.asarray([[[120.0, 130.0, 1.0], [200.0, 132.0, 1.0],
                              [160.0, 200.0, 1.0]]]), (b, 1, 3, 3)),
            "labels": jnp.ones((b, 1), jnp.int32),
        }
    return fn


def _fake_mask_detector(score=0.99):
    kp = _fake_keypoint_detector(score)

    def fn(images):
        out = dict(kp(images))
        b = images.shape[0]
        m = np.zeros((28, 28), np.float32)
        m[4:24, 4:24] = 0.9
        out["masks"] = jnp.broadcast_to(jnp.asarray(m), (b, 1, 28, 28))
        return out
    return fn


@pytest.fixture
def img(rng):
    return rng.randint(0, 255, (240, 300, 3)).astype(np.uint8)


def test_preproc3_aligns(img):
    pre = Preproc3(model_fn=_fake_keypoint_detector(), thr=0.5,
                   input_size=(320, 320))
    out = pre(img)
    assert out.shape == (224, 224, 3)
    # batch path agrees with the single-image path
    batch_out, valid, raw = pre.batch([img, img])
    assert valid.all()
    np.testing.assert_allclose(batch_out[0], out, atol=1e-3)
    assert raw["keypoints"].shape == (2, 3, 2)


def test_preproc3_rejects_low_score(img):
    pre = Preproc3(model_fn=_fake_keypoint_detector(score=0.2), thr=0.9,
                   input_size=(320, 320))
    with pytest.raises(AssertionError):
        pre(img)
    _, valid, _ = pre.batch([img])
    assert not valid[0]


def test_preproc4_crops_bbox(img):
    pre = Preproc4(model_fn=_fake_mask_detector(), thr=0.5,
                   input_size=(320, 320))
    crop = pre(img)
    # bbox (60,60,260,260) at letterbox scale back to original coords
    assert crop.ndim == 3 and crop.shape[0] > 20 and crop.shape[1] > 20
    # masked variant zeroes outside the pasted mask
    pre_m = Preproc4(model_fn=_fake_mask_detector(), thr=0.5, use_mask=True,
                     input_size=(320, 320))
    crop_m = pre_m(img)
    assert crop_m.shape[0] <= crop.shape[0] + 1


def test_preproc5_soft_mask(img):
    pre = Preproc5(model_fn=_fake_mask_detector(), thr=0.5, mask_thr=0.5,
                   input_size=(320, 320))
    crop = pre(img)
    assert crop.dtype == np.uint8 and crop.ndim == 3
    # soft region (mask 0 squared -> 0) darkens edges relative to center
    assert crop.mean() > 0


def test_preproc6_returns_bbox_for_metrics(img):
    pre = Preproc6(model_fn=_fake_keypoint_detector(), thr=0.5,
                   input_size=(320, 320))
    pre.return_for_metrics = True
    bbox, scores = pre(img)
    assert bbox.shape == (4,) and bbox.dtype == np.int64 or bbox.dtype == int
    assert len(scores) >= 1


def test_identity_preproc(img):
    pre = IdentityPreproc()
    np.testing.assert_array_equal(pre(img), img)


def test_variant_pipelines_bind_distinct_checkpoints(monkeypatch):
    """Preproc7-13 must resolve per-variant checkpoints (ref binds each ablation
    pipeline to its own mlruns ckpt, ``preprocessor/__init__.py:322-610``)."""
    from pets_face_recognition_tpu.preprocessor import (
        Preproc7, Preproc8, Preproc9, Preproc10, Preproc11, Preproc12,
        Preproc13,
    )

    expected = {
        Preproc7: ("v2", True), Preproc8: ("v2", False),
        Preproc9: ("v3", True), Preproc10: ("v3", False),
        Preproc11: ("v4", True), Preproc12: ("v4", False),
        Preproc13: ("prod", False),
    }
    from pets_face_recognition_tpu.preprocessor import Preproc3, Preproc6

    for cls, (variant, aligned) in expected.items():
        pre = cls()
        assert pre._loader.variant == variant, cls.__name__
        assert isinstance(pre, Preproc3 if aligned else Preproc6), cls.__name__

    # the deferred loader reaches configs.pipelines with the right variant
    import configs.pipelines as cp

    seen = []
    monkeypatch.setattr(cp, "keypoint_pipeline",
                        lambda variant="prod": seen.append(variant) or "FN")
    assert Preproc9().model_fn == "FN"
    assert seen == ["v3"]

    # env-var mapping: each variant resolves its own checkpoint path
    envs = {cp.KEYPOINT_VARIANTS[v][0] for v in ("prod", "v2", "v3", "v4")}
    assert len(envs) == 4

    # explicit model_fn still wins over the variant binding
    assert Preproc11(model_fn="X").model_fn == "X"


def test_pipeline_loader_failure_raises_runtime_error_and_caches():
    """A failed model BUILD must escape the per-image silent-skip semantics
    (callers catch AssertionError/ValueError/OSError only) as RuntimeError,
    and the failure must be cached — the expensive loader runs ONCE
    (ADVICE r4 #2/#3; regression for f95d97e)."""
    from pets_face_recognition_tpu.preprocessor import _ModelPipeline

    calls = []

    def bad_loader():
        calls.append(1)
        raise ValueError("bad checkpoint tree")

    pipe = _ModelPipeline(loader=bad_loader)
    with pytest.raises(RuntimeError, match="model load failed"):
        pipe.model_fn
    with pytest.raises(RuntimeError, match="model load failed"):
        pipe.model_fn
    assert len(calls) == 1, "loader must not be re-run after a cached failure"


def _failing_loader():
    raise OSError("missing checkpoint")


def test_pipeline_loader_failure_cleared_by_pickle_roundtrip():
    """__getstate__ drops the cached failure (a config error may be fixed
    between pickle and unpickle, mirroring the model_fn reload)."""
    import pickle

    from pets_face_recognition_tpu.preprocessor import _ModelPipeline

    pipe = _ModelPipeline(loader=_failing_loader)
    with pytest.raises(RuntimeError):
        pipe.model_fn
    clone = pickle.loads(pickle.dumps(pipe))
    assert clone._load_error is None
