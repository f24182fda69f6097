"""Backbone forward shapes + the lightweight R-CNN factories."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from pets_face_recognition_tpu.models import (
    convnext_tiny,
    mobilenet_v3_large,
    swin_t,
)


def test_convnext_tiny_pyramid(rng):
    model = convnext_tiny(features_only=True)
    x = jnp.asarray(rng.randn(1, 64, 64, 3).astype(np.float32))
    feats = model.apply(model.init(jax.random.PRNGKey(0), x), x)
    assert feats["c2"].shape == (1, 16, 16, 96)
    assert feats["c3"].shape == (1, 8, 8, 192)
    assert feats["c4"].shape == (1, 4, 4, 384)
    assert feats["c5"].shape == (1, 2, 2, 768)


def test_mobilenet_v3_pyramid(rng):
    model = mobilenet_v3_large(features_only=True)
    x = jnp.asarray(rng.randn(1, 64, 64, 3).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x)
    feats = model.apply(variables, x)
    assert feats["c2"].shape == (1, 16, 16, 24)
    assert feats["c3"].shape == (1, 8, 8, 40)
    assert feats["c4"].shape == (1, 4, 4, 112)
    assert feats["c5"].shape == (1, 2, 2, 160)


def test_mobilenet_v3_classifier(rng):
    model = mobilenet_v3_large(num_classes=10)
    x = jnp.asarray(rng.randn(2, 64, 64, 3).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(variables, x)
    assert out.shape == (2, 10)


def test_swin_feature_pyramid(rng):
    model = swin_t(features_only=True, window_size=4,
                   downscaling_factors=(2, 2, 2, 2))
    x = jnp.asarray(rng.randn(1, 64, 64, 3).astype(np.float32))
    feats = model.apply(model.init(jax.random.PRNGKey(0), x), x)
    assert feats["c2"].shape == (1, 32, 32, 96)
    assert feats["c5"].shape == (1, 4, 4, 768)


@pytest.mark.parametrize("factory_name", [
    "mobile_net_v3_large_rcnn",
    "convnetx_tiny_rcnn",
])
def test_two_level_rcnn_eval_forward(factory_name, rng):
    from pets_face_recognition_tpu.models import rcnn as rcnn_mod

    factory = getattr(rcnn_mod, factory_name)
    model = factory(rpn_pre_nms_top_n_test=50, rpn_post_nms_top_n_test=20)
    x = jnp.asarray(rng.rand(1, 64, 64, 3).astype(np.float32))
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "sampler": jax.random.PRNGKey(0)},
        x, train=False,
    )
    dets = model.apply(variables, x, train=False)
    assert dets["boxes"].shape == (1, 1, 4)  # box_detections_per_img=1
    assert dets["scores"].shape == (1, 1)


def test_swin_keypoint_rcnn_window_divisible(rng):
    """Swin keypoint R-CNN needs input divisible by window*prod(downscale);
    448 = 64*7 works for window 7 (the reference pads to size_divisible=49,
    models/detection/rcnn.py:157-163 — here the collate picks a valid size)."""
    from pets_face_recognition_tpu.models import swin_tiny_keypoint_rcnn

    model = swin_tiny_keypoint_rcnn(rpn_pre_nms_top_n_test=50,
                                    rpn_post_nms_top_n_test=20)
    x = jnp.asarray(rng.rand(1, 448, 448, 3).astype(np.float32))
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "sampler": jax.random.PRNGKey(0)},
        x, train=False,
    )
    dets = model.apply(variables, x, train=False)
    assert dets["keypoints"].shape == (1, 1, 3, 3)


def test_bf16_fused_stem_train_grad(rng):
    """Regression: bfloat16 compute through the space-to-depth stem must be
    differentiable (a float32 accumulator type on the stem conv broke the conv
    transpose rule under autodiff — caught by the TPU FE training smoke)."""
    import jax
    import jax.numpy as jnp

    from pets_face_recognition_tpu.models import resnet50_embedder

    m = resnet50_embedder(dtype=jnp.bfloat16)
    x = jnp.asarray(rng.uniform(0, 1, (2, 64, 64, 3)), jnp.float32)
    v = m.init(jax.random.PRNGKey(0), x)

    def loss(p):
        out, _ = m.apply(
            {"params": p, "batch_stats": v["batch_stats"]},
            x, train=True, mutable=["batch_stats"],
        )
        return (out.astype(jnp.float32) ** 2).mean()

    g = jax.grad(loss)(v["params"])
    leaves = jax.tree_util.tree_leaves(g)
    assert all(jnp.isfinite(l).all() for l in leaves)
    assert any(float(jnp.abs(l).max()) > 0 for l in leaves)
