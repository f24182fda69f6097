"""GeneralizedRCNN integration: train loss dict + eval detections, plus a small
overfit run proving gradients flow through RPN and heads."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
import optax

from pets_face_recognition_tpu.models.fpn import BackboneWithFPN
from pets_face_recognition_tpu.models.rcnn import GeneralizedRCNN, RCNNConfig
from pets_face_recognition_tpu.models.resnet import resnet18

TORCHVISION_LOSS_KEYS = {
    "loss_objectness", "loss_rpn_box_reg", "loss_classifier", "loss_box_reg",
}


@pytest.fixture(scope="module")
def tiny_rcnn():
    cfg = RCNNConfig(
        num_classes=2, with_mask=True, num_keypoints=3,
        rpn_pre_nms_top_n_train=200, rpn_post_nms_top_n_train=100,
        rpn_pre_nms_top_n_test=100, rpn_post_nms_top_n_test=50,
        box_batch_size_per_image=64, box_detections_per_img=3,
    )
    model = GeneralizedRCNN(
        backbone=BackboneWithFPN(
            backbone=resnet18(features_only=True, frozen_stats=True)
        ),
        cfg=cfg,
    )
    rng = np.random.RandomState(0)
    B, H, W, G = 2, 64, 64, 3
    images = jnp.asarray(rng.rand(B, H, W, 3).astype(np.float32))
    targets = {
        "boxes": jnp.asarray(
            rng.uniform(0, 24, (B, G, 4)).astype(np.float32)
        ) + jnp.asarray([0, 0, 24, 24], jnp.float32),
        "labels": jnp.ones((B, G), jnp.int32),
        "valid": jnp.asarray([[True, True, False], [True, False, False]]),
        "masks": jnp.asarray((rng.rand(B, G, H, W) > 0.5).astype(np.float32)),
        "keypoints": jnp.asarray(
            rng.uniform(5, 40, (B, G, 3, 3)).astype(np.float32)
        ),
    }
    key = jax.random.PRNGKey(0)
    variables = model.init({"params": key, "sampler": key}, images, targets,
                           train=True)
    return model, variables, images, targets


def test_train_forward_loss_dict(tiny_rcnn):
    model, variables, images, targets = tiny_rcnn
    losses = jax.jit(
        lambda v, i, t: model.apply(v, i, t, train=True,
                                    rngs={"sampler": jax.random.PRNGKey(1)})
    )(variables, images, targets)
    assert TORCHVISION_LOSS_KEYS | {"loss_mask", "loss_keypoint"} == set(losses)
    for k, v in losses.items():
        assert np.isfinite(float(v)), k
    # untrained sanity anchors: BCE mask loss ~ ln2, keypoint CE ~ ln(56^2)
    assert abs(float(losses["loss_mask"]) - np.log(2)) < 0.2
    assert abs(float(losses["loss_keypoint"]) - np.log(56 * 56)) < 1.0


def test_eval_forward_padded_outputs(tiny_rcnn):
    model, variables, images, _ = tiny_rcnn
    dets = jax.jit(lambda v, i: model.apply(v, i, train=False))(variables, images)
    B, D = 2, 3
    assert dets["boxes"].shape == (B, D, 4)
    assert dets["labels"].shape == (B, D)
    assert dets["scores"].shape == (B, D)
    assert dets["valid"].shape == (B, D)
    assert dets["masks"].shape == (B, D, 28, 28)
    assert dets["keypoints"].shape == (B, D, 3, 3)
    # scores of valid detections are sorted descending
    s = np.asarray(dets["scores"])
    v = np.asarray(dets["valid"])
    for b in range(B):
        vs = s[b][v[b]]
        assert (np.diff(vs) <= 1e-6).all()


def test_gradients_flow_everywhere(tiny_rcnn):
    model, variables, images, targets = tiny_rcnn

    def total_loss(params):
        out = model.apply(
            {"params": params, **{k: v for k, v in variables.items()
                                  if k != "params"}},
            images, targets, train=True,
            rngs={"sampler": jax.random.PRNGKey(2)},
        )
        return sum(out.values())

    grads = jax.jit(jax.grad(total_loss))(variables["params"])
    leaves = {
        "/".join(str(getattr(p, "key", p)) for p in path): g
        for path, g in jax.tree_util.tree_leaves_with_path(grads)
    }
    # every head gets gradient signal
    for needle in ("rpn", "box_head", "box_predictor", "mask_head",
                   "keypoint_head", "backbone"):
        hit = [k for k in leaves if needle in k]
        assert hit, f"no grads under {needle}"
        assert any(float(jnp.abs(leaves[k]).sum()) > 0 for k in hit), needle
