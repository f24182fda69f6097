"""Detection checkpoint converter: synthetic torchvision-layout state dict →
GeneralizedRCNN tree (shape-complete), plus numeric ConvTranspose parity."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import flax.linen as nn  # noqa: E402

from pets_face_recognition_tpu.models.fpn import BackboneWithFPN  # noqa: E402
from pets_face_recognition_tpu.models.rcnn import (  # noqa: E402
    GeneralizedRCNN,
    RCNNConfig,
)
from pets_face_recognition_tpu.models.resnet import resnet50  # noqa: E402
from pets_face_recognition_tpu.models.roi_heads import MaskHead  # noqa: E402
from pets_face_recognition_tpu.utils.torch_convert import (  # noqa: E402
    assert_tree_shapes,
    convert_detection_model,
    state_dict_to_numpy,
)


def test_mask_deconv_matches_torch(rng):
    """Our MaskHead's ConvTranspose convention == torch ConvTranspose2d(2, s=2)."""
    t = torch.nn.ConvTranspose2d(8, 8, 2, stride=2).eval()
    x = rng.randn(1, 8, 7, 7).astype(np.float32)
    with torch.no_grad():
        want = t(torch.from_numpy(x)).numpy().transpose(0, 2, 3, 1)

    m = nn.ConvTranspose(8, (2, 2), strides=(2, 2), padding="VALID",
                         transpose_kernel=True)
    kernel = t.weight.detach().numpy().transpose(2, 3, 1, 0)
    got = m.apply(
        {"params": {"kernel": jnp.asarray(kernel),
                    "bias": jnp.asarray(t.bias.detach().numpy())}},
        jnp.asarray(x.transpose(0, 2, 3, 1)),
    )
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)


def _fake_resnet50_sd(rng, prefix):
    """Random state dict with torchvision resnet50 names/shapes."""
    sd = {}

    def conv(name, o, i, k):
        sd[f"{prefix}{name}.weight"] = rng.randn(o, i, k, k).astype(np.float32)

    def bn(name, c):
        sd[f"{prefix}{name}.weight"] = np.ones(c, np.float32)
        sd[f"{prefix}{name}.bias"] = np.zeros(c, np.float32)
        sd[f"{prefix}{name}.running_mean"] = np.zeros(c, np.float32)
        sd[f"{prefix}{name}.running_var"] = np.ones(c, np.float32)

    conv("conv1", 64, 3, 7)
    bn("bn1", 64)
    widths = [(64, 256), (128, 512), (256, 1024), (512, 2048)]
    blocks = [3, 4, 6, 3]
    in_ch = 64
    for s, ((w, out), n) in enumerate(zip(widths, blocks)):
        for b in range(n):
            base = f"layer{s + 1}.{b}"
            conv(f"{base}.conv1", w, in_ch if b == 0 else out, 1)
            bn(f"{base}.bn1", w)
            conv(f"{base}.conv2", w, w, 3)
            bn(f"{base}.bn2", w)
            conv(f"{base}.conv3", out, w, 1)
            bn(f"{base}.bn3", out)
            if b == 0:
                conv(f"{base}.downsample.0", out, in_ch, 1)
                bn(f"{base}.downsample.1", out)
        in_ch = out
    return sd


def test_convert_detection_model_covers_keypoint_rcnn(rng):
    sd = _fake_resnet50_sd(rng, "backbone.body.")
    for i, c in enumerate([256, 512, 1024, 2048]):
        sd[f"backbone.fpn.inner_blocks.{i}.weight"] = rng.randn(
            256, c, 1, 1).astype(np.float32)
        sd[f"backbone.fpn.inner_blocks.{i}.bias"] = np.zeros(256, np.float32)
        sd[f"backbone.fpn.layer_blocks.{i}.weight"] = rng.randn(
            256, 256, 3, 3).astype(np.float32)
        sd[f"backbone.fpn.layer_blocks.{i}.bias"] = np.zeros(256, np.float32)
    sd["rpn.head.conv.weight"] = rng.randn(256, 256, 3, 3).astype(np.float32)
    sd["rpn.head.conv.bias"] = np.zeros(256, np.float32)
    sd["rpn.head.cls_logits.weight"] = rng.randn(3, 256, 1, 1).astype(np.float32)
    sd["rpn.head.cls_logits.bias"] = np.zeros(3, np.float32)
    sd["rpn.head.bbox_pred.weight"] = rng.randn(12, 256, 1, 1).astype(np.float32)
    sd["rpn.head.bbox_pred.bias"] = np.zeros(12, np.float32)
    sd["roi_heads.box_head.fc6.weight"] = rng.randn(
        1024, 256 * 49).astype(np.float32)
    sd["roi_heads.box_head.fc6.bias"] = np.zeros(1024, np.float32)
    sd["roi_heads.box_head.fc7.weight"] = rng.randn(1024, 1024).astype(np.float32)
    sd["roi_heads.box_head.fc7.bias"] = np.zeros(1024, np.float32)
    sd["roi_heads.box_predictor.cls_score.weight"] = rng.randn(
        2, 1024).astype(np.float32)
    sd["roi_heads.box_predictor.cls_score.bias"] = np.zeros(2, np.float32)
    sd["roi_heads.box_predictor.bbox_pred.weight"] = rng.randn(
        8, 1024).astype(np.float32)
    sd["roi_heads.box_predictor.bbox_pred.bias"] = np.zeros(8, np.float32)
    for i in range(8):
        sd[f"roi_heads.keypoint_head.{2 * i}.weight"] = rng.randn(
            512, 256 if i == 0 else 512, 3, 3).astype(np.float32)
        sd[f"roi_heads.keypoint_head.{2 * i}.bias"] = np.zeros(512, np.float32)
    sd["roi_heads.keypoint_predictor.kps_score_lowres.weight"] = rng.randn(
        512, 3, 4, 4).astype(np.float32)
    sd["roi_heads.keypoint_predictor.kps_score_lowres.bias"] = np.zeros(
        3, np.float32)

    params, stats = convert_detection_model(sd, num_keypoints=3)

    model = GeneralizedRCNN(
        backbone=BackboneWithFPN(backbone=resnet50(features_only=True,
                                                   frozen_stats=True)),
        cfg=RCNNConfig(num_classes=2, num_keypoints=3,
                       box_detections_per_img=1,
                       rpn_pre_nms_top_n_test=50, rpn_post_nms_top_n_test=20),
    )
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "sampler": jax.random.PRNGKey(0)},
        x, train=False,
    )
    # converted tree must cover the model tree with matching shapes
    assert_tree_shapes(variables["params"], params)
    # and the model must actually run with converted weights
    dets = model.apply(
        {"params": params, "batch_stats": stats}, x, train=False
    )
    assert dets["boxes"].shape == (1, 1, 4)
