"""Exact production checkpoint KEY LAYOUTS, synthesized.

The reference ships six torch checkpoints in ``to_reproduce.zip``
(``/root/reference/download_models.py:5-23``): the Mask R-CNN body detector
(``mask/epoch=64.ckpt``), the Keypoint R-CNN landmark detector
(``keypoint/epoch=14.ckpt``), and four FE embedders (cat/dog × head/body).
This image has no egress, so the converters in ``torch_convert.py`` can't be
exercised against the real files — instead this module synthesizes state dicts
with the EXACT key sets and tensor shapes those checkpoints have, so the
import path (`tools/import_reference_weights.py`) is locked end-to-end today
and just works the moment the zip lands.

Layout facts encoded here (and where they come from):

- Detection checkpoints are ``Controller`` state dicts — the torchvision model
  lives under ``model.`` (ref ``engine/__init__.py`` Controller holds
  ``self.model``; ``eval_detection.py:18`` loads strict).
- Detector bodies use ``FrozenBatchNorm2d`` → ``weight/bias/running_mean/
  running_var`` and NO ``num_batches_tracked`` (torchvision
  ``backbone_utils.resnet_fpn_backbone`` default norm layer).
- FE checkpoints nest twice: ``Controller.model`` is
  ``SoftmaxBasedMetricLearning`` whose ``.model`` is a torchvision
  ``resnet50`` with ``fc = Linear(2048, 512)`` (ref
  ``configs/cat_fe/cat_fe_head.py:95-108``); regular BatchNorm2d → includes
  ``num_batches_tracked``. The shipped files CUT the ``model.add_margin.weight``
  tensor (ref ``download_models.py:8-9`` — "add_margin weight is cut off"),
  hence ``strict=False`` loads; ``include_margin=True`` reproduces the v1.0
  uncut variant.
- The reference pins ``torchvision>=0.12`` (requirements.txt) and the zip was
  produced mid-2022 (torchvision 0.12.x): FPN/RPN/mask-head modules are FLAT
  (``inner_blocks.0.weight``). torchvision ≥0.14 re-nests them under
  ``Conv2dNormActivation`` (``inner_blocks.0.0.weight``); ``nested=True``
  emits that variant so the converter stays correct for re-exported
  checkpoints too.

Model hyperparameters: ``maskrcnn_resnet50_fpn(num_classes=2)``
(ref ``configs/mask/mask_rcnn_config.py:71-74``),
``keypointrcnn_resnet50_fpn(num_classes=2, num_keypoints=3)``
(ref ``configs/keypoint/keypoints_config.py:79-83``).
"""

from __future__ import annotations

import numpy as np

_RESNET50_BLOCKS = (3, 4, 6, 3)
_RESNET50_WIDTHS = ((64, 256), (128, 512), (256, 1024), (512, 2048))
FPN_IN_CHANNELS = (256, 512, 1024, 2048)


def resnet50_sd(rng: np.random.RandomState, prefix: str = "",
                frozen_bn: bool = True, fc_out: int | None = None) -> dict:
    """torchvision ``resnet50`` state dict: exact keys + shapes.

    ``frozen_bn=True`` → FrozenBatchNorm2d keys (detection bodies);
    ``frozen_bn=False`` → BatchNorm2d incl. ``num_batches_tracked`` (FE).
    ``fc_out`` adds the classifier/projection ``fc`` (FE: 512).
    """
    sd: dict = {}

    def conv(name, o, i, k):
        # 1/sqrt(fan_in) scale: keeps synthetic forwards finite through 50
        # layers (real trained weights are similarly scaled)
        sd[f"{prefix}{name}.weight"] = (
            rng.randn(o, i, k, k) / np.sqrt(i * k * k)).astype(np.float32)

    def bn(name, c):
        sd[f"{prefix}{name}.weight"] = rng.rand(c).astype(np.float32) + 0.5
        sd[f"{prefix}{name}.bias"] = rng.randn(c).astype(np.float32) * 0.1
        sd[f"{prefix}{name}.running_mean"] = rng.randn(c).astype(np.float32) * 0.1
        sd[f"{prefix}{name}.running_var"] = rng.rand(c).astype(np.float32) + 0.5
        if not frozen_bn:
            sd[f"{prefix}{name}.num_batches_tracked"] = np.asarray(0, np.int64)

    conv("conv1", 64, 3, 7)
    bn("bn1", 64)
    in_ch = 64
    for s, ((w, out), n) in enumerate(zip(_RESNET50_WIDTHS, _RESNET50_BLOCKS)):
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
    if fc_out is not None:
        sd[f"{prefix}fc.weight"] = (
            rng.randn(fc_out, 2048) / np.sqrt(2048)).astype(np.float32)
        sd[f"{prefix}fc.bias"] = np.zeros(fc_out, np.float32)
    return sd


def _detection_common_sd(rng: np.random.RandomState, prefix: str,
                         num_classes: int, nested: bool) -> dict:
    """body + FPN + RPN head + box head/predictor — shared by mask/keypoint."""
    sd = resnet50_sd(rng, prefix=f"{prefix}backbone.body.", frozen_bn=True)

    def conv(name, o, i, k):
        sd[f"{prefix}{name}.weight"] = (
            rng.randn(o, i, k, k) / np.sqrt(i * k * k)).astype(np.float32)
        sd[f"{prefix}{name}.bias"] = np.zeros(o, np.float32)

    def dense(name, o, i):
        sd[f"{prefix}{name}.weight"] = (
            rng.randn(o, i) / np.sqrt(i)).astype(np.float32)
        sd[f"{prefix}{name}.bias"] = np.zeros(o, np.float32)

    mid = ".0" if nested else ""
    for i, c in enumerate(FPN_IN_CHANNELS):
        conv(f"backbone.fpn.inner_blocks.{i}{mid}", 256, c, 1)
        conv(f"backbone.fpn.layer_blocks.{i}{mid}", 256, 256, 3)
    # resnet50-FPN anchors: 1 size × 3 aspect ratios per level → A=3
    conv("rpn.head.conv.0.0" if nested else "rpn.head.conv", 256, 256, 3)
    conv("rpn.head.cls_logits", 3, 256, 1)
    conv("rpn.head.bbox_pred", 12, 256, 1)
    dense("roi_heads.box_head.fc6", 1024, 256 * 7 * 7)
    dense("roi_heads.box_head.fc7", 1024, 1024)
    dense("roi_heads.box_predictor.cls_score", num_classes, 1024)
    dense("roi_heads.box_predictor.bbox_pred", 4 * num_classes, 1024)
    return sd


def maskrcnn_resnet50_fpn_sd(rng: np.random.RandomState, prefix: str = "model.",
                             num_classes: int = 2, nested: bool = False) -> dict:
    """``mask/epoch=64.ckpt`` layout: Controller(maskrcnn_resnet50_fpn(num_classes=2))."""
    sd = _detection_common_sd(rng, prefix, num_classes, nested)
    for i in range(1, 5):
        name = (f"roi_heads.mask_head.{i - 1}.0" if nested
                else f"roi_heads.mask_head.mask_fcn{i}")
        sd[f"{prefix}{name}.weight"] = (
            rng.randn(256, 256, 3, 3) / 48.0).astype(np.float32)
        sd[f"{prefix}{name}.bias"] = np.zeros(256, np.float32)
    # ConvTranspose2d(256, 256, 2, stride=2): torch layout (in, out, kh, kw)
    sd[f"{prefix}roi_heads.mask_predictor.conv5_mask.weight"] = (rng.randn(
        256, 256, 2, 2) / 32.0).astype(np.float32)
    sd[f"{prefix}roi_heads.mask_predictor.conv5_mask.bias"] = np.zeros(
        256, np.float32)
    sd[f"{prefix}roi_heads.mask_predictor.mask_fcn_logits.weight"] = (rng.randn(
        num_classes, 256, 1, 1) / 16.0).astype(np.float32)
    sd[f"{prefix}roi_heads.mask_predictor.mask_fcn_logits.bias"] = np.zeros(
        num_classes, np.float32)
    return sd


def keypointrcnn_resnet50_fpn_sd(rng: np.random.RandomState,
                                 prefix: str = "model.", num_classes: int = 2,
                                 num_keypoints: int = 3,
                                 nested: bool = False) -> dict:
    """``keypoint/epoch=14.ckpt`` layout:
    Controller(keypointrcnn_resnet50_fpn(num_classes=2, num_keypoints=3))."""
    sd = _detection_common_sd(rng, prefix, num_classes, nested)
    # KeypointRCNNHeads: nn.Sequential(conv, relu)×8 — convs at even indices
    for i in range(8):
        name = f"roi_heads.keypoint_head.{2 * i}"
        sd[f"{prefix}{name}.weight"] = (rng.randn(
            512, 256 if i == 0 else 512, 3, 3)
            / np.sqrt((256 if i == 0 else 512) * 9)).astype(np.float32)
        sd[f"{prefix}{name}.bias"] = np.zeros(512, np.float32)
    # ConvTranspose2d(512, num_keypoints, 4, stride=2)
    sd[f"{prefix}roi_heads.keypoint_predictor.kps_score_lowres.weight"] = (
        rng.randn(512, num_keypoints, 4, 4) / 90.0).astype(np.float32)
    sd[f"{prefix}roi_heads.keypoint_predictor.kps_score_lowres.bias"] = (
        np.zeros(num_keypoints, np.float32))
    return sd


def fe_controller_sd(rng: np.random.RandomState, num_class: int = 1000,
                     include_margin: bool = False) -> dict:
    """FE checkpoint layout (``cat_fe/epoch=42_head.ckpt`` &c):
    Controller(SoftmaxBasedMetricLearning(resnet50 + fc→512, ArcMargin))."""
    sd = resnet50_sd(rng, prefix="model.model.", frozen_bn=False, fc_out=512)
    if include_margin:
        # ArcMarginProduct.weight: (out_features=num_class, in_features=512);
        # the shipped v1.2 files cut this tensor (download_models.py:8-9)
        sd["model.add_margin.weight"] = (rng.randn(
            num_class, 512) / np.sqrt(512)).astype(np.float32)
    return sd
