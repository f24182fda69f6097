"""Model zoo (flax.linen, NHWC, bfloat16-capable).

TPU-native counterparts to the reference's torchvision model factories and from-scratch
Swin (``/root/reference/models/swin.py``, ``models/detection/rcnn.py``; SURVEY.md §2.4):

- ``resnet``   — ResNet-50/34/18 backbones (production FE encoder,
                 ``configs/cat_fe/cat_fe_head.py:101-102``).
- ``swin``     — Swin-T/S/B/L with windowed attention + cyclic shift.
- ``fpn``      — Feature Pyramid Network over backbone stages.
- ``rpn``      — region proposal network with static proposal budgets.
- ``roi_heads``— box / mask / keypoint heads.
- ``rcnn``     — FasterRCNN / MaskRCNN / KeypointRCNN assemblies + factory functions
                 mirroring the reference's config-facing names.
- ``embedder`` — backbone → 512-d embedding wrapper (the FE model).
"""

from .resnet import ResNet, resnet18, resnet34, resnet50
from .embedder import EmbeddingModel, resnet50_embedder
from .swin import SwinTransformer, swin_b, swin_l, swin_s, swin_t
from .convnext import ConvNeXt, convnext_small, convnext_tiny
from .mobilenet_v3 import MobileNetV3Large, mobilenet_v3_large
from .fpn import FPN, BackboneWithFPN
from .rcnn import (
    GeneralizedRCNN,
    RCNNConfig,
    convnetx_tiny_rcnn,
    convnext_tiny_keypoint_rcnn,
    fasterrcnn_resnet50_fpn,
    keypointrcnn_resnet50_fpn,
    maskrcnn_resnet50_fpn,
    mobile_net_v3_large_keypoint_rcnn,
    mobile_net_v3_large_rcnn,
    swin_tiny_keypoint_rcnn,
)

__all__ = [
    "ResNet",
    "resnet18",
    "resnet34",
    "resnet50",
    "EmbeddingModel",
    "resnet50_embedder",
    "SwinTransformer",
    "swin_t",
    "swin_s",
    "swin_b",
    "swin_l",
    "ConvNeXt",
    "convnext_tiny",
    "convnext_small",
    "MobileNetV3Large",
    "mobilenet_v3_large",
    "FPN",
    "BackboneWithFPN",
    "GeneralizedRCNN",
    "RCNNConfig",
    "maskrcnn_resnet50_fpn",
    "keypointrcnn_resnet50_fpn",
    "fasterrcnn_resnet50_fpn",
    "swin_tiny_keypoint_rcnn",
    "convnetx_tiny_rcnn",
    "convnext_tiny_keypoint_rcnn",
    "mobile_net_v3_large_rcnn",
    "mobile_net_v3_large_keypoint_rcnn",
]
