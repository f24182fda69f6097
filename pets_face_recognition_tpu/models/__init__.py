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

__all__ = [
    "ResNet",
    "resnet18",
    "resnet34",
    "resnet50",
    "EmbeddingModel",
    "resnet50_embedder",
]
