"""TPU-native compute ops.

These are the components the reference delegates to torchvision C++/CUDA and OpenCV
(SURVEY.md §2.10): box math + anchors, NMS, RoIAlign, and the homography
solve + perspective warp behind ``preprocessor/align.py``. All ops are static-shape and
jit-safe; the hot ones have Pallas TPU kernels with pure-JAX reference implementations
used for CPU testing.
"""

from .boxes import (
    area,
    box_iou,
    clip_boxes,
    decode_boxes,
    encode_boxes,
    pairwise_iou,
)
from .anchors import generate_anchors, grid_anchors
from .nms import nms, batched_nms
from .roi_align import roi_align
from .homography import solve_homography, warp_perspective, align_crop

__all__ = [
    "area",
    "box_iou",
    "clip_boxes",
    "decode_boxes",
    "encode_boxes",
    "pairwise_iou",
    "generate_anchors",
    "grid_anchors",
    "nms",
    "batched_nms",
    "roi_align",
    "solve_homography",
    "warp_perspective",
    "align_crop",
]
