"""Mask R-CNN body detection/segmentation (reference
``configs/mask/mask_rcnn_config.py``): Oxford-IIIT Pet, ResNet-50 FPN,
num_classes=2, 3 detections/img."""

from pets_face_recognition_tpu.config_presets import build_mask_config

globals().update(build_mask_config())
