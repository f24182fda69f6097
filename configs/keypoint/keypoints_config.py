"""Keypoint R-CNN head+landmarks (reference
``configs/keypoint/keypoints_config.py``): CAT_DATASET 3 landmarks,
num_classes=2, 1 detection/img."""

from pets_face_recognition_tpu.config_presets import build_keypoint_config

globals().update(build_keypoint_config())
