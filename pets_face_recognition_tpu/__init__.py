"""pets_face_recognition_tpu — a TPU-native pet re-identification framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
MarQuisCheshire/Pets-Face-Recognition (see SURVEY.md):

- ``models``        — ResNet/Swin backbones, FPN, RPN, RoI heads, R-CNN assemblies (flax).
- ``ops``           — box math, anchors, NMS, RoIAlign, homography warp (JAX + Pallas).
- ``losses``        — ArcFace/CosFace large-margin heads, focal loss, metric-learning wrapper.
- ``engine``        — pjit train/eval steps, trainer loop, task controllers, metrics.
- ``data_loading``  — datasets (RecDataset, Oxford-IIIT Pet, CatLMD), pair sampler, loaders.
- ``preprocessor``  — batched detect→align→crop inference pipelines (Preproc equivalents).
- ``retrieval``     — embedding DB, sharded cosine-similarity + top-k gallery matching.
- ``parallel``      — device mesh construction and sharding helpers.
- ``utils``         — executable-Python config system and misc helpers.

Everything is static-shape and jit-friendly by construction: detection uses fixed
proposal/detection budgets with validity masks instead of the reference's dynamic
per-image shapes.
"""

__version__ = "0.1.0"
