"""Cat head FE on unaligned head bbox crops (reference
``configs/cat_fe/no_align_head_cat.py`` ablation)."""

from pets_face_recognition_tpu.config_presets import build_fe_config

globals().update(build_fe_config(
    dataset_dir="../pets_datasets/data_25_transformed_v6_no_align_cats",
    extra_dataset_dir=None,
    optimizer_kind="sgd",
    experiment_name="Cats",
    run_name="ResNet50 datasetv6 cat head no-align SGD",
))
