"""Cat head FE, AdamW variant (reference ``configs/cat_fe/simple_fe_cat.py``)."""

from pets_face_recognition_tpu.config_presets import build_fe_config

globals().update(build_fe_config(
    dataset_dir="../pets_datasets/data_25_transformed_v6_cats",
    extra_dataset_dir="../pets_datasets/petfinder_extra_cats_transformed_v6",
    optimizer_kind="adamw",
    experiment_name="Cats",
    run_name="ResNet50 datasetv6 cat head AdamW",
))
