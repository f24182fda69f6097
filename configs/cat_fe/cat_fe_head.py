"""Cat head FE, SGD (reference ``configs/cat_fe/cat_fe_head.py``):
aligned head crops (data_25 v6) + petfinder extras, ResNet-50 -> 512-d ArcFace."""

from pets_face_recognition_tpu.config_presets import build_fe_config

globals().update(build_fe_config(
    dataset_dir="../pets_datasets/data_25_transformed_v6_cats",
    extra_dataset_dir="../pets_datasets/petfinder_extra_cats_transformed_v6",
    optimizer_kind="sgd",
    experiment_name="Cats",
    run_name="ResNet50 datasetv6 cat head SGD",
))
