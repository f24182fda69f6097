"""Cat body FE, SGD (reference ``configs/cat_fe/body_cat_fe.py``): letterboxed
body crops at 256, no alignment."""

from pets_face_recognition_tpu.config_presets import build_fe_config

globals().update(build_fe_config(
    dataset_dir="../pets_datasets/data_25_transformed_v6_body_cats",
    extra_dataset_dir="../pets_datasets/petfinder_extra_cats_transformed_v6_body",
    optimizer_kind="sgd",
    crop=252, size=256,
    experiment_name="Cats",
    run_name="ResNet50 datasetv6 cat body SGD",
))
