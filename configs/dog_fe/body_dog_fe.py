"""Dog body FE, SGD (reference ``configs/dog_fe/body_dog_fe.py``)."""

from pets_face_recognition_tpu.config_presets import build_fe_config

globals().update(build_fe_config(
    dataset_dir="../pets_datasets/data_25_transformed_v6_body_dogs",
    extra_dataset_dir="../pets_datasets/petfinder_extra_dogs_transformed_v6_body",
    optimizer_kind="sgd",
    crop=252, size=256,
    experiment_name="Dogs",
    run_name="ResNet50 datasetv6 dog body SGD",
))
