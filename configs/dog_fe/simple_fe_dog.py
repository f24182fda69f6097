"""Dog head FE, AdamW variant (reference ``configs/dog_fe/simple_fe_dog.py``)."""

from pets_face_recognition_tpu.config_presets import build_fe_config

globals().update(build_fe_config(
    dataset_dir="../pets_datasets/data_25_transformed_v6_dogs",
    extra_dataset_dir="../pets_datasets/petfinder_extra_dogs_transformed_v6",
    optimizer_kind="adamw",
    experiment_name="Dogs",
    run_name="ResNet50 datasetv6 dog head AdamW",
))
