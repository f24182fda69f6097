"""Dog head FE on mask-multiplied crops (reference ablation)."""

from pets_face_recognition_tpu.config_presets import build_fe_config

globals().update(build_fe_config(
    dataset_dir="../pets_datasets/data_25_transformed_v6_masked_dogs",
    extra_dataset_dir=None,
    optimizer_kind="sgd",
    experiment_name="Dogs",
    run_name="ResNet50 datasetv6 dog head masked SGD",
))
