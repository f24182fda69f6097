"""Retrieval pipelines: detect→align/crop→embed closures for the reproduce
scripts (``generate_tsv_to_reproduce{1,2}.py``).

The reference loads 4 FE controllers (cat/dog × head/body) from the frozen
``configs/to_reproduce/**`` checkpoints with the margin head stripped
(``generate_tsv_to_reproduce1.py:157-201``); each pipeline here holds the two
detectors plus the four embedders and dispatches on the card's animal type
(1 = dog, 2 = cat).

Checkpoint env overrides: ``PFR_{CAT,DOG}_{HEAD,BODY}_FE_CKPT`` plus the
detector variables from ``configs/pipelines.py``.
"""

from pathlib import Path

import importlib.util as _ilu

_spec = _ilu.spec_from_file_location(
    "_pfr_retrieval_common", Path(__file__).parent / "retrieval_common.py"
)
_common = _ilu.module_from_spec(_spec)
_spec.loader.exec_module(_common)

head_pipeline, body_pipeline = _common.build_pipelines({
    "cat_head": ("PFR_CAT_HEAD_FE_CKPT", "results/cat_fe/checkpoints"),
    "dog_head": ("PFR_DOG_HEAD_FE_CKPT", "results/dog_fe/checkpoints"),
    "cat_body": ("PFR_CAT_BODY_FE_CKPT", "results/cat_body_fe/checkpoints"),
    "dog_body": ("PFR_DOG_BODY_FE_CKPT", "results/dog_body_fe/checkpoints"),
})
