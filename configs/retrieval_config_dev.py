"""Retrieval pipelines bound to DEVELOPMENT checkpoints (``generate_tsv.py``).

The reference's dev retrieval script loads 4 FE controllers from per-run mlruns
paths instead of the frozen reproduce set (``/root/reference/generate_tsv.py:157-226``):
dog head ``epoch=36``, cat head ``epoch=42``, cat body ``epoch=39`` — and, as a
wiring quirk preserved here, the *dog body* model loads the **dog head**
checkpoint under a body config (ref ``generate_tsv.py:190-198``), so the dog
body default points at the dog-head dev checkpoint dir.

Checkpoint env overrides: ``PFR_{CAT,DOG}_{HEAD,BODY}_FE_DEV_CKPT``.
"""

from pathlib import Path

import importlib.util as _ilu

_spec = _ilu.spec_from_file_location(
    "_pfr_retrieval_common", Path(__file__).parent / "retrieval_common.py"
)
_common = _ilu.module_from_spec(_spec)
_spec.loader.exec_module(_common)

head_pipeline, body_pipeline = _common.build_pipelines({
    "cat_head": ("PFR_CAT_HEAD_FE_DEV_CKPT", "results/cat_fe_dev/checkpoints"),
    "dog_head": ("PFR_DOG_HEAD_FE_DEV_CKPT", "results/dog_fe_dev/checkpoints"),
    "cat_body": ("PFR_CAT_BODY_FE_DEV_CKPT",
                 "results/cat_body_fe_dev/checkpoints"),
    # reference quirk: dev dog body weights come from the dog HEAD run
    "dog_body": ("PFR_DOG_BODY_FE_DEV_CKPT", "results/dog_fe_dev/checkpoints"),
})
