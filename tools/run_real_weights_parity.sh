#!/usr/bin/env bash
# REAL-WEIGHTS parity reproduction: the moment the reference's data + weights
# land on this machine, this ONE script goes zip → converted params → evals →
# prediction tables → scores → retrieval tsvs, with zero new code.
#
#   bash tools/run_real_weights_parity.sh [ZIP] [DATASETS_ROOT]
#
#   ZIP            to_reproduce.zip (default: ./to_reproduce.zip; grab it with
#                  `python download_models.py` — Zenodo record 6761880)
#   DATASETS_ROOT  the reference's dataset layout (default: ../pets_datasets;
#                  grab with `python download_datasets.py`), expected to hold
#                    test/{found,lost}/{initial,extra}   kashtanka test split
#                    data_25/ …                          labeled eval corpus
#
# Pass/fail: candR@10 / candR@100 from pred_scores_test{1,2}.tsv within 1% of
# the reference's README numbers (BASELINE.md), detection AP/IoU + landmark
# NME tables matching score_{detection,landmark}.py output on the same GT.
#
# Every step holds the (exclusive) TPU chip; first compiles are slow, the
# persistent compilation cache makes reruns fast.
set -euo pipefail

ZIP=${1:-to_reproduce.zip}
DATA=${2:-../pets_datasets}

# 1) torch checkpoints → orbax (strict key accounting + tree equality inside;
#    see tools/import_reference_weights.py)
python tools/import_reference_weights.py --zip "$ZIP"

# 2) point every consumer at the imported weights
export PFR_KEYPOINT_CKPT=configs/to_reproduce/keypoint/checkpoints
export PFR_MASK_CKPT=configs/to_reproduce/mask/checkpoints
export PFR_CAT_HEAD_FE_CKPT=configs/to_reproduce/cat_fe/checkpoints
export PFR_DOG_HEAD_FE_CKPT=configs/to_reproduce/dog_fe/checkpoints
export PFR_CAT_BODY_FE_CKPT=configs/to_reproduce/cat_fe/checkpoints_body
export PFR_DOG_BODY_FE_CKPT=configs/to_reproduce/dog_fe/checkpoints_body

# 3) eval entry points (reference eval_*.py parity tables)
python eval_landmark.py        --ckpt "$PFR_KEYPOINT_CKPT"
python eval_detection.py       --ckpt "$PFR_MASK_CKPT"
python eval_fe_cat_head_sgd.py --ckpt "$PFR_CAT_HEAD_FE_CKPT"
python eval_fe_dog_head_sgd.py --ckpt "$PFR_DOG_HEAD_FE_CKPT"

# 4) detection/landmark prediction tables over the labeled corpus + scoring
#    (reference prepare_tables.py → score_{detection,landmark}.py chain)
python prepare_tables.py --data "$DATA/data_25"
python score_detection.py detected_head.tsv data_25 Head \
    --anno "$DATA/data_25_anno.pickle"
python score_detection.py detected_body.tsv data_25 Animal \
    --anno "$DATA/data_25_anno.pickle"
python score_landmark.py landmark.tsv data_25 \
    --anno "$DATA/data_25_anno.pickle"

# 5) retrieval tsvs over the kashtanka test split (the README headline)
python generate_tsv_to_reproduce1.py --data "$DATA/test"   # ensemble head+body
python generate_tsv_to_reproduce2.py --data "$DATA/test"   # head-only

echo "== wrote pred_scores_test1.tsv / pred_scores_test2.tsv =="
echo "compare candR@10/candR@100 against BASELINE.md (within 1% = pass)"
