#!/usr/bin/env bash
# End-to-end smoke drive on the real TPU chip: synthesize corpora, train the
# three production recipes through the unmodified entry points, then run every
# inference/retrieval/scoring entry point over the results.
#
# Run from the repo root. Each step holds the (exclusive) TPU chip; first
# compiles go through the remote compile service, so a cold run takes a while
# (the persistent compilation cache makes reruns fast).
set -euo pipefail

ROOT=${PFR_SMOKE_ROOT:-/tmp/pfr_smoke}

python tools/make_smoke_datasets.py --root "$ROOT"

# 1) train the three model families (checkpoints land in results_smoke/<ts>/)
python main.py           --config configs/smoke/fe_smoke.py
PFR_SMOKE_EPOCHS=8 python main_keypoints.py --config configs/smoke/keypoint_smoke.py
python main_detection.py --config configs/smoke/mask_smoke.py

latest() { ls -td results_smoke/*/ | sed -n "$1p"; }
MASK_CKPT=$(latest 1)checkpoints
KP_CKPT=$(latest 2)checkpoints
FE_CKPT=$(latest 3)checkpoints
export PFR_KEYPOINT_CKPT=$KP_CKPT PFR_MASK_CKPT=$MASK_CKPT
export PFR_CAT_HEAD_FE_CKPT=$FE_CKPT PFR_DOG_HEAD_FE_CKPT=$FE_CKPT
export PFR_CAT_BODY_FE_CKPT=$FE_CKPT PFR_DOG_BODY_FE_CKPT=$FE_CKPT
export PFR_CAT_HEAD_FE_DEV_CKPT=$FE_CKPT PFR_DOG_HEAD_FE_DEV_CKPT=$FE_CKPT
export PFR_CAT_BODY_FE_DEV_CKPT=$FE_CKPT PFR_DOG_BODY_FE_DEV_CKPT=$FE_CKPT
# smoke detectors are honest-but-weak; production threshold stays 0.9
export PFR_RETRIEVAL_THR=0.5

# 2) eval entry points against the fresh checkpoints
python eval_landmark.py        --config configs/smoke/keypoint_smoke.py --ckpt "$KP_CKPT"
python eval_detection.py       --config configs/smoke/mask_smoke.py     --ckpt "$MASK_CKPT"
python eval_fe_cat_head_sgd.py --config configs/smoke/fe_smoke.py       --ckpt "$FE_CKPT"
python eval_fe_dog_head_sgd.py --config configs/smoke/fe_smoke.py       --ckpt "$FE_CKPT"

# 3) offline transforms + prediction tables (labeled layout = one extra level)
python transform_reproduce.py --data-root "$ROOT"
mkdir -p /tmp/pfr_labeled && ln -sfn "$ROOT/data_25" /tmp/pfr_labeled/part1
python prepare_tables.py --data /tmp/pfr_labeled --thr 0.5

# 4) retrieval -> tsv (ensemble + head-only + dev variant with DB cache)
printf 'query\tmatched_1\tmatched_3\tmatched_10\tanswer\nrl999999\trf700000\trf700000\trf700000\trf700000\n' > /tmp/stock_preds.tsv
python generate_tsv_to_reproduce1.py --data "$ROOT/test" --stock-preds /tmp/stock_preds.tsv --output /tmp/pred_scores_test1.tsv --cache /tmp/scores_smoke.pickle
python generate_tsv_to_reproduce2.py --data "$ROOT/test" --stock-preds /tmp/stock_preds.tsv --output /tmp/pred_scores_test2.tsv
python generate_tsv.py --data "$ROOT/test" --output /tmp/pred_scores_test4.tsv --cache /tmp/scores3_smoke.pickle
python generate_tsv.py --data "$ROOT/test" --output /tmp/pred_scores_test4.tsv --cache /tmp/scores3_smoke.pickle  # cache hit

echo "smoke e2e drive complete"
