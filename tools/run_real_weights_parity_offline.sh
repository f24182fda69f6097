#!/usr/bin/env bash
# Offline drill of the turnkey real-weights chain (VERDICT r4 #7): proves
# tools/run_real_weights_parity.sh has not bitrotted WITHOUT the (egress-
# blocked) zip/datasets — synthesizes the exact torchvision checkpoint
# layouts, imports them through the strict-key-accounting converters to the
# entry points' default paths, and drives the same eval → tables →
# retrieval-tsv chain over the smoke corpora. Weights are random, so the
# METRICS are meaningless; the pass criterion is the CHAIN running green
# end to end (load, convert, serve, write) with zero new code.
#
# Holds the exclusive TPU chip; graphs are compile-cache-warm after the
# smoke/quality drives. Budget ~20 min.
set -euo pipefail
set -x

SYNTH=${PFR_SYNTH_DIR:-/tmp/to_reproduce_synth}
ROOT=${PFR_SMOKE_ROOT:-/tmp/pfr_smoke}

# 1) synthesize the exact production checkpoint layouts, then import them
#    exactly as the real-zip path would
python tools/import_reference_weights.py --synth "$SYNTH"
python tools/import_reference_weights.py --dir "$SYNTH"

# 2) the entry points' default checkpoint paths ARE the import outputs
export PFR_KEYPOINT_CKPT=configs/to_reproduce/keypoint/checkpoints
export PFR_MASK_CKPT=configs/to_reproduce/mask/checkpoints
export PFR_CAT_HEAD_FE_CKPT=configs/to_reproduce/cat_fe/checkpoints
export PFR_DOG_HEAD_FE_CKPT=configs/to_reproduce/dog_fe/checkpoints
export PFR_CAT_BODY_FE_CKPT=configs/to_reproduce/cat_fe/checkpoints_body
export PFR_DOG_BODY_FE_CKPT=configs/to_reproduce/dog_fe/checkpoints_body

# 3) eval entry points over the smoke datasets (random weights -> garbage
#    numbers, but the checkpoint unwrap + metric plumbing must run green)
python eval_landmark.py  --config configs/smoke/keypoint_smoke.py \
    --ckpt "$PFR_KEYPOINT_CKPT"
python eval_detection.py --config configs/smoke/mask_smoke.py \
    --ckpt "$PFR_MASK_CKPT"
python eval_fe_cat_head_sgd.py --config configs/smoke/fe_smoke.py \
    --ckpt "$PFR_CAT_HEAD_FE_CKPT"

# 4) prediction tables over the smoke labeled corpus (scorer math itself is
#    pinned by tests/test_scorers.py + test_scorer_reference_parity.py)
python prepare_tables.py --data "$ROOT/data_25" --thr 0.05

# 5) retrieval tsvs over the smoke kashtanka split (random weights: rely on
#    the relaxed thr; rows may be few/empty — writing the tsv IS the pass)
PFR_RETRIEVAL_THR=0.05 python generate_tsv_to_reproduce1.py \
    --data "$ROOT/test" --stock-preds /nonexistent \
    --output /tmp/parity_offline_test1.tsv
PFR_RETRIEVAL_THR=0.05 python generate_tsv_to_reproduce2.py \
    --data "$ROOT/test" --stock-preds /nonexistent \
    --output /tmp/parity_offline_test2.tsv

echo "OFFLINE-PARITY-CHAIN-GREEN"
