#!/usr/bin/env bash
# Rank-safety drive (VERDICT r3 #1): prove the int8 PTQ serving path keeps the
# retrieval tsv RANK-IDENTICAL to float, end-to-end on the real TPU with
# trained smoke checkpoints.
#
# Three passes of the full detect→align→embed→score→rank→tsv chain
# (generate_tsv_to_reproduce1.py over the kashtanka smoke test split):
#   float     — the stock float path (no quant modules in the graph);
#   calibrate — float math through the quant twins, recording activation
#               ranges (must be rank-identical AND score-identical to float);
#   int8      — int8 trunks (4 FE embedders), int8 detector trunk+RPN
#               (keypoint + mask R-CNN, shipping scope=rpn) and int8 keypoint
#               head, served from the calibrated state.
#
# Prereqs: tools/drive_smoke_e2e.sh has produced /tmp/pfr_smoke and
# results_smoke/ checkpoints. Run from the repo root. First int8 compiles are
# slow (remote compile service; CLAUDE.md budgets >10 min for new int8 graphs).
set -euo pipefail

ROOT=${PFR_SMOKE_ROOT:-/tmp/pfr_smoke}
OUT=${PFR_RANK_SAFETY_OUT:-/tmp/pfr_rank_safety}
mkdir -p "$OUT"

# resolve each recipe's newest run dir by its config snapshot (run dirs are
# timestamped; position in ls -td is NOT stable across recipe mixes)
latest_by_cfg() {
  for d in $(ls -td results_smoke/*/); do
    if [ -e "$d$1" ] && [ -n "$(ls "$d"checkpoints 2>/dev/null)" ]; then
      echo "$d"; return
    fi
  done
  echo "rank_safety_drive: no results_smoke run with $1" >&2; exit 1
}
MASK_CKPT=$(latest_by_cfg mask_smoke.py)checkpoints
KP_CKPT=$(latest_by_cfg keypoint_smoke.py)checkpoints
FE_CKPT=$(latest_by_cfg fe_smoke.py)checkpoints
export PFR_KEYPOINT_CKPT=$KP_CKPT PFR_MASK_CKPT=$MASK_CKPT
export PFR_CAT_HEAD_FE_CKPT=$FE_CKPT PFR_DOG_HEAD_FE_CKPT=$FE_CKPT
export PFR_CAT_BODY_FE_CKPT=$FE_CKPT PFR_DOG_BODY_FE_CKPT=$FE_CKPT
export PFR_RETRIEVAL_THR=0.5   # smoke detectors are honest-but-weak
export PFR_QUANT_STATE=$OUT/quant_state.pkl

run() { # $1 = mode ("" float), $2 = output tsv
  PFR_QUANT_MODE=$1 python generate_tsv_to_reproduce1.py \
    --data "$ROOT/test" --stock-preds /nonexistent \
    --output "$2"
}

echo "== pass 1: float =="
run ""          "$OUT/tsv_float.tsv"
echo "== pass 2: calibrate (float math + range recording) =="
run calibrate   "$OUT/tsv_calibrate.tsv"
echo "== pass 3: int8 (served from the calibrated state) =="
run int8        "$OUT/tsv_int8.tsv"

echo "== diff: calibrate vs float (same math; f32 fusion noise ~1e-6) =="
python tools/diff_tsv_ranks.py "$OUT/tsv_float.tsv" "$OUT/tsv_calibrate.tsv" \
  --score-tol 1e-5
echo "== diff: int8 vs float (ranks identical; scores may drift ~1e-3) =="
python tools/diff_tsv_ranks.py "$OUT/tsv_float.tsv" "$OUT/tsv_int8.tsv" \
  --score-tol 2e-3
