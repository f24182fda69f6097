#!/usr/bin/env bash
# Rank-safety at a REAL denominator (VERDICT r4 #1): drive the full
# detect→align→embed→score→rank chain over the 120-identity HARD corpus
# (near-duplicate identity clusters, tools/make_smoke_datasets.py::
# make_kashtanka_hard) twice — float and the SHIPPING int8 config
# (embedder+kp_head int8, float detector) — with PFR_SCORES_DUMP capturing
# every query's full per-gallery score row, then certify the near-tie
# contract (tools/verify_near_tie_contract.py):
#   - bounded int8-vs-float score drift;
#   - every rank inversion is a float near-tie (no confidently-ordered
#     pair may flip).
# The tsv-level rank lists on a hard corpus are NOT expected to be
# identical — near-duplicate identities sit within the quantization drift
# by construction; the contract is that ONLY such near-ties move.
#
# Prereqs: /tmp/pfr_smoke/test_hard + results_smoke checkpoints
# (tools/drive_smoke_e2e.sh), and a calibrated shipping quant state
# (produced by tools/quality_instrument.py's int8ship row, or pass 1 here
# recalibrates). Budget ~15 min/pass on the chip.
set -euo pipefail

ROOT=${PFR_SMOKE_ROOT:-/tmp/pfr_smoke}
OUT=${PFR_RANK_SAFETY_OUT:-/tmp/pfr_rank_hard}
mkdir -p "$OUT"

latest_by_cfg() {
  for d in $(ls -td results_smoke/*/); do
    if [ -e "$d$1" ] && [ -n "$(ls "$d"checkpoints 2>/dev/null)" ]; then
      echo "$d"; return
    fi
  done
  echo "rank_safety_hard: no results_smoke run with $1" >&2; exit 1
}
export PFR_KEYPOINT_CKPT=$(latest_by_cfg keypoint_smoke.py)checkpoints
export PFR_MASK_CKPT=$(latest_by_cfg mask_smoke.py)checkpoints
FE=$(latest_by_cfg fe_smoke.py)checkpoints
export PFR_CAT_HEAD_FE_CKPT=$FE PFR_DOG_HEAD_FE_CKPT=$FE
export PFR_CAT_BODY_FE_CKPT=$FE PFR_DOG_BODY_FE_CKPT=$FE
export PFR_RETRIEVAL_THR=0.5   # smoke detectors are honest-but-weak
export PFR_QUANT_STATE=$OUT/quant_state_ship.pkl
export PFR_QUANT_COMPONENTS=embedder,kp_head  # SHIPPING config

run() { # $1 = mode, $2 = tsv, $3 = scores dump
  PFR_QUANT_MODE=$1 PFR_SCORES_DUMP=$3 python generate_tsv_to_reproduce2.py \
    --data "$ROOT/test_hard" --stock-preds /nonexistent --output "$2"
}

echo "== pass 1: float (+ calibrate the shipping state as a side effect) =="
run calibrate "$OUT/tsv_float.tsv" "$OUT/scores_float.npz"
echo "== pass 2: shipping int8 =="
run int8      "$OUT/tsv_int8ship.tsv" "$OUT/scores_int8ship.npz"

echo "== tsv diff (membership + shared-query ranks) =="
python tools/diff_tsv_ranks.py "$OUT/tsv_float.tsv" "$OUT/tsv_int8ship.tsv" \
  --score-tol 2e-3 || true
echo "== near-tie contract =="
python tools/verify_near_tie_contract.py \
  "$OUT/scores_float.npz" "$OUT/scores_int8ship.npz" \
  --drift-budget 5e-4 --flip-budget 5e-4
