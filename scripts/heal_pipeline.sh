#!/usr/bin/env bash
# HEAL pipeline (reference MoreModality/HEAL yamls + heter_pyramid_*.py):
#
#   stage 1  train the collaboration base with pyramid fusion + occupancy
#            heads (heter_pyramid_collab, m1).
#   stage 2  "BackAlign" each new agent type: heter_pyramid_single with the
#            base's pyramid + detection heads restored (--init_from) and
#            FROZEN (heter_pyramid_single.py:27 fix_modules) — only the new
#            encoder/backbone/aligner learns to align backwards.
#   stage 3  assemble the multi-type checkpoint (heal_tools merge) and run
#            joint inference with the final_infer collab config.
#
# The separate baseline-family BackAlign method
# (heter_model_baseline_w_backalign, att fusion) is exercised by
# scripts/gencomm_two_stage.sh-style flows via
# configs/opv2v/baselines/stage2/backalign/ with baselines/stage1 bases.
set -euo pipefail
cd "$(dirname "$0")/.."

DATASET="${DATASET:-synthetic}"
EPOCHS="${EPOCHS:-2}"
STEPS="${STEPS:-100}"
OUT="${OUT:-logs/heal_pipeline}"

run() { echo "+ $*"; "$@"; }

# ---- stage 1: collaboration base (m1, pyramid fusion + occupancy heads) --
run python -m gencomm_tpu.tools.train \
    -y configs/opv2v/heal/stage1/m1_pyramid.yaml \
    --model_dir "$OUT/base_m1" --dataset "$DATASET" \
    --epochs "$EPOCHS" --steps_per_epoch "$STEPS"

# ---- stage 2: back-align the new type (m2) to the frozen base ------------
run python -m gencomm_tpu.tools.train \
    -y configs/opv2v/heal/stage2/m2_single_pyramid.yaml \
    --model_dir "$OUT/single_m2" --dataset "$DATASET" \
    --init_from "$OUT/base_m1" \
    --epochs "$EPOCHS" --steps_per_epoch "$STEPS"

# ---- stage 3: assemble the multi-type checkpoint and jointly infer -------
run python -m gencomm_tpu.tools.heal_tools merge \
    --new_ckpt "$OUT/single_m2" --base_ckpt "$OUT/base_m1" \
    --out "$OUT/final_m1m2"
cp configs/opv2v/heal/final_infer/m1m2.yaml "$OUT/final_m1m2/config.yaml"

run python -m gencomm_tpu.tools.inference \
    --model_dir "$OUT/final_m1m2" --dataset "$DATASET"
run python -m gencomm_tpu.tools.inference_heter_in_order \
    --model_dir "$OUT/final_m1m2" --dataset "$DATASET" --max_cav 3
