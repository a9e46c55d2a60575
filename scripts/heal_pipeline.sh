#!/usr/bin/env bash
# HEAL pipeline (reference heter_pyramid_collab/single + BackAlign): train the
# collaboration base with pyramid fusion, pretrain each new agent type
# single-agent, then BackAlign the new encoder to the frozen base, and
# finally assemble a multi-type checkpoint for joint inference.
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

# ---- stage 2: single-agent pretrain of the new type (m2) -----------------
run python -m gencomm_tpu.tools.train \
    -y configs/opv2v/heal/stage2/m2_single_pyramid.yaml \
    --model_dir "$OUT/single_m2" --dataset "$DATASET" \
    --epochs "$EPOCHS" --steps_per_epoch "$STEPS"

# ---- BackAlign: train m2's encoder against the frozen base ---------------
run python -m gencomm_tpu.tools.heal_tools merge \
    --new_ckpt "$OUT/single_m2" --base_ckpt "$OUT/base_m1" \
    --out "$OUT/backalign_m1m2/merged"
run python -m gencomm_tpu.tools.train \
    -y configs/opv2v/baselines/stage2/backalign/m1m2_att.yaml \
    --model_dir "$OUT/backalign_m1m2" --dataset "$DATASET" \
    --init_from "$OUT/backalign_m1m2/merged" \
    --epochs "$EPOCHS" --steps_per_epoch "$STEPS"

# ---- evaluation ----------------------------------------------------------
run python -m gencomm_tpu.tools.inference \
    --model_dir "$OUT/backalign_m1m2" --dataset "$DATASET"
