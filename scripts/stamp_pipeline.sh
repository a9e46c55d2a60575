#!/usr/bin/env bash
# STAMP pipeline (reference train_stamp.py + stamp_modules/adapter.py):
# each agent type trains an adapter/reverter pair mapping its feature space
# into the shared m0 protocol space, with everything but the adapters frozen.
set -euo pipefail
cd "$(dirname "$0")/.."

DATASET="${DATASET:-synthetic}"
EPOCHS="${EPOCHS:-2}"
STEPS="${STEPS:-100}"
OUT="${OUT:-logs/stamp_pipeline}"

run() { echo "+ $*"; "$@"; }

# protocol-space adapter training per agent type (the stage-2 configs carry
# the freeze lists; stage-1 pretrained encoders come from the baselines)
for PAIR in m0m1 m0m2; do
  run python -m gencomm_tpu.tools.train \
      -y "configs/opv2v/baselines/stage2/stamp/${PAIR}_att.yaml" \
      --model_dir "$OUT/$PAIR" --dataset "$DATASET" \
      --epochs "$EPOCHS" --steps_per_epoch "$STEPS"
done

run python -m gencomm_tpu.tools.inference \
    --model_dir "$OUT/m0m1" --dataset "$DATASET"
