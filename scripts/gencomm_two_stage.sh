#!/usr/bin/env bash
# GenComm two-stage heterogeneous training protocol (reference README.md:293-322,
# SURVEY.md §3.4): stage 1 trains each agent type homogeneously with its
# message extractor + diffusion generator; stage 2 merges the new agent's
# checkpoint into the collaboration base and trains ONLY the new agent's
# message extractor; inference runs static and agents-in-order evals.
set -euo pipefail
cd "$(dirname "$0")/.."

DATASET="${DATASET:-synthetic}"
EPOCHS="${EPOCHS:-2}"
STEPS="${STEPS:-100}"
OUT="${OUT:-logs/gencomm_two_stage}"

run() { echo "+ $*"; "$@"; }

# ---- stage 1: homogeneous, one run per agent type ------------------------
for M in m1 m2; do
  run python -m gencomm_tpu.tools.train \
      -y "configs/opv2v/gencomm/stage1/${M}_att.yaml" \
      --model_dir "$OUT/stage1_${M}" --dataset "$DATASET" \
      --epochs "$EPOCHS" --steps_per_epoch "$STEPS"
done

# ---- checkpoint surgery: merge new agent (m2) into collab base (m1) ------
run python -m gencomm_tpu.tools.heal_tools merge \
    --new_ckpt "$OUT/stage1_m2" --base_ckpt "$OUT/stage1_m1" \
    --out "$OUT/stage2_m1m2/merged"

# ---- stage 2: train only the new agent's message extractor ---------------
# (the config's freeze list pins cls/reg/dir heads, gencomm, fusion, and the
# ego-side extractor — reference heter_model_baseline_w_gencomm_stage2.py:180-185)
run python -m gencomm_tpu.tools.train \
    -y "configs/opv2v/gencomm/stage2/m1m2_att.yaml" \
    --model_dir "$OUT/stage2_m1m2" --dataset "$DATASET" \
    --init_from "$OUT/stage2_m1m2/merged" \
    --epochs "$EPOCHS" --steps_per_epoch "$STEPS"

# ---- stage 3: evaluation -------------------------------------------------
run python -m gencomm_tpu.tools.inference \
    --model_dir "$OUT/stage2_m1m2" --dataset "$DATASET" --report_comm
run python -m gencomm_tpu.tools.inference_heter_in_order \
    --model_dir "$OUT/stage2_m1m2" --dataset "$DATASET"
