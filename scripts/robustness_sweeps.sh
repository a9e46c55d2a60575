#!/usr/bin/env bash
# Robustness sweeps on a trained model dir (reference inference_w_noise.py /
# inference_w_delay.py, bash/2025_5_12.sh + 2025_5_15.sh): AP vs pose noise
# (Gaussian, optionally Laplace) and AP vs communication delay, plus the
# paper-figure renders from the collected sweep yamls.
set -euo pipefail
cd "$(dirname "$0")/.."

MODEL_DIR="${1:?usage: robustness_sweeps.sh <model_dir> [dataset]}"
DATASET="${2:-${DATASET:-synthetic}}"

run() { echo "+ $*"; "$@"; }

run python -m gencomm_tpu.tools.inference_w_noise \
    --model_dir "$MODEL_DIR" --dataset "$DATASET" --levels 0,0.2,0.4,0.6
run python -m gencomm_tpu.tools.inference_w_noise \
    --model_dir "$MODEL_DIR" --dataset "$DATASET" --levels 0,0.2,0.4,0.6 --laplace
run python -m gencomm_tpu.tools.inference_w_delay \
    --model_dir "$MODEL_DIR" --dataset "$DATASET"

# AP-vs-noise/delay figures from the dumped sweep yamls
run python -m gencomm_tpu.visualization.paper_plots \
    --model_dir "$MODEL_DIR" --out "$MODEL_DIR/plots"
