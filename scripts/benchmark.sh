#!/usr/bin/env bash
# Performance accounting (reference profiler/params_calc.py, traintp_calc.py,
# inference_time.py): end-to-end fps, params/FLOPs, train step time + peak
# memory, per-module hetero-method latency, and the five-config matrix.
set -euo pipefail
cd "$(dirname "$0")/.."

CFG="${CFG:-configs/opv2v/gencomm_stage1_m1_att.yaml}"

run() { echo "+ $*"; "$@"; }

# headline single-number benchmark (prints one JSON line)
run python bench.py

# params + FLOPs + steady-state inference latency (+ --trace for top device ops)
run python -m gencomm_tpu.tools.profiler --hypes_yaml "$CFG"

# training: step latency + device peak memory
run python -m gencomm_tpu.tools.profiler --hypes_yaml "$CFG" --train

# per-module added-cost comparison across hetero methods
run python -m gencomm_tpu.tools.inference_time

# the five BASELINE.json configs end-to-end
run python -m gencomm_tpu.tools.bench_matrix
