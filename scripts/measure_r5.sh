#!/usr/bin/env bash
# Round-5 measurement campaign (VERDICT r4 items 1, 2, 4, 5, 6): runs
# every promised measurement on the real chip, sequentially (single chip),
# HIGHEST-VALUE FIRST (the r4 campaign overran and dropped its tail — the
# MFU grid goes first this time, per the verdict).
#
#   1. train MFU vs batch (1/4/8/16) x {fp32, --half}   <- third time of asking
#   2. bf16 inference parity (fp32 vs --half, trained flagship ckpt)
#   3. five-hetero-method added-cost matrix, fp32 AND bf16
#   4. sustained fps (flagship + camera) after the sparse-label host fix
#   5. flagship by-module traces (fwd fp32/bf16 + train)
#
# Camera long training (VERDICT item 3) is scripts/camera_train_r5.sh — a
# multi-hour job run separately.
#
# Usage: scripts/measure_r5.sh
set -uo pipefail
cd "$(dirname "$0")/.."

export PYTHONPATH="/root/repo:/root/.axon_site${PYTHONPATH:+:$PYTHONPATH}"
mkdir -p logs measurements

run() { echo "+ $*" ; "$@" ; echo "rc=$? for: $*" ; }

FLAG=configs/opv2v/gencomm_stage1_m1_att.yaml

# --- 1. train MFU vs batch, fp32 vs --half (VERDICT item 2, FIRST) -------
for b in 1 4 8 16; do
  run timeout 1200 python -m gencomm_tpu.tools.profiler \
      --hypes_yaml "$FLAG" --train --batch "$b" --iters 10 \
      2>&1 | tee "logs/r5_mfu_train_b${b}_fp32.log"
  run timeout 1200 python -m gencomm_tpu.tools.profiler \
      --hypes_yaml "$FLAG" --train --batch "$b" --half --iters 10 \
      2>&1 | tee "logs/r5_mfu_train_b${b}_half.log"
done
grep -h "train step:" logs/r5_mfu_train_b*.log | tee measurements/mfu_train_grid.txt

# --- 2. bf16 inference parity on the trained flagship ckpt ---------------
run timeout 1800 python scripts/bf16_parity.py --model_dir logs/flagship_smoke \
    --frames 16 --eval_frames 30 --out measurements/bf16_parity.json \
    2>&1 | tee logs/r5_bf16_parity.log

# --- 3. added-cost matrix, fp32 then bf16 (VERDICT items 4+6) ------------
run timeout 3600 python -m gencomm_tpu.tools.bench_matrix --added_cost --iters 20 \
    2>&1 | tee logs/r5_added_cost_fp32.log
run timeout 3600 python -m gencomm_tpu.tools.bench_matrix --added_cost --iters 20 --half \
    2>&1 | tee logs/r5_added_cost_half.log
grep -h '^{' logs/r5_added_cost_fp32.log logs/r5_added_cost_half.log \
    > measurements/added_cost_matrix_r5.jsonl || true

# --- 4. five-config bench matrix (fp32 + bf16) ---------------------------
run timeout 3600 python -m gencomm_tpu.tools.bench_matrix --iters 20 \
    2>&1 | tee logs/r5_bench_matrix_fp32.log
run timeout 3600 python -m gencomm_tpu.tools.bench_matrix --iters 20 --half \
    2>&1 | tee logs/r5_bench_matrix_half.log
grep -h '^{' logs/r5_bench_matrix_fp32.log logs/r5_bench_matrix_half.log \
    > measurements/bench_matrix_r5.jsonl || true

# --- 5. sustained fps after the sparse-label host optimization -----------
run timeout 1800 python -m gencomm_tpu.tools.sustained_fps \
    -y configs/opv2v/gencomm/stage1/m1_att.yaml --frames 60 \
    2>&1 | tee logs/r5_sustained_flagship.log
run timeout 1800 python -m gencomm_tpu.tools.sustained_fps \
    -y configs/opv2v/camera_only/camera_v2xvit.yaml --frames 30 \
    2>&1 | tee logs/r5_sustained_camera.log
grep -h '^{' logs/r5_sustained_flagship.log logs/r5_sustained_camera.log \
    > measurements/sustained_fps_r5.jsonl || true

# --- 6. flagship by-module traces ----------------------------------------
run timeout 1200 python -m gencomm_tpu.tools.profiler --hypes_yaml "$FLAG" \
    --by_module --iters 10 2>&1 | tee logs/r5_by_module_fwd_fp32.log
run timeout 1200 python -m gencomm_tpu.tools.profiler --hypes_yaml "$FLAG" \
    --by_module --half --iters 10 2>&1 | tee logs/r5_by_module_fwd_half.log
run timeout 1800 python -m gencomm_tpu.tools.profiler --hypes_yaml "$FLAG" \
    --by_module --train --iters 10 2>&1 | tee logs/r5_by_module_train.log

echo "campaign done"
