#!/usr/bin/env bash
# Round-4 measurement campaign (VERDICT r3 items 2, 4, 5): runs every
# promised measurement on the real chip, sequentially (single-chip — no
# concurrent jobs), writing one JSON/log per artifact under logs/.
#
#   1. camera depth_topk AP + fps sweep  (needs a trained camera ckpt)
#   2. camera convergence AP curve       (same ckpt dir)
#   3. five-hetero-method added-cost matrix (bench_matrix --added_cost)
#   4. sustained fps host/device/overlapped (flagship + camera)
#   5. flagship per-module device trace (--by_module, fwd + train)
#   6. train MFU vs batch (1/4/8/16) with --half
#
# Usage: scripts/measure_r4.sh [camera_model_dir]
set -uo pipefail
cd "$(dirname "$0")/.."

CAM_DIR="${1:-logs/cam_conv_k8}"
export PYTHONPATH="/root/repo:/root/.axon_site${PYTHONPATH:+:$PYTHONPATH}"

run() { echo "+ $*" ; "$@" ; echo "rc=$? for: $*" ; }

# --- 1. depth_topk sweep on the trained camera checkpoint ----------------
run python scripts/camera_topk_sweep.py --model_dir "$CAM_DIR" \
    --frames 50 --score_threshold 0.05 \
    --out logs/camera_topk_sweep.json \
    2>&1 | tee logs/camera_topk_sweep.log

# --- 2. camera convergence curve -----------------------------------------
run python scripts/camera_convergence_curve.py --model_dir "$CAM_DIR" \
    --frames 30 --out logs/camera_convergence.json \
    2>&1 | tee logs/camera_convergence.log

# --- 3. hetero added-cost matrix (the poster's #P/#F claim) --------------
run python -m gencomm_tpu.tools.bench_matrix --added_cost --iters 20 \
    2>&1 | tee logs/added_cost_matrix.log

# --- 4. sustained fps: flagship + camera ---------------------------------
run python -m gencomm_tpu.tools.sustained_fps \
    -y configs/opv2v/gencomm/stage1/m1_att.yaml --frames 60 \
    2>&1 | tee logs/sustained_fps_flagship.log
run python -m gencomm_tpu.tools.sustained_fps \
    -y configs/opv2v/camera_only/camera_v2xvit.yaml --frames 30 \
    2>&1 | tee logs/sustained_fps_camera.log

# --- 5. flagship per-module trace ----------------------------------------
run python -m gencomm_tpu.tools.profiler \
    --hypes_yaml configs/opv2v/gencomm_stage1_m1_att.yaml \
    --by_module --iters 10 \
    2>&1 | tee logs/by_module_fwd.log
run python -m gencomm_tpu.tools.profiler \
    --hypes_yaml configs/opv2v/gencomm_stage1_m1_att.yaml \
    --by_module --train --iters 10 \
    2>&1 | tee logs/by_module_train.log

# --- 6. train MFU vs batch, fp32 vs --half -------------------------------
for b in 1 4 8 16; do
  run python -m gencomm_tpu.tools.profiler \
      --hypes_yaml configs/opv2v/gencomm_stage1_m1_att.yaml \
      --train --batch "$b" --iters 10 \
      2>&1 | tee "logs/mfu_train_b${b}_fp32.log"
  run python -m gencomm_tpu.tools.profiler \
      --hypes_yaml configs/opv2v/gencomm_stage1_m1_att.yaml \
      --train --batch "$b" --half --iters 10 \
      2>&1 | tee "logs/mfu_train_b${b}_half.log"
done

echo "campaign done"
