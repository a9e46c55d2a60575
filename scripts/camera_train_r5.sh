#!/usr/bin/env bash
# Round-5 camera long training (VERDICT r4 item 3): the r4 curve showed the
# camera LSS detector at AP 0.011 after 1000 steps with losses still
# falling — categorical-depth LSS needs ~10x the lidar budget. This runs
# 8000 optimizer steps (20 epochs x 400) on the chip (~2-2.5 h at ~1 s/step)
# unattended, then re-runs the convergence curve and the eval-time
# depth_topk K sweep at the converged checkpoint so the shipped
# depth_topk: 8 default is justified by AP, not feature fidelity.
#
# Usage: scripts/camera_train_r5.sh [out_dir]
set -uo pipefail
cd "$(dirname "$0")/.."
export PYTHONPATH="/root/repo:/root/.axon_site${PYTHONPATH:+:$PYTHONPATH}"

OUT="${1:-logs/cam_r5_8k}"
mkdir -p logs measurements

run() { echo "+ $*" ; "$@" ; echo "rc=$? for: $*" ; }

run timeout 14400 python -m gencomm_tpu.tools.train \
    -y configs/opv2v/gencomm/stage1/m2_att.yaml \
    --model_dir "$OUT" --dataset synthetic \
    --epochs 20 --steps_per_epoch 400 \
    2>&1 | tee logs/cam_r5_8k_train.log

# AP curve over the saved per-epoch checkpoints
run timeout 3600 python scripts/camera_convergence_curve.py \
    --model_dir "$OUT" --frames 30 --steps_per_epoch 400 \
    --out measurements/camera_convergence_r5.json \
    2>&1 | tee logs/cam_r5_convergence.log

# eval-time K sweep at the converged checkpoint (AP-based depth_topk
# justification, VERDICT item 3)
run timeout 3600 python scripts/camera_topk_sweep.py --model_dir "$OUT" \
    --frames 50 --score_threshold 0.05 \
    --out measurements/camera_topk_sweep_r5.json \
    2>&1 | tee logs/cam_r5_topk_sweep.log

# head-output fidelity at the converged trunk (re-anchors the r4 K-knee)
run timeout 3600 python scripts/camera_topk_fidelity.py --model_dir "$OUT" \
    --frames 16 --out measurements/camera_topk_fidelity_r5.json \
    2>&1 | tee logs/cam_r5_topk_fidelity.log

echo "camera campaign done"
