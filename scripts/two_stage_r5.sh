#!/usr/bin/env bash
# Round-5 stretch (VERDICT r4 item 8): end-to-end two-stage GenComm
# protocol at REAL budgets — stage-1 lidar (m1) at the 1000-step converged
# budget, stage-1 camera (m2) reusing the 8000-step r5 checkpoint
# (logs/cam_r5_8k), heal_tools merge, stage-2 freeze-schedule training of
# the new agent's message extractor, static + in-order + comm-report
# evals. Reference workflow: README.md:293-322.
set -uo pipefail
cd "$(dirname "$0")/.."
export PYTHONPATH="/root/repo:/root/.axon_site${PYTHONPATH:+:$PYTHONPATH}"

OUT="${OUT:-logs/two_stage_r5}"
CAM="${CAM:-logs/cam_r5_8k}"
run() { echo "+ $*"; "$@"; echo "rc=$? for: $*"; }

# ---- stage 1 m1 (lidar): 1000 optimizer steps (the r1-established
# convergence budget for the lidar path: AP@0.5 ~0.93) ---------------------
run timeout 3600 python -m gencomm_tpu.tools.train \
    -y configs/opv2v/gencomm/stage1/m1_att.yaml \
    --model_dir "$OUT/stage1_m1" --dataset synthetic \
    --epochs 10 --steps_per_epoch 100 \
    2>&1 | tee logs/two_stage_r5_s1m1.log

# ---- stage 1 m2 (camera): reuse the 8k-step r5 run ----------------------
test -d "$CAM" || { echo "camera ckpt $CAM missing"; exit 1; }

# ---- merge new agent (m2) into collab base (m1) --------------------------
run python -m gencomm_tpu.tools.heal_tools merge \
    --new_ckpt "$CAM" --base_ckpt "$OUT/stage1_m1" \
    --out "$OUT/stage2_m1m2/merged" 2>&1 | tee logs/two_stage_r5_merge.log

# ---- stage 2: only the new agent's message extractor trains --------------
run timeout 3600 python -m gencomm_tpu.tools.train \
    -y configs/opv2v/gencomm/stage2/m1m2_att.yaml \
    --model_dir "$OUT/stage2_m1m2" --dataset synthetic \
    --init_from "$OUT/stage2_m1m2/merged" \
    --epochs 4 --steps_per_epoch 150 \
    2>&1 | tee logs/two_stage_r5_s2.log

# ---- evals: static + comm report + agents-in-order -----------------------
run timeout 1800 python -m gencomm_tpu.tools.inference \
    --model_dir "$OUT/stage2_m1m2" --dataset synthetic --report_comm \
    --infer_info r5 2>&1 | tee logs/two_stage_r5_eval.log
run timeout 1800 python -m gencomm_tpu.tools.inference_heter_in_order \
    --model_dir "$OUT/stage2_m1m2" --dataset synthetic \
    2>&1 | tee logs/two_stage_r5_inorder.log

echo "two-stage r5 done"
