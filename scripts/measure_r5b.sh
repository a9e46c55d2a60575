#!/usr/bin/env bash
# Round-5 final perf pass (after the camera training releases the chip):
#   1. striped-kernel A/B on the flagship bench (GENCOMM_STRIPED=0 vs 1)
#   2. by-module trace with the striped kernel live
#   3. GenComm ch=32 UNet probe (tests the kernel-floor hypothesis the
#      added-cost analysis rests on; VERDICT r4 item 4's suggestion)
#   4. clean camera sustained-fps re-run (campaign row was contaminated)
set -uo pipefail
cd "$(dirname "$0")/.."
export PYTHONPATH="/root/repo:/root/.axon_site${PYTHONPATH:+:$PYTHONPATH}"
mkdir -p logs measurements

run() { echo "+ $*" ; "$@" ; echo "rc=$? for: $*" ; }

FLAG=configs/opv2v/gencomm_stage1_m1_att.yaml

# --- 1. striped A/B on the bench (same session, back to back) ------------
run timeout 900 python bench.py 2>&1 | tee logs/r5b_bench_striped.log
# non-striped comparison: bench.py builds its own model args, so flip via
# a small driver that rebuilds with striped off
run timeout 900 python -c "import bench; bench.main(striped=False)" \
    2>&1 | tee logs/r5b_bench_plain.log

# --- 2. by-module with striped live --------------------------------------
run timeout 1200 env GENCOMM_STRIPED=1 python -m gencomm_tpu.tools.profiler \
    --hypes_yaml "$FLAG" --by_module --half --iters 10 \
    2>&1 | tee logs/r5b_by_module_striped.log

# --- 3. ch=32 UNet probe (kernel-floor hypothesis) ------------------------
run timeout 1800 python scripts/unet_ch32_probe.py \
    2>&1 | tee logs/r5b_unet_ch32.log

# --- 4. clean camera sustained fps ---------------------------------------
run timeout 1800 python -m gencomm_tpu.tools.sustained_fps \
    -y configs/opv2v/camera_only/camera_v2xvit.yaml --frames 30 \
    2>&1 | tee logs/r5b_sustained_camera.log

echo "r5b done"
