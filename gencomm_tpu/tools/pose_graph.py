"""CoAlign pose-graph tooling: precompute stage-1 boxes, evaluate refinement.

Parity: opencood/tools/pose_graph_pre_calc.py (dump per-frame per-agent
stage-1 boxes/scores/poses to json for later pose-graph optimization) and
opencood/tools/pose_graph_evaluate.py (inject pose noise, run the SE2
box-alignment refinement, report position/yaw error before vs after).

The optimizer itself is gencomm_tpu.models.coalign (Gauss-Newton on SE2 in
JAX — the g2o replacement, reference sub_modules/pose_graph_optim.py).
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np

from gencomm_tpu.models.coalign import refine_poses_np


def precalc(args):
    """Dump synthetic stage-1 detections per frame (the reference runs the
    trained stage-1 model; we persist the same record layout)."""
    from gencomm_tpu.data.synthetic import SyntheticScenes, SyntheticConfig

    scenes = SyntheticScenes(SyntheticConfig())
    os.makedirs(args.out, exist_ok=True)
    records = {}
    for f in range(args.frames):
        batch = scenes.sample(1000 + f, 1)
        gt = batch["gt_boxes"][0]
        gm = batch["gt_mask"][0]
        # per-agent "detections" = GT with per-agent jitter (stand-in for the
        # stage-1 model output, same shape contract)
        rng = np.random.default_rng(f)
        l = batch["agent_mask"].shape[1]
        boxes = np.tile(gt[None], (l, 1, 1))
        boxes[..., :2] += rng.normal(0, 0.1, boxes[..., :2].shape)
        masks = np.tile(gm[None], (l, 1))
        records[str(f)] = {
            "boxes": boxes.tolist(),
            "masks": masks.tolist(),
            "scores": np.clip(
                rng.uniform(0.5, 1.0, masks.shape) * masks, 0, 1
            ).tolist(),
            "lidar_poses": batch["lidar_poses"][0].tolist()
            if "lidar_poses" in batch else np.zeros((l, 6)).tolist(),
        }
    path = os.path.join(args.out, "stage1_boxes.json")
    with open(path, "w") as fobj:
        json.dump(records, fobj)
    print("wrote", path)


def evaluate(args):
    """Pose-noise sweep: refined vs noisy pose error (σ ∈ {0.2..0.8} m /
    deg as in inference_w_noise.py / pose_graph_evaluate.py)."""
    with open(os.path.join(args.out, "stage1_boxes.json")) as fobj:
        records = json.load(fobj)
    rng = np.random.default_rng(303)
    report = {}
    for std in (0.2, 0.4, 0.6):
        errs_before, errs_after = [], []
        for rec in records.values():
            boxes = np.asarray(rec["boxes"], np.float32)
            masks = np.asarray(rec["masks"], np.float32)
            poses = np.asarray(rec["lidar_poses"], np.float64)
            noisy = poses.copy()
            noisy[1:, 0] += rng.normal(0, std, len(noisy) - 1)
            noisy[1:, 1] += rng.normal(0, std, len(noisy) - 1)
            noisy[1:, 4] += rng.normal(0, std, len(noisy) - 1)
            refined = refine_poses_np(boxes, masks, noisy)
            errs_before.append(
                np.abs(noisy[1:, :2] - poses[1:, :2]).mean())
            errs_after.append(
                np.abs(refined[1:, :2] - poses[1:, :2]).mean())
        report[f"std_{std}"] = {
            "pos_err_noisy_m": float(np.mean(errs_before)),
            "pos_err_refined_m": float(np.mean(errs_after)),
        }
    print(json.dumps(report, indent=2))
    return report


def main(argv=None):
    ap = argparse.ArgumentParser()
    sub = ap.add_subparsers(dest="cmd", required=True)
    p = sub.add_parser("precalc")
    p.add_argument("--out", default="pose_graph_out")
    p.add_argument("--frames", type=int, default=10)
    e = sub.add_parser("evaluate")
    e.add_argument("--out", default="pose_graph_out")
    args = ap.parse_args(argv)
    {"precalc": precalc, "evaluate": evaluate}[args.cmd](args)


if __name__ == "__main__":
    main()
