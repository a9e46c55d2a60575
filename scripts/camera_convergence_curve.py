"""Camera stage-1 convergence curve: AP vs training step on the chip.

VERDICT r3 item 3: train camera stage-1 at the lidar path's convergence
budget (~1000 steps) with the default TPU trunk and depth_topk=8, publish
the AP curve next to the lidar path's 1000-step 0.93/0.41 anchor
(BASELINE.md r1). This script evaluates every saved checkpoint of a
finished run (tools/train.py saves step_<epoch> dirs) on held-out
synthetic frames and emits one JSON with the curve.

Usage:
  python scripts/camera_convergence_curve.py --model_dir logs/cam_conv_k8 \
      [--frames 30] [--out logs/camera_convergence.json]
"""

from __future__ import annotations

import argparse
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model_dir", required=True)
    ap.add_argument("--frames", type=int, default=30)
    ap.add_argument("--steps_per_epoch", type=int, default=100,
                    help="converts step_<epoch> dirs to optimizer steps")
    ap.add_argument("--score_threshold", type=float, default=0.05,
                    help="low pre-NMS threshold so early (under-confident) "
                         "checkpoints still rank their detections")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    from gencomm_tpu.tools import inference

    ckpts = sorted(
        (int(m.group(1)), d)
        for d in os.listdir(args.model_dir)
        if (m := re.fullmatch(r"step_(\d+)", d))
    )
    assert ckpts, f"no step_<n> checkpoints in {args.model_dir}"

    curve = []
    for epoch, d in ckpts:
        res = inference.main([
            "--model_dir", args.model_dir,
            "--ckpt", os.path.join(args.model_dir, d),
            "--dataset", "synthetic",
            "--frames", str(args.frames),
            "--infer_info", f"conv_{d}",
            "--score_threshold", str(args.score_threshold),
        ])
        curve.append({
            "epoch": epoch,
            "opt_steps": epoch * args.steps_per_epoch,
            **{k: round(float(v), 4) for k, v in res.items()},
        })
        print(json.dumps(curve[-1]))

    out = args.out or os.path.join(args.model_dir, "convergence_curve.json")
    with open(out, "w") as f:
        json.dump(curve, f, indent=2)
    print("wrote", out)


if __name__ == "__main__":
    main()
