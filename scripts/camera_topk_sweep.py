"""depth_topk / trunk-bf16 AP + fps sweep on a trained camera checkpoint.

VERDICT r2 item 1a: pick the quality-neutral splat sparsification point.
Evaluates ONE checkpoint (trained at the config's depth_topk) under
eval-time variants — K in {dense,8,4,2} and bf16 trunk — sharing a single
host init and one pre-generated frame set, then reports AP@0.3/0.5/0.7 and
device fps per variant.

Usage:
  python scripts/camera_topk_sweep.py --model_dir /tmp/cam_conv_k8 \
      [--frames 50] [--out BASELINE_fragment.json]
"""

from __future__ import annotations

import argparse
import copy
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model_dir", required=True)
    ap.add_argument("--frames", type=int, default=50)
    ap.add_argument("--out", default=None)
    ap.add_argument("--ckpt", default=None,
                    help="checkpoint dir (default bestval/latest)")
    ap.add_argument("--score_threshold", type=float, default=None,
                    help="override postprocess score_threshold (AP is "
                         "rank-based; a low threshold keeps weak but "
                         "correctly-ranked detections in the curve)")
    args = ap.parse_args()

    import gencomm_tpu

    gencomm_tpu.enable_persistent_cache()
    from gencomm_tpu.config.yaml_utils import load_yaml
    from gencomm_tpu.models import create_model
    from gencomm_tpu.train import trainer, checkpoint
    from gencomm_tpu.tools.train import build_dataset
    from gencomm_tpu.data.postprocessor import generate_anchor_box
    from gencomm_tpu.data.bucketing import trim_agent_slots
    from gencomm_tpu.pipeline import InferencePipeline
    from gencomm_tpu.utils import eval_utils, box_utils

    hypes = load_yaml(None, args.model_dir)
    dataset = build_dataset(hypes, False, "synthetic")

    np.random.seed(303)
    print("generating frames...", flush=True)
    frames = [
        trim_agent_slots(dataset.sample(1000 + f, 1), buckets=(2, 3, 5))
        for f in range(args.frames)
    ]

    anchors = generate_anchor_box(
        hypes["postprocess"]["anchor_args"],
        hypes["postprocess"].get("order", "hwl"),
    )
    if args.score_threshold is not None:
        hypes["postprocess"]["target_args"]["score_threshold"] = \
            args.score_threshold
    ckpt_path = args.ckpt or (checkpoint.bestval_checkpoint(args.model_dir)
                              or checkpoint.latest_checkpoint(args.model_dir))
    restored = checkpoint.load_checkpoint(ckpt_path)

    base_model = create_model(hypes)
    print("host init...", flush=True)
    variables = trainer.cpu_init(
        base_model, frames[0], jax.random.PRNGKey(0), train=False
    )
    variables = {
        "params": checkpoint.load_into(variables["params"],
                                       restored["params"]),
        "batch_stats": checkpoint.load_into(
            variables.get("batch_stats", {}),
            restored.get("batch_stats", {})),
    }

    def modality_settings(h):
        return [m for m in h["model"]["args"].values()
                if isinstance(m, dict) and m.get("sensor_type") == "camera"]

    variants = []
    for k in (8, 4, 2, 0):
        variants.append((f"topk{k or 'dense'}", {"depth_topk": k}))
    variants.append(("topk8_bf16", {"depth_topk": 8, "trunk_bf16": True,
                                    "splat_bf16": True}))
    variants.append(("topk4_bf16", {"depth_topk": 4, "trunk_bf16": True,
                                    "splat_bf16": True}))

    results = {}
    for name, overrides in variants:
        h = copy.deepcopy(hypes)
        for m in modality_settings(h):
            m["encoder_args"].update(overrides)
        model = create_model(h)
        pipe = InferencePipeline(model, variables, anchors,
                                 h["postprocess"])
        stat = eval_utils.new_result_stat()
        t_dev = 0.0
        n_timed = 0
        seen_buckets = set()  # first frame of each agent bucket compiles
        for f, host in enumerate(frames):
            batch = {k2: jnp.asarray(v) for k2, v in host.items()}
            # transfers are async — block so the timed region is the model
            # step only (bench.py's device-resident-input convention; the
            # tunnel's host->device image upload otherwise dominates)
            jax.block_until_ready(batch)
            bucket = host["agent_mask"].shape[1]
            t0 = time.perf_counter()
            dets = pipe.run(batch, seed=f)
            jax.block_until_ready(dets.scores)
            if bucket in seen_buckets:
                t_dev += time.perf_counter() - t0
                n_timed += 1
            seen_buckets.add(bucket)
            valid = np.asarray(dets.valid[0])
            corners = np.asarray(dets.corners3d[0])[valid]
            scores = np.asarray(dets.scores[0])[valid]
            gt_boxes = host["gt_boxes"][0][host["gt_mask"][0] == 1]
            gt = box_utils.boxes_to_corners_3d(gt_boxes, "hwl")
            for t in (0.3, 0.5, 0.7):
                eval_utils.calculate_tp_fp(corners, scores, gt, stat, t)
        res = eval_utils.eval_final_results(stat, global_sort_detections=True)
        fps = n_timed / t_dev if t_dev else 0.0
        results[name] = {**{k2: round(float(v), 4) for k2, v in res.items()},
                         "model_fps": round(fps, 1)}
        print(name, results[name], flush=True)

    if args.out:
        with open(args.out, "w") as f:
            json.dump(results, f, indent=1)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
