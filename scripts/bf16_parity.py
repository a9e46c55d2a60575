"""bf16 inference parity vs fp32 (VERDICT r4 item 1 evidence).

Runs the SAME trained weights through the fp32 graph and the --half (bf16
activation) graph on identical frames and reports:

  cls_rel_l2      relative L2 of sigmoid class probabilities
  cls_max_abs     max abs probability difference
  top100_overlap  mean fraction of the fp32 top-100 scoring cells kept in
                  the bf16 top-100 (the AP-relevant statistic: AP only
                  sees score ORDER)
  ap_fp32 / ap_bf16  full synthetic AP@{0.3,0.5,0.7} via the end-to-end
                  pipeline (decode + rotated NMS) for both dtypes

Same validation protocol as the r4 depth_topk decision
(scripts/camera_topk_fidelity.py): overlap >= 0.95 + matching AP = the
bf16 graph computes the same detector.

Usage:
  python scripts/bf16_parity.py --model_dir logs/flagship_smoke \
      [--frames 16] [--out measurements/bf16_parity.json]
"""

from __future__ import annotations

import argparse
import copy
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model_dir", required=True)
    ap.add_argument("--frames", type=int, default=16)
    ap.add_argument("--eval_frames", type=int, default=30)
    ap.add_argument("--ckpt", default=None)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    import gencomm_tpu

    gencomm_tpu.enable_persistent_cache()
    from gencomm_tpu.config.yaml_utils import load_yaml
    from gencomm_tpu.models import create_model
    from gencomm_tpu.train import trainer, checkpoint
    from gencomm_tpu.tools.train import build_dataset
    from gencomm_tpu.data.bucketing import trim_agent_slots
    from gencomm_tpu.data.postprocessor import generate_anchor_box
    from gencomm_tpu.pipeline import InferencePipeline

    hypes = load_yaml(None, args.model_dir)
    dataset = build_dataset(hypes, False, "synthetic")

    np.random.seed(303)
    frames = [
        trim_agent_slots(dataset.sample(4000 + f, 1), buckets=(2,))
        for f in range(args.frames)
    ]

    ckpt_path = args.ckpt or (checkpoint.bestval_checkpoint(args.model_dir)
                              or checkpoint.latest_checkpoint(args.model_dir))
    restored = checkpoint.load_checkpoint(ckpt_path)
    base_model = create_model(hypes)
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
    variables = jax.device_put(variables, jax.devices()[0])

    def head_outputs(half):
        h = copy.deepcopy(hypes)
        h["model"]["args"]["half"] = half
        model = create_model(h)

        @jax.jit
        def run(variables, batch, rng):
            out = model.apply(
                variables, batch, train=False,
                rngs={"diffusion": rng,
                      "dropout": jax.random.fold_in(rng, 7)},
            )
            return out["cls_preds"]

        cls_all = []
        for f, host in enumerate(frames):
            batch = {k2: jnp.asarray(v) for k2, v in host.items()}
            c = run(variables, batch, jax.random.PRNGKey(f))
            cls_all.append(np.asarray(jax.nn.sigmoid(c)).ravel())
        return np.stack(cls_all)

    cls_ref = head_outputs(False)
    cls_bf = head_outputs(True)

    rel = float(np.linalg.norm(cls_bf - cls_ref) / np.linalg.norm(cls_ref))
    mx = float(np.abs(cls_bf - cls_ref).max())
    top_ref = np.argsort(-cls_ref, axis=1)[:, :100]
    top_bf = np.argsort(-cls_bf, axis=1)[:, :100]
    overlap = float(np.mean([
        len(set(a) & set(b)) / 100.0 for a, b in zip(top_ref, top_bf)
    ]))

    # full end-to-end AP both ways (decode + rotated NMS + VOC AP)
    anchors = generate_anchor_box(
        hypes["postprocess"]["anchor_args"],
        hypes["postprocess"].get("order", "hwl"),
    )
    aps = {}
    for half in (False, True):
        h = copy.deepcopy(hypes)
        h["model"]["args"]["half"] = half
        model = create_model(h)
        pipe = InferencePipeline(model, jax.device_get(variables), anchors,
                                 hypes["postprocess"])
        res = pipe.evaluate(dataset, n_frames=args.eval_frames)
        aps["bf16" if half else "fp32"] = {
            k: round(float(v), 4) for k, v in res.items()
        }
        print("ap", "bf16" if half else "fp32", aps["bf16" if half else "fp32"],
              flush=True)

    results = {
        "cls_rel_l2": round(rel, 5),
        "cls_max_abs": round(mx, 5),
        "top100_overlap": round(overlap, 4),
        "ap_fp32": aps["fp32"],
        "ap_bf16": aps["bf16"],
        "frames": args.frames,
        "eval_frames": args.eval_frames,
        "ckpt": str(ckpt_path),
    }
    print(json.dumps(results, indent=1))
    out = args.out or "measurements/bf16_parity.json"
    os.makedirs(os.path.dirname(out), exist_ok=True)
    with open(out, "w") as f:
        json.dump(results, f, indent=1)
    print("wrote", out)


if __name__ == "__main__":
    main()
