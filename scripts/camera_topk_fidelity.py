"""Feature-space fidelity of the top-K depth splat vs the dense splat.

AP on a convergence-budget synthetic checkpoint is too coarse to resolve
the quality cost of depth_topk (VERDICT r3 item 2a): at 1000 steps the
camera detector is still early in training and APs sit near zero for every
K. This script answers the question at the head-output level instead: run
the SAME trained weights with the dense splat (depth_topk=0, the reference
semantics — lss_submodule.py:40-141 splats all D bins) and with K in
{8, 4, 2}, and measure how far the predicted class heatmaps and box
regressions move. If K=8 is numerically indistinguishable from dense at
the heads, it cannot cost AP at any training budget (the function computed
is the same); the divergence at K=4/2 bounds where sparsification starts
to bite.

Metrics per K (vs dense, same frames, same weights):
  cls_rel_l2     relative L2 of sigmoid class probabilities
  cls_max_abs    max abs prob difference
  top100_overlap mean fraction of the dense top-100 scoring cells kept in
                 the K-splat top-100 (ranking agreement - the AP-relevant
                 statistic: AP only sees score ORDER)
  reg_rel_l2     relative L2 of reg deltas over the FULL reg map
  reg_rel_l2_top100  same, restricted to the dense top-100 scoring cells
                 (the boxes AP actually sees)

Usage:
  python scripts/camera_topk_fidelity.py --model_dir logs/cam_conv_k8 \
      [--frames 16] [--out logs/camera_topk_fidelity.json]
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

    hypes = load_yaml(None, args.model_dir)
    dataset = build_dataset(hypes, False, "synthetic")

    np.random.seed(303)
    # one fixed agent bucket -> one compile per variant
    frames = [
        trim_agent_slots(dataset.sample(2000 + f, 1), buckets=(2,))
        for f in range(args.frames)
    ]

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
    variables = jax.device_put(variables, jax.devices()[0])

    def camera_settings(h):
        return [m for m in h["model"]["args"].values()
                if isinstance(m, dict) and m.get("sensor_type") == "camera"]

    def head_outputs(k):
        h = copy.deepcopy(hypes)
        for m in camera_settings(h):
            m["encoder_args"]["depth_topk"] = k
        model = create_model(h)

        @jax.jit
        def run(variables, batch, rng):
            out = model.apply(
                variables, batch, train=False,
                rngs={"diffusion": rng,
                      "dropout": jax.random.fold_in(rng, 7)},
            )
            return out["cls_preds"], out["reg_preds"]

        cls_all, reg_all = [], []
        for f, host in enumerate(frames):
            batch = {k2: jnp.asarray(v) for k2, v in host.items()}
            c, r = run(variables, batch, jax.random.PRNGKey(f))
            cls_all.append(np.asarray(jax.nn.sigmoid(c)).ravel())
            reg_all.append(np.asarray(r).reshape(-1, r.shape[-1]))
        return np.stack(cls_all), np.stack(reg_all)  # (F, cells), (F*?, 7)

    # Dense reference via the top-K code path at K=D: keeping every bin
    # through the top-K splat is numerically the dense splat (the kept mass
    # renormalization is exact at K=D) but compiles like the other variants
    # — the depth_topk=0 dense-splat program is ~25x larger and stalled
    # >12 min compiling through the tunnel in the r4 sweep. D comes from
    # the config's depth discretization (the splat clamps k=min(K, D), so
    # a hardcoded K < D would silently make the "dense" run a top-K one).
    cams = camera_settings(hypes)
    assert cams, "no camera modality in this config"
    d_bins = {int(m["encoder_args"]["grid_conf"]["ddiscr"][2]) for m in cams}
    assert len(d_bins) == 1, f"mixed depth-bin counts {d_bins}"
    d_bins = d_bins.pop()
    print(f"dense-equivalent K = D = {d_bins}")
    cls_ref, reg_ref = head_outputs(d_bins)
    top_ref = np.argsort(-cls_ref, axis=1)[:, :100]

    results = {}
    for k in (8, 4, 2):
        cls_k, reg_k = head_outputs(k)
        rel = np.linalg.norm(cls_k - cls_ref) / np.linalg.norm(cls_ref)
        mx = float(np.abs(cls_k - cls_ref).max())
        top_k = np.argsort(-cls_k, axis=1)[:, :100]
        overlap = float(np.mean([
            len(set(a) & set(b)) / 100.0 for a, b in zip(top_ref, top_k)
        ]))
        reg_rel = float(
            np.linalg.norm(reg_k - reg_ref) / np.linalg.norm(reg_ref)
        )
        # restricted to the dense top-100 cells: cls cell index i raveled
        # over (H, W, A) -> reg row i // A (reg rows are per-position with
        # A*7 channels), slice (i % A)*7:(i % A + 1)*7
        n_frames = cls_ref.shape[0]
        reg_ref2 = reg_ref.reshape(-1, reg_ref.shape[-1])
        reg_k2 = reg_k.reshape(-1, reg_k.shape[-1])
        rows_per_frame = reg_ref2.shape[0] // n_frames
        anchors = cls_ref.shape[1] // rows_per_frame
        ch_per_anchor = reg_ref2.shape[1] // anchors
        num, den = 0.0, 0.0
        for f in range(n_frames):
            pos = top_ref[f] // anchors + f * rows_per_frame
            a = top_ref[f] % anchors
            for i in range(100):
                sl = slice(a[i] * ch_per_anchor, (a[i] + 1) * ch_per_anchor)
                d = reg_k2[pos[i], sl] - reg_ref2[pos[i], sl]
                num += float(d @ d)
                den += float(reg_ref2[pos[i], sl] @ reg_ref2[pos[i], sl])
        reg_rel_top = float(np.sqrt(num / max(den, 1e-12)))
        results[f"topk{k}"] = {
            "cls_rel_l2": round(float(rel), 5),
            "cls_max_abs": round(mx, 5),
            "top100_overlap": round(overlap, 4),
            "reg_rel_l2": round(reg_rel, 5),
            "reg_rel_l2_top100": round(reg_rel_top, 5),
        }
        print(f"topk{k}", results[f"topk{k}"], flush=True)

    out = args.out or os.path.join(args.model_dir, "topk_fidelity.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=1)
    print("wrote", out)


if __name__ == "__main__":
    main()
