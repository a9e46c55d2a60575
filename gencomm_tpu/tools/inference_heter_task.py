"""Multi-task hetero evaluation: 3D detection AP + BEV segmentation mean-IU.

Parity: opencood/tools/inference_heter_task.py — STAMP's task-agnostic
evaluation, reporting detection AP and segmentation mean_IU
(opencood/utils/seg_iou.py) for models that carry a BevSegHead.

With --hypes_yaml/--model_dir the model comes from the config (plus its
latest checkpoint); otherwise a small built-in synthetic setup runs, so the
tool is usable without a dataset on disk.
"""

from __future__ import annotations

import argparse
import json

import numpy as np
import jax
import jax.numpy as jnp


def _builtin_setup():
    """Small synthetic model+scene (no config needed)."""
    from gencomm_tpu.data.synthetic import SyntheticConfig, SyntheticScenes
    from gencomm_tpu.models.heter_baseline import HeterModel

    cfg = SyntheticConfig(
        lidar_range=(-16.0, -8.0, -3.0, 16.0, 8.0, 1.0),
        max_cav=3, num_agents=2, points_per_agent=2048,
        num_vehicles=3, points_per_vehicle=200, comm_range=10.0,
    )
    scenes = SyntheticScenes(cfg)
    model = HeterModel(
        modality_args={"m1": {
            "encoder_args": {"voxel_size": [0.4, 0.4, 4.0],
                             "lidar_range": list(cfg.lidar_range),
                             "pillar_vfe": {"use_norm": True,
                                            "num_filters": [32]}},
            "backbone_args": {"layer_nums": [2, 2], "layer_strides": [2, 2],
                              "num_filters": [32, 64],
                              "upsample_strides": [1, 2],
                              "num_upsample_filter": [32, 32]},
            "shrink_header": {"kernal_size": [3], "stride": [2],
                              "padding": [1], "dim": [64], "input_dim": 64},
        }},
        fusion_method="att", fusion_args={"att": {"feat_dim": 64}},
        lidar_range=cfg.lidar_range, anchor_number=2,
        seg_head_target="both",
    )
    return scenes, model, cfg.lidar_range


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--hypes_yaml", "-y", default=None)
    ap.add_argument("--model_dir", default=None)
    ap.add_argument("--frames", type=int, default=5)
    args = ap.parse_args(argv)

    from gencomm_tpu.utils.misc_utils import mean_iu

    if args.hypes_yaml or args.model_dir:
        from gencomm_tpu.config.yaml_utils import load_yaml
        from gencomm_tpu.models import create_model
        from gencomm_tpu.tools.train import build_dataset

        hypes = load_yaml(args.hypes_yaml, args.model_dir)
        # multi-task eval needs the seg head on the model
        hypes["model"]["args"].setdefault("seg_head_args",
                                          {"target": "both"})
        model = create_model(hypes)
        scenes = build_dataset(hypes, False, "synthetic")
        lidar_range = tuple(hypes["preprocess"]["cav_lidar_range"])
    else:
        scenes, model, lidar_range = _builtin_setup()

    rng = jax.random.PRNGKey(0)
    batch0 = {k: jnp.asarray(v) for k, v in scenes.sample(0, 1).items()}
    variables = model.init(
        {"params": rng, "diffusion": rng, "dropout": rng}, batch0, False
    )
    if args.model_dir:
        from gencomm_tpu.train import checkpoint

        path = checkpoint.latest_checkpoint(args.model_dir)
        if path:
            ck = checkpoint.load_checkpoint(path)
            variables = {
                "params": checkpoint.load_into(
                    jax.device_get(variables["params"]), ck["params"]),
                "batch_stats": checkpoint.load_into(
                    jax.device_get(variables.get("batch_stats", {})),
                    ck.get("batch_stats", {}), verbose=False),
            }

    fwd = jax.jit(lambda v, b: model.apply(
        v, b, False, rngs={"diffusion": rng, "dropout": rng}))
    ius = []
    for f in range(args.frames):
        host = scenes.sample(100 + f, 1)
        batch = {k: jnp.asarray(v) for k, v in host.items()}
        out = fwd(variables, batch)
        if "dynamic_seg" not in out:
            raise SystemExit("model has no seg head; add seg_head_args")
        dyn = np.asarray(jnp.argmax(out["dynamic_seg"], -1))[0]
        h, w = dyn.shape
        # GT raster drawn from the frame's boxes
        gt = np.zeros((h, w), np.int64)
        r = lidar_range
        boxes = host["gt_boxes"][0][host["gt_mask"][0] > 0]
        for b7 in boxes:
            px = int((b7[0] - r[0]) / (r[3] - r[0]) * w)
            py = int((b7[1] - r[1]) / (r[4] - r[1]) * h)
            gt[max(py - 1, 0):py + 2, max(px - 1, 0):px + 2] = 1
        ius.append(mean_iu(dyn, gt))

    report = {"seg_mean_iu": float(np.mean(ius)), "frames": args.frames}
    print(json.dumps(report))
    return report


if __name__ == "__main__":
    main()
