"""Evaluation entry point: run a trained model over a dataset and report
VOC AP@0.3/0.5/0.7 (per-frame and global-sort variants).

Parity: opencood/tools/inference.py + inference_utils.py. Robustness sweeps
(pose noise / comm delay) mirror inference_w_noise.py:66-110 and
inference_w_delay.py:66-78 via --pos_std/--rot_std/--delay flags.
"""

from __future__ import annotations

import argparse
import os

import numpy as np
import jax
import jax.numpy as jnp

from gencomm_tpu.config.yaml_utils import load_yaml, save_yaml
from gencomm_tpu.models import create_model
from gencomm_tpu.train import trainer, checkpoint
from gencomm_tpu.data.postprocessor import generate_anchor_box
from gencomm_tpu.pipeline import InferencePipeline
from gencomm_tpu.utils import eval_utils, box_utils


def main(argv=None):
    import gencomm_tpu

    gencomm_tpu.enable_persistent_cache()
    gencomm_tpu.enable_fast_prng()
    parser = argparse.ArgumentParser()
    parser.add_argument("--model_dir", required=True)
    parser.add_argument("--dataset", default="opv2v",
                        choices=["opv2v", "v2xset", "dairv2x", "v2xsim", "v2xreal", "synthetic"])
    parser.add_argument("--frames", type=int, default=50)
    parser.add_argument("--pos_std", type=float, default=0.0)
    parser.add_argument("--rot_std", type=float, default=0.0)
    parser.add_argument("--laplace", action="store_true")
    parser.add_argument("--delay", type=int, default=0,
                        help="comm delay in ms (100 ms frames)")
    parser.add_argument("--infer_info", default=None)
    parser.add_argument("--ckpt", default=None,
                        help="evaluate this checkpoint dir instead of "
                             "bestval/latest (convergence curves)")
    parser.add_argument("--score_threshold", type=float, default=None,
                        help="override postprocess score_threshold")
    parser.add_argument("--use_cav", type=int, default=0,
                        help="cap the number of collaborating agents "
                        "(dynamic in-order evaluation, "
                        "inference_heter_in_order.py:34-57); 0 = all")
    parser.add_argument("--report_comm", action="store_true",
                        help="report communication volume: where2comm "
                             "comm_rate and transmitted-payload CPM bytes "
                             "(reference: comm_modules/where2comm.py rate "
                             "accounting + draco_compression CPM sizing)")
    parser.add_argument("--save_vis_interval", type=int, default=0,
                        help="dump a BEV png every N frames (0 = off; "
                        "reference inference.py:205-226)")
    parser.add_argument("--range", dest="det_range", default=None,
                        help="override the detection range as "
                             "'xmin,ymin,zmin,xmax,ymax,zmax' and re-derive "
                             "the anchor grid (reference inference.py:50-73)")
    parser.add_argument("--half", action="store_true",
                        help="bf16 inference: activations run bf16 through "
                             "encoder/backbone/GenComm/fusion, heads+decode "
                             "fp32 (the train --half analog applied at "
                             "eval; fp32 checkpoints load unchanged — "
                             "params stay fp32)")
    args = parser.parse_args(argv)

    hypes = load_yaml(None, args.model_dir)
    if args.half:
        hypes["model"]["args"]["half"] = True
    if args.det_range:
        rng_ = [float(v) for v in args.det_range.split(",")]
        assert len(rng_) == 6, "--range needs 6 comma-separated floats"
        from gencomm_tpu.config.yaml_utils import update_yaml

        hypes["cav_lidar_range"] = list(rng_)
        hypes["preprocess"]["cav_lidar_range"] = list(rng_)
        hypes["postprocess"]["anchor_args"]["cav_lidar_range"] = list(rng_)
        hypes["postprocess"]["gt_range"] = list(rng_)
        for setting in hypes.get("heter", {}).get(
                "modality_setting", {}).values():
            setting.setdefault("preprocess", {})["cav_lidar_range"] = \
                list(rng_)
        # the MODEL's BEV grids must follow too (the encoders build their
        # canvas from args.lidar_range; anchors at the new range against
        # heads at the old grid would shape-mismatch in decode)
        margs = hypes["model"].get("args", {})
        if "lidar_range" in margs:
            margs["lidar_range"] = list(rng_)
        for mcfg in margs.values():
            if isinstance(mcfg, dict) and "encoder_args" in mcfg:
                if "lidar_range" in mcfg["encoder_args"]:
                    mcfg["encoder_args"]["lidar_range"] = list(rng_)
        hypes = update_yaml(hypes)
    if args.pos_std or args.rot_std:
        hypes["noise_setting"] = {
            "add_noise": True,
            "add_pose_noise": True,
            "args": {"pos_std": args.pos_std, "rot_std": args.rot_std,
                     "laplace": args.laplace},
        }
    if args.delay:
        hypes["wild_setting"] = {"async": True, "async_overhead": args.delay}
    if args.score_threshold is not None:
        hypes["postprocess"]["target_args"]["score_threshold"] = \
            args.score_threshold

    np.random.seed(303)  # reference inference.py:107
    from gencomm_tpu.tools.train import build_dataset

    dataset = build_dataset(hypes, False, args.dataset)
    model = create_model(hypes)

    # prefer the bestval checkpoint at eval (reference
    # train_utils.load_saved_model:168-216); --ckpt pins a specific one
    # (the reference's eval-at-epoch convention, inference.py --epoch)
    ckpt_path = args.ckpt or (checkpoint.bestval_checkpoint(args.model_dir)
                              or checkpoint.latest_checkpoint(args.model_dir))
    assert ckpt_path, f"no checkpoint in {args.model_dir}"
    restored = checkpoint.load_checkpoint(ckpt_path)

    anchors = generate_anchor_box(
        hypes["postprocess"]["anchor_args"],
        hypes["postprocess"].get("order", "hwl"),
    )

    # template init to get batch_stats structure
    if args.dataset == "synthetic":
        first = dataset.sample(0, 1)
    else:
        first = dataset.collate([dataset[0]])
    variables = trainer.cpu_init(
        model, first, jax.random.PRNGKey(0), train=False
    )
    variables = {
        "params": checkpoint.load_into(variables["params"], restored["params"]),
        "batch_stats": checkpoint.load_into(
            variables.get("batch_stats", {}), restored.get("batch_stats", {})
        ),
    }
    num_class = int(hypes["postprocess"].get("num_class", 1))
    if num_class > 1:
        return _multiclass_eval(args, hypes, dataset, model, variables,
                                num_class)

    pipe = InferencePipeline(model, variables, anchors, hypes["postprocess"])

    stat = eval_utils.new_result_stat()
    n = args.frames if args.dataset == "synthetic" else min(
        args.frames, len(dataset)
    )
    for f in range(n):
        if args.dataset == "synthetic":
            host = dataset.sample(1000 + f, 1)
        else:
            host = dataset.collate([dataset[f]])
        if args.use_cav:
            host = dict(host)
            am = host["agent_mask"].copy()
            am[:, args.use_cav:] = False
            host["agent_mask"] = am
            for k in list(host):
                if k.startswith("modality_mask_"):
                    mm = host[k].copy()
                    mm[:, args.use_cav:] = False
                    host[k] = mm
        # agent-slot bucketing: one compilation per bucket size, skip the
        # compute of empty padded slots (record_len parity, see bench.py)
        from gencomm_tpu.data.bucketing import trim_agent_slots

        host = trim_agent_slots(host, buckets=(2, 3, 5))
        batch = {k: jnp.asarray(v) for k, v in host.items()}
        dets = pipe.run(batch, seed=f)
        valid = np.asarray(dets.valid[0])
        corners = np.asarray(dets.corners3d[0])[valid]
        scores = np.asarray(dets.scores[0])[valid]
        gt_boxes = host["gt_boxes"][0][host["gt_mask"][0] == 1]
        gt = box_utils.boxes_to_corners_3d(gt_boxes, "hwl")
        for t in (0.3, 0.5, 0.7):
            eval_utils.calculate_tp_fp(corners, scores, gt, stat, t)
        if args.save_vis_interval and f % args.save_vis_interval == 0:
            from gencomm_tpu.visualization import simple_vis

            vis_dir = os.path.join(args.model_dir, "vis")
            os.makedirs(vis_dir, exist_ok=True)
            pts_key = next(
                (k for k in host if k.startswith("points_")), None
            )
            pts = (host[pts_key][0].reshape(-1, host[pts_key].shape[-1])
                   if pts_key else None)
            simple_vis.visualize(
                corners, gt, pts, hypes["postprocess"]["gt_range"],
                os.path.join(vis_dir, f"bev_{f:05d}.png"),
            )

    if args.report_comm and n > 0:
        # communication-volume accounting on the last frame: where2comm
        # mask rate (if the model carries Communication) and the CPM byte
        # size of what actually crosses the air — GenComm's 2-ch messages,
        # else the fused BEV features. Only VALID non-ego agents transmit.
        from gencomm_tpu.utils.misc_utils import cpm_size_bytes

        out = model.apply(
            variables, batch, train=False,
            rngs={"diffusion": jax.random.PRNGKey(0),
                  "dropout": jax.random.PRNGKey(7)},
        )
        report = {}
        if "comm_rate" in out:
            report["comm_rate"] = float(np.asarray(out["comm_rate"]))
        amask = np.asarray(batch["agent_mask"])[0] > 0
        senders = np.nonzero(amask[1:])[0] + 1  # valid non-ego slots
        payload = out.get("message")
        if payload is not None:
            report["payload"] = "gencomm_message_2ch"
            per_agent = np.asarray(payload)[0, senders]
        else:
            report["payload"] = "bev_feature"
            feat = out.get("gt_feature")
            if feat is not None:
                per_agent = np.asarray(feat).reshape(
                    (amask.shape[0], -1))[senders]
            else:
                per_agent = np.zeros((len(senders), 0), np.float16)
        report["n_senders"] = int(len(senders))
        sizes = cpm_size_bytes(per_agent)
        report["cpm_bytes_fp16_raw"] = sizes["raw_bytes"]
        report["cpm_bytes_fp16_deflate"] = sizes["compressed_bytes"]
        codes = out.get("codebook_codes")
        if codes is not None:
            # CodeFilling: the code indices are the real payload — report
            # exact entropy-coded sizes (draco_compression.py analog)
            from gencomm_tpu.utils.misc_utils import code_stream_bytes

            # Same default as create-model (heter_baseline.py
            # codebook_dict_sizes fallback (64,64,64)) so the bits/code
            # used for packed/entropy byte accounting matches the model.
            dict_sizes = hypes["model"]["args"]["codebook"].get(
                "dict_size", [64, 64, 64])
            if not isinstance(dict_sizes, (list, tuple)):
                dict_sizes = [dict_sizes]
            codes = np.asarray(codes)[0, senders]  # (S, stages, N)
            per_stage = [
                code_stream_bytes(codes[:, s], int(dict_sizes[
                    min(s, len(dict_sizes) - 1)]))
                for s in range(codes.shape[1])
            ]
            report["payload"] = "codebook_codes"
            report["cpm_code_bytes_packed"] = sum(
                s["raw_bytes"] for s in per_stage)
            report["cpm_code_bytes_entropy"] = sum(
                s["entropy_bytes"] for s in per_stage)
            report["cpm_code_bytes_deflate"] = sum(
                s["compressed_bytes"] for s in per_stage)
        print("comm report:", report)

    for global_sort in (False, True):
        res = eval_utils.eval_final_results(stat, global_sort)
        tag = "eval_global_sort" if global_sort else "eval"
        if args.infer_info:
            tag += f"_{args.infer_info}"
        save_yaml(res, os.path.join(args.model_dir, f"{tag}.yaml"))
        print(tag, {k: round(v, 4) for k, v in res.items()})
    return res


def _multiclass_eval(args, hypes, dataset, model, variables, num_class):
    """V2X-Real multi-class evaluation: per anchor-class decode + NMS,
    per-class VOC AP and mAP (reference tools/inference_v2xreal.py +
    eval_utils.eval_final_results_v2xreal:349-383)."""
    from gencomm_tpu.data.postprocessor import (
        decode_and_nms_multiclass, generate_anchor_box_multiclass,
    )
    from gencomm_tpu.data.v2xreal import CLASS_NAMES

    pp = hypes["postprocess"]
    anchors_mc, _, _, class_names = generate_anchor_box_multiclass(
        pp["anchor_args"], pp.get("order", "hwl"))
    if len(class_names) != num_class:
        class_names = list(CLASS_NAMES)[:num_class]
    gt_range = jnp.asarray(pp["gt_range"], jnp.float32)
    anchors_j = jnp.asarray(anchors_mc)
    score_thr = pp["target_args"].get("score_threshold", 0.2)
    nms_thr = pp.get("nms_thresh", 0.15)

    @jax.jit
    def run(v, batch, rng):
        out = model.apply(
            v, batch, train=False,
            rngs={"diffusion": rng, "dropout": jax.random.fold_in(rng, 7)},
        )
        return decode_and_nms_multiclass(
            out["cls_preds"][0], out["reg_preds"][0], anchors_j,
            jnp.eye(4), gt_range,
            score_threshold=score_thr, nms_thresh=nms_thr,
        )

    from gencomm_tpu.data.bucketing import trim_agent_slots

    stats = eval_utils.new_multiclass_stat(class_names)
    n = args.frames if args.dataset == "synthetic" else min(
        args.frames, len(dataset))
    for f in range(n):
        if args.dataset == "synthetic":
            host = dataset.sample(1000 + f, 1)
        else:
            host = dataset.collate([dataset[f]])
        if args.use_cav:
            # agents-join-in-order sweeps (inference_v2xreal_heter_in_order)
            host = dict(host)
            for k in list(host):
                if k == "agent_mask" or k.startswith("modality_mask_"):
                    mm = host[k].copy()
                    mm[:, args.use_cav:] = False
                    host[k] = mm
        host = trim_agent_slots(host, buckets=(2, 3, 5))
        batch = {k: jnp.asarray(v) for k, v in host.items()}
        dets = run(variables, batch, jax.random.PRNGKey(f))
        valid = np.asarray(dets.valid)
        corners = np.asarray(dets.corners3d)[valid]
        scores = np.asarray(dets.scores)[valid]
        labels = np.asarray(dets.labels)[valid]
        gt_boxes = host["gt_boxes"][0][host["gt_mask"][0] == 1]
        gt_cls = np.asarray(host["gt_classes"][0])[
            host["gt_mask"][0] == 1] if "gt_classes" in host else \
            np.ones(len(gt_boxes), np.int32)
        gtc = box_utils.boxes_to_corners_3d(gt_boxes, pp.get("order", "hwl"))
        for ci, cname in enumerate(class_names):
            csel = labels == ci + 1
            gsel = gt_cls == ci + 1
            for t in (0.3, 0.5, 0.7):
                eval_utils.calculate_tp_fp(
                    corners[csel], scores[csel], gtc[gsel],
                    stats[cname], t)
    res = eval_utils.eval_multiclass_results(stats)
    flat = {}
    for k, v in res.items():
        if isinstance(v, dict):
            for kk, vv in v.items():
                flat[f"{k}_{kk}"] = float(vv)
        else:
            flat[k] = float(v)
    tag = "eval_multiclass"
    if args.infer_info:
        tag += f"_{args.infer_info}"
    save_yaml(flat, os.path.join(args.model_dir, f"{tag}.yaml"))
    print(tag, {k: round(v, 4) for k, v in flat.items()})
    return flat


if __name__ == "__main__":
    main()
