"""Model zoo. ``create_model`` is the explicit-registry analog of the
reference's reflection loader (opencood/tools/train_utils.py:255-288)."""

from __future__ import annotations


def create_model(hypes: dict):
    core = hypes["model"]["core_method"].lower()
    args = hypes["model"]["args"]
    if core in ("ciassd", "second_ssfa", "second_ssfa_uncertainty"):
        from gencomm_tpu.models.ciassd import CIASSDModel

        head = args.get("head", {})
        anchor_num = head.get("num_cls", args.get("anchor_num", 2))
        # head.num_dir is the TOTAL dir channel count (anchors x bins,
        # cia_ssd_utils.py Head conv_dir), not per-anchor bins
        dir_bins = max(head.get("num_dir", 2 * anchor_num) // anchor_num, 2)
        return CIASSDModel(
            voxel_size=tuple(args["voxel_size"]),
            lidar_range=tuple(args["lidar_range"]),
            anchor_num=anchor_num,
            use_dir=head.get("use_dir", True),
            dir_bins=dir_bins,
            max_voxels=args.get("max_voxels", 32000),
            shrink_args=args.get("shrink_header"),
            use_unc="uncertainty" in core,
            uncertainty_dim=args.get("uncertainty_dim", 3),
        )
    if core in ("second", "second_intermediate"):
        from gencomm_tpu.models.ciassd import SecondModel

        return SecondModel(
            voxel_size=tuple(args["voxel_size"]),
            lidar_range=tuple(args["lidar_range"]),
            backbone_args=args["base_bev_backbone"],
            anchor_num=args.get("anchor_number", args.get("anchor_num", 2)),
            max_voxels=args.get("max_voxels", 32000),
            intermediate="intermediate" in core,
        )
    if core == "point_pillar_uncertainty":
        from gencomm_tpu.models.uncertainty import PointPillarUncertainty

        return PointPillarUncertainty(
            modality_args={"m1": {
                "encoder_args": {
                    "voxel_size": args["voxel_size"],
                    "lidar_range": args["lidar_range"],
                    "pillar_vfe": args["pillar_vfe"],
                },
                "backbone_args": args["base_bev_backbone"],
                "shrink_header": args.get(
                    "shrink_header",
                    {"dim": [128 * 3], "kernal_size": [1], "stride": [1]},
                ),
            }},
            lidar_range=tuple(args["lidar_range"]),
            anchor_num=args.get("anchor_num", args.get("anchor_number", 2)),
            uncertainty_dim=args.get("uncertainty_dim", 3),
            dir_bins=args.get("dir_args", {}).get("num_bins", 0),
        )
    if core == "point_pillar_baseline_multiscale":
        from gencomm_tpu.models.multiscale import MultiscaleFusionModel

        return MultiscaleFusionModel.from_config(hypes)
    if core == "fpvrcnn":
        from gencomm_tpu.models.fpvrcnn import build_fpvrcnn

        return build_fpvrcnn(hypes)
    if core == "heter_model_baseline_ms":
        from gencomm_tpu.models.heter_pyramid import build_ms_model

        return build_ms_model(hypes)
    if "pyramid" in core:
        from gencomm_tpu.models.heter_pyramid import build_pyramid_model

        return build_pyramid_model(hypes)
    if core.startswith("center_point"):
        modality_args = {"m1": args["m1"]} if "m1" in args else {
            "m1": {"encoder_args": args["pillar_vfe_args"],
                   "backbone_args": args["base_bev_backbone"],
                   "shrink_header": args["shrink_header"]}
        }
        if "where2comm" in core:
            # center_point_where2comm.py:46-47: fusion_net = Where2comm
            # (fusion_args carries multi_scale / communication / agg mode)
            from gencomm_tpu.models.center_point import CenterPointWhere2comm

            return CenterPointWhere2comm(
                modality_args=modality_args,
                lidar_range=tuple(args["lidar_range"]),
                fusion_args=args.get("fusion_args", {}),
                out_size_factor=args.get("out_size_factor", 4),
                voxel_size=tuple(args.get("voxel_size", (0.4, 0.4, 4.0))),
            )
        from gencomm_tpu.models.center_point import CenterPointModel

        return CenterPointModel(
            modality_args=modality_args,
            lidar_range=tuple(args["lidar_range"]),
            out_size_factor=args.get("out_size_factor", 4),
            voxel_size=tuple(args.get("voxel_size", (0.4, 0.4, 4.0))),
        )
    if core.startswith("pixor"):
        from gencomm_tpu.models.encoders.pixor import PIXORModel

        return PIXORModel(
            voxel_size=tuple(args.get("voxel_size", (0.4, 0.4, 0.1))),
            lidar_range=tuple(args["lidar_range"]),
        )
    from gencomm_tpu.models.heter_baseline import build_model

    return build_model(hypes)
