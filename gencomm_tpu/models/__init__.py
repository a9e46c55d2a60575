"""Model zoo. ``create_model`` is the explicit-registry analog of the
reference's reflection loader (opencood/tools/train_utils.py:255-288)."""

from __future__ import annotations


def create_model(hypes: dict):
    core = hypes["model"]["core_method"].lower()
    args = hypes["model"]["args"]
    if "pyramid" in core:
        from gencomm_tpu.models.heter_pyramid import build_pyramid_model

        return build_pyramid_model(hypes)
    if core.startswith("center_point"):
        from gencomm_tpu.models.center_point import CenterPointModel

        return CenterPointModel(
            modality_args={"m1": args["m1"]} if "m1" in args else {
                "m1": {"encoder_args": args["pillar_vfe_args"],
                       "backbone_args": args["base_bev_backbone"],
                       "shrink_header": args["shrink_header"]}
            },
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
