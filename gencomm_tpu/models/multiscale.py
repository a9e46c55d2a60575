"""Multiscale intermediate fusion: fuse agents at EVERY backbone level.

Parity target: opencood/models/point_pillar_baseline_multiscale.py (CoAlign
lineage; also the mechanism of sub_modules/att_bev_backbone.py used by
second_intermediate / center_point_intermediate):
  encoder canvas -> backbone.get_multiscale_feature -> per-level fusion
  (Max or Att, one module per level) -> decode_multiscale_feature ->
  optional shrink -> cls/reg/dir heads (:92-134).

Here the per-level fusion reuses the transplant-verified MaxFusion /
AttFusion over the padded (B, L) agent axis, and the backbone is the
transplant-verified BEVBackbone's encode/decode split.
"""

from __future__ import annotations

from typing import Any, Dict, Sequence, Tuple

import jax.numpy as jnp
import flax.linen as nn

from gencomm_tpu.models.encoders.point_pillar import PointPillarEncoder
from gencomm_tpu.models.backbones.bev_backbone import BEVBackbone
from gencomm_tpu.models.fuse.fusion import MaxFusion, AttFusion
from gencomm_tpu.models.layers import DownsampleConv, NaiveCompressor
from gencomm_tpu.models.heads import DetectionHeads
from gencomm_tpu.utils.transformation_utils import normalize_pairwise_tfm
from gencomm_tpu.registry import MODELS


@MODELS.register("point_pillar_baseline_multiscale")
class MultiscaleFusionModel(nn.Module):
    voxel_size: Tuple[float, float, float]
    lidar_range: Tuple[float, ...]
    backbone_args: Dict[str, Any]
    fusion_method: str = "att"  # 'max' | 'att'
    att_feat_dims: Sequence[int] = ()  # per level (args['att']['feat_dim'])
    pillar_filters: Sequence[int] = (64,)
    anchor_num: int = 2
    dir_bins: int = 2
    use_dir: bool = True
    shrink_args: Dict[str, Any] | None = None
    compression: int = 0

    @nn.compact
    def __call__(self, batch: Dict[str, Any], train: bool = False):
        agent_mask = batch["agent_mask"]
        b, l = agent_mask.shape
        hm = self.lidar_range[4] - self.lidar_range[1]
        wm = self.lidar_range[3] - self.lidar_range[0]
        affine = normalize_pairwise_tfm(
            batch["pairwise_t_matrix"], hm, wm, 1.0
        ).astype(jnp.float32)

        enc = PointPillarEncoder(
            voxel_size=tuple(self.voxel_size),
            lidar_range=tuple(self.lidar_range),
            num_filters=tuple(self.pillar_filters),
            name="encoder",
        )
        if "decorated_m1" in batch:
            canvas = enc(
                None, None, train,
                decorated=batch["decorated_m1"], gids=batch["gids_m1"],
                dvalid=batch["dvalid_m1"],
            )
        else:
            canvas = enc(batch["points_m1"], batch["point_mask_m1"], train)

        flat = canvas.reshape((b * l,) + canvas.shape[2:])
        if self.compression:
            flat = NaiveCompressor(
                input_dim=flat.shape[-1], compress_ratio=self.compression,
                name="compressor",
            )(flat, train)

        backbone = BEVBackbone(
            layer_nums=tuple(self.backbone_args["layer_nums"]),
            layer_strides=tuple(self.backbone_args["layer_strides"]),
            num_filters=tuple(self.backbone_args["num_filters"]),
            upsample_strides=tuple(
                self.backbone_args.get("upsample_strides", ())
            ),
            num_upsample_filters=tuple(
                self.backbone_args.get("num_upsample_filter", ())
            ),
            name="backbone",
        )
        def level_fuse(i, feat):
            # (B*L, h, w, c) -> fuse agents -> (B, h, w, c); the fusion
            # modules attach under the backbone's scope (see BEVBackbone)
            per_agent = feat.reshape((b, l) + feat.shape[1:])
            if self.fusion_method == "max":
                fuse = MaxFusion(name=f"fuse{i}")
            else:
                fd = (self.att_feat_dims[i] if i < len(self.att_feat_dims)
                      else per_agent.shape[-1])
                fuse = AttFusion(feat_dim=fd, name=f"fuse{i}")
            return fuse(per_agent, affine, agent_mask, train)

        fused = backbone(flat, train, level_fuse=level_fuse)

        if self.shrink_args:
            fused = DownsampleConv(
                dims=tuple(self.shrink_args["dim"]),
                kernels=tuple(self.shrink_args["kernal_size"]),
                strides=tuple(self.shrink_args["stride"]),
                name="shrinker",
            )(fused)

        cls_preds, reg_preds, dir_preds = DetectionHeads(
            self.anchor_num, self.dir_bins, name="heads",
        )(fused)
        out = {"cls_preds": cls_preds, "reg_preds": reg_preds}
        if self.use_dir:
            out["dir_preds"] = dir_preds
        return out

    @staticmethod
    def from_config(hypes: dict) -> "MultiscaleFusionModel":
        args = hypes["model"]["args"]
        return MultiscaleFusionModel(
            voxel_size=tuple(args["voxel_size"]),
            lidar_range=tuple(args["lidar_range"]),
            backbone_args=args["base_bev_backbone"],
            fusion_method=args.get("fusion_method", "att"),
            att_feat_dims=tuple(args.get("att", {}).get("feat_dim", ())),
            pillar_filters=tuple(
                args.get("pillar_vfe", {}).get("num_filters", (64,))
            ),
            anchor_num=args.get("anchor_number", args.get("anchor_num", 2)),
            dir_bins=args.get("dir_args", {}).get("num_bins", 2),
            use_dir="dir_args" in args,
            shrink_args=args.get("shrink_header"),
            compression=int(args.get("compression", 0)),
        )
