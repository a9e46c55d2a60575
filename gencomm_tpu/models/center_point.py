"""CenterPoint: anchor-free center-heatmap detector.

Parity: opencood/models/center_point.py (PointPillars VFE + BEV backbone +
1x1 heatmap head + 8-dim box head (dx, dy, z, log-dims(3), sin, cos);
generate_predicted_boxes:83-150 decode) and
opencood/loss/center_point_loss.py (gaussian focal :76-110 on heatmaps +
masked L1 regression). Targets (gaussian heatmaps) are drawn on the fly
from the batch's gt_boxes — dense, jittable.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from gencomm_tpu.models.heter_baseline import ModalityBranch
from gencomm_tpu.models.fuse.fusion import build_fusion
from gencomm_tpu.utils.transformation_utils import normalize_pairwise_tfm
from gencomm_tpu.registry import MODELS, LOSSES


@MODELS.register("center_point")
@MODELS.register("center_point_baseline")
class CenterPointModel(nn.Module):
    modality_args: Dict[str, Any]
    lidar_range: Tuple[float, float, float, float, float, float]
    fusion_method: str = "att"
    fusion_args: Dict[str, Any] | None = None
    out_size_factor: int = 4
    voxel_size: Tuple[float, float, float] = (0.4, 0.4, 4.0)

    @nn.compact
    def __call__(self, batch: Dict[str, Any], train: bool = False):
        margs = self.modality_args["m1"]
        feat, _ = ModalityBranch(
            encoder_args=margs["encoder_args"],
            backbone_args=margs["backbone_args"],
            shrink_args=margs["shrink_header"],
            core_method="point_pillar",
            name="branch_m1",
        )({"points": batch["points_m1"],
           "point_mask": batch["point_mask_m1"]}, train)

        hm = self.lidar_range[4] - self.lidar_range[1]
        wm = self.lidar_range[3] - self.lidar_range[0]
        affine = normalize_pairwise_tfm(
            batch["pairwise_t_matrix"], hm, wm, 1.0
        ).astype(jnp.float32)
        fusion = build_fusion(
            self.fusion_method, self.fusion_args or
            {"att": {"feat_dim": feat.shape[-1]}}, name="fusion_net",
        )
        fused = fusion(feat, affine, batch["agent_mask"], train)

        # heatmap bias init at -log((1-pi)/pi), pi=0.01 (center_point.py:44)
        cls = nn.Conv(
            1, (1, 1),
            bias_init=nn.initializers.constant(-np.log(99.0)),
            name="cls_head",
        )(fused)
        bbox = nn.Conv(
            8, (1, 1),
            kernel_init=nn.initializers.normal(0.001),
            name="reg_head",
        )(fused)
        boxes7 = self.decode(bbox)
        return {"cls_preds": cls, "bbox_preds": bbox, "reg_preds": boxes7}

    def decode(self, bbox):
        """(B, H', W', 8) -> (B, H', W', 7) boxes in meters
        (generate_predicted_boxes parity: offsets + exp dims + atan2)."""
        b, h, w, _ = bbox.shape
        cell = self.voxel_size[0] * self.out_size_factor
        gy = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
        gx = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
        x = self.lidar_range[0] + (gx + 0.5) * cell + bbox[..., 0]
        y = self.lidar_range[1] + (gy + 0.5) * cell + bbox[..., 1]
        z = bbox[..., 2]
        dims = jnp.exp(jnp.clip(bbox[..., 3:6], -5.0, 5.0))
        yaw = jnp.arctan2(bbox[..., 6], bbox[..., 7])
        return jnp.concatenate(
            [jnp.stack([x, y, z], -1), dims, yaw[..., None]], axis=-1
        )


@MODELS.register("center_point_where2comm")
class CenterPointWhere2comm(nn.Module):
    """CenterPoint detector with Where2comm confidence-driven fusion.

    Parity: opencood/models/center_point_where2comm.py —
      encoder -> backbone -> shrink -> single-agent heads (:106-123),
      Where2comm fusion (multi_scale re-runs the SAME backbone on
      communication-masked features and fuses per level, :126-139;
      single-scale masks + fuses the shrunk feature), then the SAME heads
      on the fused map (:143-144). Heads and backbone params are shared
      between the single and fused passes (flax: one module instance,
      two calls).
    """

    modality_args: Dict[str, Any]
    lidar_range: Tuple[float, float, float, float, float, float]
    fusion_args: Dict[str, Any] | None = None
    out_size_factor: int = 4
    voxel_size: Tuple[float, float, float] = (0.4, 0.4, 4.0)

    @nn.compact
    def __call__(self, batch: Dict[str, Any], train: bool = False):
        from gencomm_tpu.models.fuse.where2comm import (
            Communication, where2comm_multi_scale, Where2commFusion,
        )

        fargs = self.fusion_args or {}
        comm_cfg = fargs.get("communication", {})
        smooth_cfg = comm_cfg.get("gaussian_smooth", {})
        agg_mode = fargs.get("agg_operator", {}).get("mode", "ATTEN")
        multi_scale = bool(fargs.get("multi_scale", False))

        margs = self.modality_args["m1"]
        agent_mask = batch["agent_mask"]
        b, l = agent_mask.shape
        branch = ModalityBranch(
            encoder_args=margs["encoder_args"],
            backbone_args=margs["backbone_args"],
            shrink_args=margs["shrink_header"],
            core_method="point_pillar",
            encode_only=True,
            name="branch_m1",
        )
        canvas, _ = branch(
            {"points": batch["points_m1"],
             "point_mask": batch["point_mask_m1"]}, train)

        # shared backbone + shrinker + heads (one instance, two passes)
        from gencomm_tpu.models.backbones.bev_backbone import BEVBackbone
        from gencomm_tpu.models.layers import DownsampleConv

        backbone = BEVBackbone(
            layer_nums=tuple(margs["backbone_args"]["layer_nums"]),
            layer_strides=tuple(margs["backbone_args"]["layer_strides"]),
            num_filters=tuple(margs["backbone_args"]["num_filters"]),
            upsample_strides=tuple(
                margs["backbone_args"].get("upsample_strides", ())),
            num_upsample_filters=tuple(
                margs["backbone_args"].get("num_upsample_filter", ())),
            name="backbone",
        )
        shrink = DownsampleConv(
            dims=tuple(margs["shrink_header"]["dim"]),
            kernels=tuple(margs["shrink_header"]["kernal_size"]),
            strides=tuple(margs["shrink_header"]["stride"]),
            name="shrinker",
        )
        cls_head = nn.Conv(
            1, (1, 1), bias_init=nn.initializers.constant(-np.log(99.0)),
            name="cls_head",
        )
        reg_head = nn.Conv(
            8, (1, 1), kernel_init=nn.initializers.normal(0.001),
            name="reg_head",
        )

        flat = canvas.reshape((b * l,) + canvas.shape[2:])
        feat_single = shrink(backbone(flat, train))
        psm_single = cls_head(feat_single)
        rm_single = reg_head(feat_single)
        conf = psm_single.reshape((b, l) + psm_single.shape[1:])

        hm = self.lidar_range[4] - self.lidar_range[1]
        wm = self.lidar_range[3] - self.lidar_range[0]
        affine = normalize_pairwise_tfm(
            batch["pairwise_t_matrix"], hm, wm, 1.0
        ).astype(jnp.float32)

        if "communication" in fargs:
            masks, rate = Communication(
                thre=comm_cfg.get("thre", 0.01),
                smooth="gaussian_smooth" in comm_cfg,
                kernel_size=smooth_cfg.get("k_size", 5),
                c_sigma=smooth_cfg.get("c_sigma", 1.0),
                name="communication",
            )(conf, agent_mask)
        else:
            masks, rate = None, jnp.zeros(())

        if multi_scale:
            fused = where2comm_multi_scale(
                backbone, canvas, masks, affine, agent_mask,
                agg_mode=agg_mode, train=train,
            )
            fused = shrink(fused)
        else:
            feat = feat_single.reshape((b, l) + feat_single.shape[1:])
            if masks is not None:
                if masks.shape[2:4] != feat.shape[2:4]:
                    masks = jax.image.resize(
                        masks, (b, l) + feat.shape[2:4] + (1,),
                        method="nearest",
                    )
                feat = feat * masks
            fused = Where2commFusion(
                feat_dim=feat.shape[-1], name="fusion_net",
            )(feat, affine, agent_mask, train)

        cls = cls_head(fused)
        bbox = reg_head(fused)
        decoder = CenterPointModel(
            modality_args=self.modality_args, lidar_range=self.lidar_range,
            out_size_factor=self.out_size_factor, voxel_size=self.voxel_size,
        )
        boxes7 = decoder.decode(bbox)
        return {
            "cls_preds": cls, "bbox_preds": bbox, "reg_preds": boxes7,
            "cls_preds_single": psm_single, "bbox_preds_single": rm_single,
            "reg_preds_single": decoder.decode(rm_single),
            "comm_rate": rate,
        }


def gaussian_focal_loss(pred_logits, target, alpha=2.0, gamma=4.0):
    """center_point_loss.py:76-110 — focal loss on gaussian heatmaps."""
    prob = jax.nn.sigmoid(pred_logits)
    eps = 1e-12
    pos_w = (target >= 0.999).astype(prob.dtype)
    neg_w = (1 - target) ** gamma
    pos = -jnp.log(prob + eps) * (1 - prob) ** alpha * pos_w
    neg = -jnp.log(1 - prob + eps) * prob ** alpha * neg_w * (1 - pos_w)
    return pos + neg


def draw_heatmap(gt_boxes, gt_mask, lidar_range, cell, h, w,
                 min_radius=2.0):
    """Gaussian heatmap targets from (K, 7) boxes — dense over the grid."""
    cx = (gt_boxes[:, 0] - lidar_range[0]) / cell - 0.5
    cy = (gt_boxes[:, 1] - lidar_range[1]) / cell - 0.5
    # radius from box footprint (CenterNet-style, simplified)
    dims = jnp.maximum(gt_boxes[:, 3:6].max(axis=-1), 1.0)
    radius = jnp.maximum(dims / cell / 2.0, min_radius)
    gy = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
    gx = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
    d2 = (gx[None] - cx[:, None, None]) ** 2 + \
        (gy[None] - cy[:, None, None]) ** 2
    sigma2 = (2 * radius[:, None, None] / 3.0) ** 2 / 2.0
    g = jnp.exp(-d2 / jnp.maximum(sigma2, 1e-6)) * gt_mask[:, None, None]
    return g.max(axis=0)  # (h, w)


@LOSSES.register("center_point_loss")
class CenterPointLoss:
    def __init__(self, args: dict):
        self.cls_weight = args.get("cls_weight", 1.0)
        self.reg_weight = args.get("reg_weight", 2.0)
        self.lidar_range = tuple(args["lidar_range"])
        self.voxel_size = tuple(args.get("voxel_size", (0.4, 0.4, 4.0)))
        self.out_size_factor = args.get("out_size_factor", 4)

    def __call__(self, output: dict, target: dict, suffix: str = "") -> dict:
        cls = output["cls_preds"][..., 0]  # (B, H, W)
        boxes7 = output["reg_preds"]
        b, h, w = cls.shape
        cell = self.voxel_size[0] * self.out_size_factor

        def one(gt_boxes, gt_mask):
            return draw_heatmap(gt_boxes, gt_mask, self.lidar_range, cell,
                                h, w)

        heat = jax.vmap(one)(target["gt_boxes"], target["gt_mask"])
        cls_loss = gaussian_focal_loss(cls, heat).sum() / jnp.clip(
            (heat >= 0.999).sum(), 1.0, None
        )

        # L1 on decoded boxes at gt centers (masked nearest-cell match)
        def reg_one(boxes_map, gt_boxes, gt_mask):
            cx = jnp.clip(((gt_boxes[:, 0] - self.lidar_range[0]) / cell
                           - 0.5).astype(jnp.int32), 0, w - 1)
            cy = jnp.clip(((gt_boxes[:, 1] - self.lidar_range[1]) / cell
                           - 0.5).astype(jnp.int32), 0, h - 1)
            pred = boxes_map[cy, cx]  # (K, 7)
            err = jnp.abs(pred - gt_boxes) * gt_mask[:, None]
            return err.sum() / jnp.clip(gt_mask.sum() * 7, 1.0, None)

        reg_loss = jax.vmap(reg_one)(
            boxes7, target["gt_boxes"], target["gt_mask"]
        ).mean()

        total = self.cls_weight * cls_loss + self.reg_weight * reg_loss
        return {"cls_loss": cls_loss, "reg_loss": reg_loss,
                "total_loss": total}
