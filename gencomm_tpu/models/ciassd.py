"""CIA-SSD / SECOND-SSFA model family.

Parity targets:
  opencood/models/ciassd.py:11-46           (SECOND voxel branch + SSFA +
                                             IoU-aware head, single agent)
  opencood/models/second_ssfa.py:15-57      (same graph, shrink header opt.)
  opencood/models/second_ssfa_uncertainty.py:16-86 (cls/reg/unc/dir heads)
  opencood/models/second.py / second_intermediate.py (SECOND + BaseBEV
                                             backbone + heads, single /
                                             att-fused intermediate)

TPU design: agents live on the padded (B, L) axis; the encoder is our
gather/scatter sparse-conv SECOND (models/encoders/second.py) and all heads
run over every slot at once — per-slot masking happens in the loss/decode.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax.numpy as jnp
import flax.linen as nn

from gencomm_tpu.models.encoders.second import SECONDEncoder
from gencomm_tpu.models.backbones.bev_backbone import BEVBackbone
from gencomm_tpu.models.backbones.ssfa import SSFA, IoUAwareHead
from gencomm_tpu.models.layers import DownsampleConv
from gencomm_tpu.models.fuse.fusion import build_fusion
from gencomm_tpu.utils.transformation_utils import normalize_pairwise_tfm
from gencomm_tpu.registry import MODELS


class _SecondTrunk(nn.Module):
    """Shared SECOND voxel branch -> flat (B*L, H, W, C) BEV features."""

    voxel_size: Tuple[float, float, float]
    lidar_range: Tuple[float, ...]
    max_voxels: int = 32000
    out_ch: int = 128

    @nn.compact
    def __call__(self, batch: Dict[str, Any], train: bool = False):
        canvas = SECONDEncoder(
            voxel_size=self.voxel_size,
            lidar_range=self.lidar_range,
            voxel_capacity_per_agent=self.max_voxels,
            out_ch=self.out_ch,
            name="encoder",
        )(batch["points_m1"], batch["point_mask_m1"], train)
        b, l = canvas.shape[:2]
        return canvas.reshape((b * l,) + canvas.shape[2:]), (b, l)


@MODELS.register("ciassd")
@MODELS.register("second_ssfa")
class CIASSDModel(nn.Module):
    """SECOND -> SSFA -> IoU-aware head, every agent slot independently
    (late/no fusion: each CAV is its own sample in the reference)."""

    voxel_size: Tuple[float, float, float]
    lidar_range: Tuple[float, ...]
    anchor_num: int = 2
    dir_bins: int = 2
    use_dir: bool = True
    max_voxels: int = 32000
    shrink_args: Dict[str, Any] | None = None
    use_unc: bool = False
    uncertainty_dim: int = 3

    @nn.compact
    def __call__(self, batch: Dict[str, Any], train: bool = False):
        flat, (b, l) = _SecondTrunk(
            voxel_size=self.voxel_size, lidar_range=self.lidar_range,
            max_voxels=self.max_voxels, name="trunk",
        )(batch, train)
        feat = SSFA(name="ssfa")(flat, train)
        if self.shrink_args:
            feat = DownsampleConv(
                dims=tuple(self.shrink_args["dim"]),
                kernels=tuple(self.shrink_args["kernal_size"]),
                strides=tuple(self.shrink_args["stride"]),
                name="shrinker",
            )(feat)
        out = IoUAwareHead(
            anchor_num=self.anchor_num, use_dir=self.use_dir,
            dir_bins=self.dir_bins, name="head",
        )(feat)
        if self.use_unc:
            # second_ssfa_uncertainty.py:44-46: log-variance head
            out["unc_preds"] = nn.Conv(
                self.uncertainty_dim * self.anchor_num, (1, 1),
                name="unc_head",
            )(feat)
        out["batch_lens"] = (b, l)
        return out


@MODELS.register("second_ssfa_uncertainty")
class SecondSSFAUncertainty(CIASSDModel):
    """CIASSD trunk with an extra aleatoric-uncertainty head."""

    use_unc: bool = True


@MODELS.register("second")
@MODELS.register("second_intermediate")
class SecondModel(nn.Module):
    """SECOND + BaseBEVBackbone + cls/reg heads
    (opencood/models/second.py:14-57). ``intermediate`` adds attentive
    fusion over the agent axis before the heads
    (second_intermediate.py:15-60)."""

    voxel_size: Tuple[float, float, float]
    lidar_range: Tuple[float, ...]
    backbone_args: Dict[str, Any]
    anchor_num: int = 2
    max_voxels: int = 32000
    intermediate: bool = False

    @nn.compact
    def __call__(self, batch: Dict[str, Any], train: bool = False):
        flat, (b, l) = _SecondTrunk(
            voxel_size=self.voxel_size, lidar_range=self.lidar_range,
            max_voxels=self.max_voxels, name="trunk",
        )(batch, train)
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
        level_fuse = None
        if self.intermediate:
            # per-level attentive fusion inside the backbone — the
            # reference's AttBEVBackbone dataflow (att_bev_backbone.py:
            # 140-155): the UNFUSED features continue through the stages,
            # each stage's fused map feeds its deconv up-head
            hm = self.lidar_range[4] - self.lidar_range[1]
            wm = self.lidar_range[3] - self.lidar_range[0]
            affine = normalize_pairwise_tfm(
                batch["pairwise_t_matrix"], hm, wm, 1.0
            ).astype(jnp.float32)

            def level_fuse(i, f):
                grouped = f.reshape((b, l) + f.shape[1:])
                return build_fusion(
                    "att", {"att": {"feat_dim": f.shape[-1]}},
                    name=f"fuse{i}",
                )(grouped, affine, batch["agent_mask"], train)

        feat = backbone(flat, train, level_fuse=level_fuse)
        cls = nn.Conv(self.anchor_num, (1, 1), name="cls_head")(feat)
        reg = nn.Conv(7 * self.anchor_num, (1, 1), name="reg_head")(feat)
        return {"cls_preds": cls, "reg_preds": reg}
