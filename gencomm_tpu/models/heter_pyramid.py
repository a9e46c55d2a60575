"""HEAL pyramid models (collaborative + single).

Parity targets:
  opencood/models/heter_pyramid_collab.py (HeterPyramidCollab): per-modality
  encoder -> ResNetBEVBackbone -> AlignNet -> camera center-crop ->
  PyramidFusion.forward_collab with camera-FOV score masks -> shrink ->
  cls/reg/dir heads, plus per-level occupancy outputs for the pyramid loss.
  opencood/models/heter_pyramid_single.py: same stack, single-agent pass.

TPU conventions as in heter_baseline.py: dense padded (B, L, ...) with
modality masks; every branch runs over all slots and is mask-combined.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax.numpy as jnp
import flax.linen as nn

from gencomm_tpu.models.backbones.resnet_bev import ResNetBEVBackbone
from gencomm_tpu.models.aligners import AlignNet
from gencomm_tpu.models.fuse.pyramid import PyramidFusion
from gencomm_tpu.models.layers import DownsampleConv, NaiveCompressor
from gencomm_tpu.models.heads import DetectionHeads
from gencomm_tpu.utils.transformation_utils import normalize_pairwise_tfm
from gencomm_tpu.registry import MODELS


def camera_fov_mask(shape_hw, crop_ratio_h: float, crop_ratio_w: float):
    """Binary mask, 1 inside the camera's true FOV after center crop/pad.

    Parity: pyramid_fuse.py:144-160 — interior extent H/crop_ratio - 4
    (edge responses are unstable), centered.
    """
    h, w = shape_hw
    ch = int(h / crop_ratio_h) - 4
    cw = int(w / crop_ratio_w) - 4
    ys = jnp.arange(h)[:, None]
    xs = jnp.arange(w)[None, :]
    inside = (
        (ys >= h // 2 - ch // 2) & (ys < h // 2 + ch // 2)
        & (xs >= w // 2 - cw // 2) & (xs < w // 2 + cw // 2)
    )
    return inside.astype(jnp.float32)[..., None]  # (H, W, 1)


@MODELS.register("heter_pyramid_collab")
@MODELS.register("heter_pyramid_single")
class HeterPyramidModel(nn.Module):
    modality_args: Dict[str, Dict[str, Any]]
    fusion_backbone: Dict[str, Any]
    lidar_range: Tuple[float, float, float, float, float, float]
    shrink_args: Dict[str, Any] | None = None
    anchor_number: int = 2
    dir_bins: int = 2
    collab: bool = True
    compressor: Dict[str, Any] | None = None

    @nn.compact
    def __call__(self, batch: Dict[str, Any], train: bool = False):
        # NOTE: no mode string in the output dict — jitted callers need
        # array-only outputs (the reference's output_dict['pyramid'] tag
        # lives in the loss config here, see loss/__init__.create_loss).
        out: Dict[str, Any] = {}
        agent_mask = batch["agent_mask"]
        b, l = agent_mask.shape

        hm = self.lidar_range[4] - self.lidar_range[1]
        wm = self.lidar_range[3] - self.lidar_range[0]
        affine = normalize_pairwise_tfm(
            batch["pairwise_t_matrix"], hm, wm, 1.0
        ).astype(jnp.float32)

        feature = None
        score_mask = None
        for mname, margs in self.modality_args.items():
            is_cam = margs.get("sensor_type", "lidar") == "camera"
            feat = self._branch(mname, margs, batch, train, out)
            mmask = batch[f"modality_mask_{mname}"][..., None, None, None]
            contrib = feat * mmask
            feature = contrib if feature is None else feature + contrib
            # camera-FOV score mask for pyramid fusion
            hw = feat.shape[2:4]
            if is_cam:
                gc = margs["camera_mask_args"]["grid_conf"]
                ratio_h = self.lidar_range[4] / gc["ybound"][1]
                ratio_w = self.lidar_range[3] / gc["xbound"][1]
                fov = camera_fov_mask(hw, ratio_h, ratio_w)
                sm = jnp.broadcast_to(fov, (b, l) + hw + (1,)) * mmask
            else:
                sm = jnp.broadcast_to(
                    jnp.ones(hw + (1,), jnp.float32), (b, l) + hw + (1,)
                ) * mmask
            score_mask = sm if score_mask is None else score_mask + sm

        if self.compressor is not None:
            flat = feature.reshape((b * l,) + feature.shape[2:])
            flat = NaiveCompressor(
                input_dim=self.compressor["input_dim"],
                compress_ratio=self.compressor["compress_ratio"],
                name="compressor",
            )(flat, train)
            feature = flat.reshape(feature.shape)

        pyramid = PyramidFusion.from_config(
            self.fusion_backbone, name="pyramid_backbone"
        )
        if self.collab:
            # crop masks only applied at eval (pyramid_fuse.py:146 `not
            # self.training`)
            fused, occ_maps = pyramid(
                feature, affine, agent_mask, train,
                score_mask=None if train else score_mask,
            )
        else:
            flat = feature.reshape((b * l,) + feature.shape[2:])
            fused, occ_maps = pyramid(flat, train=train, single=True)

        if self.shrink_args is not None:
            fused = DownsampleConv.from_config(self.shrink_args)(fused)

        cls_preds, reg_preds, dir_preds = DetectionHeads(
            self.anchor_number, self.dir_bins, name="heads"
        )(fused)
        out.update(
            cls_preds=cls_preds, reg_preds=reg_preds, dir_preds=dir_preds,
            occ_single_list=occ_maps,
        )
        return out

    def _branch(self, mname, margs, batch, train, out):
        """encoder -> ResNet backbone -> aligner (-> camera crop)."""
        from gencomm_tpu.models.heter_baseline import ModalityBranch

        is_cam = margs.get("sensor_type", "lidar") == "camera"
        if is_cam:
            inputs = {
                k: batch[f"{k}_{mname}"]
                for k in ("imgs", "rots", "trans", "intrins", "post_rots",
                          "post_trans")
            }
            if f"depths_{mname}" in batch:
                inputs["depths"] = batch[f"depths_{mname}"]
            from gencomm_tpu.models.encoders.lss import (
                LSSEncoder, center_crop_or_pad,
            )

            enc = LSSEncoder(
                grid_conf=margs["encoder_args"]["grid_conf"],
                final_dim=tuple(
                    margs["encoder_args"]["data_aug_conf"]["final_dim"]
                ),
                downsample=margs["encoder_args"].get("img_downsample", 8),
                feat_ch=margs["encoder_args"].get("img_features", 128),
                trunk_blocks=margs["encoder_args"].get("trunk_blocks", 2),
                trunk=margs["encoder_args"].get("img_trunk", "tpu"),
                depth_topk=margs["encoder_args"].get("depth_topk", 0),
                trunk_bf16=margs["encoder_args"].get("trunk_bf16", False),
                name=f"encoder_{mname}",
            )
            canvas, depth_logits = enc(inputs, train)
            if isinstance(depth_logits, tuple):
                logits, gt_idx = depth_logits
                wt = batch[f"modality_mask_{mname}"].astype(
                    logits.dtype
                )[:, :, None, None, None]
                out[f"depth_items_{mname}"] = (logits, gt_idx, wt)
            elif depth_logits is not None:
                out[f"depth_items_{mname}"] = depth_logits
        else:
            # reuse the lidar encoder dispatch from the baseline branch,
            # incl. the host-decorated pillar fast path (data/decorate.py)
            if f"decorated_{mname}" in batch:
                inputs = {
                    "decorated": batch[f"decorated_{mname}"],
                    "gids": batch[f"gids_{mname}"],
                    "dvalid": batch[f"dvalid_{mname}"],
                    "points": None, "point_mask": None,
                }
            else:
                inputs = {"points": batch[f"points_{mname}"],
                          "point_mask": batch[f"point_mask_{mname}"]}
            canvas, _ = ModalityBranch(
                encoder_args=margs["encoder_args"],
                backbone_args={},
                shrink_args={},
                core_method=margs.get("core_method", "point_pillar"),
                encode_only=True,
                name=f"enc_branch_{mname}",
            )(inputs, train)

        bsz, l = canvas.shape[:2]
        flat = canvas.reshape((bsz * l,) + canvas.shape[2:])
        feat = ResNetBEVBackbone.from_config(
            margs["backbone_args"], name=f"backbone_{mname}"
        )(flat, train)
        feat = AlignNet.from_config(
            margs.get("aligner_args", {"core_method": "identity"}),
            name=f"aligner_{mname}",
        )(feat, train)
        feat = feat.reshape((bsz, l) + feat.shape[1:])

        if is_cam:
            from gencomm_tpu.models.encoders.lss import center_crop_or_pad

            gc = margs["encoder_args"]["grid_conf"]
            ratio_w = self.lidar_range[3] / gc["xbound"][1]
            ratio_h = self.lidar_range[4] / gc["ybound"][1]
            th = int(feat.shape[2] * ratio_h)
            tw = int(feat.shape[3] * ratio_w)
            feat = center_crop_or_pad(feat, (th, tw))
        return feat


@MODELS.register("heter_model_baseline_ms")
class HeterMsModel(HeterPyramidModel):
    """Heterogeneous multiscale fusion baseline.

    Parity target: opencood/models/heter_model_baseline_ms.py — the same
    per-modality encoder -> ResNetBEVBackbone -> AlignNet -> camera-crop
    branches as the pyramid models (hence the subclass: ``_branch`` is
    shared), but fused by per-level Max/Att fusion over a shared fusion
    backbone (``MsFusion``) instead of occupancy-weighted pyramid fusion,
    plus optional pre-fusion single-agent supervision heads (:188-196).
    """

    fusion_method: str = "att"
    att_feat_dims: Tuple[int, ...] = ()
    supervise_single: bool = False

    @nn.compact
    def __call__(self, batch: Dict[str, Any], train: bool = False):
        from gencomm_tpu.models.fuse.pyramid import MsFusion
        from gencomm_tpu.models.heads import DetectionHeads

        out: Dict[str, Any] = {}
        agent_mask = batch["agent_mask"]
        b, l = agent_mask.shape

        hm = self.lidar_range[4] - self.lidar_range[1]
        wm = self.lidar_range[3] - self.lidar_range[0]
        affine = normalize_pairwise_tfm(
            batch["pairwise_t_matrix"], hm, wm, 1.0
        ).astype(jnp.float32)

        feature = None
        for mname, margs in self.modality_args.items():
            feat = self._branch(mname, margs, batch, train, out)
            mmask = batch[f"modality_mask_{mname}"][..., None, None, None]
            contrib = feat * mmask
            feature = contrib if feature is None else feature + contrib

        if self.supervise_single:
            flat = feature.reshape((b * l,) + feature.shape[2:])
            cls_s, reg_s, dir_s = DetectionHeads(
                self.anchor_number, self.dir_bins, name="heads_single"
            )(flat)
            out.update(
                cls_preds_single=cls_s, reg_preds_single=reg_s,
                dir_preds_single=dir_s,
            )

        fused = MsFusion.from_config(
            self.fusion_backbone, fusion_method=self.fusion_method,
            att_feat_dims=self.att_feat_dims, name="fusion_backbone",
        )(feature, affine, agent_mask, train)

        if self.shrink_args is not None:
            fused = DownsampleConv.from_config(self.shrink_args)(fused)

        cls_preds, reg_preds, dir_preds = DetectionHeads(
            self.anchor_number, self.dir_bins, name="heads"
        )(fused)
        out.update(cls_preds=cls_preds, reg_preds=reg_preds,
                   dir_preds=dir_preds)
        return out


def build_ms_model(hypes: dict) -> "HeterMsModel":
    args = hypes["model"]["args"]
    modality_args = {
        k: v for k, v in args.items()
        if k.startswith("m") and k[1:].isdigit()
    }
    for k, v in modality_args.items():
        enc = dict(v["encoder_args"])
        enc.setdefault("lidar_range", args["lidar_range"])
        v["encoder_args"] = enc
    return HeterMsModel(
        modality_args=modality_args,
        fusion_backbone=args["fusion_backbone"],
        lidar_range=tuple(args["lidar_range"]),
        shrink_args=args.get("shrink_header"),
        anchor_number=args["anchor_number"],
        dir_bins=args["dir_args"]["num_bins"],
        fusion_method=args.get("fusion_method", "att"),
        att_feat_dims=tuple(args.get("att", {}).get("feat_dim", ())),
        supervise_single=bool(args.get("supervise_single", False)),
    )


def build_pyramid_model(hypes: dict) -> HeterPyramidModel:
    args = hypes["model"]["args"]
    core = hypes["model"]["core_method"].lower()
    modality_args = {
        k: v for k, v in args.items()
        if k.startswith("m") and k[1:].isdigit()
    }
    for k, v in modality_args.items():
        enc = dict(v["encoder_args"])
        enc.setdefault("lidar_range", args["lidar_range"])
        v["encoder_args"] = enc
    return HeterPyramidModel(
        modality_args=modality_args,
        fusion_backbone=args["fusion_backbone"],
        lidar_range=tuple(args["lidar_range"]),
        shrink_args=args.get("shrink_header"),
        anchor_number=args["anchor_number"],
        dir_bins=args["dir_args"]["num_bins"],
        collab="collab" in core,
        compressor=args.get("compressor"),
    )
