"""Top-level heterogeneous collaboration models.

Parity targets:
  heter_model_baseline.py                 (plain multi-modality baseline)
  heter_model_baseline_w_gencomm_stage1.py (adds DME + GenComm + Enhancer)
  heter_model_baseline_w_gencomm_stage2.py (same graph; freezing handled by
                                            the optimizer, missing-message
                                            masking at eval)

TPU conventions: inputs are padded (B, L, ...) arrays with masks (see
ARCHITECTURE.md). Every modality encoder runs over all agent slots; features
are combined with per-slot modality masks — dense, static-shape, XLA-friendly.
The "communication boundary" is the 2-channel message tensor exactly as in
the reference; GenComm regenerates the 128-channel features from (ego
feature, message) at the receiver.
"""

from __future__ import annotations

from typing import Any, Dict, Sequence, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from gencomm_tpu.models.encoders.point_pillar import PointPillarEncoder
from gencomm_tpu.models.backbones.bev_backbone import BEVBackbone
from gencomm_tpu.models.layers import DownsampleConv
from gencomm_tpu.models.fuse.fusion import build_fusion
from gencomm_tpu.models.gencomm.message_extractor import MessageExtractor
from gencomm_tpu.models.gencomm.diffusion import GenCommDiffusion
from gencomm_tpu.models.gencomm.enhancer import Enhancer
from gencomm_tpu.models.heads import DetectionHeads
from gencomm_tpu.utils.transformation_utils import normalize_pairwise_tfm
from gencomm_tpu.registry import MODELS


class ModalityBranch(nn.Module):
    """encoder -> backbone -> shrinker for one modality.

    ``core_method`` selects the encoder (reference: reflection scan of
    heter_encoders.py, here an explicit dispatch):
    point_pillar | second | lift_splat_shoot.
    """

    encoder_args: Dict[str, Any]
    backbone_args: Dict[str, Any]
    shrink_args: Dict[str, Any]
    core_method: str = "point_pillar"
    encode_only: bool = False  # skip backbone+shrinker (pyramid models)
    # AMP analog (train_ddp.py --half): bf16 activations in the BEV neck
    dtype: object = None

    @nn.compact
    def __call__(self, inputs: Dict[str, Any], train: bool = False):
        depth_logits = None
        if self.core_method == "lift_splat_shoot":
            from gencomm_tpu.models.encoders.lss import LSSEncoder

            enc = LSSEncoder(
                grid_conf=self.encoder_args["grid_conf"],
                final_dim=tuple(
                    self.encoder_args["data_aug_conf"]["final_dim"]
                ),
                downsample=self.encoder_args.get("img_downsample", 8),
                feat_ch=self.encoder_args.get("img_features", 128),
                trunk_blocks=self.encoder_args.get("trunk_blocks", 2),
                trunk=self.encoder_args.get("img_trunk", "tpu"),
                depth_topk=self.encoder_args.get("depth_topk", 0),
                # half (the --half AMP analog) implies the camera-specific
                # bf16 knobs too: trunk activations + splat update rows
                trunk_bf16=self.encoder_args.get(
                    "trunk_bf16", self.dtype == jnp.bfloat16),
                splat_bf16=self.encoder_args.get(
                    "splat_bf16", self.dtype == jnp.bfloat16),
                name="encoder",
            )
            canvas, depth_logits = enc(inputs, train)
            if self.encode_only:
                return canvas, depth_logits
            return self._neck(canvas, train), depth_logits
        points, point_mask = inputs["points"], inputs["point_mask"]
        if self.core_method == "point_pillar":
            enc = PointPillarEncoder(
                voxel_size=tuple(self.encoder_args["voxel_size"]),
                lidar_range=tuple(self.encoder_args["lidar_range"]),
                num_filters=tuple(
                    self.encoder_args["pillar_vfe"]["num_filters"]
                ),
                use_norm=self.encoder_args["pillar_vfe"].get("use_norm", True),
                dtype=self.dtype,
                striped=bool(
                    self.encoder_args.get("striped_scatter", False)),
                name="encoder",
            )
            if "decorated" in inputs:
                # host-decorated fast path (gencomm_tpu/native)
                canvas = enc(
                    None, None, train,
                    decorated=inputs["decorated"], gids=inputs["gids"],
                    dvalid=inputs["dvalid"],
                )
                if self.encode_only:
                    return canvas, depth_logits
                return self._neck(canvas, train), depth_logits
        elif self.core_method in ("voxelnet", "voxel_net"):
            from gencomm_tpu.models.encoders.voxelnet import VoxelNetEncoder

            enc = VoxelNetEncoder(
                voxel_size=tuple(self.encoder_args["voxel_size"]),
                lidar_range=tuple(self.encoder_args["lidar_range"]),
                vfe_filters=tuple(
                    self.encoder_args.get("vfe_filters", (32, 128))
                ),
                name="encoder",
            )
        elif self.core_method == "second":
            from gencomm_tpu.models.encoders.second import SECONDEncoder

            enc = SECONDEncoder(
                voxel_size=tuple(self.encoder_args["voxel_size"]),
                lidar_range=tuple(self.encoder_args["lidar_range"]),
                voxel_capacity_per_agent=self.encoder_args.get(
                    "max_voxels", 32000
                ),
                out_ch=self.encoder_args.get("spconv", {}).get(
                    "num_features_out", 128
                ),
                name="encoder",
            )
        else:
            raise ValueError(f"unknown encoder core_method {self.core_method}")
        canvas = enc(points, point_mask, train)  # (B, L, ny, nx, C)
        if self.encode_only:
            return canvas, depth_logits
        return self._neck(canvas, train), depth_logits

    def _neck(self, canvas, train: bool):
        b, l = canvas.shape[:2]
        flat = canvas.reshape((b * l,) + canvas.shape[2:])
        feat = BEVBackbone(
            layer_nums=tuple(self.backbone_args["layer_nums"]),
            layer_strides=tuple(self.backbone_args["layer_strides"]),
            num_filters=tuple(self.backbone_args["num_filters"]),
            upsample_strides=tuple(self.backbone_args.get("upsample_strides", ())),
            num_upsample_filters=tuple(
                self.backbone_args.get("num_upsample_filter", ())
            ),
            dtype=self.dtype,
            name="backbone",
        )(flat, train)
        feat = DownsampleConv(
            dims=tuple(self.shrink_args["dim"]),
            kernels=tuple(self.shrink_args["kernal_size"]),
            strides=tuple(self.shrink_args["stride"]),
            dtype=self.dtype,
            name="shrinker",
        )(feat)
        # under --half the feature stays bf16 through message extraction /
        # generation / fusion (heads cast back to fp32 at their call sites)
        feat = feat.astype(self.dtype or jnp.float32)
        return feat.reshape((b, l) + feat.shape[1:])  # (B, L, H, W, C)


@MODELS.register("heter_model_baseline")
@MODELS.register("heter_model_baseline_w_gencomm_stage1")
@MODELS.register("heter_model_baseline_w_gencomm_stage2")
@MODELS.register("heter_model_baseline_w_backalign")
@MODELS.register("heter_model_baseline_w_codebook")
@MODELS.register("heter_model_baseline_w_mpda")
@MODELS.register("heter_model_baseline_w_stamp")
class HeterModel(nn.Module):
    """Unified hetero model; GenComm message passing optional."""

    modality_args: Dict[str, Dict[str, Any]]  # name -> {encoder_args, backbone_args, shrink_header}
    fusion_method: str
    fusion_args: Dict[str, Any]
    lidar_range: Tuple[float, float, float, float, float, float]
    anchor_number: int = 2
    # V2X-Real multi-class: C>1 widens the heads to A*C*C cls / A*C*7 reg
    # channels (heter_model_baseline.py:91,130-132)
    num_class: int = 1
    dir_bins: int = 2
    in_head: int = 128
    use_gencomm: bool = False
    use_enhancer: bool = False
    # Enhancer attention branch (reference enhancer.py:352 ships it
    # commented out; enable via config enhancer.use_attn)
    enhancer_use_attn: bool = False
    enhancer_num_heads: int = 4
    enhancer_attn_mode: str = "window_sparse"
    enhancer_win_size: Sequence[int] = (8, 8)
    message_ch: int = 2
    gencomm_timesteps: int = 3
    unet_ch: int = 8
    unet_ch_mult: Sequence[int] = (1, 1)
    unet_num_res_blocks: int = 2
    missing_message_rate: float = 0.0  # eval-time robustness injection
    # 'trick' (gencomm_stage2.py:40,285-294): zero the generated features
    # where the simulation-side true features are spatially empty. Config
    # default off in every shipped yaml.
    gencomm_trick: bool = False
    # BackAlign-style eval-time feature corruption on non-ego agents
    # (heter_model_baseline_w_backalign.py:252-260): random per-pixel drop
    # + additive Gaussian noise on the transmitted features.
    feature_missing_rate: float = 0.0
    feature_noise_std: float = 0.0
    # CodeFilling (heter_model_baseline_w_codebook.py): UMGM quantization of
    # transmitted features + where2comm confidence comm masks
    use_codebook: bool = False
    codebook_seg: int = 2
    codebook_dict_sizes: Tuple[int, ...] = (64, 64, 64)
    use_comm_mask: bool = False
    comm_thre: float = 0.01
    # MPDA (heter_model_baseline_w_mpda.py): learnable resizer + cross-
    # domain fusion on non-ego features + adversarial domain classifier
    use_mpda: bool = False
    mpda_window_size: int = 8
    mpda_depth: int = 1
    # STAMP (heter_model_baseline_w_stamp.py): per-modality adapters map
    # features into the protocol space (= the ego/collab-base space here);
    # reverters map back for the cycle-consistency adapter loss.
    use_stamp: bool = False
    ego_modality: str = "m1"
    stamp_args: Dict[str, Any] | None = None
    # gradient-matching ablation (tools/train_gmatch.py): also fuse the
    # ORIGINAL (non-generated) features through the same fusion+heads and
    # emit *_T predictions
    gmatch: bool = False
    supervise_single: bool = False
    # STAMP multi-task: BEV segmentation head on the fused feature
    # (sub_modules/bev_seg_head.py via tools/inference_heter_task.py)
    seg_head_target: str | None = None
    # AMP analog (reference train_ddp.py:140-141 --half): bf16 activations
    # in the per-modality BEV necks (params/BN stats fp32, fusion+heads
    # fp32). Config key model.args.half or the --half train flag.
    half: bool = False

    @nn.compact
    def __call__(self, batch: Dict[str, Any], train: bool = False):
        out: Dict[str, Any] = {}
        agent_mask = batch["agent_mask"]  # (B, L)
        b, l = agent_mask.shape

        hm = self.lidar_range[4] - self.lidar_range[1]
        wm = self.lidar_range[3] - self.lidar_range[0]
        affine = normalize_pairwise_tfm(
            batch["pairwise_t_matrix"], hm, wm, 1.0
        ).astype(jnp.float32)

        # --- per-modality encode (all agent slots), combine by masks ---
        feature = None
        message = None
        feats: Dict[str, jnp.ndarray] = {}
        for mname, margs in self.modality_args.items():
            core = margs.get("core_method", "point_pillar")
            if margs.get("sensor_type", "lidar") == "camera":
                inputs = {
                    "imgs": batch[f"imgs_{mname}"],
                    "rots": batch[f"rots_{mname}"],
                    "trans": batch[f"trans_{mname}"],
                    "intrins": batch[f"intrins_{mname}"],
                    "post_rots": batch[f"post_rots_{mname}"],
                    "post_trans": batch[f"post_trans_{mname}"],
                }
                if f"depths_{mname}" in batch:
                    inputs["depths"] = batch[f"depths_{mname}"]
            else:
                if f"decorated_{mname}" in batch:
                    inputs = {
                        "decorated": batch[f"decorated_{mname}"],
                        "gids": batch[f"gids_{mname}"],
                        "dvalid": batch[f"dvalid_{mname}"],
                        "points": None, "point_mask": None,
                    }
                else:
                    inputs = {
                        "points": batch[f"points_{mname}"],
                        "point_mask": batch[f"point_mask_{mname}"],
                    }
            feat, depth_logits = ModalityBranch(
                encoder_args=margs["encoder_args"],
                backbone_args=margs["backbone_args"],
                shrink_args=margs["shrink_header"],
                core_method=core,
                dtype=jnp.bfloat16 if self.half else None,
                name=f"branch_{mname}",
            )(inputs, train)
            if margs.get("sensor_type", "lidar") == "camera":
                # align the camera BEV extent to the lidar range by center
                # crop/pad (heter_model_baseline.py:199-209)
                from gencomm_tpu.models.encoders.lss import center_crop_or_pad

                gc = margs["encoder_args"]["grid_conf"]
                ratio_w = self.lidar_range[3] / gc["xbound"][1]
                ratio_h = self.lidar_range[4] / gc["ybound"][1]
                # round, don't truncate: 100.8/51.2 is 1.96874999... in
                # binary fp, and int() would shear one column off odd
                # DAIR-sized grids (126 -> 125), breaking the cross-modality
                # feature sum
                th = int(round(feat.shape[2] * ratio_h))
                tw = int(round(feat.shape[3] * ratio_w))
                feat = center_crop_or_pad(feat, (th, tw))
                if isinstance(depth_logits, tuple):
                    # (logits, gt_indices) from the encoder when GT depth is
                    # in the batch; append the per-slot modality mask so the
                    # depth loss averages over REAL camera agents only
                    # (the reference concatenates only actual camera CAVs —
                    # our padded layout needs the explicit mask)
                    logits, gt_idx = depth_logits
                    wt = batch[f"modality_mask_{mname}"].astype(
                        logits.dtype
                    )[:, :, None, None, None]
                    out[f"depth_items_{mname}"] = (logits, gt_idx, wt)
                elif depth_logits is not None:
                    out[f"depth_items_{mname}"] = depth_logits
            feats[mname] = feat
            mmask = batch[f"modality_mask_{mname}"][..., None, None, None]
            if not self.use_stamp:
                # STAMP modalities may live on DIFFERENT grids (own lidar
                # ranges); their combine happens below in protocol space
                contrib = feat * mmask
                feature = contrib if feature is None else feature + contrib
            if self.use_gencomm:
                flat = feat.reshape((b * l,) + feat.shape[2:])
                msg = MessageExtractor(
                    in_ch=feat.shape[-1], out_ch=self.message_ch,
                    name=f"message_extractor_{mname}",
                )(flat).reshape((b, l) + feat.shape[2:-1] + (self.message_ch,))
                mcontrib = msg * mmask
                message = mcontrib if message is None else message + mcontrib

        if self.use_stamp:
            # rebuild the combined feature in protocol space: non-ego
            # modalities pass through their adapter; cycle-consistency
            # tensors are emitted for the adapter loss
            # (adapter_loss.py:23-50: P2M / M2P2M / M2P MSEs)
            from gencomm_tpu.models.stamp import StampAdapter

            ego_m = self.ego_modality
            fp = feats[ego_m]
            out["stamp_FP"] = fp
            feature = None
            for mname, margs in self.modality_args.items():
                f = feats[mname]
                if mname == ego_m:
                    proto = f
                else:
                    cfgs = (self.stamp_args or {}).get(mname, {})
                    in_range = tuple(
                        margs["encoder_args"].get(
                            "lidar_range", self.lidar_range
                        )
                    )
                    flat = f.reshape((b * l,) + f.shape[2:])
                    adapter = StampAdapter.from_config(
                        cfgs.get("adapter", {}), in_range,
                        self.lidar_range, fp.shape[2:4],
                        name=f"adapter_{mname}",
                    )
                    m2p = adapter(flat, train)
                    proto = m2p.reshape((b, l) + m2p.shape[1:])
                    # is_initializing(): reverter params must exist even
                    # when the first apply is an eval pass
                    if train or self.is_initializing():
                        reverter = StampAdapter.from_config(
                            cfgs.get("reverter", {}), self.lidar_range,
                            in_range, f.shape[2:4],
                            name=f"reverter_{mname}",
                        )
                        fp_flat = fp.reshape((b * l,) + fp.shape[2:])
                        out[f"stamp_FM_{mname}"] = f
                        out[f"stamp_M2P_{mname}"] = proto
                        out[f"stamp_M2P2M_{mname}"] = reverter(
                            m2p, train
                        ).reshape(f.shape)
                        out[f"stamp_P2M_{mname}"] = reverter(
                            fp_flat, train
                        ).reshape(f.shape)
                mmask = batch[f"modality_mask_{mname}"][..., None, None, None]
                contrib = proto * mmask
                feature = contrib if feature is None else feature + contrib

        hw = feature.shape[2:4]

        if (not train) and (
            self.feature_missing_rate > 0 or self.feature_noise_std > 0
        ):
            rng = self.make_rng("dropout")
            keep = (
                jax.random.uniform(rng, (b, l) + hw + (1,))
                > self.feature_missing_rate
            )
            noise = (
                jax.random.normal(
                    jax.random.fold_in(rng, 1), feature.shape
                ) * self.feature_noise_std
            )
            corrupted = feature * keep + noise
            is_ego = jnp.arange(l)[None, :, None, None, None] == 0
            feature = jnp.where(is_ego, feature, corrupted)

        if self.supervise_single:
            flat_feat = feature.reshape(
                (b * l,) + feature.shape[2:]).astype(jnp.float32)
            cls_s, reg_s, dir_s = DetectionHeads(
                self.anchor_number, self.dir_bins, self.num_class,
                name="heads_single",
            )(flat_feat)
            out.update(
                cls_preds_single=cls_s, reg_preds_single=reg_s,
                dir_preds_single=dir_s,
            )

        heads = DetectionHeads(self.anchor_number, self.dir_bins,
                               self.num_class, name="heads")

        if self.use_mpda:
            # non-ego features pass through resizer + cross-domain encoder
            # conditioned on the ego's feature; all slots are domain-
            # classified behind a gradient-reversal layer
            # (heter_model_baseline_w_mpda.py:230-262)
            from gencomm_tpu.models.mpda import (
                LearnableResizer, CrossDomainFusionEncoder, DAImgHead,
            )

            c = feature.shape[-1]
            hw2 = feature.shape[2:4]
            ego = feature[:, 0]
            cavs = feature[:, 1:].reshape((b * (l - 1),) + feature.shape[2:])
            ego_rep = jnp.broadcast_to(
                feature[:, 0:1], (b, l - 1) + feature.shape[2:]
            ).reshape(cavs.shape)
            resized = LearnableResizer(
                out_channel=c, window_size=self.mpda_window_size,
                wg_depth=self.mpda_depth, name="resizer",
            )(ego_rep, cavs, train)
            aligned = CrossDomainFusionEncoder(
                dim=c, depth=self.mpda_depth,
                window_size=self.mpda_window_size, name="cdt",
            )(ego_rep, resized)
            feature = jnp.concatenate(
                [ego[:, None], aligned.reshape((b, l - 1) + aligned.shape[1:])],
                axis=1,
            )
            da_logits = DAImgHead(name="classifier")(
                feature.reshape((b * l,) + hw2 + (c,))
            )
            out["da_feature"] = da_logits.reshape((b, l) + hw2 + (1,))

        if self.use_codebook:
            # quantize transmitted features; the ego keeps its raw feature
            # (heter_model_baseline_w_codebook.py:272-291)
            from gencomm_tpu.models.codebook import UMGMQuantizer

            c = feature.shape[-1]
            restored, codes, code_loss = UMGMQuantizer(
                channel=c, seg_num=self.codebook_seg,
                dict_sizes=tuple(self.codebook_dict_sizes), name="codebook",
            )(feature.reshape(-1, c), train)
            q_feat = restored.reshape(feature.shape)
            is_ego = jnp.arange(l)[None, :, None, None, None] == 0
            feature = jnp.where(is_ego, feature, q_feat)
            out["codebook_loss"] = code_loss
            # the code indices ARE the transmitted payload — surface them
            # (per stage, per agent) for entropy-coded CPM accounting
            # (reference's draco_compression.py role, done losslessly here)
            out["codebook_codes"] = jnp.stack(
                [s.reshape((b, l, -1)) for s in codes], axis=2
            )  # (B, L, n_stages, H*W*seg)

        if self.use_comm_mask:
            # where2comm confidence masks from the shared cls head
            # (heter_model_baseline_w_codebook.py:304-312)
            from gencomm_tpu.models.fuse.where2comm import Communication

            flat_feat = feature.reshape(
                (b * l,) + feature.shape[2:]).astype(jnp.float32)
            cls_before = heads(flat_feat)[0]
            conf = cls_before.reshape((b, l) + cls_before.shape[1:])
            masks, rate = Communication(
                thre=self.comm_thre, name="communication"
            )(conf, agent_mask)
            if conf.shape[2:4] != feature.shape[2:4]:
                masks = jax.image.resize(
                    masks, (b, l) + feature.shape[2:4] + (1,),
                    method="nearest",
                )
            feature = feature * masks
            out["comm_rate"] = rate

        if self.use_gencomm:
            # eval-time missing-message robustness: random 40%-style spatial
            # dropout on non-ego messages (gencomm_stage2.py:257-262)
            if not train and self.missing_message_rate > 0:
                rng = self.make_rng("dropout")
                keep = (
                    jax.random.uniform(rng, (b, l) + hw + (1,))
                    > self.missing_message_rate
                )
                keep = keep.at[:, 0].set(True)  # ego intact
                message = message * keep

            out["message"] = message
            # [SIMULATED COMM BOUNDARY] — only `message` crosses agents.
            ego_bc = jnp.broadcast_to(
                feature[:, 0:1], feature.shape
            ).reshape((b * l,) + feature.shape[2:])
            cond = message.reshape((b * l,) + hw + (self.message_ch,))
            pred = GenCommDiffusion(
                feat_ch=feature.shape[-1],
                msg_ch=self.message_ch,
                num_timesteps=self.gencomm_timesteps,
                unet_ch=self.unet_ch,
                unet_ch_mult=tuple(self.unet_ch_mult),
                unet_num_res_blocks=self.unet_num_res_blocks,
                dtype=jnp.bfloat16 if self.half else None,
                name="gencomm",
            )(ego_bc, cond, train)

            out["gt_feature"] = feature.reshape(pred.shape)
            out["pred_feature"] = pred
            out["feature_mask"] = agent_mask.reshape(-1)
            fused_in = pred
            if self.gencomm_trick:
                smask = jnp.any(
                    out["gt_feature"] != 0, axis=-1, keepdims=True
                ).astype(pred.dtype)
                fused_in = pred * smask
            if self.use_enhancer:
                # per-agent affine into the ego frame, row 0 of the
                # pairwise matrix (reference enhancer.py:375
                # affine_matrix[b, 0][:n_agents])
                agent_affine = affine[:, 0].reshape((-1,) + affine.shape[-2:])
                fused_in = Enhancer(
                    dim=pred.shape[-1],
                    use_attn=self.enhancer_use_attn,
                    num_heads=self.enhancer_num_heads,
                    attn_mode=self.enhancer_attn_mode,
                    win_size=tuple(self.enhancer_win_size),
                    dtype=jnp.bfloat16 if self.half else None,
                    name="enhancer",
                )(fused_in, agent_affine)
            feature = fused_in.reshape((b, l) + hw + (pred.shape[-1],))

        fusion = build_fusion(self.fusion_method, self.fusion_args,
                              name="fusion_net", half=self.half)
        fused = fusion(feature, affine, agent_mask, train)
        # the fused BEV feature, exposed for KD distillation (reference
        # point_pillar_disconet.py emits output_dict['feature'] for
        # train_w_kd.py; the teacher's copy becomes 'teacher_feature')
        out["feature"] = fused

        if self.gmatch and self.use_gencomm:
            # T path: original features through the SAME fusion + heads
            gt_feat = out["gt_feature"].reshape(feature.shape)
            fused_t = fusion(gt_feat, affine, agent_mask, train)
            cls_t, reg_t, dir_t = heads(fused_t.astype(jnp.float32))
            out.update(cls_preds_T=cls_t, reg_preds_T=reg_t,
                       dir_preds_T=dir_t)

        cls_preds, reg_preds, dir_preds = heads(fused.astype(jnp.float32))
        out.update(cls_preds=cls_preds, reg_preds=reg_preds, dir_preds=dir_preds)

        if self.seg_head_target:
            from gencomm_tpu.models.seg_head import BevSegHead

            out.update(BevSegHead(
                target=self.seg_head_target, name="seg_head",
            )(fused.astype(jnp.float32)))
        return out


def build_model(hypes: dict) -> HeterModel:
    """Construct HeterModel from a hypes dict (model.args block).

    Mirrors the reference's reflection-based assembly
    (heter_model_baseline*.py __init__) via explicit config plumbing.
    """
    args = hypes["model"]["args"]
    core = hypes["model"]["core_method"].lower()
    modality_args = {}
    for key, val in args.items():
        if key.startswith("m") and key[1:].isdigit():
            margs = dict(val)
            enc = dict(margs["encoder_args"])
            enc.setdefault("lidar_range", args["lidar_range"])
            margs["encoder_args"] = enc
            modality_args[key] = margs
    use_gencomm = ("gencomm" in core or "gencomm" in args) and (
        "backalign" not in core
    )
    # BackAlign robustness: features (not messages) are corrupted at eval
    # with the reference's hardcoded missing 0.05 / noise sigma 3
    # (heter_model_baseline_w_backalign.py:252-257)
    backalign_missing = "backalign" in core and args.get(
        "missing_message", False
    )
    gencomm_cfg = args.get("gencomm", {})
    unet_cfg = gencomm_cfg.get("model", {})
    diff_cfg = gencomm_cfg.get("diffusion", {})
    return HeterModel(
        modality_args=modality_args,
        fusion_method=args["fusion_method"],
        fusion_args=args,
        lidar_range=tuple(args["lidar_range"]),
        anchor_number=args["anchor_number"],
        num_class=int(args.get("num_class", 1)),
        half=bool(args.get("half", False)),
        dir_bins=args["dir_args"]["num_bins"],
        in_head=args.get("in_head", 128),
        use_gencomm=use_gencomm,
        use_enhancer=use_gencomm and "enhancer" in args,
        enhancer_use_attn=bool(
            args.get("enhancer", {}).get("use_attn", False)),
        enhancer_num_heads=int(
            args.get("enhancer", {}).get("num_heads", 4)),
        enhancer_attn_mode=str(
            args.get("enhancer", {}).get("attn_mode", "window_sparse")),
        enhancer_win_size=tuple(
            args.get("enhancer", {}).get("win_size", (8, 8))),
        message_ch=args.get("message_extractor", {}).get("out_ch", 2),
        gencomm_timesteps=diff_cfg.get("num_diffusion_timesteps", 3),
        unet_ch=unet_cfg.get("ch", 8),
        unet_ch_mult=tuple(unet_cfg.get("ch_mult", (1, 1))),
        unet_num_res_blocks=unet_cfg.get("num_res_blocks", 2),
        gencomm_trick=bool(args.get("trick", False)),
        missing_message_rate=(
            0.4 if (use_gencomm and args.get("missing_message", False))
            else 0.0
        ),
        feature_missing_rate=0.05 if backalign_missing else 0.0,
        feature_noise_std=3.0 if backalign_missing else 0.0,
        use_codebook="codebook" in args,
        codebook_seg=args.get("codebook", {}).get("seg_num", 2),
        codebook_dict_sizes=tuple(
            [args["codebook"]["dict_size"]] * 3
            if isinstance(args.get("codebook", {}).get("dict_size"), int)
            else args.get("codebook", {}).get("dict_size", (64, 64, 64))
        ),
        use_comm_mask="communication" in args,
        comm_thre=args.get("communication", {}).get("thre", 0.01),
        use_mpda="mpda" in core,
        mpda_window_size=args.get("cdt", {}).get("window_size", 8),
        mpda_depth=args.get("cdt", {}).get("depth", 1),
        use_stamp="stamp" in core,
        ego_modality=str(args.get("ego_modality", "m1")),
        stamp_args={
            m: {"adapter": v.get("adapter", {}),
                "reverter": v.get("reverter", {})}
            for m, v in modality_args.items()
        } if "stamp" in core else None,
        supervise_single=args.get("supervise_single", False),
        seg_head_target=args.get("seg_head_args", {}).get("target")
        if "seg_head_args" in args else None,
        # gradient-matching needs the *_T (teacher-path) predictions
        # emitted (tools/train_gmatch.py pairs them with the S path)
        gmatch="gmatch" in hypes.get("loss", {}).get("core_method", ""),
    )
