"""HEAL pyramid fusion (multiscale occupancy-weighted collaboration).

Parity target: opencood/models/fuse_modules/pyramid_fuse.py —
``PyramidFusion`` subclasses the ResNet BEV backbone, adds a per-level 1x1
occupancy head, and fuses each level with ``weighted_fuse`` (:17-63): warp
every agent's features AND occupancy scores into the ego frame, softmax the
warped scores over the agent axis (zeros → -inf, NaN → 0 for all-invalid
pixels), and take the weighted sum.

TPU version: dense (B, L, H, W, C) inputs; the per-sample Python loop over
ragged ``record_len`` becomes a masked softmax over the padded agent axis L.
Camera-FOV crop masks (forward_collab :127-163) are multiplicative score
masks passed in at full resolution and nearest-resized per level. The
single-agent pass (forward_single :91-103) is the ``single=True`` mode of
the same compact call, so both modes share parameters.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn

from gencomm_tpu.models.backbones.resnet_bev import BasicBlock, Bottleneck
from gencomm_tpu.models.layers import ConvBNReLU, DeconvBNReLU
from gencomm_tpu.registry import FUSIONS

_NEG = -1e9


def weighted_fuse(feat, score, affine, agent_mask):
    """Fuse one pyramid level.

    feat: (B, L, H, W, C); score: (B, L, H, W, 1) positive scores;
    affine: (B, L, L, 2, 3); agent_mask: (B, L) bool.
    Returns (B, H, W, C). Parity: pyramid_fuse.py:17-63.
    """
    from gencomm_tpu.models.fuse.fusion import warp_to_ego

    # feature+score warped together in ONE kernel launch (concat on C)
    both = jnp.concatenate([feat, score], axis=-1)
    warped_both = warp_to_ego(both, affine)
    warped, warped_s = warped_both[..., :-1], warped_both[..., -1:]

    valid = (warped_s > 0) & agent_mask[:, :, None, None, None]
    logits = jnp.where(valid, warped_s, _NEG)
    attn = jax.nn.softmax(logits, axis=1)
    # pixels with no valid agent: softmax of all--inf is garbage — zero it
    # (reference replaces NaN with 0, pyramid_fuse.py:56-58)
    any_valid = valid.any(axis=1, keepdims=True)
    attn = jnp.where(any_valid, attn, 0.0)
    return (attn * warped).sum(axis=1)


@FUSIONS.register("pyramid")
class PyramidFusion(nn.Module):
    """Multiscale ResNeXt encode -> per-level occupancy-weighted fuse ->
    deconv decode."""

    layer_nums: Sequence[int]
    layer_strides: Sequence[int]
    num_filters: Sequence[int]
    upsample_strides: Sequence[int] = ()
    num_upsample_filters: Sequence[int] = ()
    resnext: bool = True

    def _encode(self, x, train):
        block_cls = Bottleneck if self.resnext else BasicBlock
        feats = []
        for i, (n, stride, filters) in enumerate(
            zip(self.layer_nums, self.layer_strides, self.num_filters)
        ):
            x = block_cls(filters, stride=stride, name=f"layer{i}_0")(x, train)
            for k in range(1, n):
                x = block_cls(filters, name=f"layer{i}_{k}")(x, train)
            feats.append(x)
        return feats

    def _decode(self, feats, train):
        ups = []
        for i, x in enumerate(feats):
            if i < len(self.upsample_strides):
                s = self.upsample_strides[i]
                f = self.num_upsample_filters[i]
                if s >= 1:
                    x = DeconvBNReLU(f, stride=int(s), name=f"deblock{i}")(
                        x, train
                    )
                else:
                    k = int(round(1 / s))
                    x = ConvBNReLU(f, kernel=k, stride=k, name=f"deblock{i}")(
                        x, train
                    )
            ups.append(x)
        return jnp.concatenate(ups, axis=-1) if len(ups) > 1 else ups[0]

    @nn.compact
    def __call__(self, x, affine=None, agent_mask=None, train: bool = False,
                 score_mask: Optional[jnp.ndarray] = None,
                 single: bool = False):
        """Collab mode: x (B, L, H, W, C) -> (fused (B, H', W', C'),
        occ_maps [(B*L, Hi, Wi, 1)]). Single mode: x (N, H, W, C) ->
        (decoded (N, H', W', C'), occ_maps [(N, Hi, Wi, 1)])."""
        if single:
            feats = self._encode(x, train)
            occ_maps = [
                nn.Conv(1, (1, 1), name=f"single_head_{i}")(f)
                for i, f in enumerate(feats)
            ]
            return self._decode(feats, train), occ_maps

        b, l = x.shape[:2]
        flat = x.reshape((b * l,) + x.shape[2:])
        feats = self._encode(flat, train)
        occ_maps = []
        fused_levels = []
        for i, f in enumerate(feats):
            occ = nn.Conv(1, (1, 1), name=f"single_head_{i}")(f)
            occ_maps.append(occ)
            score = jax.nn.sigmoid(occ) + 1e-4
            score = score.reshape((b, l) + score.shape[1:])
            if score_mask is not None:
                sm = jax.image.resize(
                    score_mask, (b, l) + f.shape[1:3] + (1,), method="nearest"
                )
                score = score * sm
            fl = f.reshape((b, l) + f.shape[1:])
            fused_levels.append(weighted_fuse(fl, score, affine, agent_mask))
        return self._decode(fused_levels, train), occ_maps

    @staticmethod
    def from_config(cfg: dict, name: str | None = None) -> "PyramidFusion":
        return PyramidFusion(
            layer_nums=tuple(cfg["layer_nums"]),
            layer_strides=tuple(cfg["layer_strides"]),
            num_filters=tuple(cfg["num_filters"]),
            upsample_strides=tuple(cfg.get("upsample_strides", ())),
            num_upsample_filters=tuple(cfg.get("num_upsample_filter", ())),
            resnext=bool(cfg.get("resnext", True)),
            name=name,
        )


@FUSIONS.register("multiscale_ms")
class MsFusion(nn.Module):
    """Multiscale Max/Att fusion over a shared fusion backbone's levels.

    Parity target: opencood/models/heter_model_baseline_ms.py:196-210 with
    sub_modules/base_bev_backbone_resnet.py:119-142 — level 0 is the
    per-agent input itself ("we omit self.backbone's first layer": the
    fusion backbone's layer 0 is constructed but never run); each further
    level is ResNet ``layer_i`` applied to the previous *per-agent* feature
    (fusion happens per level, not cumulatively); every level gets its own
    MaxFusion/AttFusion; the fused maps go through the backbone's
    ``decode_multiscale_feature`` deconv heads and are concatenated.

    Input x: (B, L, H, W, C) padded agent axis; affine (B, L, L, 2, 3);
    agent_mask (B, L). Returns (B, H', W', sum(num_upsample_filters)).
    """

    layer_nums: Sequence[int]
    layer_strides: Sequence[int]
    num_filters: Sequence[int]
    upsample_strides: Sequence[int] = ()
    num_upsample_filters: Sequence[int] = ()
    fusion_method: str = "att"
    att_feat_dims: Sequence[int] = ()

    @nn.compact
    def __call__(self, x, affine, agent_mask, train: bool = False):
        from gencomm_tpu.models.fuse.fusion import AttFusion, MaxFusion

        b, l = x.shape[:2]
        flat = x.reshape((b * l,) + x.shape[2:])
        feats = [flat]
        for i in range(1, len(self.layer_nums)):
            flat = BasicBlock(
                self.num_filters[i], stride=self.layer_strides[i],
                name=f"layer{i}_0",
            )(flat, train)
            for k in range(1, self.layer_nums[i]):
                flat = BasicBlock(self.num_filters[i], name=f"layer{i}_{k}")(
                    flat, train
                )
            feats.append(flat)

        fused = []
        for i, f in enumerate(feats):
            per_agent = f.reshape((b, l) + f.shape[1:])
            if self.fusion_method == "max":
                fm = MaxFusion(name=f"fuse{i}")
            else:
                fd = (self.att_feat_dims[i] if i < len(self.att_feat_dims)
                      else f.shape[-1])
                fm = AttFusion(feat_dim=fd, name=f"fuse{i}")
            fused.append(fm(per_agent, affine, agent_mask, train))

        ups = []
        for i, f in enumerate(fused):
            if i < len(self.upsample_strides):
                s = self.upsample_strides[i]
                nf = self.num_upsample_filters[i]
                if s >= 1:
                    f = DeconvBNReLU(nf, stride=int(s), name=f"deblock{i}")(
                        f, train
                    )
                else:
                    k = int(round(1 / s))
                    f = ConvBNReLU(nf, kernel=k, stride=k, name=f"deblock{i}")(
                        f, train
                    )
            ups.append(f)
        return jnp.concatenate(ups, axis=-1) if len(ups) > 1 else ups[0]

    @staticmethod
    def from_config(cfg: dict, fusion_method: str = "att",
                    att_feat_dims=(), name: str | None = None) -> "MsFusion":
        return MsFusion(
            layer_nums=tuple(cfg["layer_nums"]),
            layer_strides=tuple(cfg["layer_strides"]),
            num_filters=tuple(cfg["num_filters"]),
            upsample_strides=tuple(cfg.get("upsample_strides", ())),
            num_upsample_filters=tuple(cfg.get("num_upsample_filter", ())),
            fusion_method=fusion_method,
            att_feat_dims=tuple(att_feat_dims),
            name=name,
        )
