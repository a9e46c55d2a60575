"""SSD-style multiscale BEV backbone.

Parity target: opencood/models/sub_modules/base_bev_backbone.py:6-156
(BaseBEVBackbone): N levels of strided conv stacks, per-level deconv
up-heads concatenated to a single 2D feature map. Also exposes the
multiscale encode/decode split used by HEAL pyramid fusion
(get_multiscale_feature / decode_multiscale_feature, :127-156).

NHWC layout.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

from gencomm_tpu.models.layers import ConvBNReLU, DeconvBNReLU


class BEVBackbone(nn.Module):
    layer_nums: Sequence[int]
    layer_strides: Sequence[int]
    num_filters: Sequence[int]
    upsample_strides: Sequence[int] = ()
    num_upsample_filters: Sequence[int] = ()
    # AMP analog (reference train_ddp.py --half): bf16 conv/BN activations
    # throughout the backbone; params and BN statistics stay fp32
    dtype: object = None

    def _blocks(self):
        return list(zip(self.layer_nums, self.layer_strides, self.num_filters))

    @nn.compact
    def __call__(self, x, train: bool = False, level_fuse=None):
        """level_fuse(i, feat) -> feat: optional per-level hook applied
        between encode and decode — the multiscale intermediate-fusion
        mechanism (point_pillar_baseline_multiscale.py:115-120 /
        att_bev_backbone.py:140-155). Modules the hook constructs attach
        to THIS backbone's scope (flax compact context)."""
        feats = self.encode_multiscale(x, train)
        if level_fuse is not None:
            feats = [level_fuse(i, f) for i, f in enumerate(feats)]
        return self.decode_multiscale(feats, train)

    def encode_multiscale(self, x, train: bool = False):
        feats = []
        for i, (n_layers, stride, filters) in enumerate(self._blocks()):
            # torch_pad: the reference's strided stem convs are
            # ZeroPad2d(1)+conv (pad 1); on EVEN grids (the real BEV sizes)
            # stride-2 SAME pads (0,1) and shifts alignment — see ConvBNReLU
            x = ConvBNReLU(filters, kernel=3, stride=stride, torch_pad=True,
                           dtype=self.dtype, name=f"block{i}_0")(x, train)
            for k in range(n_layers):
                x = ConvBNReLU(filters, kernel=3, dtype=self.dtype,
                               name=f"block{i}_{k + 1}")(x, train)
            feats.append(x)
        return feats

    def decode_multiscale(self, feats, train: bool = False):
        ups = []
        for i, x in enumerate(feats):
            if i < len(self.upsample_strides):
                s = self.upsample_strides[i]
                f = self.num_upsample_filters[i]
                if s >= 1:
                    x = DeconvBNReLU(f, stride=int(s), dtype=self.dtype,
                                     name=f"deblock{i}")(x, train)
                else:
                    x = ConvBNReLU(
                        f, kernel=int(round(1 / s)), stride=int(round(1 / s)),
                        dtype=self.dtype, name=f"deblock{i}",
                    )(x, train)
            ups.append(x)
        if len(ups) > 1:
            # odd input dims round up under strided downsampling, so the
            # re-upsampled maps can overshoot by a row/col — crop to match
            h = min(u.shape[1] for u in ups)
            w = min(u.shape[2] for u in ups)
            return jnp.concatenate([u[:, :h, :w] for u in ups], axis=-1)
        return ups[0]

    @staticmethod
    def from_config(cfg: dict) -> "BEVBackbone":
        return BEVBackbone(
            layer_nums=tuple(cfg["layer_nums"]),
            layer_strides=tuple(cfg["layer_strides"]),
            num_filters=tuple(cfg["num_filters"]),
            upsample_strides=tuple(cfg.get("upsample_strides", ())),
            num_upsample_filters=tuple(cfg.get("num_upsample_filter", ())),
        )
