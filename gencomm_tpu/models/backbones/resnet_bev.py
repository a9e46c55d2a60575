"""ResNet/ResNeXt multiscale BEV backbone.

Parity targets:
  opencood/models/sub_modules/base_bev_backbone_resnet.py (ResNetBEVBackbone)
  opencood/models/sub_modules/resblock.py (ResNetModified, BasicBlock,
  Bottleneck — HEAL's pyramid uses Bottleneck with expansion=1, groups=32,
  width_per_group=4, i.e. a ResNeXt-32x4d stage per level).

NHWC layout. BatchNorm eps: the residual blocks use torch's default
eps=1e-5 (resblock.py builds plain ``nn.BatchNorm2d(planes)``), while the
deconv decode heads keep the OpenPCDet convention eps=1e-3
(base_bev_backbone_resnet.py:60-82) — the reference mixes both and weight
transplants only match if we mirror that split. Exposes the encode/decode
multiscale split that HEAL
PyramidFusion fuses between (get_multiscale_feature /
decode_multiscale_feature, base_bev_backbone_resnet.py:112-135).
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

from gencomm_tpu.models.layers import ConvBNReLU, DeconvBNReLU


class BasicBlock(nn.Module):
    """resblock.py BasicBlock: 3x3-3x3 residual."""

    features: int
    stride: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        bn = lambda: nn.BatchNorm(  # noqa: E731
            use_running_average=not train, momentum=0.99, epsilon=1e-5
        )
        identity = x
        # explicit pad-1: torch semantics on even grids at stride 2
        y = nn.Conv(self.features, (3, 3), strides=(self.stride, self.stride),
                    padding=((1, 1), (1, 1)), use_bias=False)(x)
        y = nn.relu(bn()(y))
        y = nn.Conv(self.features, (3, 3), padding="SAME", use_bias=False)(y)
        y = bn()(y)
        if self.stride != 1 or x.shape[-1] != self.features:
            identity = nn.Conv(
                self.features, (1, 1), strides=(self.stride, self.stride),
                use_bias=False, name="downsample",
            )(x)
            identity = bn()(identity)
        return nn.relu(y + identity)


class Bottleneck(nn.Module):
    """resblock.py Bottleneck with HEAL's ResNeXt config: expansion=1,
    groups=32, width_per_group=4 (pyramid_fuse.py:70-79)."""

    features: int
    stride: int = 1
    groups: int = 32
    width_per_group: int = 4

    @nn.compact
    def __call__(self, x, train: bool = False):
        bn = lambda: nn.BatchNorm(  # noqa: E731
            use_running_average=not train, momentum=0.99, epsilon=1e-5
        )
        width = int(self.features * (self.width_per_group * self.groups / 64.0))
        identity = x
        y = nn.Conv(width, (1, 1), use_bias=False)(x)
        y = nn.relu(bn()(y))
        # explicit pad-1: torch semantics on even grids at stride 2
        y = nn.Conv(width, (3, 3), strides=(self.stride, self.stride),
                    padding=((1, 1), (1, 1)), use_bias=False,
                    feature_group_count=self.groups)(y)
        y = nn.relu(bn()(y))
        y = nn.Conv(self.features, (1, 1), use_bias=False)(y)
        y = bn()(y)
        if self.stride != 1 or x.shape[-1] != self.features:
            identity = nn.Conv(
                self.features, (1, 1), strides=(self.stride, self.stride),
                use_bias=False, name="downsample",
            )(x)
            identity = bn()(identity)
        return nn.relu(y + identity)


class ResNetBEVBackbone(nn.Module):
    """Multiscale residual BEV backbone with deconv decode heads."""

    layer_nums: Sequence[int]
    layer_strides: Sequence[int]
    num_filters: Sequence[int]
    upsample_strides: Sequence[int] = ()
    num_upsample_filters: Sequence[int] = ()
    resnext: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        return self.decode_multiscale(self.encode_multiscale(x, train), train)

    def encode_multiscale(self, x, train: bool = False):
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

    def decode_multiscale(self, feats, train: bool = False):
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
        if len(ups) > 1:
            return jnp.concatenate(ups, axis=-1)
        return ups[0]

    @staticmethod
    def from_config(cfg: dict, name: str | None = None) -> "ResNetBEVBackbone":
        return ResNetBEVBackbone(
            layer_nums=tuple(cfg["layer_nums"]),
            layer_strides=tuple(cfg["layer_strides"]),
            num_filters=tuple(cfg["num_filters"]),
            upsample_strides=tuple(cfg.get("upsample_strides", ())),
            num_upsample_filters=tuple(cfg.get("num_upsample_filter", ())),
            resnext=bool(cfg.get("resnext", False)),
            name=name,
        )
