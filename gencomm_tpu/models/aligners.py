"""HEAL feature aligners (BackAlign's trainable adapters).

Parity targets: opencood/models/sub_modules/feature_alignnet.py (AlignNet
dispatch) and feature_alignnet_modules.py (ConvNeXt :299-363, Res1x1Aligner
:404-417, Res3x3Aligner :419-433, SCAligner :465+). HEAL configs use
``identity`` and ``convnext``; the residual aligners are kept for parity.

NHWC. ConvNeXt block = depthwise conv -> LayerNorm -> pointwise MLP with
layer scale — all natively channel-last here (the reference permutes).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp


class ConvNeXtBlock(nn.Module):
    dim: int
    kernel_size: int = 7
    layer_scale_init_value: float = 1e-6

    @nn.compact
    def __call__(self, x):
        y = nn.Conv(
            self.dim, (self.kernel_size, self.kernel_size), padding="SAME",
            feature_group_count=self.dim, name="dwconv",
        )(x)
        y = nn.LayerNorm(epsilon=1e-6)(y)
        y = nn.Dense(4 * self.dim, name="pwconv1")(y)
        y = nn.gelu(y, approximate=False)  # torch nn.GELU is exact erf
        y = nn.Dense(self.dim, name="pwconv2")(y)
        if self.layer_scale_init_value > 0:
            gamma = self.param(
                "gamma",
                lambda key, shape: jnp.full(
                    shape, self.layer_scale_init_value, jnp.float32
                ),
                (self.dim,),
            )
            y = gamma * y
        return x + y


class ResidualAlignBlock(nn.Module):
    """feature_alignnet_modules.py ResidualBlock (conv-bn-relu-conv-bn + skip)."""

    dim: int
    kernel: int = 3

    @nn.compact
    def __call__(self, x, train: bool = False):
        bn = lambda: nn.BatchNorm(  # noqa: E731
            # torch BatchNorm2d default eps (the reference ResidualBlock
            # uses the default, feature_alignnet_modules.py:393-394)
            use_running_average=not train, momentum=0.99, epsilon=1e-5
        )
        y = nn.Conv(self.dim, (self.kernel, self.kernel), padding="SAME")(x)
        y = nn.relu(bn()(y))
        y = nn.Conv(self.dim, (self.kernel, self.kernel), padding="SAME")(y)
        y = bn()(y)
        return nn.relu(y + x)


class AlignNet(nn.Module):
    """Dispatch on ``core_method`` (feature_alignnet.py:14-36)."""

    core_method: str
    args: dict

    @nn.compact
    def __call__(self, x, train: bool = False):
        method = self.core_method
        if method == "identity":
            return x
        dim = self.args["dim"]
        n = self.args.get("num_of_blocks", 1)
        if method == "convnext":
            for i in range(n):
                x = ConvNeXtBlock(
                    dim, kernel_size=self.args.get("kernel_size", 7),
                    name=f"block{i}",
                )(x)
            return x
        if method in ("resnet1x1", "resnet3x3"):
            k = 1 if method == "resnet1x1" else 3
            for i in range(n):
                x = ResidualAlignBlock(dim, kernel=k, name=f"block{i}")(x, train)
            return x
        if method == "scaligner":
            # SCAligner: ResMLP stack (feature_alignnet_modules.py:453-463):
            # each block is residual(LayerNorm -> [Linear -> GELU] x layers)
            layers = self.args.get("num_of_layers", 2)
            for i in range(n):
                y = nn.LayerNorm(name=f"mlp{i}_norm")(x)
                for j in range(layers):
                    y = nn.gelu(nn.Dense(dim, name=f"mlp{i}_{j}")(y),
                                approximate=False)
                x = x + y
            return x
        raise ValueError(f"unknown aligner core_method {method}")

    @staticmethod
    def from_config(cfg: dict, name: str | None = None) -> "AlignNet":
        return AlignNet(
            core_method=cfg.get("core_method", "identity"),
            args=cfg.get("args", {}),
            name=name,
        )
