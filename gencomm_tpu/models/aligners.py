"""HEAL feature aligners (BackAlign's trainable adapters).

Parity targets: opencood/models/sub_modules/feature_alignnet.py (AlignNet
dispatch) and feature_alignnet_modules.py (ConvNeXt :299-363, Res1x1Aligner
:404-417, Res3x3Aligner :419-433, SCAligner :465+, SDTAAgliner :435-448,
FANet :244-275) plus sub_modules/cbam.py (CBAM BasicBlock :62-99). HEAL
configs use ``identity`` and ``convnext``; the rest are selectable parity.

NHWC. ConvNeXt block = depthwise conv -> LayerNorm -> pointwise MLP with
layer scale — all natively channel-last here (the reference permutes).
"""

from __future__ import annotations

import jax
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


def _layer_scale(mod: nn.Module, name: str, dim: int, init: float):
    return mod.param(
        name, lambda key, shape: jnp.full(shape, init, jnp.float32), (dim,)
    )


class XCA(nn.Module):
    """Cross-covariance attention (feature_alignnet_modules.py:33-71):
    attention over the CHANNEL axis — q/k L2-normalized along tokens,
    per-head learned temperature scales the (C/h, C/h) covariance."""

    dim: int
    heads: int = 4

    @nn.compact
    def __call__(self, x):
        b, n, c = x.shape
        dh = c // self.heads
        qkv = nn.Dense(3 * c, use_bias=True, name="qkv")(x)
        qkv = qkv.reshape(b, n, 3, self.heads, dh)
        q, k, v = (
            jnp.transpose(qkv[:, :, i], (0, 2, 3, 1)) for i in range(3)
        )  # each (B, h, C/h, N)
        q = q / jnp.maximum(
            jnp.linalg.norm(q, axis=-1, keepdims=True), 1e-12
        )
        k = k / jnp.maximum(
            jnp.linalg.norm(k, axis=-1, keepdims=True), 1e-12
        )
        temp = self.param("temperature", nn.initializers.ones,
                          (self.heads, 1, 1))
        attn = nn.softmax(
            jnp.einsum("bhcn,bhdn->bhcd", q, k) * temp, axis=-1
        )
        out = jnp.einsum("bhcd,bhdn->bhcn", attn, v)
        out = jnp.transpose(out, (0, 3, 1, 2)).reshape(b, n, c)
        return nn.Dense(c, name="proj")(out)


class ConvEncoder(nn.Module):
    """feature_alignnet_modules.py:74-104 (kernel_size=1 depthwise ->
    LN -> pointwise MLP with layer scale, residual)."""

    dim: int
    expan_ratio: int = 4
    layer_scale_init_value: float = 1e-6

    @nn.compact
    def __call__(self, x):
        y = nn.Conv(self.dim, (1, 1), feature_group_count=self.dim,
                    name="dwconv")(x)
        y = nn.LayerNorm(epsilon=1e-6, name="norm")(y)
        y = nn.Dense(self.expan_ratio * self.dim, name="pwconv1")(y)
        y = nn.gelu(y, approximate=False)
        y = nn.Dense(self.dim, name="pwconv2")(y)
        y = _layer_scale(self, "gamma", self.dim,
                         self.layer_scale_init_value) * y
        return x + y


class SDTAEncoder(nn.Module):
    """feature_alignnet_modules.py:105-160: 1x1 depthwise conv stack ->
    XCA token-mix (residual, layer-scaled) -> inverted bottleneck; the
    final residual adds the block INPUT (pre-convs)."""

    dim: int
    num_conv: int = 2
    heads: int = 4
    expan_ratio: int = 4
    layer_scale_init_value: float = 1e-6

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        y = x
        for i in range(self.num_conv):
            y = nn.relu(
                nn.Conv(self.dim, (1, 1), feature_group_count=self.dim,
                        name=f"conv{i}")(y)
            )
        tokens = y.reshape(b, h * w, c)
        gamma_xca = _layer_scale(self, "gamma_xca", self.dim,
                                 self.layer_scale_init_value)
        tokens = tokens + gamma_xca * XCA(
            self.dim, self.heads, name="xca"
        )(nn.LayerNorm(epsilon=1e-6, name="norm_xca")(tokens))
        z = nn.LayerNorm(epsilon=1e-6, name="norm")(tokens)
        z = nn.Dense(self.expan_ratio * self.dim, name="pwconv1")(z)
        z = nn.gelu(z, approximate=False)
        z = nn.Dense(self.dim, name="pwconv2")(z)
        z = _layer_scale(self, "gamma", self.dim,
                         self.layer_scale_init_value) * z
        return x + z.reshape(b, h, w, c)


class CBAMBlock(nn.Module):
    """cbam.py BasicBlock:62-99 — conv1x1-bn-relu-conv1x1-bn, then channel
    attention (shared avg/max-pool MLP) and spatial attention (7x7 conv on
    channel mean|max), residual + relu."""

    dim: int
    ratio: int = 16

    @nn.compact
    def __call__(self, x, train: bool = False):
        bn = lambda name: nn.BatchNorm(  # noqa: E731
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            name=name,
        )
        out = nn.Conv(self.dim, (1, 1), use_bias=False, name="conv1")(x)
        out = nn.relu(bn("bn1")(out))
        out = nn.Conv(self.dim, (1, 1), use_bias=False, name="conv2")(out)
        out = bn("bn2")(out)

        # channel attention: shared 2-layer 1x1 MLP on avg & max pooled maps
        fc1 = nn.Conv(self.dim // self.ratio, (1, 1), use_bias=False,
                      name="ca_fc1")
        fc2 = nn.Conv(self.dim, (1, 1), use_bias=False, name="ca_fc2")
        avg = out.mean(axis=(1, 2), keepdims=True)
        mx = out.max(axis=(1, 2), keepdims=True)
        ca = nn.sigmoid(fc2(nn.relu(fc1(avg))) + fc2(nn.relu(fc1(mx))))
        out = ca * out

        # spatial attention on [channel-mean, channel-max]
        sp = jnp.concatenate(
            [out.mean(axis=-1, keepdims=True), out.max(axis=-1, keepdims=True)],
            axis=-1,
        )
        sa = nn.sigmoid(
            nn.Conv(1, (7, 7), padding="SAME", use_bias=False,
                    name="sa_conv")(sp)
        )
        return nn.relu(sa * out + x)


class ARNetBlock(nn.Module):
    """feature_alignnet_modules.py:211-222."""

    indim: int
    outdim: int

    @nn.compact
    def __call__(self, x):
        y = nn.relu(nn.Conv(self.indim, (1, 1), name="c1")(x))
        y = nn.relu(nn.Conv(self.indim, (3, 3), padding="SAME",
                            feature_group_count=8, name="c2")(y))
        return nn.Conv(self.outdim, (1, 1), name="c3")(y)


class FALayer(nn.Module):
    """feature_alignnet_modules.py:224-241: FiLM-style modulation — the
    (detached) input pyramid provides gamma/beta for the feature stream."""

    indim: int
    outdim: int
    imgdim: int

    @nn.compact
    def __call__(self, feature, img):
        f = ARNetBlock(self.indim, self.outdim, name="arblock")(feature)
        inter = nn.relu(nn.Conv(self.imgdim, (1, 1), name="conv1")(img))
        gamma = nn.Conv(self.outdim, (1, 1), name="conv2")(inter)
        beta = nn.Conv(self.outdim, (1, 1), name="conv3")(inter)
        return f * gamma + beta


class FANetAligner(nn.Module):
    """feature_alignnet_modules.py FANet:244-275 — 2-down/2-up U-Net of
    FALayers conditioned on a detached copy of the input ("fake image")."""

    dim: int

    @nn.compact
    def __call__(self, x):
        def down(t):
            return nn.max_pool(t, (2, 2), strides=(2, 2))

        def up(t):
            b, h, w, c = t.shape
            return jax.image.resize(t, (b, 2 * h, 2 * w, c), "bilinear")

        img0 = jax.lax.stop_gradient(x)
        img1 = down(img0)
        img2 = down(img1)
        d = self.dim
        f0 = FALayer(d, d, d, name="falayer1")(x, img0)
        f1 = FALayer(d, 2 * d, d, name="falayer2")(down(f0), img1)
        f2 = FALayer(2 * d, 4 * d, d, name="falayer3")(down(f1), img2)
        f3 = FALayer(4 * d, 2 * d, d, name="falayer4")(up(f2), img1) + \
            nn.Conv(2 * d, (1, 1), name="skip_conv1")(f1)
        f4 = FALayer(2 * d, d, d, name="falayer5")(up(f3), img0) + \
            nn.Conv(d, (1, 1), name="skip_conv2")(f0)
        return f4


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
        if method == "sdta":
            # SDTAAgliner (feature_alignnet_modules.py:435-448): each block
            # is ConvEncoder -> SDTAEncoder
            for i in range(n):
                x = ConvEncoder(dim, name=f"conv_enc{i}")(x)
                x = SDTAEncoder(dim, name=f"sdta_enc{i}")(x)
            return x
        if method == "cbam":
            for i in range(n):
                x = CBAMBlock(dim, name=f"block{i}")(x, train)
            return x
        if method == "fanet":
            return FANetAligner(dim, name="fanet")(x)
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
