"""Reference-exact camera trunks for the LSS encoder.

The reference offers two pretrained image trunks
(opencood/models/sub_modules/lss_submodule.py):
  - ``CamEncode`` (:40-141): EfficientNet-b0 (efficientnet_pytorch),
    endpoints reduction_3/4/5 combined by two ``Up`` blocks (bilinear
    align_corners x2 upsample + concat + 2x conv-BN-ReLU) to a 512-ch
    stride-8 feature map.
  - ``CamEncode_Resnet101`` (:143-221): torchvision resnet101's
    conv1+bn1+maxpool+layer1+layer2 only ("Equal to resnet50!", :158) —
    512-ch stride-8.

These flax modules reproduce both architectures exactly so that reference
checkpoints (and torch-pretrained trunks) can be weight-transplanted via
``gencomm_tpu/tools/trunk_convert.py``; tests/test_camera_trunks.py proves
output parity against hand-built torch replicas. The default LSS trunk
remains the TPU-first patchify stack in ``lss.py`` (same role, far less
activation traffic); select these with encoder_args ``img_trunk:
efficientnet-b0 | resnet101``.

All tensors NHWC. BatchNorm semantics match torch: EfficientNet uses
eps=1e-3 / torch-momentum 0.01, ResNet eps=1e-5 / torch-momentum 0.1
(flax momentum = 1 - torch momentum).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn


def upsample2x_align_corners(x: jnp.ndarray) -> jnp.ndarray:
    """Bilinear 2x upsample with torch's ``align_corners=True`` semantics
    (nn.Upsample in the reference's ``Up`` block, lss_submodule.py:22).

    jax.image.resize uses half-pixel centers (align_corners=False), so this
    is done explicitly: output pixel i samples input at i*(I-1)/(O-1).
    NHWC; H and W are doubled.
    """

    def interp_axis(v, axis):
        size = v.shape[axis]
        out = 2 * size
        if size == 1:
            reps = [1] * v.ndim
            reps[axis] = 2
            return jnp.tile(v, reps)
        pos = jnp.arange(out, dtype=jnp.float32) * (size - 1) / (out - 1)
        lo = jnp.floor(pos).astype(jnp.int32)
        hi = jnp.minimum(lo + 1, size - 1)
        w = (pos - lo).astype(v.dtype)
        shape = [1] * v.ndim
        shape[axis] = out
        w = w.reshape(shape)
        return (
            jnp.take(v, lo, axis=axis) * (1 - w)
            + jnp.take(v, hi, axis=axis) * w
        )

    x = interp_axis(x, 1)
    return interp_axis(x, 2)


def swish(x):
    return x * jax.nn.sigmoid(x)


class MBConv(nn.Module):
    """efficientnet_pytorch MBConvBlock (model.py MBConvBlock.forward):
    [expand 1x1 + BN + swish] -> depthwise kxk/s + BN + swish -> SE
    (squeeze channels = max(1, in_ch * 0.25), biased 1x1 convs, swish then
    sigmoid gate) -> project 1x1 + BN -> skip (+ drop_connect at train)
    when stride==1 and in==out. TF-style SAME padding (flax default)."""

    in_ch: int
    out_ch: int
    kernel: int
    stride: int
    expand: int
    se_ratio: float = 0.25
    drop_rate: float = 0.0
    dtype: object = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        inputs = x
        mid = self.in_ch * self.expand
        if self.expand != 1:
            x = nn.Conv(mid, (1, 1), use_bias=False, dtype=self.dtype,
                        name="expand_conv")(x)
            x = nn.BatchNorm(use_running_average=not train, momentum=0.99,
                             epsilon=1e-3, dtype=self.dtype, name="bn0")(x)
            x = swish(x)
        x = nn.Conv(mid, (self.kernel, self.kernel),
                    strides=(self.stride, self.stride), padding="SAME",
                    feature_group_count=mid, use_bias=False,
                    dtype=self.dtype, name="depthwise_conv")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.99,
                         epsilon=1e-3, dtype=self.dtype, name="bn1")(x)
        x = swish(x)
        # squeeze-excite (input_filters-based squeeze width)
        sq = max(1, int(self.in_ch * self.se_ratio))
        s = jnp.mean(x, axis=(1, 2), keepdims=True)
        s = nn.Conv(sq, (1, 1), dtype=self.dtype, name="se_reduce")(s)
        s = swish(s)
        s = nn.Conv(mid, (1, 1), dtype=self.dtype, name="se_expand")(s)
        x = jax.nn.sigmoid(s) * x
        x = nn.Conv(self.out_ch, (1, 1), use_bias=False, dtype=self.dtype,
                    name="project_conv")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.99,
                         epsilon=1e-3, dtype=self.dtype, name="bn2")(x)
        if self.stride == 1 and self.in_ch == self.out_ch:
            if train and self.drop_rate > 0.0 and self.has_rng("dropout"):
                # stochastic depth (efficientnet_pytorch utils.drop_connect)
                keep = 1.0 - self.drop_rate
                rng = self.make_rng("dropout")
                mask = jax.random.bernoulli(
                    rng, keep, (x.shape[0], 1, 1, 1)
                ).astype(x.dtype)
                x = x / keep * mask
            x = x + inputs
        return x


# (out_ch, kernel, stride, expand) per block, b0 depths/widths
# (efficientnet_pytorch model config for efficientnet-b0: repeats
# [1,2,2,3,3,4,1], widths [16,24,40,80,112,192,320])
_B0_BLOCKS: Sequence[Tuple[int, int, int, int]] = (
    (16, 3, 1, 1),
    (24, 3, 2, 6), (24, 3, 1, 6),
    (40, 5, 2, 6), (40, 5, 1, 6),
    (80, 3, 2, 6), (80, 3, 1, 6), (80, 3, 1, 6),
    (112, 5, 1, 6), (112, 5, 1, 6), (112, 5, 1, 6),
    (192, 5, 2, 6), (192, 5, 1, 6), (192, 5, 1, 6), (192, 5, 1, 6),
    (320, 3, 1, 6),
)
# block indices whose OUTPUT is an endpoint the reference consumes
# (CamEncode.get_eff_features:88-113): reduction_3 = out of block 4
# (40ch, stride 8), reduction_4 = out of block 10 (112ch, stride 16),
# reduction_5 = out of block 15 (320ch, stride 32)
_RED3, _RED4, _RED5 = 4, 10, 15


class Up(nn.Module):
    """lss_submodule.Up:17-36 — upsample x1 by 2 (bilinear,
    align_corners=True), concat [x2, x1] on channels, two conv3x3-BN-ReLU."""

    out_ch: int
    dtype: object = None

    @nn.compact
    def __call__(self, x1, x2, train: bool = False):
        x1 = upsample2x_align_corners(x1)
        x = jnp.concatenate([x2, x1], axis=-1)
        for i in range(2):
            x = nn.Conv(self.out_ch, (3, 3), padding="SAME", use_bias=False,
                        dtype=self.dtype, name=f"conv{i}")(x)
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, dtype=self.dtype,
                             name=f"bn{i}")(x)
            x = nn.relu(x)
        return x


class EfficientNetB0Features(nn.Module):
    """The reference CamEncode's feature extractor: EfficientNet-b0 stem +
    16 MBConv blocks, reduction_5 + reduction_4 merged by up1 (and
    reduction_3 by up2 when downsample == 8) to 512-ch features.

    Parity: lss_submodule.py:40-113 (get_eff_features).
    """

    downsample: int = 8
    drop_connect_rate: float = 0.2
    dtype: object = None

    @nn.compact
    def __call__(self, imgs, train: bool = False):
        x = imgs if self.dtype is None else imgs.astype(self.dtype)
        x = nn.Conv(32, (3, 3), strides=(2, 2), padding="SAME",
                    use_bias=False, dtype=self.dtype, name="conv_stem")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.99,
                         epsilon=1e-3, dtype=self.dtype, name="bn0")(x)
        x = swish(x)
        in_ch = 32
        red3 = red4 = None
        n = len(_B0_BLOCKS)
        for i, (out_ch, k, s, e) in enumerate(_B0_BLOCKS):
            x = MBConv(in_ch=in_ch, out_ch=out_ch, kernel=k, stride=s,
                       expand=e,
                       drop_rate=self.drop_connect_rate * float(i) / n,
                       dtype=self.dtype, name=f"block{i}")(x, train)
            in_ch = out_ch
            if i == _RED3:
                red3 = x
            elif i == _RED4:
                red4 = x
        x = Up(512, dtype=self.dtype, name="up1")(x, red4, train)
        if self.downsample == 8:
            x = Up(512, dtype=self.dtype, name="up2")(x, red3, train)
        return x


class Bottleneck(nn.Module):
    """torchvision resnet Bottleneck: 1x1 -> 3x3/s -> 1x1(x4), BN after
    each, ReLU after add; 1x1/s downsample on the identity when shapes
    change."""

    width: int  # conv2 width; output is width * 4
    stride: int = 1
    dtype: object = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        out_ch = self.width * 4

        def bn(h, name):
            return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                epsilon=1e-5, dtype=self.dtype, name=name)(h)

        ident = x
        h = nn.Conv(self.width, (1, 1), use_bias=False, dtype=self.dtype,
                    name="conv1")(x)
        h = nn.relu(bn(h, "bn1"))
        # torch pads 3x3 stride-2 symmetrically (padding=1); SAME differs on
        # even dims, so pad explicitly
        h = nn.Conv(self.width, (3, 3), strides=(self.stride, self.stride),
                    padding=((1, 1), (1, 1)), use_bias=False,
                    dtype=self.dtype, name="conv2")(h)
        h = nn.relu(bn(h, "bn2"))
        h = nn.Conv(out_ch, (1, 1), use_bias=False, dtype=self.dtype,
                    name="conv3")(h)
        h = bn(h, "bn3")
        if x.shape[-1] != out_ch or self.stride != 1:
            ident = nn.Conv(out_ch, (1, 1),
                            strides=(self.stride, self.stride),
                            use_bias=False, dtype=self.dtype,
                            name="down_conv")(x)
            ident = bn(ident, "down_bn")
        return nn.relu(h + ident)


class ResNet101L2Features(nn.Module):
    """CamEncode_Resnet101's trunk (lss_submodule.py:155-205): resnet101
    conv1/bn1/relu/maxpool + layer1 (3 bottlenecks, width 64) + layer2
    (4 bottlenecks, width 128, first stride 2) -> 512-ch stride-8 map."""

    dtype: object = None

    @nn.compact
    def __call__(self, imgs, train: bool = False):
        x = imgs if self.dtype is None else imgs.astype(self.dtype)
        # torch conv1: 7x7/s2 padding=3 symmetric (SAME would pad (2,3) on
        # even dims)
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=((3, 3), (3, 3)),
                    use_bias=False, dtype=self.dtype, name="conv1")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype, name="bn1")(x)
        x = nn.relu(x)
        # torch maxpool k3/s2 padding=1: pad with -inf then VALID pool
        neg = jnp.finfo(x.dtype).min
        x = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)),
                    constant_values=neg)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding="VALID")
        for i in range(3):
            x = Bottleneck(64, 1, dtype=self.dtype,
                           name=f"layer1_{i}")(x, train)
        for i in range(4):
            x = Bottleneck(128, 2 if i == 0 else 1, dtype=self.dtype,
                           name=f"layer2_{i}")(x, train)
        return x
