"""Shared flax building blocks.

NHWC layout throughout (TPU-native conv layout). BatchNorm uses the
reference's eps=1e-3 / torch-momentum 0.01 (flax momentum 0.99).
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp


class ConvBNReLU(nn.Module):
    features: int
    kernel: int = 3
    stride: int = 1
    use_bn: bool = True
    # compute dtype for activations (params stay fp32). bf16 halves HBM
    # traffic on TPU and keeps the MXU in its native precision.
    dtype: object = None
    # torch_pad: explicit symmetric (k-1)//2 padding, matching torch's
    # Conv2d(padding=k//2). Identical to SAME for stride 1 (and for stride
    # 2 on odd dims); on EVEN dims at stride 2 SAME pads (0,1) while torch
    # pads (1,1), which shifts the window alignment — modules whose
    # reference runs on even grids (SSFA) must set this for parity.
    torch_pad: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        p = (self.kernel - 1) // 2
        x = nn.Conv(
            self.features,
            (self.kernel, self.kernel),
            strides=(self.stride, self.stride),
            padding=((p, p), (p, p)) if self.torch_pad else "SAME",
            use_bias=not self.use_bn,
            dtype=self.dtype,
        )(x)
        if self.use_bn:
            x = nn.BatchNorm(
                use_running_average=not train, momentum=0.99, epsilon=1e-3,
                dtype=self.dtype,
            )(x)
        return nn.relu(x)


class DeconvBNReLU(nn.Module):
    features: int
    stride: int = 2
    dtype: object = None
    # kernel defaults to stride (the reference BEV backbone's k==s deconvs);
    # kernel > stride reproduces torch ConvTranspose2d(k, s, p=(k-1)//2,
    # output_padding=s-1) — the standard "2x upsample" deconv (e.g. SSFA's
    # k3/s2/p1/op1, cia_ssd_utils.py:21-24) via explicit LHS padding
    # (k-1-p, k-1-p+op)
    kernel: int = 0

    @nn.compact
    def __call__(self, x, train: bool = False):
        k = self.kernel or self.stride
        if k == self.stride:
            pad = "VALID"
        else:
            p = (k - 1) // 2
            op = self.stride - 1
            pad = ((k - 1 - p, k - 1 - p + op),) * 2
        x = nn.ConvTranspose(
            self.features,
            (k, k),
            strides=(self.stride, self.stride),
            padding=pad,
            use_bias=False,
            dtype=self.dtype,
        )(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.99,
                         epsilon=1e-3, dtype=self.dtype)(x)
        return nn.relu(x)


class DoubleConv(nn.Module):
    """Two 3x3-ish convs with ReLU (reference: sub_modules/downsample_conv.py
    DoubleConv)."""

    features: int
    kernel: int = 3
    stride: int = 1
    dtype: object = None

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(
            self.features,
            (self.kernel, self.kernel),
            strides=(self.stride, self.stride),
            padding="SAME",
            dtype=self.dtype,
        )(x)
        x = nn.relu(x)
        x = nn.Conv(self.features, (3, 3), padding="SAME",
                    dtype=self.dtype)(x)
        return nn.relu(x)


class DownsampleConv(nn.Module):
    """Shrink header (reference: sub_modules/downsample_conv.py:30-50)."""

    dims: Sequence[int]
    kernels: Sequence[int]
    strides: Sequence[int]
    dtype: object = None

    @nn.compact
    def __call__(self, x):
        for k, d, s in zip(self.kernels, self.dims, self.strides):
            x = DoubleConv(features=d, kernel=k, stride=s,
                           dtype=self.dtype)(x)
        return x

    @staticmethod
    def from_config(cfg: dict, dtype=None) -> "DownsampleConv":
        return DownsampleConv(
            dims=tuple(cfg["dim"]),
            kernels=tuple(cfg["kernal_size"]),  # reference spelling
            strides=tuple(cfg["stride"]),
            dtype=dtype,
        )


class NaiveCompressor(nn.Module):
    """Conv autoencoder channel compressor
    (reference: sub_modules/naive_compress.py)."""

    input_dim: int
    compress_ratio: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        hidden = self.input_dim // self.compress_ratio
        x = ConvBNReLU(hidden, kernel=3)(x, train)
        x = ConvBNReLU(self.input_dim, kernel=3)(x, train)
        x = nn.Conv(self.input_dim, (3, 3), padding="SAME", use_bias=False)(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.99, epsilon=1e-3)(x)
        return nn.relu(x)


def flatten_agents(x: jnp.ndarray) -> jnp.ndarray:
    """(B, L, ...) -> (B*L, ...)."""
    return x.reshape((-1,) + x.shape[2:])


def unflatten_agents(x: jnp.ndarray, b: int, l: int) -> jnp.ndarray:
    return x.reshape((b, l) + x.shape[1:])
