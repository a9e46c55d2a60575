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

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(
            self.features,
            (self.kernel, self.kernel),
            strides=(self.stride, self.stride),
            padding="SAME",
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

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.ConvTranspose(
            self.features,
            (self.stride, self.stride),
            strides=(self.stride, self.stride),
            padding="VALID",
            use_bias=False,
        )(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.99, epsilon=1e-3)(x)
        return nn.relu(x)


class DoubleConv(nn.Module):
    """Two 3x3-ish convs with ReLU (reference: sub_modules/downsample_conv.py
    DoubleConv)."""

    features: int
    kernel: int = 3
    stride: int = 1

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(
            self.features,
            (self.kernel, self.kernel),
            strides=(self.stride, self.stride),
            padding="SAME",
        )(x)
        x = nn.relu(x)
        x = nn.Conv(self.features, (3, 3), padding="SAME")(x)
        return nn.relu(x)


class DownsampleConv(nn.Module):
    """Shrink header (reference: sub_modules/downsample_conv.py:30-50)."""

    dims: Sequence[int]
    kernels: Sequence[int]
    strides: Sequence[int]

    @nn.compact
    def __call__(self, x):
        for k, d, s in zip(self.kernels, self.dims, self.strides):
            x = DoubleConv(features=d, kernel=k, stride=s)(x)
        return x

    @staticmethod
    def from_config(cfg: dict) -> "DownsampleConv":
        return DownsampleConv(
            dims=tuple(cfg["dim"]),
            kernels=tuple(cfg["kernal_size"]),  # reference spelling
            strides=tuple(cfg["stride"]),
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
