"""SECOND encoder: MeanVFE -> VoxelBackBone8x -> HeightCompression,
built on the TPU sparse-conv ops (gencomm_tpu/ops/sparse.py).

Parity: opencood/models/heter_encoders.py:52-81 +
sub_modules/sparse_backbone_3d.py (VoxelBackBone8x — channel/stride plan:
subm 16 -> [spconv s2 32, subm, subm] -> [spconv s2 64, subm, subm] ->
[spconv s2 p(0,1,1) 64, subm, subm] -> spconv (3,1,1) s(2,1,1) 128,
BatchNorm1d(eps 1e-3) + ReLU after every conv) + height compression
reshaping the final (z=2, 128ch) volume to a 256-channel BEV map.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np
import jax.numpy as jnp
import flax.linen as nn

from gencomm_tpu.ops import sparse as sp
from gencomm_tpu.models.encoders.point_pillar import MaskedBatchNorm


class SubMConvBlock(nn.Module):
    out_ch: int
    kernel: Tuple[int, int, int] = (3, 3, 3)

    @nn.compact
    def __call__(self, feats, coords, valid, grid, sorted_keys, sorted_idx,
                 train: bool = False):
        w = self.param(
            "kernel",
            nn.initializers.lecun_normal(batch_axis=(0, 1, 2)),
            (*self.kernel, feats.shape[-1], self.out_ch),
        )
        out = sp.subm_conv3d(
            feats, coords, valid, w, grid,
            sorted_keys=sorted_keys, sorted_idx=sorted_idx,
        )
        out = MaskedBatchNorm()(out, valid, train)
        return nn.relu(out) * valid[:, None]


class SpConvDownBlock(nn.Module):
    out_ch: int
    stride: Tuple[int, int, int]
    padding: Tuple[int, int, int]
    out_capacity: int
    kernel: Tuple[int, int, int] = (3, 3, 3)

    @nn.compact
    def __call__(self, feats, coords, valid, grid, train: bool = False):
        w = self.param(
            "kernel",
            nn.initializers.lecun_normal(batch_axis=(0, 1, 2)),
            (*self.kernel, feats.shape[-1], self.out_ch),
        )
        out, ocoords, ovalid, ogrid = sp.spconv3d_downsample(
            feats, coords, valid, w, grid, self.stride, self.padding,
            self.out_capacity,
        )
        out = MaskedBatchNorm()(out, ovalid, train)
        return nn.relu(out) * ovalid[:, None], ocoords, ovalid, ogrid


class SECONDEncoder(nn.Module):
    """Full SECOND BEV encoder over the padded agent grid.

    Input points (B, L, P, 4) -> BEV (B, L, H/8, W/8, 2*out_ch).
    """

    voxel_size: Tuple[float, float, float]
    lidar_range: Tuple[float, float, float, float, float, float]
    voxel_capacity_per_agent: int = 32000
    out_ch: int = 128

    @property
    def grid(self) -> Tuple[int, int, int]:
        nx = int(round((self.lidar_range[3] - self.lidar_range[0]) / self.voxel_size[0]))
        ny = int(round((self.lidar_range[4] - self.lidar_range[1]) / self.voxel_size[1]))
        nz = int(round((self.lidar_range[5] - self.lidar_range[2]) / self.voxel_size[2]))
        # spconv convention: sparse z dim = grid_z + 1 (sparse_backbone_3d.py:39)
        return (nz + 1, ny, nx)

    def _subm_stack(self, n, ch, feats, coords, valid, grid, name, train):
        keys = sp.linear_key(coords, grid, valid)
        sorted_keys, sorted_idx = sp.build_index(keys)
        for i in range(n):
            feats = SubMConvBlock(ch, name=f"{name}_{i}")(
                feats, coords, valid, grid, sorted_keys, sorted_idx, train
            )
        return feats

    @nn.compact
    def __call__(self, points, point_mask, train: bool = False):
        b, l, p, _ = points.shape
        grid = self.grid
        cap = self.voxel_capacity_per_agent * b * l

        feats, coords, valid = sp.voxelize_mean(
            points.reshape(b * l, p, -1),
            point_mask.reshape(b * l, p),
            self.lidar_range, self.voxel_size, grid, cap,
        )

        # conv_input + conv1: submanifold 16 (shared indice key 'subm1')
        feats = self._subm_stack(2, 16, feats, coords, valid, grid,
                                 "subm1", train)
        # conv2: spconv s2 -> 32 + 2 subm
        feats, coords, valid, grid = SpConvDownBlock(
            32, (2, 2, 2), (1, 1, 1), cap, name="down2"
        )(feats, coords, valid, grid, train)
        feats = self._subm_stack(2, 32, feats, coords, valid, grid,
                                 "subm2", train)
        # conv3: spconv s2 -> 64 + 2 subm
        feats, coords, valid, grid = SpConvDownBlock(
            64, (2, 2, 2), (1, 1, 1), cap // 2, name="down3"
        )(feats, coords, valid, grid, train)
        feats = self._subm_stack(2, 64, feats, coords, valid, grid,
                                 "subm3", train)
        # conv4: spconv s2 p(0,1,1) -> 64 + 2 subm
        feats, coords, valid, grid = SpConvDownBlock(
            64, (2, 2, 2), (0, 1, 1), cap // 4, name="down4"
        )(feats, coords, valid, grid, train)
        feats = self._subm_stack(2, 64, feats, coords, valid, grid,
                                 "subm4", train)
        # conv_out: (3,1,1) s(2,1,1) p0 -> out_ch
        feats, coords, valid, grid = SpConvDownBlock(
            self.out_ch, (2, 1, 1), (0, 0, 0), cap // 4,
            kernel=(3, 1, 1), name="down_out",
        )(feats, coords, valid, grid, train)

        # HeightCompression: dense (A, D, H, W, C) -> (B, L, H, W, D*C)
        dense = sp.scatter_to_dense(feats, coords, valid, grid, b * l)
        a, d, h, w, c = dense.shape
        bev = jnp.transpose(dense, (0, 2, 3, 1, 4)).reshape(a, h, w, d * c)
        return bev.reshape(b, l, h, w, d * c)
