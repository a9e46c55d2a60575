"""VoxelNet encoder, TPU-first.

Parity: opencood/models/voxel_net.py (VFE stacks + Conv3d middle layers +
dense reshape; the legacy voxel_preprocessor.py numba voxelizer becomes the
same flat-scatter formulation as the pillar path, with z-binned voxel ids).

Pipeline: points -> 3D voxel ids -> per-point decorate (7-dim: xyzi +
cluster offsets, voxel_net.py VFE input) -> two VFE stages (linear + BN +
ReLU + voxel-max broadcast concat, voxel_net.py:77-106) -> scatter to the
dense (D, ny, nx, C) grid -> 3 Conv3D middle layers (64 ch, z-strided,
voxel_net.py ConvMiddleLayer) -> z-collapse to a BEV canvas.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn


class VFELayer(nn.Module):
    """FCN + voxel-wise max concat (voxel_net.py:60-106)."""

    out_ch: int

    @nn.compact
    def __call__(self, x, gids, valid, num_segments: int):
        half = self.out_ch // 2
        h = nn.Dense(half, use_bias=False)(x)
        # masked batch norm over valid points
        from gencomm_tpu.models.encoders.point_pillar import MaskedBatchNorm

        h = nn.relu(MaskedBatchNorm()(h, valid, False))
        neg = jnp.finfo(h.dtype).min
        vmax = jax.ops.segment_max(
            jnp.where(valid[:, None], h, neg), gids,
            num_segments=num_segments,
        )
        vmax = jnp.where(jnp.isfinite(vmax), vmax, 0.0)
        return jnp.concatenate([h, vmax[gids]], axis=-1) * valid[:, None]


class VoxelNetEncoder(nn.Module):
    voxel_size: Tuple[float, float, float]
    lidar_range: Tuple[float, float, float, float, float, float]
    vfe_filters: Sequence[int] = (32, 128)
    mid_ch: int = 64

    @property
    def grid(self):
        nx = int(round((self.lidar_range[3] - self.lidar_range[0])
                       / self.voxel_size[0]))
        ny = int(round((self.lidar_range[4] - self.lidar_range[1])
                       / self.voxel_size[1]))
        nz = int(round((self.lidar_range[5] - self.lidar_range[2])
                       / self.voxel_size[2]))
        return nx, ny, nz

    @nn.compact
    def __call__(self, points, point_mask, train: bool = False):
        # points: (B, L, P, 4)
        b, l, p, d = points.shape
        nx, ny, nz = self.grid
        ncell = nx * ny * nz
        pts = points.reshape(b * l * p, d)
        x, y, z = pts[:, 0], pts[:, 1], pts[:, 2]
        lr, vs = self.lidar_range, self.voxel_size
        ix = jnp.floor((x - lr[0]) / vs[0]).astype(jnp.int32)
        iy = jnp.floor((y - lr[1]) / vs[1]).astype(jnp.int32)
        iz = jnp.floor((z - lr[2]) / vs[2]).astype(jnp.int32)
        inb = (
            (ix >= 0) & (ix < nx) & (iy >= 0) & (iy < ny)
            & (iz >= 0) & (iz < nz)
        )
        valid = inb & point_mask.reshape(-1)
        agent = jax.lax.broadcasted_iota(
            jnp.int32, (b * l, p), 0
        ).reshape(-1)
        cell = (iz * ny + iy) * nx + ix
        gids = jnp.where(valid, agent * ncell + jnp.clip(cell, 0, ncell - 1),
                         b * l * ncell)
        nseg = b * l * ncell + 1

        # decorate: xyzi + cluster offset (voxel_net VFE takes 7-dim)
        vf = valid[:, None].astype(pts.dtype)
        sums4 = jax.ops.segment_sum(
            jnp.concatenate([pts[:, :3], jnp.ones_like(vf)], -1) * vf,
            gids, num_segments=nseg,
        )
        mean = sums4[:, :3] / jnp.maximum(sums4[:, 3:4], 1.0)
        feat = jnp.concatenate([pts, pts[:, :3] - mean[gids]], -1) * vf

        for f in self.vfe_filters:
            feat = VFELayer(out_ch=f, name=f"vfe_{f}")(feat, gids, valid,
                                                       nseg)
        # voxel feature = max over points
        neg = jnp.finfo(feat.dtype).min
        vox = jax.ops.segment_max(
            jnp.where(valid[:, None], feat, neg), gids, num_segments=nseg
        )
        vox = jnp.where(jnp.isfinite(vox), vox, 0.0)[: b * l * ncell]
        dense = vox.reshape(b * l, nz, ny, nx, feat.shape[-1])

        # Conv3D middle layers (voxel_net.py ConvMiddleLayer): z-strided
        h = dense
        for i, (stride_z) in enumerate((2, 1, 2)):
            h = nn.Conv(
                self.mid_ch, (3, 3, 3), strides=(stride_z, 1, 1),
                padding=((1, 1), (1, 1), (1, 1)), use_bias=False,
                name=f"mid_{i}",
            )(h)
            h = nn.BatchNorm(use_running_average=not train, momentum=0.99,
                             epsilon=1e-3)(h)
            h = nn.relu(h)
        # z-collapse: concat remaining z slices onto channels
        bl, dz, hy, wx, c = h.shape
        bev = h.transpose(0, 2, 3, 1, 4).reshape(bl, hy, wx, dz * c)
        return bev.reshape(b, l, hy, wx, dz * c)
