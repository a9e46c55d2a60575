"""PointPillars encoder, TPU-first.

Reference pipeline (opencood/models/heter_encoders.py:22-50):
  spconv CPU voxelizer -> PillarVFE (pillar_vfe.py:56-155, PFN max-pool over
  voxel lists) -> PointPillarScatter (point_pillar_scatter.py:19-76).

TPU redesign: no voxel lists. Points are decorated per-point (cluster/center
offsets via segment_sum over dense pillar ids), passed through the PFN linear
stack as ONE large matmul over all points of all agents (MXU-friendly), then
segment_max-scattered directly onto the dense (ny, nx, C) canvas
(see gencomm_tpu/ops/voxel.py).

Input convention: points (B, L, P, 4) padded + point_mask (B, L, P).
Output: (B, L, ny, nx, C) NHWC BEV features.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from gencomm_tpu.ops import voxel as vox


class PFNLayer(nn.Module):
    """Linear + masked BN + ReLU over points (reference pillar_vfe.py:10-53).

    BN statistics are computed over *valid* points only (the reference
    includes zero-padded voxel slots in its BatchNorm1d — a quirk we do not
    reproduce; we train our own weights).
    """

    features: int
    use_norm: bool = True

    @nn.compact
    def __call__(self, x, valid, train: bool = False):
        # x: (N, D), valid: (N,)
        x = nn.Dense(self.features, use_bias=not self.use_norm)(x)
        if self.use_norm:
            x = MaskedBatchNorm()(x, valid, train)
        return nn.relu(x)


class MaskedBatchNorm(nn.Module):
    """BatchNorm over axis 0 restricted to valid rows."""

    momentum: float = 0.99
    epsilon: float = 1e-3

    @nn.compact
    def __call__(self, x, valid, train: bool = False):
        c = x.shape[-1]
        ra_mean = self.variable("batch_stats", "mean", lambda: jnp.zeros((c,)))
        ra_var = self.variable("batch_stats", "var", lambda: jnp.ones((c,)))
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))

        if train:
            vf = valid.astype(x.dtype)[:, None]
            n = jnp.maximum(vf.sum(), 1.0)
            mean = (x * vf).sum(axis=0) / n
            var = ((x - mean) ** 2 * vf).sum(axis=0) / n
            if not self.is_initializing():
                ra_mean.value = self.momentum * ra_mean.value + (1 - self.momentum) * mean
                ra_var.value = self.momentum * ra_var.value + (1 - self.momentum) * var
        else:
            mean, var = ra_mean.value, ra_var.value
        y = (x - mean) * jax.lax.rsqrt(var + self.epsilon)
        return y * scale + bias


class PointPillarEncoder(nn.Module):
    """Full PointPillars BEV encoder over the padded agent grid."""

    voxel_size: Tuple[float, float, float]
    lidar_range: Tuple[float, float, float, float, float, float]
    num_filters: Sequence[int] = (64,)
    use_norm: bool = True
    max_points_per_pillar: int = 0  # 0 = uncapped (TPU default)

    @property
    def grid(self) -> Tuple[int, int]:
        nx = int(round((self.lidar_range[3] - self.lidar_range[0]) / self.voxel_size[0]))
        ny = int(round((self.lidar_range[4] - self.lidar_range[1]) / self.voxel_size[1]))
        return nx, ny

    @nn.compact
    def __call__(self, points, point_mask, train: bool = False):
        # points: (B, L, P, 4); point_mask: (B, L, P)
        b, l, p, d = points.shape
        nx, ny = self.grid
        flat_pts = points.reshape(b * l, p, d)
        flat_mask = point_mask.reshape(b * l, p)

        # One flat scatter across all agents (no vmapped segment ops — a
        # single big HBM scatter compiles and runs far better on TPU).
        x, gids, valid = vox.pillar_decorate_flat(
            flat_pts, flat_mask, self.lidar_range, self.voxel_size, nx, ny
        )

        # PFN over ALL points at once (one big matmul on the MXU)
        for f in self.num_filters:
            x = PFNLayer(features=f, use_norm=self.use_norm)(x, valid, train)

        canvas = vox.scatter_pillar_max_flat(x, gids, valid, b * l, nx, ny)
        return canvas.reshape(b, l, ny, nx, x.shape[-1])
