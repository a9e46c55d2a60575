"""PIXOR: rasterized BEV occupancy encoder + dense one-stage header.

Parity: opencood/data_utils/pre_processor/bev_preprocessor.py (occupancy
raster: one-hot z slices + mean intensity channel) and
opencood/models/pixor.py (ResNet-style BEV backbone + Header emitting a
per-pixel classification map and a 6-dim regression map
(cos yaw, sin yaw, dx, dy, log w, log l) at stride 4; decode in
bev_postprocessor.py).

TPU version: the raster is an on-device unique-less scatter (occupancy is
a max of ones — duplicates harmless), the backbone reuses
ResNetBEVBackbone, and decode is a fixed-top-K peak picker.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from gencomm_tpu.models.backbones.resnet_bev import ResNetBEVBackbone


def rasterize_bev(points, point_mask, lidar_range, voxel_size):
    """(B, L, P, 4) points -> (B, L, ny, nx, nz+1) occupancy + intensity.

    Parity: bev_preprocessor.preprocess — cell = 1 where any point falls in
    the z slice; last channel = mean intensity per BEV cell.
    """
    b, l, p, _ = points.shape
    lr, vs = lidar_range, voxel_size
    nx = int(round((lr[3] - lr[0]) / vs[0]))
    ny = int(round((lr[4] - lr[1]) / vs[1]))
    nz = int(round((lr[5] - lr[2]) / vs[2]))
    pts = points.reshape(b * l * p, 4)
    ix = jnp.floor((pts[:, 0] - lr[0]) / vs[0]).astype(jnp.int32)
    iy = jnp.floor((pts[:, 1] - lr[1]) / vs[1]).astype(jnp.int32)
    iz = jnp.floor((pts[:, 2] - lr[2]) / vs[2]).astype(jnp.int32)
    inb = ((ix >= 0) & (ix < nx) & (iy >= 0) & (iy < ny)
           & (iz >= 0) & (iz < nz))
    valid = inb & point_mask.reshape(-1)
    agent = jax.lax.broadcasted_iota(jnp.int32, (b * l, p), 0).reshape(-1)
    ncell = ny * nx
    cell2d = jnp.clip(iy, 0, ny - 1) * nx + jnp.clip(ix, 0, nx - 1)
    gid3 = jnp.where(
        valid,
        (agent * ncell + cell2d) * nz + jnp.clip(iz, 0, nz - 1),
        b * l * ncell * nz,
    )
    occ = jnp.zeros((b * l * ncell * nz + 1,), jnp.float32)
    occ = occ.at[gid3].max(valid.astype(jnp.float32))
    occ = occ[:-1].reshape(b, l, ny, nx, nz)

    gid2 = jnp.where(valid, agent * ncell + cell2d, b * l * ncell)
    inten = jax.ops.segment_sum(
        pts[:, 3] * valid, gid2, num_segments=b * l * ncell + 1
    )
    cnt = jax.ops.segment_sum(
        valid.astype(jnp.float32), gid2, num_segments=b * l * ncell + 1
    )
    mean_i = (inten / jnp.maximum(cnt, 1.0))[:-1].reshape(b, l, ny, nx, 1)
    return jnp.concatenate([occ, mean_i], axis=-1)


class PIXOREncoder(nn.Module):
    """Raster -> ResNet BEV backbone (pixor.py BackBone role)."""

    voxel_size: Tuple[float, float, float]
    lidar_range: Tuple[float, float, float, float, float, float]

    @nn.compact
    def __call__(self, points, point_mask, train: bool = False):
        bev = rasterize_bev(points, point_mask, self.lidar_range,
                            self.voxel_size)
        b, l = bev.shape[:2]
        flat = bev.reshape((b * l,) + bev.shape[2:])
        feat = ResNetBEVBackbone(
            layer_nums=(2, 2, 2),
            layer_strides=(2, 2, 2),
            num_filters=(64, 128, 192),
            upsample_strides=(1, 2, 4),
            num_upsample_filters=(64, 64, 64),
            resnext=False,
            name="backbone",
        )(flat, train)
        return feat.reshape((b, l) + feat.shape[1:])


class PIXORHeader(nn.Module):
    """pixor.py Header:217-254 — per-pixel cls (1) + reg (6)."""

    @nn.compact
    def __call__(self, x, train: bool = False):
        h = x
        for i in range(4):
            h = nn.Conv(96, (3, 3), padding="SAME", use_bias=False,
                        name=f"conv{i}")(h)
            h = nn.BatchNorm(use_running_average=not train, momentum=0.99,
                             epsilon=1e-3)(h)
            h = nn.relu(h)
        cls = nn.Conv(1, (3, 3), padding="SAME", name="clshead")(h)
        reg = nn.Conv(6, (3, 3), padding="SAME", name="reghead")(h)
        return cls, reg


from gencomm_tpu.registry import MODELS, LOSSES


@MODELS.register("pixor")
@MODELS.register("pixor_intermediate")
class PIXORModel(nn.Module):
    """pixor.py PIXOR:256+ — raster encoder + header; collaboration via
    the standard warp+fusion family on the BEV features."""

    voxel_size: Tuple[float, float, float]
    lidar_range: Tuple[float, float, float, float, float, float]
    fusion_method: str = "att"
    feat_dim: int = 192

    @nn.compact
    def __call__(self, batch, train: bool = False):
        from gencomm_tpu.models.fuse.fusion import build_fusion
        from gencomm_tpu.utils.transformation_utils import (
            normalize_pairwise_tfm,
        )

        feat = PIXOREncoder(
            voxel_size=self.voxel_size, lidar_range=self.lidar_range,
            name="encoder",
        )(batch["points_m1"], batch["point_mask_m1"], train)
        hm = self.lidar_range[4] - self.lidar_range[1]
        wm = self.lidar_range[3] - self.lidar_range[0]
        affine = normalize_pairwise_tfm(
            batch["pairwise_t_matrix"], hm, wm, 1.0
        ).astype(jnp.float32)
        fused = build_fusion(
            self.fusion_method, {"att": {"feat_dim": feat.shape[-1]}},
            name="fusion_net",
        )(feat, affine, batch["agent_mask"], train)
        cls, reg = PIXORHeader(name="header")(fused, train)
        return {"cls_preds": cls, "reg_preds": reg}


@LOSSES.register("pixor_loss")
class PixorLoss:
    """opencood/loss/pixor_loss.py: per-pixel BCE-focal cls + smooth L1 on
    the 6-dim targets where a box center falls (on-the-fly targets from
    gt_boxes)."""

    def __init__(self, args: dict):
        self.alpha = args.get("alpha", 0.25)
        self.gamma = args.get("gamma", 2.0)
        self.cls_weight = args.get("cls_weight", 1.0)
        self.reg_weight = args.get("reg_weight", 1.0)
        self.lidar_range = tuple(args["lidar_range"])
        self.cell = args.get("cell", 1.6)  # voxel * stride4

    def __call__(self, output: dict, target: dict, suffix: str = "") -> dict:
        cls = output["cls_preds"][..., 0]
        reg = output["reg_preds"]
        b, h, w = cls.shape
        lr, cell = self.lidar_range, self.cell

        def targets_one(gt_boxes, gt_mask):
            cx = jnp.clip(((gt_boxes[:, 0] - lr[0]) / cell - 0.5
                           ).astype(jnp.int32), 0, w - 1)
            cy = jnp.clip(((gt_boxes[:, 1] - lr[1]) / cell - 0.5
                           ).astype(jnp.int32), 0, h - 1)
            pos = jnp.zeros((h, w))
            pos = pos.at[cy, cx].max(gt_mask)
            # (cos, sin, dx, dy, log w, log l) at centers
            dx = gt_boxes[:, 0] - (lr[0] + (cx + 0.5) * cell)
            dy = gt_boxes[:, 1] - (lr[1] + (cy + 0.5) * cell)
            tvec = jnp.stack(
                [jnp.cos(gt_boxes[:, 6]), jnp.sin(gt_boxes[:, 6]), dx, dy,
                 jnp.log(jnp.maximum(gt_boxes[:, 4], 1e-3)),
                 jnp.log(jnp.maximum(gt_boxes[:, 5], 1e-3))], axis=-1,
            )
            tmap = jnp.zeros((h, w, 6))
            tmap = tmap.at[cy, cx].set(tvec * gt_mask[:, None])
            return pos, tmap

        pos, tmap = jax.vmap(targets_one)(
            target["gt_boxes"], target["gt_mask"]
        )
        prob = jax.nn.sigmoid(cls)
        pt = pos * prob + (1 - pos) * (1 - prob)
        alpha_w = pos * self.alpha + (1 - pos) * (1 - self.alpha)
        bce = jnp.clip(cls, 0, None) - cls * pos + jnp.log1p(
            jnp.exp(-jnp.abs(cls))
        )
        cls_loss = ((1 - pt) ** self.gamma * alpha_w * bce).sum() / jnp.clip(
            pos.sum(), 1.0, None
        )
        diff = jnp.abs(reg - tmap) * pos[..., None]
        reg_loss = jnp.where(diff < 1.0, 0.5 * diff ** 2, diff - 0.5).sum() \
            / jnp.clip(pos.sum() * 6, 1.0, None)
        total = self.cls_weight * cls_loss + self.reg_weight * reg_loss
        return {"cls_loss": cls_loss, "reg_loss": reg_loss,
                "total_loss": total}


def decode_pixor(cls_map, reg_map, lidar_range, stride: float,
                 score_threshold: float = 0.2, topk: int = 128):
    """bev_postprocessor decode: per-pixel (cos, sin, dx, dy, logw, logl)
    -> top-K (x, y, yaw, w, l) boxes + scores (fixed-size, jittable)."""
    h, w = cls_map.shape[:2]
    prob = jax.nn.sigmoid(cls_map[..., 0]).reshape(-1)
    cos_t, sin_t = reg_map[..., 0], reg_map[..., 1]
    dx, dy = reg_map[..., 2], reg_map[..., 3]
    logw, logl = reg_map[..., 4], reg_map[..., 5]
    gy = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
    gx = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
    cell = stride
    px = lidar_range[0] + (gx + 0.5) * cell + dx
    py = lidar_range[1] + (gy + 0.5) * cell + dy
    yaw = jnp.arctan2(sin_t, cos_t)
    boxes = jnp.stack(
        [px, py, yaw, jnp.exp(logw), jnp.exp(logl)], axis=-1
    ).reshape(-1, 5)
    scores, idx = jax.lax.top_k(prob, topk)
    sel = boxes[idx]
    valid = scores > score_threshold
    return sel, scores, valid
