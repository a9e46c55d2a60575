"""FPV-RCNN: two-stage keypoint-refined cooperative detector.

Parity targets:
  opencood/models/fpvrcnn.py:19-89            (CIASSD stage 1 + VSA +
                                               Matcher + RoIHead)
  opencood/models/sub_modules/vsa.py:45-273   (VoxelSetAbstraction)
  opencood/models/sub_modules/matcher.py:16-181 (IoU clustering + weighted
                                               cluster fusion of proposals)
  opencood/models/sub_modules/roi_head.py:14-285 (6x6x6 grid pool + FC
                                               cls/iou/reg refinement)
  opencood/pcdet_utils/roiaware_pool3d          (points_in_boxes_gpu ->
                                               vectorized rotated test here)

TPU design: every dynamic structure becomes a fixed-capacity array + mask —
K_PROP proposals/agent (NMS'd stage-1 decode), K_KP keypoints/agent (masked
FPS), clusters live on the concatenated (L*K_PROP) axis with segment ops,
R_ROI fused boxes/sample. The whole second stage is jit/vmap over the batch.
"""

from __future__ import annotations

from typing import Any, Dict, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from gencomm_tpu.models.ciassd import _SecondTrunk
from gencomm_tpu.models.backbones.ssfa import SSFA, IoUAwareHead
from gencomm_tpu.ops.pointnet2 import (
    farthest_point_sample,
    radius_group,
    masked_max_pool,
    bilinear_interpolate,
)
from gencomm_tpu.ops.rotated_iou import boxes_iou3d
from gencomm_tpu.registry import MODELS

_BIG = 1e9


def points_in_rotated_boxes(points, boxes, box_valid):
    """points (N, 3) x boxes (M, 7) lwh -> (N,) bool: inside any valid box.

    Replaces pcdet_utils/roiaware_pool3d points_in_boxes_gpu (vsa.py:200).
    """
    rel = points[:, None, :] - boxes[None, :, :3]  # (N, M, 3)
    yaw = boxes[:, 6]
    c, s = jnp.cos(yaw), jnp.sin(yaw)
    lx = rel[..., 0] * c[None] + rel[..., 1] * s[None]
    ly = -rel[..., 0] * s[None] + rel[..., 1] * c[None]
    inside = (
        (jnp.abs(lx) <= boxes[None, :, 3] / 2)
        & (jnp.abs(ly) <= boxes[None, :, 4] / 2)
        & (jnp.abs(rel[..., 2]) <= boxes[None, :, 5] / 2)
        & box_valid[None, :]
    )
    return inside.any(axis=-1)


def box_encode(boxes, anchors):
    """Residual-encode boxes (N, 7) lwh against anchor boxes (N, 7).

    Parity: box_utils.box_encode:1201-1263 (log-dim variant).
    """
    diag = jnp.clip(
        jnp.sqrt(anchors[:, 3] ** 2 + anchors[:, 4] ** 2), 1e-3, None
    )
    xt = (boxes[:, 0] - anchors[:, 0]) / diag
    yt = (boxes[:, 1] - anchors[:, 1]) / diag
    safe_dims = jnp.clip(anchors[:, 3:6], 1e-3, None)
    zt = (boxes[:, 2] - anchors[:, 2]) / safe_dims[:, 2]
    lt = jnp.log(jnp.clip(boxes[:, 3] / safe_dims[:, 0], 1e-6, None))
    wt = jnp.log(jnp.clip(boxes[:, 4] / safe_dims[:, 1], 1e-6, None))
    ht = jnp.log(jnp.clip(boxes[:, 5] / safe_dims[:, 2], 1e-6, None))
    rt = boxes[:, 6] - anchors[:, 6]
    return jnp.stack([xt, yt, zt, lt, wt, ht, rt], axis=-1)


def rotate_points_z(points, angle):
    """(N, K, 3) points rotated around z by per-row angle (N,)."""
    c, s = jnp.cos(angle), jnp.sin(angle)
    x = points[..., 0] * c[:, None] - points[..., 1] * s[:, None]
    y = points[..., 0] * s[:, None] + points[..., 1] * c[:, None]
    return jnp.stack([x, y, points[..., 2]], axis=-1)


# ---------------------------------------------------------------------------
# Matcher: IoU clustering + score-weighted proposal fusion (matcher.py:16-181)
# ---------------------------------------------------------------------------


def cluster_boxes(boxes, scores, valid, iou_thresh: float = 0.1):
    """Greedy IoU clustering over concatenated per-agent proposals.

    boxes (N, 7) lwh in ego frame, scores (N,), valid (N,) ->
    cluster_ids (N,) int32 in [0, N) (own index for noise), exactly the
    reference's first-unassigned-seeds-a-cluster sweep (matcher.py:76-84),
    vectorized: seeds are processed in score order via a fori_loop.
    """
    n = boxes.shape[0]
    iou = boxes_iou3d(boxes, boxes, order="lwh")
    adj = (iou > iou_thresh) & valid[None, :] & valid[:, None]

    def body(_, cid):
        unassigned = cid < 0
        any_left = unassigned.any()
        seed = jnp.argmax(unassigned)  # first unassigned index
        members = adj[seed] & unassigned
        new = jnp.where(members, seed, cid)
        return jnp.where(any_left, new, cid)

    cid0 = jnp.where(valid, -1, jnp.arange(n))  # invalid = own singleton
    cid = jax.lax.fori_loop(0, n, body, cid0)
    return cid


def fuse_clusters(boxes, scores, valid, cluster_ids):
    """Score-weighted box fusion per cluster (matcher.py:95-147).

    Returns fused boxes (N, 7), fused scores (N,), fused_valid (N,) — one
    entry per cluster seed (the seed's slot), others masked out.
    """
    n = boxes.shape[0]
    w = jnp.where(valid, scores, 0.0)
    seg = cluster_ids  # segment ids in [0, n)

    # per-cluster leader = member with max score (dominant direction ref)
    leader_score = jax.ops.segment_max(w, seg, num_segments=n)
    is_leader = valid & (w >= leader_score[seg] - 1e-12)
    # leader dir broadcast to members: take max over (is_leader * dir+offset)
    leader_dir = jax.ops.segment_max(
        jnp.where(is_leader, boxes[:, 6], -_BIG), seg, num_segments=n
    )
    dirs = boxes[:, 6]
    diff = jnp.abs(dirs - leader_dir[seg])
    diff = jnp.where(diff > jnp.pi, 2 * jnp.pi - diff, diff)
    gt_half = diff > jnp.pi / 2
    score_gt = jax.ops.segment_sum(
        jnp.where(gt_half, w, 0.0), seg, num_segments=n
    )
    score_le = jax.ops.segment_sum(
        jnp.where(gt_half, 0.0, w), seg, num_segments=n
    )
    flip_gt_group = score_gt[seg] <= score_le[seg]
    flip = jnp.where(flip_gt_group, gt_half, ~gt_half)
    dirs = jnp.where(flip, dirs + jnp.pi, dirs)
    dirs = dirs - jnp.floor(dirs / (2 * jnp.pi) + 0.5) * 2 * jnp.pi

    wsum = jax.ops.segment_sum(w, seg, num_segments=n)
    wn = w / jnp.clip(wsum[seg], 1e-9, None)
    sint = jax.ops.segment_sum(jnp.sin(dirs) * wn, seg, num_segments=n)
    cost = jax.ops.segment_sum(jnp.cos(dirs) * wn, seg, num_segments=n)
    theta = jnp.arctan2(sint, cost)
    center_dim = jax.ops.segment_sum(
        boxes[:, :6] * wn[:, None], seg, num_segments=n
    )
    fused = jnp.concatenate([center_dim, theta[:, None]], axis=-1)

    # fused score: sum of s_i^(rank+1) over desc-sorted member scores,
    # capped at 1 (matcher.py:123-129). Rank via counting higher scores in
    # the same cluster.
    same = (seg[:, None] == seg[None, :]) & valid[None, :] & valid[:, None]
    higher = same & (
        (w[None, :] > w[:, None])
        | ((w[None, :] == w[:, None])
           & (jnp.arange(n)[None, :] < jnp.arange(n)[:, None]))
    )
    rank = higher.sum(axis=-1)
    powed = jnp.where(valid, w ** (rank + 1), 0.0)
    s_fused = jnp.minimum(
        jax.ops.segment_sum(powed, seg, num_segments=n), 1.0
    )

    is_seed = valid & (jnp.arange(n) == seg)
    return fused, s_fused, is_seed


# ---------------------------------------------------------------------------
# Voxel Set Abstraction (vsa.py:45-273), sources: bev + raw_points
# ---------------------------------------------------------------------------


class StackSABranch(nn.Module):
    """One (radius, nsample, mlp) grouping branch of StackSAModuleMSG."""

    radius: float
    nsample: int
    mlp: Sequence[int]

    @nn.compact
    def __call__(self, src_xyz, src_valid, src_feats, new_xyz, new_valid):
        g_xyz, g_feats, ok = radius_group(
            src_xyz, src_valid, src_feats, new_xyz, new_valid,
            self.radius, self.nsample,
        )
        x = jnp.concatenate([g_xyz, g_feats], axis=-1)
        for i, ch in enumerate(self.mlp):
            x = nn.Dense(ch, use_bias=False, name=f"mlp{i}")(x)
            x = nn.relu(x)
        return masked_max_pool(x, ok)


class VoxelSetAbstraction(nn.Module):
    """Keypoint features from BEV interpolation + raw-point SA branches."""

    num_keypoints: int = 512
    out_features: int = 32
    radii: Sequence[float] = (0.4, 0.8)
    nsamples: Sequence[int] = (16, 16)
    mlps: Sequence[Sequence[int]] = ((16, 16), (16, 16))
    bev_stride: int = 8
    voxel_size: Tuple[float, float, float] = (0.1, 0.1, 0.1)
    lidar_range: Tuple[float, ...] = (0, 0, 0, 1, 1, 1)

    @nn.compact
    def __call__(self, points, point_mask, bev, det_boxes, det_valid):
        """points (P, 4), point_mask (P,), bev (H, W, C),
        det_boxes (K, 7) lwh in agent frame, det_valid (K,) ->
        kp_xyz (M, 3), kp_feats (M, F), kp_valid (M,)."""
        xyz = points[:, :3]
        valid = point_mask > 0
        kp_idx = farthest_point_sample(xyz, valid, self.num_keypoints)
        kp = xyz[kp_idx]
        kp_valid = valid[kp_idx]
        # height window (vsa.py:186) + inside-enlarged-proposals
        # (vsa.py:188-204, enlarge_selection_boxes +0.5 m)
        kp_valid &= (kp[:, 2] > -2.8) & (kp[:, 2] < 1.0)
        enlarged = det_boxes.at[:, 3:6].add(0.5)
        kp_valid &= points_in_rotated_boxes(kp, enlarged, det_valid)

        feats = []
        # BEV bilinear interpolation (vsa.py:103-120)
        xi = (kp[:, 0] - self.lidar_range[0]) / (
            self.voxel_size[0] * self.bev_stride
        )
        yi = (kp[:, 1] - self.lidar_range[1]) / (
            self.voxel_size[1] * self.bev_stride
        )
        feats.append(bilinear_interpolate(bev, xi, yi))
        # raw-point SA branches (vsa.py:82-95,222-233); point intensity is
        # the (P, 1) feature channel
        for i, (r, ns, mlp) in enumerate(
            zip(self.radii, self.nsamples, self.mlps)
        ):
            feats.append(
                StackSABranch(
                    radius=r, nsample=ns, mlp=tuple(mlp),
                    name=f"sa_raw_{i}",
                )(xyz, valid, points[:, 3:4], kp, kp_valid)
            )
        x = jnp.concatenate(feats, axis=-1)
        x = nn.Dense(self.out_features, use_bias=False, name="fusion")(x)
        x = nn.relu(x)
        return kp, x * kp_valid[:, None], kp_valid


# ---------------------------------------------------------------------------
# RoI head (roi_head.py:14-285)
# ---------------------------------------------------------------------------


class RoIHead(nn.Module):
    grid_size: int = 6
    radii: Sequence[float] = (0.8, 1.6)
    nsamples: Sequence[int] = (16, 16)
    mlps: Sequence[Sequence[int]] = ((32, 32), (32, 32))
    fc_neurons: int = 256
    in_channels: int = 32

    @nn.compact
    def __call__(self, rois, roi_valid, kp_xyz, kp_feats, kp_valid):
        """rois (R, 7) lwh ego frame; keypoints merged over agents.
        Returns rcnn_cls/iou/reg (R, 1/1/7)."""
        r = rois.shape[0]
        g = self.grid_size
        # dense grid points in roi-local coords (roi_head.py:97-127)
        idx = jnp.stack(
            jnp.meshgrid(*[jnp.arange(g)] * 3, indexing="ij"), axis=-1
        ).reshape(-1, 3).astype(jnp.float32)  # (g^3, 3)
        local = (idx[None] + 0.5) / g * rois[:, None, 3:6] \
            - rois[:, None, 3:6] / 2
        global_pts = rotate_points_z(local, rois[:, 6]) + rois[:, None, :3]
        queries = global_pts.reshape(-1, 3)  # (R*g^3, 3)
        q_valid = jnp.repeat(roi_valid, g * g * g)

        pooled = []
        for i, (rad, ns, mlp) in enumerate(
            zip(self.radii, self.nsamples, self.mlps)
        ):
            pooled.append(
                StackSABranch(
                    radius=rad, nsample=ns, mlp=tuple(mlp),
                    name=f"sa_grid_{i}",
                )(kp_xyz, kp_valid, kp_feats, queries, q_valid)
            )
        x = jnp.concatenate(pooled, axis=-1).reshape(r, -1)  # (R, g^3*C)

        shared = x
        for i in range(2):
            shared = nn.Dense(
                self.fc_neurons, use_bias=False, name=f"shared_fc{i}"
            )(shared)
            shared = nn.relu(shared)

        def _branch(h, out_ch, name):
            for i in range(2):
                h = nn.Dense(
                    self.fc_neurons, use_bias=False, name=f"{name}_fc{i}"
                )(h)
                h = nn.relu(h)
            return nn.Dense(out_ch, name=f"{name}_out")(h)

        return {
            "rcnn_cls": _branch(shared, 1, "cls"),
            "rcnn_iou": _branch(shared, 1, "iou"),
            "rcnn_reg": _branch(shared, 7, "reg"),
        }


def assign_roi_targets(rois, roi_valid, gt_boxes, gt_mask):
    """Stage-2 targets (roi_head.py:133-221). rois/gt lwh, ego frame.

    Returns dict of (R, ...) arrays: cls_tgt, iou_tgt, reg_tgt.
    """
    # invalid slots get the reference's placeholder box (matcher.py:66:
    # [0, 0, 0, 1, 1, 1, 1.57]) so box_encode never divides by zero
    dummy = jnp.array([0.0, 0.0, 0.0, 1.0, 1.0, 1.0, 1.57], rois.dtype)
    rois = jnp.where(roi_valid[:, None] > 0, rois, dummy[None])
    iou = boxes_iou3d(rois, gt_boxes, order="lwh")
    iou = jnp.where(gt_mask[None, :] > 0, iou, 0.0)
    max_iou = iou.max(axis=-1)
    gt_idx = jnp.argmax(iou, axis=-1)
    gt_of_rois = gt_boxes[gt_idx]
    labels = (max_iou > 0.3).astype(jnp.float32) * roi_valid

    # negatives regress to themselves (no correction)
    gt_of_rois = jnp.where(labels[:, None] > 0, gt_of_rois, rois)

    # canonical transform: roi-centered, yaw-aligned
    roi_ry = rois[:, 6] % (2 * jnp.pi)
    rel = gt_of_rois.at[:, :3].add(-rois[:, :3])
    rel = rel.at[:, 6].add(-roi_ry)
    xy = rotate_points_z(rel[:, None, :3], -roi_ry)[:, 0]
    rel = rel.at[:, :3].set(xy)

    # heading flip into (-pi/2, pi/2) (roi_head.py:175-192)
    heading = rel[:, 6] % (2 * jnp.pi)
    opposite = (heading > jnp.pi * 0.5) & (heading < jnp.pi * 1.5)
    heading = jnp.where(opposite, (heading + jnp.pi) % (2 * jnp.pi), heading)
    heading = jnp.where(heading > jnp.pi, heading - 2 * jnp.pi, heading)
    heading = jnp.clip(heading, -jnp.pi / 2, jnp.pi / 2)
    rel = rel.at[:, 6].set(heading)

    anchor = rois.at[:, :3].set(0.0).at[:, 6].set(0.0)
    reg_tgt = box_encode(rel, anchor)
    return {"cls_tgt": labels, "iou_tgt": max_iou, "reg_tgt": reg_tgt}


# ---------------------------------------------------------------------------
# Full model
# ---------------------------------------------------------------------------


@MODELS.register("fpvrcnn")
class FPVRCNN(nn.Module):
    voxel_size: Tuple[float, float, float]
    lidar_range: Tuple[float, ...]
    anchor_args: Dict[str, Any]
    max_voxels: int = 16000
    anchor_num: int = 2
    num_keypoints: int = 256
    num_proposals: int = 32
    num_rois: int = 64
    roi_grid_size: int = 6
    score_threshold: float = 0.2
    nms_thresh: float = 0.15
    activate_stage2: bool = True
    vsa_out: int = 32

    @nn.compact
    def __call__(self, batch: Dict[str, Any], train: bool = False):
        from gencomm_tpu.data.postprocessor import (
            decode_and_nms, generate_anchor_box,
        )

        flat, (b, l) = _SecondTrunk(
            voxel_size=self.voxel_size, lidar_range=self.lidar_range,
            max_voxels=self.max_voxels, name="trunk",
        )(batch, train)
        feat = SSFA(name="ssfa")(flat, train)
        out: Dict[str, Any] = IoUAwareHead(
            anchor_num=self.anchor_num, use_dir=True, name="head"
        )(feat)

        if not self.activate_stage2:
            return out

        anchors = jnp.asarray(
            generate_anchor_box(dict(self.anchor_args)), jnp.float32
        )
        # align the anchor grid to the actual head resolution
        h, w = out["cls_preds"].shape[1:3]
        anchors = jax.image.resize(
            anchors, (h, w) + anchors.shape[2:], method="nearest"
        ) if anchors.shape[:2] != (h, w) else anchors

        eye = jnp.broadcast_to(jnp.eye(4), (b * l, 4, 4))
        gt_range = jnp.asarray(self.lidar_range)

        def decode_one(cls_p, reg_p, dir_p, tfm):
            det = decode_and_nms(
                cls_p, reg_p, dir_p, anchors, tfm, gt_range,
                score_threshold=self.score_threshold,
                nms_thresh=self.nms_thresh, topk=self.num_proposals,
                order="hwl",
            )
            return det.boxes7, det.scores, det.valid

        boxes, scores, bvalid = jax.vmap(decode_one)(
            out["cls_preds"], out["reg_preds"], out["dir_preds"], eye
        )
        # hwl (x y z h w l yaw) -> lwh (x y z l w h yaw) (fpvrcnn.py:196)
        boxes = boxes[:, :, (0, 1, 2, 5, 4, 3, 6)]
        # invalid proposals can carry inf/NaN from the exp box decode of an
        # untrained head; replace with the reference's placeholder box
        # (matcher.py:66) so 0-weight segment math downstream stays finite
        dummy = jnp.array([0.0, 0.0, 0.0, 1.0, 1.0, 1.0, 1.57], boxes.dtype)
        boxes = jnp.where(bvalid[..., None], boxes, dummy)
        boxes = jax.lax.stop_gradient(boxes)
        scores = jax.lax.stop_gradient(scores)
        out["det_boxes"] = boxes.reshape(b, l, self.num_proposals, 7)
        out["det_scores"] = scores.reshape(b, l, self.num_proposals)

        # ---- VSA on each agent ----
        vsa = VoxelSetAbstraction(
            num_keypoints=self.num_keypoints, out_features=self.vsa_out,
            voxel_size=self.voxel_size, lidar_range=self.lidar_range,
            name="vsa",
        )
        pts = batch["points_m1"].reshape((b * l,) + batch["points_m1"].shape[2:])
        pmask = batch["point_mask_m1"].reshape(b * l, -1)
        kp_xyz, kp_feats, kp_valid = nn.vmap(
            lambda m, p, pm, bev, db, dv: m(p, pm, bev, db, dv),
            variable_axes={"params": None}, split_rngs={"params": False},
        )(vsa, pts, pmask, feat, boxes, bvalid)

        agent_valid = batch["agent_mask"].reshape(b * l) > 0
        kp_valid &= agent_valid[:, None]
        bvalid &= agent_valid[:, None]

        # ---- project per-agent boxes & keypoints to ego ----
        tfm = batch["pairwise_t_matrix"][:, :, 0]  # (B, L, 4, 4): agent->ego
        tfm = tfm.reshape(b * l, 4, 4).astype(jnp.float32)

        def to_ego(bx, kp, t):
            r, tr = t[:3, :3], t[:3, 3]
            ctr = bx[:, :3] @ r.T + tr
            dyaw = jnp.arctan2(r[1, 0], r[0, 0])
            bx = bx.at[:, :3].set(ctr).at[:, 6].add(dyaw)
            kp = kp @ r.T + tr
            return bx, kp

        boxes_e, kp_e = jax.vmap(to_ego)(boxes, kp_xyz, tfm)

        # ---- Matcher: cluster + fuse per sample ----
        kprop = self.num_proposals

        def match_one(bx, sc, va):
            bx = bx.reshape(l * kprop, 7)
            sc = sc.reshape(l * kprop)
            va = va.reshape(l * kprop)
            cid = cluster_boxes(bx, sc, va)
            fused, s_fused, seed = fuse_clusters(bx, sc, va, cid)
            # keep top num_rois seeds by fused score
            key = jnp.where(seed, s_fused, -1.0)
            top_s, top_i = jax.lax.top_k(key, self.num_rois)
            return fused[top_i], jnp.clip(top_s, 0.0, None), top_s > 0

        rois, roi_scores, roi_valid = jax.vmap(match_one)(
            boxes_e.reshape(b, l, kprop, 7),
            scores.reshape(b, l, kprop),
            bvalid.reshape(b, l, kprop),
        )
        out["boxes_fused"] = rois
        out["scores_fused"] = roi_scores
        out["roi_valid"] = roi_valid

        # ---- targets (train) ----
        if "gt_boxes" in batch:
            gt = batch["gt_boxes"].astype(jnp.float32)
            # gt order hwl (x y z h w l yaw) -> lwh
            gt = gt[..., (0, 1, 2, 5, 4, 3, 6)]
            tdict = jax.vmap(assign_roi_targets)(
                rois, roi_valid.astype(jnp.float32), gt, batch["gt_mask"]
            )
            out["rcnn_label_dict"] = tdict

        # ---- RoI grid pooling over merged keypoints ----
        kp_all = kp_e.reshape(b, l * self.num_keypoints, 3)
        kf_all = kp_feats.reshape(b, l * self.num_keypoints, -1)
        kv_all = kp_valid.reshape(b, l * self.num_keypoints)

        roi_head = RoIHead(
            grid_size=self.roi_grid_size, in_channels=self.vsa_out,
            name="roi_head",
        )
        stage2 = nn.vmap(
            lambda m, r, rv, kx, kf, kv: m(r, rv, kx, kf, kv),
            variable_axes={"params": None}, split_rngs={"params": False},
        )(roi_head, rois, roi_valid, kp_all, kf_all, kv_all)
        out["stage2_out"] = stage2
        return out


def build_fpvrcnn(hypes: dict) -> FPVRCNN:
    args = hypes["model"]["args"]
    pp = hypes.get("postprocess", {})
    anchor_args = dict(pp.get("anchor_args", {}))
    return FPVRCNN(
        voxel_size=tuple(args["voxel_size"]),
        lidar_range=tuple(args["lidar_range"]),
        anchor_args=anchor_args,
        max_voxels=args.get("max_voxels", 16000),
        anchor_num=anchor_args.get("num", 2),
        num_keypoints=args.get("vsa", {}).get("num_keypoints", 256),
        num_proposals=args.get("num_proposals", 32),
        num_rois=args.get("num_rois", 64),
        roi_grid_size=args.get("roi_head", {})
        .get("roi_grid_pool", {}).get("grid_size", 6),
        activate_stage2=args.get("activate_stage2", True),
    )


def box_decode(deltas, anchors):
    """Inverse of :func:`box_encode` (box_utils.box_decode:1267+)."""
    safe_dims = jnp.clip(anchors[:, 3:6], 1e-3, None)
    diag = jnp.clip(
        jnp.sqrt(anchors[:, 3] ** 2 + anchors[:, 4] ** 2), 1e-3, None
    )
    x = deltas[:, 0] * diag + anchors[:, 0]
    y = deltas[:, 1] * diag + anchors[:, 1]
    z = deltas[:, 2] * safe_dims[:, 2] + anchors[:, 2]
    l = jnp.exp(deltas[:, 3]) * safe_dims[:, 0]
    w = jnp.exp(deltas[:, 4]) * safe_dims[:, 1]
    h = jnp.exp(deltas[:, 5]) * safe_dims[:, 2]
    r = deltas[:, 6] + anchors[:, 6]
    return jnp.stack([x, y, z, l, w, h, r], axis=-1)


def decode_stage2(rois, roi_valid, stage2_out, score_threshold: float = 0.3):
    """Refined boxes from the RCNN head, per sample.

    Mirrors fpvrcnn_postprocessor's stage-2 path: decode canonical residuals
    back around each roi, score = sigmoid(cls) rectified by the predicted
    IoU. rois (R, 7) lwh ego frame -> boxes (R, 7), scores (R,), valid (R,).
    """
    anchor = rois.at[:, :3].set(0.0).at[:, 6].set(0.0)
    local = box_decode(stage2_out["rcnn_reg"], anchor)
    # rotate/translate back into ego frame
    roi_ry = rois[:, 6] % (2 * jnp.pi)
    xy = rotate_points_z(local[:, None, :3], roi_ry)[:, 0]
    boxes = local.at[:, :3].set(xy + rois[:, :3]).at[:, 6].add(roi_ry)
    cls_s = jax.nn.sigmoid(stage2_out["rcnn_cls"][:, 0])
    iou_s = jnp.clip((stage2_out["rcnn_iou"][:, 0] + 1.0) / 2.0, 0.0, 1.0)
    scores = cls_s * iou_s
    valid = roi_valid & (scores > score_threshold)
    return boxes, scores, valid
