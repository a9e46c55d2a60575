"""Anchor generation, target assignment, and box decoding.

Parity targets (opencood/data_utils/post_processor/voxel_postprocessor.py):
  generate_anchor_box   :68-121   (2-yaw anchors at W//stride x H//stride)
  generate_label        :188-310  (standup-IoU matching, pos/neg thresholds,
                                   best-anchor-per-gt forcing, delta targets)
  delta_to_boxes3d      :1351     (anchor decode)
  post_process          :1084-1246 (sigmoid -> threshold -> decode -> dir fix
                                   -> corner filters -> rotated NMS -> range)

Anchors/labels are host-side numpy (data pipeline); decode + NMS are
jittable with static shapes: the ragged "masked_select" stages of the
reference become top-K selection + validity masks.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from gencomm_tpu.utils import box_utils
from gencomm_tpu.ops.nms import rotated_nms


def generate_anchor_box(anchor_args: dict, order: str = "hwl") -> np.ndarray:
    """(H', W', A, 7) anchor grid; H'=H//stride, W'=W//stride.

    Matches voxel_postprocessor.generate_anchor_box:68-121 including its
    linspace endpoints (xmin+vw .. xmax-vw).
    """
    W, H = anchor_args["W"], anchor_args["H"]
    l, w, h = anchor_args["l"], anchor_args["w"], anchor_args["h"]
    yaws = [np.radians(r) for r in anchor_args["r"]]
    vw, vh = anchor_args["vw"], anchor_args["vh"]
    xrange = anchor_args["cav_lidar_range"][0], anchor_args["cav_lidar_range"][3]
    yrange = anchor_args["cav_lidar_range"][1], anchor_args["cav_lidar_range"][4]
    stride = anchor_args.get("feature_stride", 2)
    anchor_num = len(yaws)

    x = np.linspace(xrange[0] + vw, xrange[1] - vw, W // stride)
    y = np.linspace(yrange[0] + vh, yrange[1] - vh, H // stride)
    cx, cy = np.meshgrid(x, y)  # (H', W')
    cx = np.tile(cx[..., None], anchor_num)
    cy = np.tile(cy[..., None], anchor_num)
    cz = np.full_like(cx, -1.0)
    ws = np.full_like(cx, w)
    ls = np.full_like(cx, l)
    hs = np.full_like(cx, h)
    rs = np.stack([np.full_like(cx[..., 0], yv) for yv in yaws], axis=-1)

    if order == "hwl":
        anchors = np.stack([cx, cy, cz, hs, ws, ls, rs], axis=-1)
    elif order == "lhw":
        anchors = np.stack([cx, cy, cz, ls, hs, ws, rs], axis=-1)
    else:
        raise ValueError(f"unknown box order {order}")
    return anchors.astype(np.float32)


def generate_label(gt_box_center: np.ndarray, gt_mask: np.ndarray,
                   anchors: np.ndarray, pos_threshold: float,
                   neg_threshold: float, order: str = "hwl") -> dict:
    """Anchor target assignment (numpy, host side).

    gt_box_center: (max_num, 7) hwl-order boxes; gt_mask: (max_num,).
    anchors: (H', W', A, 7). Returns pos/neg/targets arrays shaped like the
    reference (pos_equal_one (H',W',A), targets (H',W',A*7)).
    """
    assert order == "hwl"
    fm_shape = anchors.shape[:2]
    anchor_num = anchors.shape[2]
    anchors_flat = anchors.reshape(-1, 7)
    anchors_d = np.sqrt(anchors_flat[:, 4] ** 2 + anchors_flat[:, 5] ** 2)

    pos_equal_one = np.zeros((*fm_shape, anchor_num), np.float32)
    neg_equal_one = np.zeros((*fm_shape, anchor_num), np.float32)
    targets = np.zeros((*fm_shape, anchor_num * 7), np.float32)

    gt_valid = gt_box_center[gt_mask == 1]
    if gt_valid.shape[0] == 0:
        neg_equal_one[...] = 1
        return {
            "pos_equal_one": pos_equal_one,
            "neg_equal_one": neg_equal_one,
            "targets": targets,
        }

    anchor_corners = box_utils.boxes_to_corners_3d(anchors_flat, order)
    gt_corners = box_utils.boxes_to_corners_3d(gt_valid, order)
    anchor_standup = box_utils.corners_to_standup_2d(anchor_corners[:, :4])
    gt_standup = box_utils.corners_to_standup_2d(gt_corners[:, :4])

    iou = box_utils.aligned_iou_2d(anchor_standup, gt_standup)  # (N_a, n_gt)

    # best anchor per gt (forced positive if iou > 0)
    id_highest = np.argmax(iou, axis=0)
    id_highest_gt = np.arange(iou.shape[1])
    has_overlap = iou[id_highest, id_highest_gt] > 0
    id_highest, id_highest_gt = id_highest[has_overlap], id_highest_gt[has_overlap]

    id_pos, id_pos_gt = np.where(iou > pos_threshold)
    id_neg = np.where((iou < neg_threshold).sum(axis=1) == iou.shape[1])[0]

    id_pos = np.concatenate([id_pos, id_highest])
    id_pos_gt = np.concatenate([id_pos_gt, id_highest_gt])
    id_pos, index = np.unique(id_pos, return_index=True)
    id_pos_gt = id_pos_gt[index]

    ix, iy, iz = np.unravel_index(id_pos, (*fm_shape, anchor_num))
    pos_equal_one[ix, iy, iz] = 1

    a = anchors_flat[id_pos]
    d = anchors_d[id_pos]
    g = gt_valid[id_pos_gt]
    targets[ix, iy, iz * 7 + 0] = (g[:, 0] - a[:, 0]) / d
    targets[ix, iy, iz * 7 + 1] = (g[:, 1] - a[:, 1]) / d
    targets[ix, iy, iz * 7 + 2] = (g[:, 2] - a[:, 2]) / a[:, 3]
    targets[ix, iy, iz * 7 + 3] = np.log(g[:, 3] / a[:, 3])
    targets[ix, iy, iz * 7 + 4] = np.log(g[:, 4] / a[:, 4])
    targets[ix, iy, iz * 7 + 5] = np.log(g[:, 5] / a[:, 5])
    targets[ix, iy, iz * 7 + 6] = g[:, 6] - a[:, 6]

    ix, iy, iz = np.unravel_index(id_neg, (*fm_shape, anchor_num))
    neg_equal_one[ix, iy, iz] = 1
    # a forced-positive anchor must not stay negative
    ix, iy, iz = np.unravel_index(id_highest, (*fm_shape, anchor_num))
    neg_equal_one[ix, iy, iz] = 0

    return {
        "pos_equal_one": pos_equal_one,
        "neg_equal_one": neg_equal_one,
        "targets": targets,
    }


def delta_to_boxes3d(deltas, anchors):
    """Decode regression deltas against anchors (jittable).

    deltas: (..., H', W', A*7) channel-last; anchors: (H', W', A, 7).
    Returns (..., H'*W'*A, 7). Parity: voxel_postprocessor.delta_to_boxes3d.
    """
    lead = deltas.shape[:-3]
    d = deltas.reshape(lead + (-1, 7))
    a = anchors.reshape(-1, 7).astype(d.dtype)
    diag = jnp.sqrt(a[:, 4] ** 2 + a[:, 5] ** 2)
    xy = d[..., 0:2] * diag[..., :, None] + a[..., 0:2]
    z = d[..., 2:3] * a[..., 3:4] + a[..., 2:3]
    # clip the log-dim residuals: an untrained head can emit values whose
    # exp overflows to inf, which then poisons downstream IoU/NMS math even
    # in masked slots (0 * inf = NaN). e^10 ~ 22k x anchor dim is already
    # far outside remove_large_pred_bbx's keep range, so this changes no
    # surviving detection.
    hwl = jnp.exp(jnp.clip(d[..., 3:6], -10.0, 10.0)) * a[..., 3:6]
    yaw = d[..., 6:7] + a[..., 6:7]
    return jnp.concatenate([xy, z, hwl, yaw], axis=-1)


class Detections(NamedTuple):
    """Fixed-size decoded detections (post-NMS)."""

    corners3d: jnp.ndarray  # (K, 8, 3) in ego frame
    boxes7: jnp.ndarray     # (K, 7) decoded boxes (pre-projection frame)
    scores: jnp.ndarray     # (K,)
    valid: jnp.ndarray      # (K,) bool


@partial(
    jax.jit,
    static_argnames=("score_threshold", "nms_thresh", "topk", "dir_offset",
                     "num_bins", "order"),
)
def decode_and_nms(
    cls_preds,
    reg_preds,
    dir_preds,
    anchors,
    transformation_matrix,
    gt_range,
    *,
    score_threshold: float = 0.2,
    nms_thresh: float = 0.15,
    topk: int = 512,
    dir_offset: float = 0.7853,
    num_bins: int = 2,
    order: str = "hwl",
) -> Detections:
    """Single-sample decode: (H', W', A), (H', W', A*7), (H', W', A*nb).

    Mirrors voxel_postprocessor.post_process:1084-1246 with static shapes:
    score-threshold/masked_select becomes top-K + valid mask.
    """
    prob = jax.nn.sigmoid(cls_preds.reshape(-1))
    boxes = delta_to_boxes3d(reg_preds, anchors)  # (N, 7)

    # direction correction (post_process:1158-1175)
    dir_logits = dir_preds.reshape(-1, num_bins)
    dir_labels = jnp.argmax(dir_logits, axis=-1)
    period = 2 * jnp.pi / num_bins
    dir_rot = box_utils.limit_period(boxes[:, 6] - dir_offset, 0.0, period)
    yaw = dir_rot + dir_offset + period * dir_labels.astype(boxes.dtype)
    yaw = box_utils.limit_period(yaw, 0.5, 2 * jnp.pi)
    boxes = boxes.at[:, 6].set(yaw)

    score_ok = prob > score_threshold
    masked_scores = jnp.where(score_ok, prob, 0.0)
    # small grids (tiny eval ranges) can have fewer anchors than the
    # requested pre-NMS cap
    topk = min(topk, masked_scores.shape[0])
    top_scores, top_idx = jax.lax.top_k(masked_scores, topk)
    top_boxes = boxes[top_idx]
    top_valid = top_scores > score_threshold

    corners = box_utils.boxes_to_corners_3d(top_boxes, order)  # (K, 8, 3)
    corners = box_utils.project_box3d(corners, transformation_matrix)

    keep = box_utils.remove_large_pred_bbx(corners)
    keep &= box_utils.remove_bbx_abnormal_z(corners)
    keep &= box_utils.mask_boxes_outside_range(corners, gt_range)
    top_valid &= keep

    quads = corners[:, :4, :2]
    ordr, kept = rotated_nms(quads, top_scores, top_valid, nms_thresh)
    return Detections(
        corners3d=corners[ordr],
        boxes7=top_boxes[ordr],
        scores=top_scores[ordr],
        valid=kept,
    )
