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


# Per-anchor-grid statics for the sparse label path: anchors are the SAME
# array every frame (built once from the yaml), so corners/standups/diag
# are cached, and the regular grid structure lets candidate anchors per GT
# be found analytically instead of via a dense (H'*W'*A, n_gt) IoU.
_ANCHOR_STATICS: dict = {}


def _anchor_statics(anchors: np.ndarray, order: str):
    key = (anchors.shape, anchors.tobytes()[:256], anchors.tobytes()[-256:])
    hit = _ANCHOR_STATICS.get(key)
    if hit is not None:
        return hit
    h, w, a = anchors.shape[:3]
    xs = anchors[0, :, 0, 0]
    ys = anchors[:, 0, 0, 1]
    # structured iff centers form a regular separable grid and every
    # anchor type has constant size/yaw across the grid
    structured = (
        np.all(np.diff(xs) > 0) and np.all(np.diff(ys) > 0)
        and np.allclose(anchors[..., 0], xs[None, :, None])
        and np.allclose(anchors[..., 1], ys[:, None, None])
        and all(
            np.allclose(anchors[..., k], anchors[0, 0, :, k][None, None, :])
            for k in (2, 3, 4, 5, 6)
        )
    )
    stat = {"structured": bool(structured)}
    if structured:
        # corner OFFSETS per type: boxes_to_corners_3d computes
        # rotated_template + center, so offsets are center-independent fp
        # values, and min/max over (cx + off_j) == cx + min/max(off_j)
        # (rounding is monotone) — the sparse standups below are BIT-EXACT
        # equal to the dense corners_to_standup_2d path
        rep = anchors[0, 0].copy()  # (A, 7)
        rep[:, 0:2] = 0.0
        corners = box_utils.boxes_to_corners_3d(rep, order)
        standup = box_utils.corners_to_standup_2d(corners[:, :4])
        stat["off"] = np.asarray(standup)  # (A, 4) xmin/ymin/xmax/ymax
        stat["xs"], stat["ys"] = xs.copy(), ys.copy()
        diag = np.sqrt(anchors[0, 0, :, 4] ** 2 + anchors[0, 0, :, 5] ** 2)
        stat["diag"] = diag
    else:
        anchors_flat = anchors.reshape(-1, 7)
        corners = box_utils.boxes_to_corners_3d(anchors_flat, order)
        stat["standup"] = box_utils.corners_to_standup_2d(corners[:, :4])
        stat["diag"] = np.sqrt(
            anchors_flat[:, 4] ** 2 + anchors_flat[:, 5] ** 2)
    if len(_ANCHOR_STATICS) > 8:
        _ANCHOR_STATICS.clear()
    _ANCHOR_STATICS[key] = stat
    return stat


def _sparse_candidate_iou(stat: dict, gt_standup: np.ndarray,
                          fm_shape, anchor_num):
    """All (anchor_flat_idx, gt_idx, iou) covering every anchor with
    iou > 0, in the same row-major (anchor-major) order np.where would
    produce. The IoU values replicate box_utils.aligned_iou_2d op-for-op
    in float32, so thresholds and argmax tie-breaks are bit-identical to
    the dense path."""
    xs, ys = stat["xs"], stat["ys"]
    off = stat["off"]  # (A, 4)
    h, w = fm_shape
    gt_standup = np.asarray(gt_standup, np.float32)
    idx_list, gt_list, iou_list = [], [], []
    for g, (gx0, gy0, gx1, gy1) in enumerate(gt_standup):
        g_area = np.float32((gx1 - gx0) * (gy1 - gy0))
        for a in range(anchor_num):
            ox0, oy0, ox1, oy1 = off[a]
            # candidate gate (1-cell safety margin for fp rounding):
            # overlap needs cx + ox1 > gx0 and cx + ox0 < gx1
            j0 = max(np.searchsorted(xs, gx0 - ox1, side="left") - 1, 0)
            j1 = min(np.searchsorted(xs, gx1 - ox0, side="right") + 1,
                     len(xs))
            i0 = max(np.searchsorted(ys, gy0 - oy1, side="left") - 1, 0)
            i1 = min(np.searchsorted(ys, gy1 - oy0, side="right") + 1,
                     len(ys))
            if j0 >= j1 or i0 >= i1:
                continue
            sx0 = xs[j0:j1] + ox0
            sx1 = xs[j0:j1] + ox1
            sy0 = ys[i0:i1] + oy0
            sy1 = ys[i0:i1] + oy1
            # aligned_iou_2d op order, float32
            iw = np.clip(np.minimum(sx1, gx1) - np.maximum(sx0, gx0),
                         0, None)  # (nx,)
            ih = np.clip(np.minimum(sy1, gy1) - np.maximum(sy0, gy0),
                         0, None)  # (ny,)
            inter = ih[:, None] * iw[None, :]
            area_a = ((sx1 - sx0)[None, :]
                      * np.broadcast_to((sy1 - sy0)[:, None],
                                        (i1 - i0, j1 - j0)))
            union = area_a + g_area - inter
            iou = np.where(union > 0,
                           inter / np.where(union > 0, union,
                                            np.float32(1.0)),
                           np.float32(0.0))
            ii, jj = np.meshgrid(np.arange(i0, i1), np.arange(j0, j1),
                                 indexing="ij")
            idx_list.append((ii * w + jj).ravel() * anchor_num + a)
            gt_list.append(np.full(ii.size, g, np.int64))
            iou_list.append(iou.astype(np.float32).ravel())
    if not idx_list:
        return (np.zeros(0, np.int64), np.zeros(0, np.int64),
                np.zeros(0, np.float32))
    cand_idx = np.concatenate(idx_list)
    cand_gt = np.concatenate(gt_list)
    cand_iou = np.concatenate(iou_list)
    # match dense np.where order: anchor-major, then gt
    o = np.lexsort((cand_gt, cand_idx))
    return cand_idx[o], cand_gt[o], cand_iou[o]


def generate_label(gt_box_center: np.ndarray, gt_mask: np.ndarray,
                   anchors: np.ndarray, pos_threshold: float,
                   neg_threshold: float, order: str = "hwl") -> dict:
    """Anchor target assignment (numpy, host side).

    gt_box_center: (max_num, 7) hwl-order boxes; gt_mask: (max_num,).
    anchors: (H', W', A, 7). Returns pos/neg/targets arrays shaped like the
    reference (pos_equal_one (H',W',A), targets (H',W',A*7)).

    Fast path: for the regular anchor grids every shipped config uses, the
    dense (H'*W'*A, n_gt) standup-IoU is replaced by an exact sparse
    computation over the analytically-found overlapping anchors (identical
    outputs; this was >50% of the host pipeline per profile).
    """
    assert order == "hwl"
    fm_shape = anchors.shape[:2]
    anchor_num = anchors.shape[2]
    anchors_flat = anchors.reshape(-1, 7)

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

    stat = _anchor_statics(anchors, order)
    anchors_d = stat["diag"]
    if stat["structured"]:
        anchors_d = np.broadcast_to(
            anchors_d[None, :], (anchors_flat.shape[0] // anchor_num,
                                 anchor_num)).reshape(-1)
    gt_corners = box_utils.boxes_to_corners_3d(gt_valid, order)
    gt_standup = box_utils.corners_to_standup_2d(gt_corners[:, :4])

    if stat["structured"] and 0 < neg_threshold <= pos_threshold:
        return _generate_label_sparse(
            stat, gt_valid, gt_standup, anchors_flat, anchors_d,
            fm_shape, anchor_num, pos_threshold, neg_threshold,
            pos_equal_one, neg_equal_one, targets)

    anchor_standup = stat["standup"]
    iou = box_utils.aligned_iou_2d(anchor_standup, gt_standup)  # (N_a, n_gt)
    return _finish_label_dense(
        iou, gt_valid, anchors_flat, anchors_d, fm_shape, anchor_num,
        pos_threshold, neg_threshold, pos_equal_one, neg_equal_one, targets)


def _generate_label_sparse(stat, gt_valid, gt_standup, anchors_flat,
                           anchors_d, fm_shape, anchor_num,
                           pos_threshold, neg_threshold,
                           pos_equal_one, neg_equal_one, targets):
    n_gt = gt_valid.shape[0]
    cand_idx, cand_gt, cand_iou = _sparse_candidate_iou(
        stat, gt_standup, fm_shape, anchor_num)

    # best anchor per gt (forced positive if iou > 0) — non-candidates all
    # have iou == 0, so the restricted argmax is exact. Dense argmax takes
    # the FIRST (lowest anchor idx) maximum; cand_* is anchor-major sorted
    # so a stable per-gt argmax reproduces that tie-break.
    id_highest, id_highest_gt = [], []
    for g in range(n_gt):
        sel = cand_gt == g
        if not np.any(sel):
            continue
        vals = cand_iou[sel]
        best = np.argmax(vals)  # first max in anchor-major order
        if vals[best] > 0:
            id_highest.append(cand_idx[sel][best])
            id_highest_gt.append(g)
    id_highest = np.asarray(id_highest, np.int64)
    id_highest_gt = np.asarray(id_highest_gt, np.int64)

    pos_sel = cand_iou > pos_threshold
    id_pos, id_pos_gt = cand_idx[pos_sel], cand_gt[pos_sel]

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

    # negative = NO gt with iou >= neg_threshold (non-candidates are 0)
    neg_equal_one[...] = 1
    blocked = np.unique(cand_idx[cand_iou >= neg_threshold])
    ix, iy, iz = np.unravel_index(blocked, (*fm_shape, anchor_num))
    neg_equal_one[ix, iy, iz] = 0
    # positives must not stay negative either
    ix, iy, iz = np.unravel_index(id_pos, (*fm_shape, anchor_num))
    neg_equal_one[ix, iy, iz] = 0
    # (forced-positive clearing is implied: id_highest ⊆ id_pos)

    return {
        "pos_equal_one": pos_equal_one,
        "neg_equal_one": neg_equal_one,
        "targets": targets,
    }


def _finish_label_dense(iou, gt_valid, anchors_flat, anchors_d, fm_shape,
                        anchor_num, pos_threshold, neg_threshold,
                        pos_equal_one, neg_equal_one, targets):

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


# ----------------------------------------------------------------------
# V2X-Real multi-class variants
# (voxel_postprocessor.generate_anchor_box_v2xreal:123-186,
#  generate_label_v2xreal:312-463, post_process_v2xreal:787-943)
# ----------------------------------------------------------------------

def generate_anchor_box_multiclass(anchor_args: dict, order: str = "hwl"):
    """Per-class anchor grids from ``anchor_generator_config``.

    Returns (anchors (C, H', W', A, 7), matched (C,), unmatched (C,),
    class_names). Each entry of the config carries its own anchor_sizes
    (lwh), rotations, bottom heights and IoU thresholds; align_center
    places centers at cell midpoints (generate_anchor_box_v2xreal:133-151).
    All classes share one feature_map_stride in the shipped configs — we
    require that so the label/pred maps stack on a single grid.
    """
    cfgs = anchor_args["anchor_generator_config"]
    rng_ = anchor_args["cav_lidar_range"]
    vw, vh = anchor_args.get("vw", 0.4), anchor_args.get("vh", 0.4)
    W = anchor_args.get("W", int(round((rng_[3] - rng_[0]) / vw)))
    H = anchor_args.get("H", int(round((rng_[4] - rng_[1]) / vh)))
    strides = {int(c.get("feature_map_stride", 4)) for c in cfgs}
    assert len(strides) == 1, "per-class strides must match"
    stride = strides.pop()
    gw, gh = W // stride, H // stride

    out, matched, unmatched, names = [], [], [], []
    for cfg in cfgs:
        size = cfg["anchor_sizes"][0]  # (l, w, h)
        rots = cfg["anchor_rotations"]
        z = float(cfg["anchor_bottom_heights"][0])
        if cfg.get("align_center", True):
            xs = (rng_[3] - rng_[0]) / gw
            ys = (rng_[4] - rng_[1]) / gh
            x = np.arange(rng_[0] + xs / 2, rng_[3], xs)[:gw]
            y = np.arange(rng_[1] + ys / 2, rng_[4], ys)[:gh]
        else:
            x = np.linspace(rng_[0], rng_[3], gw)
            y = np.linspace(rng_[1], rng_[4], gh)
        cx, cy = np.meshgrid(x, y)  # (gh, gw)
        A = len(rots)
        anch = np.zeros((gh, gw, A, 7), np.float32)
        anch[..., 0] = cx[..., None]
        anch[..., 1] = cy[..., None]
        anch[..., 2] = z
        l, w, h = size  # anchor_sizes are (l, w, h)
        if order == "hwl":
            dims = (h, w, l)
        elif order == "lhw":
            dims = (l, h, w)
        else:
            raise ValueError(f"unknown box order {order}")
        anch[..., 3:6] = dims
        anch[..., 6] = np.asarray(rots, np.float32)
        out.append(anch)
        matched.append(float(cfg.get("matched_threshold", 0.6)))
        unmatched.append(float(cfg.get("unmatched_threshold", 0.45)))
        names.append(cfg.get("class_name", f"class{len(names)}"))
    return (np.stack(out), np.asarray(matched, np.float32),
            np.asarray(unmatched, np.float32), names)


def generate_label_multiclass(gt_box_center, gt_classes, gt_mask,
                              anchors_mc, matched, unmatched,
                              order: str = "hwl") -> dict:
    """Multi-class anchor target assignment.

    gt_box_center (max_num, 7), gt_classes (max_num,) in 1..C, gt_mask
    (max_num,). anchors_mc (C, H', W', A, 7). Returns
    pos_equal_one (H', W', C*A) holding -1 (ignore) / 0 (negative) /
    class id (positive) — the reference's combined `labels` array — and
    targets (H', W', C*A*7), class-major on the anchor axis
    (generate_label_v2xreal:312-463).
    """
    assert order == "hwl"
    C = anchors_mc.shape[0]
    fm_shape = anchors_mc.shape[1:3]
    A = anchors_mc.shape[3]
    labels_all, targets_all = [], []
    valid = gt_mask == 1
    for c in range(C):
        anchors = anchors_mc[c]
        gsel = valid & (gt_classes - 1 == c)
        gt_c = gt_box_center[gsel]
        labels = -np.ones((*fm_shape, A), np.float32)
        targets = np.zeros((*fm_shape, A, 7), np.float32)
        anchors_flat = anchors.reshape(-1, 7)
        anchors_d = np.sqrt(anchors_flat[:, 4] ** 2 + anchors_flat[:, 5] ** 2)
        if gt_c.shape[0] == 0:
            labels[...] = 0.0
            labels_all.append(labels)
            targets_all.append(targets)
            continue
        anchor_corners = box_utils.boxes_to_corners_3d(anchors_flat, order)
        gt_corners = box_utils.boxes_to_corners_3d(gt_c, order)
        anchor_standup = box_utils.corners_to_standup_2d(anchor_corners[:, :4])
        gt_standup = box_utils.corners_to_standup_2d(gt_corners[:, :4])
        iou = box_utils.aligned_iou_2d(anchor_standup, gt_standup)

        id_highest = np.argmax(iou, axis=0)
        id_highest_gt = np.arange(iou.shape[1])
        has = iou[id_highest, id_highest_gt] > 0
        id_highest, id_highest_gt = id_highest[has], id_highest_gt[has]
        id_pos, id_pos_gt = np.where(iou > matched[c])
        id_neg = np.where(
            (iou < unmatched[c]).sum(axis=1) == iou.shape[1]
        )[0]
        id_pos = np.concatenate([id_pos, id_highest])
        id_pos_gt = np.concatenate([id_pos_gt, id_highest_gt])
        id_pos, index = np.unique(id_pos, return_index=True)
        id_pos_gt = id_pos_gt[index]

        ix, iy, iz = np.unravel_index(id_neg, (*fm_shape, A))
        labels[ix, iy, iz] = 0.0
        a = anchors_flat[id_pos]
        d = anchors_d[id_pos]
        g = gt_c[id_pos_gt]
        ix, iy, iz = np.unravel_index(id_pos, (*fm_shape, A))
        labels[ix, iy, iz] = float(c + 1)
        targets[ix, iy, iz, 0] = (g[:, 0] - a[:, 0]) / d
        targets[ix, iy, iz, 1] = (g[:, 1] - a[:, 1]) / d
        targets[ix, iy, iz, 2] = (g[:, 2] - a[:, 2]) / a[:, 3]
        targets[ix, iy, iz, 3] = np.log(g[:, 3] / a[:, 3])
        targets[ix, iy, iz, 4] = np.log(g[:, 4] / a[:, 4])
        targets[ix, iy, iz, 5] = np.log(g[:, 5] / a[:, 5])
        targets[ix, iy, iz, 6] = g[:, 6] - a[:, 6]
        labels_all.append(labels)
        targets_all.append(targets)
    return {
        "pos_equal_one": np.concatenate(labels_all, axis=-1),
        "targets": np.concatenate(targets_all, axis=-2).reshape(
            (*fm_shape, C * A * 7)
        ),
    }


class MulticlassDetections(NamedTuple):
    corners3d: jnp.ndarray  # (K, 8, 3) ego frame
    scores: jnp.ndarray     # (K,)
    labels: jnp.ndarray     # (K,) 1-indexed class ids
    valid: jnp.ndarray      # (K,) bool


@partial(
    jax.jit,
    static_argnames=("score_threshold", "nms_thresh", "topk", "order"),
)
def decode_and_nms_multiclass(
    cls_preds,
    reg_preds,
    anchors_mc,
    transformation_matrix,
    gt_range,
    *,
    score_threshold: float = 0.2,
    nms_thresh: float = 0.15,
    topk: int = 512,
    order: str = "hwl",
) -> MulticlassDetections:
    """Single-sample multi-class decode (post_process_v2xreal:787-943).

    cls_preds (H', W', C*A*C) channel-last; reg_preds (H', W', C*A*7);
    anchors_mc (C, H', W', A, 7). Per anchor-class slot: sigmoid -> max
    over the C class scores -> argmax label (1-indexed); no direction
    head in the v2xreal path. Class-wide NMS, like the reference.
    """
    C = anchors_mc.shape[0]
    # (H',W',C,A,7) -> (N, 7): class-major per-pixel, matching the head's
    # channel layout after the (..., C*A, ...) reshape
    anchors = jnp.transpose(anchors_mc, (1, 2, 0, 3, 4)).reshape(-1, 7)
    prob = jax.nn.sigmoid(cls_preds.reshape(-1, C))
    scores = jnp.max(prob, axis=-1)
    labels = jnp.argmax(prob, axis=-1) + 1

    d = reg_preds.reshape(-1, 7)
    diag = jnp.sqrt(anchors[:, 4] ** 2 + anchors[:, 5] ** 2)
    xy = d[:, 0:2] * diag[:, None] + anchors[:, 0:2]
    z = d[:, 2:3] * anchors[:, 3:4] + anchors[:, 2:3]
    hwl = jnp.exp(jnp.clip(d[:, 3:6], -10.0, 10.0)) * anchors[:, 3:6]
    yaw = d[:, 6:7] + anchors[:, 6:7]
    boxes = jnp.concatenate([xy, z, hwl, yaw], axis=-1)

    score_ok = scores > score_threshold
    masked = jnp.where(score_ok, scores, 0.0)
    topk = min(topk, masked.shape[0])
    top_scores, top_idx = jax.lax.top_k(masked, topk)
    top_boxes = boxes[top_idx]
    top_labels = labels[top_idx]
    top_valid = top_scores > score_threshold

    corners = box_utils.boxes_to_corners_3d(top_boxes, order)
    corners = box_utils.project_box3d(corners, transformation_matrix)
    # v2xreal uses relaxed sanity filters — trucks exceed the 6 m cap and
    # curvy roads span heights (remove_large_pred_bbx_v2xreal /
    # remove_bbx_abnormal_z_v2xreal, box_utils.py:1115-1166: 100 m bounds)
    x_len = corners[..., 0].max(axis=1) - corners[..., 0].min(axis=1)
    y_len = corners[..., 1].max(axis=1) - corners[..., 1].min(axis=1)
    keep = (x_len <= 100.0) & (y_len <= 100.0)
    keep &= (corners[..., 2].min(axis=1) >= -100.0)
    keep &= (corners[..., 2].max(axis=1) <= 100.0)
    keep &= box_utils.mask_boxes_outside_range(corners, gt_range)
    top_valid &= keep

    quads = corners[:, :4, :2]
    ordr, kept = rotated_nms(quads, top_scores, top_valid, nms_thresh)
    return MulticlassDetections(
        corners3d=corners[ordr],
        scores=top_scores[ordr],
        labels=top_labels[ordr],
        valid=kept,
    )
