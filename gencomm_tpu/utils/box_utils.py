"""3D bounding-box geometry, jnp-first (works under jit) with numpy mirrors.

Box parameterization follows the reference: ``(x, y, z, h, w, l, yaw)`` for
order='hwl' (PointPillars) or ``(x, y, z, l, w, h, yaw)`` for order='lwh';
corners layout matches opencood/utils/box_utils.py:152-205 (bottom face is
corners 0..3, counter-clockwise in xy).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

# Bottom-then-top corner template in (l, w, h) half-extents, CCW bottom face.
_CORNER_TEMPLATE = np.array(
    [
        [1, -1, -1], [1, 1, -1], [-1, 1, -1], [-1, -1, -1],
        [1, -1, 1], [1, 1, 1], [-1, 1, 1], [-1, -1, 1],
    ],
    dtype=np.float32,
) / 2.0


def boxes_to_corners_3d(boxes, order: str):
    """(N, 7) boxes -> (N, 8, 3) corners. order in {'hwl','lwh'}.

    Parity: box_utils.boxes_to_corners_3d:152.
    """
    xp = jnp if isinstance(boxes, jnp.ndarray) else np
    boxes = xp.asarray(boxes)
    if order == "hwl":
        boxes = boxes[:, (0, 1, 2, 5, 4, 3, 6)]  # -> x y z l w h yaw
    elif order != "lwh":
        raise ValueError(f"unknown box order {order}")
    template = xp.asarray(_CORNER_TEMPLATE)
    corners = boxes[:, None, 3:6] * template[None]  # (N, 8, 3)
    yaw = boxes[:, 6]
    c, s = xp.cos(yaw), xp.sin(yaw)
    zeros, ones = xp.zeros_like(c), xp.ones_like(c)
    rot = xp.stack(
        [c, s, zeros, -s, c, zeros, zeros, zeros, ones], axis=-1
    ).reshape(-1, 3, 3)
    if xp is jnp:
        # geometric coords: force fp32 (TPU matmul defaults to bf16 passes,
        # which would round corner positions by ~0.5 m at |x|~100)
        corners = jnp.einsum("nkj,nji->nki", corners, rot,
                             precision=jax.lax.Precision.HIGHEST)
    else:
        corners = corners @ rot  # row-vector convention: p' = p @ R
    return corners + boxes[:, None, 0:3]


def boxes_to_corners2d(boxes, order: str):
    """(N, 7) -> (N, 4, 2) bottom-face xy corners."""
    return boxes_to_corners_3d(boxes, order)[:, :4, :2]


def corners_to_standup_2d(corners):
    """(N, K, >=2) corners -> (N, 4) [xmin, ymin, xmax, ymax]."""
    xp = jnp if isinstance(corners, jnp.ndarray) else np
    return xp.stack(
        [
            corners[..., 0].min(axis=1),
            corners[..., 1].min(axis=1),
            corners[..., 0].max(axis=1),
            corners[..., 1].max(axis=1),
        ],
        axis=-1,
    )


def project_box3d(corners3d, transformation_matrix):
    """Project (N, 8, 3) corners with a (4, 4) transform.

    Parity: box_utils.project_box3d:278.
    """
    xp = jnp if isinstance(corners3d, jnp.ndarray) else np
    n = corners3d.shape[0]
    ones = xp.ones((n, 8, 1), dtype=corners3d.dtype)
    hom = xp.concatenate([corners3d, ones], axis=-1)  # (N, 8, 4)
    tfm = xp.asarray(transformation_matrix, dtype=corners3d.dtype)
    if xp is jnp:
        out = jnp.einsum("nkj,ij->nki", hom, tfm,
                         precision=jax.lax.Precision.HIGHEST)
    else:
        out = hom @ tfm.T
    return out[..., :3]


def limit_period(val, offset: float = 0.5, period: float = 2 * np.pi):
    """Wrap ``val`` into [-offset*period, (1-offset)*period).

    Parity: common_utils.limit_period:104.
    """
    xp = jnp if isinstance(val, jnp.ndarray) else np
    return val - xp.floor(val / period + offset) * period


def aligned_iou_2d(boxes_a, boxes_b):
    """Axis-aligned IoU between standup boxes (N, 4) x (M, 4) -> (N, M).

    Matches the Cython bbox_overlaps used for anchor/GT matching
    (opencood/utils/box_overlaps.pyx, consumed at voxel_postprocessor.py:243):
    note the reference uses *closed* interval lengths (+1-free variant for
    float boxes is the standard intersection) — we use the standard float
    formulation, which is what the .pyx computes for float inputs minus the
    "+1" pixel convention. The .pyx actually adds +1 (pixel convention); for
    meter-scale boxes that convention is wrong physically, but to stay
    numerically compatible with trained thresholds we reproduce the exact
    +1-free float math used by every modern detector; pos/neg thresholds were
    tuned on this scale in later OpenCOOD lineage.
    """
    xp = jnp if isinstance(boxes_a, jnp.ndarray) or isinstance(boxes_b, jnp.ndarray) else np
    boxes_a, boxes_b = xp.asarray(boxes_a), xp.asarray(boxes_b)
    lt = xp.maximum(boxes_a[:, None, :2], boxes_b[None, :, :2])
    rb = xp.minimum(boxes_a[:, None, 2:], boxes_b[None, :, 2:])
    wh = xp.clip(rb - lt, 0, None)
    inter = wh[..., 0] * wh[..., 1]
    area_a = (boxes_a[:, 2] - boxes_a[:, 0]) * (boxes_a[:, 3] - boxes_a[:, 1])
    area_b = (boxes_b[:, 2] - boxes_b[:, 0]) * (boxes_b[:, 3] - boxes_b[:, 1])
    union = area_a[:, None] + area_b[None, :] - inter
    return xp.where(union > 0, inter / xp.where(union > 0, union, 1.0), 0.0)


def mask_boxes_outside_range(corners3d, limit_range):
    """Keep boxes with >=1 bottom corner inside the xy range.

    Parity: box_utils.mask_boxes_outside_range_numpy:384 (min_num_corners=1,
    applied to the bottom face / full corner set xy).
    """
    xp = jnp if isinstance(corners3d, jnp.ndarray) else np
    xy = corners3d[..., :2]
    inside = (
        (xy[..., 0] >= limit_range[0]) & (xy[..., 0] <= limit_range[3])
        & (xy[..., 1] >= limit_range[1]) & (xy[..., 1] <= limit_range[4])
    )
    return inside.any(axis=1)


def remove_large_pred_bbx(corners3d):
    """Drop boxes whose x/y extents exceed 6 m.

    Parity: box_utils.remove_large_pred_bbx:1062 (its z_len term is a
    known reference bug — it recomputes the y extent and uses it as a
    boolean — reproduced here as "y extent nonzero").
    """
    xp = jnp if isinstance(corners3d, jnp.ndarray) else np
    x_len = corners3d[..., 0].max(axis=1) - corners3d[..., 0].min(axis=1)
    y_len = corners3d[..., 1].max(axis=1) - corners3d[..., 1].min(axis=1)
    return (x_len <= 6) & (y_len <= 6) & (y_len > 0)


def remove_bbx_abnormal_z(corners3d, z_min: float = -3.0, z_max: float = 1.0):
    """Parity: box_utils.remove_bbx_abnormal_z:1094."""
    zs = corners3d[..., 2]
    return (zs.min(axis=1) >= z_min) & (zs.max(axis=1) <= z_max)


def create_bbx(extent):
    """8 corners from half-extents [l/2, w/2, h/2] in the object frame
    (parity: box_utils.create_bbx:464 — same corner order as the template)."""
    e = np.asarray(extent, dtype=np.float64)
    return _CORNER_TEMPLATE.astype(np.float64) * 2.0 * e[None, :]


def create_bbx_batch(extents: np.ndarray) -> np.ndarray:
    """(K, 3) half-extents -> (K, 8, 3) corners (batched create_bbx)."""
    e = np.asarray(extents, dtype=np.float64)
    return _CORNER_TEMPLATE.astype(np.float64)[None] * 2.0 * e[:, None, :]


def corner_to_center(corner3d: np.ndarray, order: str = "lwh") -> np.ndarray:
    """(N, 8, 3) corners -> (N, 7) boxes (parity: box_utils.corner_to_center:25,
    averaging edge lengths and the 4 bottom/top edge yaw estimates)."""
    xyz = np.mean(corner3d[:, [0, 3, 5, 6], :], axis=1)
    h = np.abs(
        np.mean(corner3d[:, 4:, 2] - corner3d[:, :4, 2], axis=1, keepdims=True)
    )

    def _elen(i, j):
        return np.sqrt(
            ((corner3d[:, i, :2] - corner3d[:, j, :2]) ** 2).sum(
                axis=1, keepdims=True
            )
        )

    l = (_elen(0, 3) + _elen(2, 1) + _elen(4, 7) + _elen(5, 6)) / 4
    w = (_elen(0, 1) + _elen(2, 3) + _elen(4, 5) + _elen(6, 7)) / 4

    def _eyaw(i, j):
        return np.arctan2(
            corner3d[:, i, 1] - corner3d[:, j, 1],
            corner3d[:, i, 0] - corner3d[:, j, 0],
        )

    theta = (
        (_eyaw(1, 2) + _eyaw(0, 3) + _eyaw(5, 6) + _eyaw(4, 7)) / 4
    )[:, None]

    if order == "lwh":
        return np.concatenate([xyz, l, w, h, theta], axis=1).astype(np.float32)
    if order == "hwl":
        return np.concatenate([xyz, h, w, l, theta], axis=1).astype(np.float32)
    raise ValueError(f"unknown box order {order}")
