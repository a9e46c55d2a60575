"""Rotated-box (convex quad) IoU, fully jittable with static shapes.

The reference computes polygon IoU on CPU via shapely (opencood/utils/
common_utils.py:230-255, consumed by nms_rotated box_utils.py:915 and the
CUDA kernel opencood/pcdet_utils/iou3d_nms). On TPU we want this in-graph:

Convex-convex intersection without scatter/compaction:
  candidate vertices = {verts of A inside B} ∪ {verts of B inside A}
                       ∪ {edge-edge intersection points}        (<= 24)
  intersection area  = shoelace over candidates sorted by angle around
                       their centroid (valid-masked).

Exact for convex quads (up to fp error); degenerate overlaps (shared edges)
are measure-zero for NMS/eval purposes.

Quads must be consistently wound (the corner template in
utils/box_utils.py yields CCW bottom faces — winding only matters for
the sign handled by ``abs`` in the shoelace).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-8
_NCAND = 24  # 4 + 4 + 16


def _cross2(o, a, b):
    """Cross product (a - o) x (b - o), last dim 2."""
    return (a[..., 0] - o[..., 0]) * (b[..., 1] - o[..., 1]) - (
        a[..., 1] - o[..., 1]
    ) * (b[..., 0] - o[..., 0])


def _points_in_quad(points, quad):
    """points (..., P, 2) inside convex quad (..., 4, 2) -> (..., P) bool.

    Handles either winding by requiring all edge cross-products to share a
    sign.
    """
    q0 = quad[..., None, :, :]  # (..., 1, 4, 2)
    q1 = jnp.roll(quad, -1, axis=-2)[..., None, :, :]
    p = points[..., :, None, :]  # (..., P, 1, 2)
    crosses = _cross2(q0, q1, p)  # (..., P, 4)
    return (crosses >= -_EPS).all(axis=-1) | (crosses <= _EPS).all(axis=-1)


def _edge_intersections(qa, qb):
    """All 16 edge-edge intersection points between two quads.

    qa, qb: (..., 4, 2). Returns points (..., 16, 2), valid (..., 16).
    """
    a0 = qa[..., :, None, :]  # (..., 4, 1, 2)
    a1 = jnp.roll(qa, -1, axis=-2)[..., :, None, :]
    b0 = qb[..., None, :, :]  # (..., 1, 4, 2)
    b1 = jnp.roll(qb, -1, axis=-2)[..., None, :, :]

    r = a1 - a0
    s = b1 - b0
    denom = r[..., 0] * s[..., 1] - r[..., 1] * s[..., 0]  # (..., 4, 4)
    qp = b0 - a0
    t_num = qp[..., 0] * s[..., 1] - qp[..., 1] * s[..., 0]
    u_num = qp[..., 0] * r[..., 1] - qp[..., 1] * r[..., 0]
    safe = jnp.where(jnp.abs(denom) > _EPS, denom, 1.0)
    t = t_num / safe
    u = u_num / safe
    valid = (
        (jnp.abs(denom) > _EPS)
        & (t >= -_EPS) & (t <= 1 + _EPS)
        & (u >= -_EPS) & (u <= 1 + _EPS)
    )
    pts = a0 + t[..., None] * r  # (..., 4, 4, 2)
    shape = pts.shape[:-3] + (16, 2)
    return pts.reshape(shape), valid.reshape(shape[:-1])


def _masked_hull_area(points, valid):
    """Area of the convex hull of valid points via angular sort + shoelace.

    points: (..., N, 2), valid: (..., N) -> area (...,). The valid points are
    assumed to form a convex set boundary (true for convex intersection).
    """
    nvalid = valid.sum(axis=-1)  # (...,)
    vf = valid[..., None].astype(points.dtype)
    centroid = (points * vf).sum(axis=-2) / jnp.maximum(
        nvalid[..., None].astype(points.dtype), 1.0
    )
    rel = points - centroid[..., None, :]
    angle = jnp.arctan2(rel[..., 1], rel[..., 0])
    angle = jnp.where(valid, angle, jnp.inf)  # invalid sort to the end
    order = jnp.argsort(angle, axis=-1)
    sorted_pts = jnp.take_along_axis(points, order[..., None], axis=-2)
    sorted_valid = jnp.take_along_axis(valid, order, axis=-1)

    n = points.shape[-2]
    idx = jnp.arange(n)
    # next index cyclic over the first `nvalid` entries (invalid sorted last)
    next_idx = (idx + 1) % jnp.maximum(nvalid[..., None], 1)
    next_pts = jnp.take_along_axis(sorted_pts, next_idx[..., None], axis=-2)
    cross = (
        sorted_pts[..., 0] * next_pts[..., 1]
        - sorted_pts[..., 1] * next_pts[..., 0]
    )
    cross = jnp.where(sorted_valid, cross, 0.0)
    area = 0.5 * jnp.abs(cross.sum(axis=-1))
    return jnp.where(nvalid >= 3, area, 0.0)


def _ccw(q):
    """Canonicalize quads to CCW winding (flip if signed area < 0)."""
    nxt = jnp.roll(q, -1, axis=-2)
    signed = (q[..., 0] * nxt[..., 1] - q[..., 1] * nxt[..., 0]).sum(axis=-1)
    return jnp.where(signed[..., None, None] >= 0, q, q[..., ::-1, :])


def _clipped_edge_contribution(poly, clip, strict: bool = False):
    """Green's-theorem contribution of ``poly``'s edges clipped to ``clip``.

    For CCW convex polygons, Area(A ∩ B) = 1/2 ∮_{∂(A∩B)} (x dy − y dx); the
    boundary decomposes into sub-segments of A's edges inside B and B's
    edges inside A. Each edge p0→p1 is clipped against clip's 4 half-planes
    by Liang–Barsky interval intersection — branch-free, sort-free,
    gather-free (the TPU-friendly formulation; the candidate-vertex +
    angular-sort alternative is ~50x slower on TPU due to the sorts).

    poly, clip: (..., 4, 2). Returns (...,) = sum over edges of
    cross(p(t_lo), p(t_hi)).
    """
    p0 = poly[..., :, None, :]  # (..., 4 edges of poly, 1, 2)
    p1 = jnp.roll(poly, -1, axis=-2)[..., :, None, :]
    v0 = clip[..., None, :, :]  # (..., 1, 4 edges of clip, 2)
    d = (jnp.roll(clip, -1, axis=-2) - clip)[..., None, :, :]

    # half-plane values f(p) = cross(d, p - v0) / |d|  (signed distance,
    # meters); inside means f >= 0
    dn = jnp.sqrt(d[..., 0] ** 2 + d[..., 1] ** 2)
    dn = jnp.where(dn > _EPS, dn, 1.0)
    f0 = (
        d[..., 0] * (p0[..., 1] - v0[..., 1])
        - d[..., 1] * (p0[..., 0] - v0[..., 0])
    ) / dn  # (..., 4, 4)
    f1 = (
        d[..., 0] * (p1[..., 1] - v0[..., 1])
        - d[..., 1] * (p1[..., 0] - v0[..., 0])
    ) / dn
    df = f1 - f0
    eps = 1e-5  # meters
    t_cross = -f0 / jnp.where(jnp.abs(df) > eps, df, 1.0)

    lower = jnp.where(df > eps, t_cross, 0.0)
    upper = jnp.where(df < -eps, t_cross, 1.0)
    # constant-f edge (parallel to the clip edge): feasibility decided by f0.
    # strict=True drops edges lying exactly ON the clip boundary — used for
    # the second polygon so collinear shared edges are not double-counted.
    thresh = eps if strict else -eps
    infeasible = (jnp.abs(df) <= eps) & (f0 < thresh)
    lower = jnp.where(infeasible, 2.0, lower)

    t_lo = jnp.clip(lower.max(axis=-1), 0.0, 1.0)  # (..., 4)
    t_hi = jnp.clip(upper.min(axis=-1), 0.0, 1.0)
    ok = (t_hi > t_lo).astype(poly.dtype)

    e0 = poly
    e1 = jnp.roll(poly, -1, axis=-2)
    a = e0 + t_lo[..., None] * (e1 - e0)
    b = e0 + t_hi[..., None] * (e1 - e0)
    cross = a[..., 0] * b[..., 1] - a[..., 1] * b[..., 0]
    return (cross * ok).sum(axis=-1)


def quad_intersection_area(qa, qb):
    """Intersection area of convex quads. qa, qb: (..., 4, 2) -> (...,)."""
    qa = _ccw(qa)
    qb = _ccw(qb)
    total = _clipped_edge_contribution(qa, qb, strict=False) + (
        _clipped_edge_contribution(qb, qa, strict=True)
    )
    return jnp.maximum(0.5 * total, 0.0)


def quad_intersection_area_hull(qa, qb):
    """Reference implementation via candidate vertices + angular sort.

    Kept for cross-validation in tests; prefer quad_intersection_area.
    """
    batch = jnp.broadcast_shapes(qa.shape[:-2], qb.shape[:-2])
    qa = jnp.broadcast_to(qa, batch + (4, 2))
    qb = jnp.broadcast_to(qb, batch + (4, 2))
    in_b = _points_in_quad(qa, qb)  # (..., 4)
    in_a = _points_in_quad(qb, qa)  # (..., 4)
    inter_pts, inter_valid = _edge_intersections(qa, qb)  # (..., 16, 2)
    pts = jnp.concatenate([qa, qb, inter_pts], axis=-2)  # (..., 24, 2)
    valid = jnp.concatenate([in_b, in_a, inter_valid], axis=-1)
    return _masked_hull_area(pts, valid)


def quad_area(q):
    """Shoelace area of quads (..., 4, 2) -> (...,)."""
    nxt = jnp.roll(q, -1, axis=-2)
    cross = q[..., 0] * nxt[..., 1] - q[..., 1] * nxt[..., 0]
    return 0.5 * jnp.abs(cross.sum(axis=-1))


def quad_iou_pairwise(qa, qb, row_chunk: int = 256):
    """Pairwise IoU matrix between two sets of quads.

    qa: (N, 4, 2), qb: (M, 4, 2) -> (N, M). Row-chunked with ``lax.map`` to
    bound the (chunk, M, 4, 4) clip intermediates.
    """
    n, m = qa.shape[0], qb.shape[0]
    area_a = quad_area(qa)
    area_b = quad_area(qb)
    pad = (-n) % row_chunk
    qa_p = jnp.pad(qa, ((0, pad), (0, 0), (0, 0)))
    chunks = qa_p.reshape(-1, row_chunk, 4, 2)

    def one_chunk(chunk):
        return quad_intersection_area(
            chunk[:, None], qb[None, :]
        )  # (row_chunk, M)

    inter = jax.lax.map(one_chunk, chunks).reshape(-1, m)[:n]
    union = area_a[:, None] + area_b[None, :] - inter
    return jnp.where(union > _EPS, inter / jnp.where(union > _EPS, union, 1.0), 0.0)


def quad_iou_elementwise(qa, qb):
    """Elementwise IoU: qa, qb (..., 4, 2) -> (...,)."""
    inter = quad_intersection_area(qa, qb)
    union = quad_area(qa) + quad_area(qb) - inter
    return jnp.where(union > _EPS, inter / jnp.where(union > _EPS, union, 1.0), 0.0)


def _boxes7_to_quads_z(boxes, order: str):
    """(N, 7) boxes -> bottom-face quads (N, 4, 2) + z intervals (N, 2)."""
    from gencomm_tpu.utils.box_utils import boxes_to_corners2d

    quads = boxes_to_corners2d(boxes, order)
    if order == "hwl":
        h = boxes[:, 3]
    else:
        h = boxes[:, 5]
    z0 = boxes[:, 2] - h / 2.0
    z1 = boxes[:, 2] + h / 2.0
    return quads, jnp.stack([z0, z1], axis=-1)


def boxes_iou3d(boxes_a, boxes_b, order: str = "lwh", row_chunk: int = 256):
    """Pairwise rotated 3D IoU, (N, 7) x (M, 7) -> (N, M).

    TPU-native replacement for pcdet_utils/iou3d_nms ``boxes_iou3d_gpu``
    (reference: opencood/pcdet_utils/iou3d_nms/iou3d_nms.cpp): BEV polygon
    intersection (Sutherland-Hodgman, static buffers) times z-overlap.
    """
    qa, za = _boxes7_to_quads_z(jnp.asarray(boxes_a), order)
    qb, zb = _boxes7_to_quads_z(jnp.asarray(boxes_b), order)
    inter_bev = quad_iou_pairwise(qa, qb, row_chunk)  # IoU, need raw inter
    # recompute raw intersection area from IoU to avoid a second clip pass:
    # iou = I / (Aa + Ab - I)  =>  I = iou * (Aa + Ab) / (1 + iou)
    area_a, area_b = quad_area(qa), quad_area(qb)
    s = area_a[:, None] + area_b[None, :]
    inter_area = inter_bev * s / (1.0 + inter_bev)
    zov = jnp.clip(
        jnp.minimum(za[:, None, 1], zb[None, :, 1])
        - jnp.maximum(za[:, None, 0], zb[None, :, 0]),
        0.0, None,
    )
    inter3d = inter_area * zov
    vol_a = area_a * (za[:, 1] - za[:, 0])
    vol_b = area_b * (zb[:, 1] - zb[:, 0])
    union = vol_a[:, None] + vol_b[None, :] - inter3d
    return jnp.where(union > _EPS, inter3d / jnp.where(union > _EPS, union, 1.0), 0.0)


def boxes_iou3d_elementwise(boxes_a, boxes_b, order: str = "lwh"):
    """Aligned (elementwise) rotated 3D IoU, (N, 7) x (N, 7) -> (N,).

    Replacement for ``aligned_boxes_iou3d_gpu`` (used by the IoU-rescore
    losses, reference: opencood/loss/ciassd_loss.py:92-96).
    """
    qa, za = _boxes7_to_quads_z(jnp.asarray(boxes_a), order)
    qb, zb = _boxes7_to_quads_z(jnp.asarray(boxes_b), order)
    inter_bev = quad_intersection_area(qa, qb)
    zov = jnp.clip(
        jnp.minimum(za[:, 1], zb[:, 1]) - jnp.maximum(za[:, 0], zb[:, 0]),
        0.0, None,
    )
    inter3d = inter_bev * zov
    vol_a = quad_area(qa) * (za[:, 1] - za[:, 0])
    vol_b = quad_area(qb) * (zb[:, 1] - zb[:, 0])
    union = vol_a + vol_b - inter3d
    return jnp.where(union > _EPS, inter3d / jnp.where(union > _EPS, union, 1.0), 0.0)
