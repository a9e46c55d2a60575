import numpy as np
import jax.numpy as jnp

from gencomm_tpu.ops.rotated_iou import (
    quad_iou_elementwise,
    quad_iou_pairwise,
    quad_area,
)
from gencomm_tpu.ops.nms import rotated_nms
from gencomm_tpu.utils.box_utils import boxes_to_corners2d


def _aa_quad(cx, cy, w, h):
    return np.array(
        [
            [cx - w / 2, cy - h / 2],
            [cx + w / 2, cy - h / 2],
            [cx + w / 2, cy + h / 2],
            [cx - w / 2, cy + h / 2],
        ],
        dtype=np.float32,
    )


def test_quad_area():
    q = jnp.asarray(_aa_quad(0, 0, 2, 3)[None])
    assert np.isclose(quad_area(q)[0], 6.0)


def test_iou_identical():
    q = jnp.asarray(_aa_quad(1, 2, 2, 4)[None])
    assert np.isclose(quad_iou_elementwise(q, q)[0], 1.0, atol=1e-5)


def test_iou_disjoint():
    a = jnp.asarray(_aa_quad(0, 0, 2, 2)[None])
    b = jnp.asarray(_aa_quad(10, 0, 2, 2)[None])
    assert np.isclose(quad_iou_elementwise(a, b)[0], 0.0, atol=1e-6)


def test_iou_half_overlap():
    a = jnp.asarray(_aa_quad(0, 0, 2, 2)[None])
    b = jnp.asarray(_aa_quad(1, 0, 2, 2)[None])
    # intersection 1x2=2, union 4+4-2=6
    assert np.isclose(quad_iou_elementwise(a, b)[0], 2 / 6, atol=1e-5)


def test_iou_rotated_45():
    # unit square vs itself rotated 45 deg about center:
    # intersection is a regular octagon, area = 2*(sqrt(2)-1)
    boxes = np.array(
        [[0, 0, 0, 1.0, 1.0, 1.0, 0.0], [0, 0, 0, 1.0, 1.0, 1.0, np.pi / 4]]
    )
    quads = jnp.asarray(boxes_to_corners2d(boxes, "hwl"))
    inter = 2 * (np.sqrt(2) - 1)
    expect = inter / (2 - inter)
    got = quad_iou_elementwise(quads[0:1], quads[1:2])[0]
    assert np.isclose(got, expect, atol=1e-4)


def test_iou_contained():
    a = jnp.asarray(_aa_quad(0, 0, 4, 4)[None])
    b = jnp.asarray(_aa_quad(0.5, 0.5, 1, 1)[None])
    assert np.isclose(quad_iou_elementwise(a, b)[0], 1 / 16, atol=1e-5)


def test_pairwise_matches_elementwise():
    rng = np.random.RandomState(3)
    n, m = 13, 9
    boxes_a = np.concatenate(
        [
            rng.uniform(-5, 5, (n, 2)),
            np.zeros((n, 1)),
            rng.uniform(1, 3, (n, 3)),
            rng.uniform(-np.pi, np.pi, (n, 1)),
        ],
        axis=1,
    )
    boxes_b = boxes_a[:m] + 0.5
    qa = jnp.asarray(boxes_to_corners2d(boxes_a, "hwl"))
    qb = jnp.asarray(boxes_to_corners2d(boxes_b, "hwl"))
    mat = np.asarray(quad_iou_pairwise(qa, qb, row_chunk=4))
    for i in range(n):
        row = np.asarray(quad_iou_elementwise(jnp.tile(qa[i : i + 1], (m, 1, 1)), qb))
        assert np.allclose(mat[i], row, atol=1e-5)
    # sanity vs monte-carlo for one pair
    pts = rng.uniform(-6, 6, (200000, 2))

    def inside(q, p):
        res = np.ones(len(p), bool)
        for k in range(4):
            a, b = q[k], q[(k + 1) % 4]
            res &= (b[0] - a[0]) * (p[:, 1] - a[1]) - (b[1] - a[1]) * (
                p[:, 0] - a[0]
            ) >= 0
        return res

    qa0, qb0 = np.asarray(qa[0]), np.asarray(qb[0])
    ia, ib = inside(qa0, pts), inside(qb0, pts)
    mc = (ia & ib).sum() / max((ia | ib).sum(), 1)
    assert abs(mat[0, 0] - mc) < 0.02


def test_fast_area_matches_hull_reference():
    from gencomm_tpu.ops.rotated_iou import (
        quad_intersection_area,
        quad_intersection_area_hull,
    )

    rng = np.random.RandomState(7)
    n = 300
    boxes = np.concatenate(
        [
            rng.uniform(-4, 4, (n, 2)),
            np.zeros((n, 1)),
            rng.uniform(0.5, 3, (n, 3)),
            rng.uniform(-np.pi, np.pi, (n, 1)),
        ],
        axis=1,
    )
    qa = jnp.asarray(boxes_to_corners2d(boxes, "hwl"), jnp.float32)
    qb = jnp.roll(qa, 1, axis=0)
    fast = np.asarray(quad_intersection_area(qa, qb))
    ref = np.asarray(quad_intersection_area_hull(qa, qb))
    np.testing.assert_allclose(fast, ref, atol=1e-3)
    # winding insensitivity: flip qb's vertex order
    fast_flipped = np.asarray(quad_intersection_area(qa, qb[:, ::-1, :]))
    np.testing.assert_allclose(fast_flipped, ref, atol=1e-3)


def test_rotated_nms_basic():
    boxes = np.array(
        [
            [0, 0, 0, 1.0, 2.0, 4.0, 0.0],      # kept (highest score)
            [0.2, 0, 0, 1.0, 2.0, 4.0, 0.0],    # suppressed by 0
            [20, 0, 0, 1.0, 2.0, 4.0, 0.5],     # kept
            [0, 0, 0, 1.0, 2.0, 4.0, 0.0],      # invalid
        ]
    )
    quads = jnp.asarray(boxes_to_corners2d(boxes, "hwl"), dtype=jnp.float32)
    scores = jnp.asarray([0.9, 0.8, 0.7, 0.99])
    valid = jnp.asarray([True, True, True, False])
    order, keep = rotated_nms(quads, scores, valid, iou_thresh=0.15, row_chunk=4)
    kept_idx = np.asarray(order)[np.asarray(keep)]
    assert set(kept_idx.tolist()) == {0, 2}


def test_rotated_nms_matches_sequential_greedy_dense():
    """The round-parallel keep-set closure in ops/nms.py must equal the
    reference's sequential greedy walk (box_utils.py:915-961) exactly, on
    dense random clusters that force deep suppression chains."""
    from gencomm_tpu.ops.rotated_iou import quad_iou_pairwise

    rng = np.random.default_rng(0)
    for trial in range(4):
        k = 128
        centers = rng.normal(0, 3 if trial % 2 else 1.2, (k, 2))
        ang = rng.uniform(0, np.pi, k)
        w = rng.uniform(1.5, 2.5, k)
        h = rng.uniform(3.5, 5.0, k)
        quads = np.zeros((k, 4, 2), np.float32)
        for i in range(k):
            c, s = np.cos(ang[i]), np.sin(ang[i])
            rot = np.array([[c, -s], [s, c]])
            box = np.array([[-w[i] / 2, -h[i] / 2], [w[i] / 2, -h[i] / 2],
                            [w[i] / 2, h[i] / 2], [-w[i] / 2, h[i] / 2]])
            quads[i] = box @ rot.T + centers[i]
        scores = rng.uniform(0, 1, k).astype(np.float32)
        valid = rng.uniform(0, 1, k) > 0.1

        iou = np.asarray(quad_iou_pairwise(jnp.asarray(quads),
                                           jnp.asarray(quads)))
        order_ref = np.argsort(-np.where(valid, scores, -np.inf))
        iou_s = iou[np.ix_(order_ref, order_ref)]
        v = valid[order_ref]
        suppressed = ~v
        keep_ref = np.zeros(k, bool)
        for i in range(k):
            if suppressed[i]:
                continue
            keep_ref[i] = True
            suppressed |= (iou_s[i] > 0.15) & (np.arange(k) > i)

        order, keep = rotated_nms(jnp.asarray(quads), jnp.asarray(scores),
                                  jnp.asarray(valid), 0.15)
        kept_new = set(np.asarray(order)[np.asarray(keep)].tolist())
        kept_ref = set(order_ref[keep_ref].tolist())
        assert kept_new == kept_ref
