"""On-device rotated NMS with static shapes.

The reference runs greedy shapely-polygon NMS on CPU with a top-1000 cap
(opencood/utils/box_utils.py:915-961) — a device->host sync per frame. Here
the K candidate boxes stay on device: one K x K rotated-quad IoU matrix
(vectorized convex clipping) followed by a ``fori_loop`` greedy suppression
over the score-sorted order. Same keep-set semantics for non-degenerate
inputs.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from gencomm_tpu.ops.rotated_iou import quad_iou_pairwise


@partial(jax.jit, static_argnames=("row_chunk",))
def rotated_nms(corners, scores, valid, iou_thresh: float, row_chunk: int = 64):
    """Greedy rotated NMS.

    corners: (K, 4, 2) BEV quads; scores: (K,); valid: (K,) bool.
    Returns (order, keep): ``order`` is the score-descending permutation and
    ``keep`` a bool mask aligned with ``order``. Gather results as
    ``corners[order][keep]`` (mask form keeps shapes static under jit).
    """
    k = scores.shape[0]
    neg = jnp.finfo(scores.dtype).min
    s = jnp.where(valid, scores, neg)
    order = jnp.argsort(-s)
    q = corners[order]
    v = valid[order]

    iou = quad_iou_pairwise(q, q, row_chunk=row_chunk)  # (K, K)
    idx = jnp.arange(k)
    # overlap[j, i]: higher-scored j (j < i in sorted order) would suppress i
    overlap = (iou > iou_thresh) & (idx[:, None] < idx[None, :])

    # Exact greedy keep-set via round-parallel closure instead of a K-step
    # sequential fori_loop (which costs ~3.7 us/step on TPU — the profiled
    # hot spot of the whole pipeline). Each round:
    #   * a candidate = still-undecided box not overlapped by any KEPT box;
    #   * keep every candidate with no higher-scored candidate overlapping
    #     it. Such a box is kept by sequential greedy too: every
    #     higher-scored overlapping box is suppressed by an already-kept
    #     box, so it can never be kept itself.
    # Each round finalizes at least the highest-scored undecided candidate,
    # and rounds = suppression-chain depth (2-4 in practice, K worst case),
    # each one two masked (K, K) any-reductions — pure VPU work.

    def cond(state):
        kept, und = state
        return und.any()

    def body(state):
        kept, und = state
        sup_by_kept = (overlap & kept[:, None]).any(axis=0)
        und = und & ~sup_by_kept
        blocked = (overlap & und[:, None]).any(axis=0)
        newkeep = und & ~blocked
        return kept | newkeep, und & ~newkeep

    kept0 = jnp.zeros((k,), dtype=bool)
    kept, _ = jax.lax.while_loop(cond, body, (kept0, v))
    return order, kept
