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

    def body(i, state):
        suppressed, keep = state
        is_keep = (~suppressed[i]) & v[i]
        keep = keep.at[i].set(is_keep)
        newly = is_keep & (iou[i] > iou_thresh) & (idx > i)
        return suppressed | newly, keep

    suppressed0 = ~v
    keep0 = jnp.zeros((k,), dtype=bool)
    _, keep = jax.lax.fori_loop(0, k, body, (suppressed0, keep0))
    return order, keep
