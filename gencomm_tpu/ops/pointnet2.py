"""Fixed-shape pointnet2-style ops: FPS, radius grouping, masked pooling.

TPU-native replacement for opencood/pcdet_utils/pointnet2/* (CUDA stack
ops: furthest_point_sample, ball_query, group_points). Dynamic neighbor
lists become static (M, nsample) gathers chosen by top-k over masked
distances; empty slots carry a validity mask that downstream max-pools
respect. Everything is jittable and vmappable over agents.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

_BIG = 1e9


@partial(jax.jit, static_argnames=("k",))
def farthest_point_sample(xyz: jnp.ndarray, valid: jnp.ndarray, k: int):
    """Iterative farthest-point sampling.

    xyz: (N, 3), valid: (N,) bool -> (k,) int32 indices (padded slots repeat
    the first valid index). Parity: pointnet2_stack furthest_point_sample
    (consumed at vsa.py:152-156).
    """
    n = xyz.shape[0]
    big = jnp.where(valid, _BIG, -_BIG)  # invalid points never selected
    first = jnp.argmax(valid.astype(jnp.int32))  # first valid point

    def body(i, state):
        dists, idxs = state
        last = idxs[i]
        d = jnp.sum((xyz - xyz[last]) ** 2, axis=-1)
        dists = jnp.minimum(dists, jnp.where(valid, d, -_BIG))
        nxt = jnp.argmax(dists)
        idxs = idxs.at[i + 1].set(nxt)
        return dists, idxs

    idxs0 = jnp.full((k,), first, dtype=jnp.int32)
    dists0 = big
    _, idxs = jax.lax.fori_loop(0, k - 1, body, (dists0, idxs0))
    return idxs


def radius_group(src_xyz, src_valid, src_feats, new_xyz, new_valid,
                 radius: float, nsample: int, row_chunk: int = 128):
    """Group up to ``nsample`` sources within ``radius`` of each query.

    src_xyz (N, 3), src_valid (N,), src_feats (N, C) or None,
    new_xyz (M, 3), new_valid (M,) ->
      grouped_xyz (M, nsample, 3) relative coords,
      grouped_feats (M, nsample, C) (zeros if src_feats is None),
      group_mask (M, nsample) bool.

    Parity: pointnet2 ball_query + grouping (QueryAndGroup); selection is
    nearest-``nsample``-within-radius instead of first-found (a strictly
    better, order-independent choice that keeps shapes static).
    """
    m = new_xyz.shape[0]
    pad = (-m) % row_chunk
    q = jnp.pad(new_xyz, ((0, pad), (0, 0)))

    def one_chunk(qc):
        d2 = jnp.sum((qc[:, None] - src_xyz[None]) ** 2, axis=-1)
        d2 = jnp.where(src_valid[None], d2, _BIG)
        neg, idx = jax.lax.top_k(-d2, nsample)  # nearest nsample
        ok = (-neg) <= radius * radius
        return idx, ok

    chunks = q.reshape(-1, row_chunk, 3)
    idx, ok = jax.lax.map(one_chunk, chunks)
    idx = idx.reshape(-1, nsample)[:m]
    ok = ok.reshape(-1, nsample)[:m] & new_valid[:, None]

    g_xyz = src_xyz[idx] - new_xyz[:, None]  # relative coords
    g_xyz = jnp.where(ok[..., None], g_xyz, 0.0)
    if src_feats is None:
        g_feats = jnp.zeros(idx.shape + (0,), dtype=src_xyz.dtype)
    else:
        g_feats = jnp.where(ok[..., None], src_feats[idx], 0.0)
    return g_xyz, g_feats, ok


def masked_max_pool(x, mask):
    """(M, S, C), (M, S) -> (M, C) max over valid slots (zeros if none)."""
    neg = jnp.where(mask[..., None], x, -_BIG)
    out = neg.max(axis=-2)
    any_valid = mask.any(axis=-1, keepdims=True)
    return jnp.where(any_valid, out, 0.0)


def bilinear_interpolate(grid, x, y):
    """Bilinear sample a (H, W, C) grid at float pixel coords x, y (N,).

    Parity: vsa.py bilinear_interpolate_torch:13-42.
    """
    h, w = grid.shape[:2]
    x0 = jnp.clip(jnp.floor(x).astype(jnp.int32), 0, w - 1)
    x1 = jnp.clip(x0 + 1, 0, w - 1)
    y0 = jnp.clip(jnp.floor(y).astype(jnp.int32), 0, h - 1)
    y1 = jnp.clip(y0 + 1, 0, h - 1)
    ia, ib = grid[y0, x0], grid[y1, x0]
    ic, id_ = grid[y0, x1], grid[y1, x1]
    wa = (x1 - x) * (y1 - y)
    wb = (x1 - x) * (y - y0)
    wc = (x - x0) * (y1 - y)
    wd = (x - x0) * (y - y0)
    return (ia * wa[:, None] + ib * wb[:, None]
            + ic * wc[:, None] + id_ * wd[:, None])
