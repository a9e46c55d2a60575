"""MXU-native LSS BEV splat (Pallas kernel).

The camera path's hottest op is the categorical-depth splat: M weighted
feature rows scatter-added into the BEV canvas. XLA lowers the
``segment_sum`` as a serialized per-row apply (~14 ns/row regardless of
row width — measured round 1/2; 2.76 ms/frame at the camera_v2xvit scale).
Parity: opencood/models/heter_encoders.py:161-217 (voxel_pooling) +
utils/camera_utils.py:209-252 (QuickCumsum) — the reference's rank-sort +
cumsum trick, rebuilt as MXU work instead of a memory-serialized scan.

Design (TPU-first):
  1. sort the M rows by flat BEV cell id (argsort on the int ids only —
     permuting full (M, C) rows through the sort network is the measured
     regression; here the big gather happens once, fused with the
     depth-weight multiply when the padded update rows are materialized)
  2. pad each canvas *stripe*'s run of sorted rows to a multiple of the
     chunk size R, so every R-row chunk lands entirely inside one stripe
     (stripe = T contiguous canvas cells)
  3. one sequential Pallas grid pass over chunks: each chunk builds a
     (T, R) one-hot cell-membership matrix from iota comparisons and
     accumulates ``one_hot @ updates`` into the stripe's VMEM-resident
     (T, C) output block on the MXU. The output block index is
     data-dependent — chunk -> stripe — via scalar-prefetch indexing
     (PrefetchScalarGridSpec); sorted order makes each stripe's visits
     consecutive, so the block stays in VMEM for its whole run.
  4. stripes with no rows are never visited: mask them to zero after.

The backward pass needs no scatter at all: d_updates is a row gather of
the canvas cotangent by cell id, reduced over the K depth bins per pixel
(pixel-major row layout is part of this op's contract).

MEASURED (v5e, r3, L=5 camera scale, M=491k rows): the kernel accumulates
in 0.41 ms where the XLA scatter takes 2.76 ms — but the sorted-order prep
(permutation of rows into stripe-padded layout) needs per-row random
gathers that XLA serializes at ~4 ns/row, ~2 ms per M-sized gather. Every
arrangement tried (argsort + take, payload sort + feats row-gather,
stripe-slot inversion) pays at least one such gather, so end-to-end the
kernel path is not faster than segment_sum on this backend. Selectable via
LSSEncoder.splat_impl="pallas" for backends where gathers run at
bandwidth; the default stays segment_sum.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# stripe = T contiguous flat canvas cells; chunk = R sorted rows.
# Padding each stripe run to R requires R <= T is NOT needed (chunks are
# aligned to stripe runs by construction), but MXU cost scales with T and
# the worst-case pad overhead with R.
STRIPE_CELLS = 512
CHUNK_ROWS = 256


def _splat_kernel(cs_ref, first_ref, ids_ref, upd_ref, out_ref, *, t):
    c = pl.program_id(0)
    base = cs_ref[c] * t
    # ids arrive as an (8, R) block of 8 consecutive chunks (VMEM tiling
    # needs >= 8 sublanes); pick this chunk's row by dynamic sublane index
    local = ids_ref[pl.ds(c % 8, 1), :] - base  # (1, R); outside [0,t) -> miss
    t_iota = jax.lax.broadcasted_iota(jnp.int32, (t, local.shape[1]), 0)
    oh = (t_iota == local).astype(upd_ref.dtype)  # (T, R)
    contrib = jnp.dot(oh, upd_ref[:], preferred_element_type=jnp.float32)

    @pl.when(first_ref[c] == 1)
    def _():
        out_ref[:] = contrib

    @pl.when(first_ref[c] == 0)
    def _():
        out_ref[:] = out_ref[:] + contrib


def _splat_fwd_impl(dvals, feats, ids, num_cells, bf16_rows=True):
    p, k = dvals.shape
    c_ch = feats.shape[-1]
    m = p * k
    t, r = STRIPE_CELLS, CHUNK_ROWS
    n_stripes = -(-num_cells // t)
    s_pad = n_stripes * t

    flat_ids = jnp.where(ids < num_cells, ids, s_pad).reshape(m)
    order = jnp.argsort(flat_ids)  # (M,) — int-only sort
    sids = flat_ids[order]

    # per-stripe run boundaries in the sorted order; sentinel rows
    # (id == s_pad) sort past bound[n_stripes] and are dropped
    # method='sort': the default binary-search lowers to a sequential
    # while loop on TPU (measured 19 ms/frame at camera scale) and
    # 'compare_all' materializes an (M, n_stripes) compare matrix (1.4 GB
    # at flagship camera scale); one extra sort of M + n_stripes keys is
    # the cheap option
    bound = jnp.searchsorted(
        sids, jnp.arange(n_stripes + 1, dtype=sids.dtype) * t,
        method="sort",
    ).astype(jnp.int32)
    counts = bound[1:] - bound[:-1]
    pad_counts = -(-counts // r) * r
    pad_off = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(pad_counts)]
    )

    # static slot capacity, rounded so the chunk count is a multiple of 8
    # (the kernel reads ids in (8, R) blocks)
    mp = -(-(m + n_stripes * (r - 1)) // (8 * r)) * (8 * r)
    slots = jnp.arange(mp, dtype=jnp.int32)
    # slot -> stripe map WITHOUT searchsorted: drop a +1 mark at each
    # stripe's first padded slot (n_stripes tiny scatter rows; empty
    # stripes stack marks on the same slot and are skipped by the cumsum,
    # exactly as a binary search would) and prefix-sum the marks
    marks = jnp.zeros((mp + 1,), jnp.int32).at[pad_off[:-1]].add(
        1, mode="drop"
    )[:mp]
    s_of = jnp.clip(jnp.cumsum(marks) - 1, 0, n_stripes - 1)
    within = slots - pad_off[s_of]
    valid = within < counts[s_of]
    src = jnp.where(valid, bound[:-1][s_of] + within, 0)
    row = order[src]  # original row index
    w = jnp.where(valid, dvals.reshape(m)[row], 0.0)
    # THE one big gather: feature row per padded slot (pixel = row // K),
    # fused with the depth-weight multiply; bf16 rows halve the traffic
    # and feed the MXU at its native precision (accumulation stays fp32)
    upd = w[:, None] * feats.reshape(p, c_ch)[row // k]
    if bf16_rows:
        upd = upd.astype(jnp.bfloat16)
    ids_pad = jnp.where(valid, sids[src], s_pad).reshape(mp // r, r)

    chunk_stripe = s_of[::r]  # chunks never straddle stripes (pad to R)
    first = jnp.concatenate(
        [jnp.ones((1,), jnp.int32),
         (chunk_stripe[1:] != chunk_stripe[:-1]).astype(jnp.int32)]
    )

    acc = pl.pallas_call(
        partial(_splat_kernel, t=t),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(mp // r,),
            in_specs=[
                pl.BlockSpec((8, r), lambda c, cs, fr: (c // 8, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((r, c_ch), lambda c, cs, fr: (c, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((t, c_ch), lambda c, cs, fr: (cs[c], 0),
                                   memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct((s_pad, c_ch), jnp.float32),
        interpret=jax.default_backend() != "tpu",
    )(chunk_stripe, first, ids_pad, upd)

    # unvisited stripes hold uninitialized VMEM contents — mask, don't add
    visited = (counts > 0)[:, None, None]  # (n_stripes, 1, 1)
    canvas = jnp.where(
        visited, acc.reshape(n_stripes, t, c_ch), 0.0
    ).reshape(s_pad, c_ch)
    return canvas[:num_cells]


@partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def splat_topk(dvals, feats, ids, num_cells, bf16_rows=True):
    """Top-K categorical-depth splat onto a flat BEV canvas.

    dvals: (P, K) depth weights per pixel (renormalized top-K mass)
    feats: (P, C) image features per pixel
    ids:   (P, K) int32 flat canvas cell per (pixel, k); >= num_cells drops
    bf16_rows: cast the padded update rows to bf16 before the MXU matmul
      (halves HBM traffic; accumulation stays fp32 either way). Threaded
      from LSSEncoder.splat_bf16 so backend choice doesn't silently change
      numerics (ADVICE r3).
    Returns (num_cells, C) fp32 canvas: canvas[c] = sum dvals * feats over
    rows with ids == c. Row layout contract: K is minor (pixel-major).
    """
    return _splat_fwd_impl(dvals, feats, ids, num_cells, bf16_rows)


def _splat_fwd(dvals, feats, ids, num_cells, bf16_rows=True):
    return (_splat_fwd_impl(dvals, feats, ids, num_cells, bf16_rows),
            (dvals, feats, ids))


def _splat_bwd(num_cells, bf16_rows, res, g):
    dvals, feats, ids = res
    p, k = dvals.shape
    valid = ids < num_cells  # (P, K)
    grows = g[jnp.where(valid, ids, 0)]  # (P, K, C) gather — no scatter
    grows = jnp.where(valid[..., None], grows, 0.0)
    d_dvals = jnp.einsum("pc,pkc->pk", feats, grows)
    d_feats = jnp.einsum("pk,pkc->pc", dvals, grows)
    return (
        d_dvals.astype(dvals.dtype), d_feats.astype(feats.dtype),
        np.zeros(ids.shape, dtype=jax.dtypes.float0),
    )


splat_topk.defvjp(_splat_fwd, _splat_bwd)
