"""MXU-native pillar canvas build (sorted segment-max as Pallas kernel).

The flagship's single hottest device op is the pillar max-scatter that
builds the BEV canvas from per-point PFN features: XLA lowers `.at[].max`
as a serialized per-row apply (~8 ns/row sorted — 1.24 ms/step on the
5-agent flagship graph, r5 device trace). Parity target:
opencood/models/sub_modules/point_pillar_scatter.py:19-76 (the reference
scatters with dense index_put on GPU).

TPU-first design (the r3 LSS splat kernel's stripe binning, adapted to a
MAX reduction — and without its fatal prep cost, because the C++ host
decorator already emits rows SORTED by pillar id, so no device-side
argsort/permutation is needed at all):

  1. the host emits rows in STRIPE-PADDED order (native.stripe_pad_sorted):
     each stripe (T contiguous canvas cells) owns a whole number of R-row
     chunks, chunk stripe ids non-decreasing; pad rows repeat the previous
     gid with zeroed features (max identity for the >= 0 post-ReLU PFN
     features).
  2. one sequential Pallas grid pass over chunks. Per chunk:
       a. chunk-local SEGMENTED MAX over each equal-gid run
          (log2(R) shift-max steps on the VPU; rows ordered, runs
          contiguous) so the first row of each run holds the run max;
       b. one-hot HEAD matmul on the MXU: oh[t, i] = (cell t == gid i)
          AND (i is run head). Each cell has at most one head row per
          chunk, so the f32 dot-product sum IS that head's value;
       c. stripe-block accumulate: first visit overwrites, later chunks
          of the same stripe combine with max (runs crossing chunk
          boundaries produce one head per chunk).
  3. stripes never visited keep garbage — masked to zero outside with the
     per-stripe visited flags.

Values must be >= 0 (post-ReLU, invalid rows masked to 0) — zero is used
as the max identity throughout, exactly like the zero-init canvas of the
XLA scatter path, so empty pillars stay exactly 0.

Feature rows enter in their natural (M, C) layout; each chunk is
transposed to (C, R) in-kernel by an identity one-hot MXU matmul so the
shift-max runs along the lane axis and the (1, R) gid row broadcasts
against (C, R) without any sublane/lane vector transpose; the head matmul
then contracts the lane axis of both operands ((T, R) x (C, R) -> (T, C)).
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

STRIPE_CELLS = 1024
CHUNK_ROWS = 128


def _kernel(cs_ref, first_ref, ids_ref, x_ref, out_ref, *, t, r):
    c = pl.program_id(0)
    ids = ids_ref[pl.ds(c % 8, 1), :]  # (1, R) stripe-local cell ids
    # in-kernel transpose (R, C) -> (C, R) via an identity one-hot matmul
    # (MXU; bit-exact — each sum has a single 1*v term). Keeping the
    # global x in its natural (M, C) layout avoids a full-array transpose
    # copy that XLA would otherwise insert before the kernel.
    xr = x_ref[:]  # (R, C) rows >= 0, pad rows 0
    r_iota = jax.lax.broadcasted_iota(jnp.int32, (r, r), 0)
    eye = (r_iota == jax.lax.broadcasted_iota(jnp.int32, (r, r), 1))
    x = jax.lax.dot_general(
        xr, eye.astype(xr.dtype),
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(xr.dtype)  # (C, R)

    # chunk-local segmented max: after step s, x[:, i] covers rows
    # i..i+2s-1 of its run; sorted order makes runs contiguous
    s = 1
    while s < r:
        ids_sh = jnp.concatenate(
            [ids[:, s:], jnp.full((1, s), -1, ids.dtype)], axis=1)
        x_sh = jnp.concatenate(
            [x[:, s:], jnp.zeros((x.shape[0], s), x.dtype)], axis=1)
        x = jnp.maximum(x, jnp.where(ids_sh == ids, x_sh, 0))
        s *= 2

    prev = jnp.concatenate(
        [jnp.full((1, 1), -1, ids.dtype), ids[:, :-1]], axis=1)
    head = ids != prev  # (1, R); first lane always a head (prev = -1)

    t_iota = jax.lax.broadcasted_iota(jnp.int32, (t, r), 0)
    oh = ((t_iota == ids) & head).astype(jnp.float32)  # (T, R)
    contrib = jax.lax.dot_general(
        oh, x.astype(jnp.float32),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(out_ref.dtype)  # (T, C)

    @pl.when(first_ref[c] == 1)
    def _():
        out_ref[:] = contrib

    @pl.when(first_ref[c] == 0)
    def _():
        out_ref[:] = jnp.maximum(out_ref[:], contrib)


@partial(jax.jit, static_argnames=("n_agents", "ncell", "stripe_cells",
                                   "chunk_rows", "interpret"))
def striped_pillar_canvas(x, gids, n_agents: int, ncell: int,
                          stripe_cells: int = STRIPE_CELLS,
                          chunk_rows: int = CHUNK_ROWS,
                          interpret: bool | None = None):
    """x: (A*N_out, C) masked non-negative BF16 rows in stripe-padded
    order; gids: (A*N_out,) int32 within-agent cell ids (pads repeat the
    previous gid). Returns the canvas (A, ncell, C) bf16.

    bf16-only by design: the head matmul's default-precision MXU pass
    rounds operands to bf16, and the production canvas is already bf16
    (point_pillar.py casts before the scatter — max commutes with the
    monotone bf16 rounding), so bf16 in/out is BIT-EXACT vs the XLA
    scatter path while fp32 inputs would silently lose mantissa bits.
    """
    assert x.dtype == jnp.bfloat16, "striped canvas is bf16-only"
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    t, r = stripe_cells, chunk_rows
    m, c_ch = x.shape
    n_out = m // n_agents
    assert n_out * n_agents == m and n_out % r == 0, (m, n_agents, r)
    n_stripes = -(-ncell // t)
    n_chunks = m // r
    s_total = n_agents * n_stripes

    chunk_first_gid = gids[::r]
    chunk_agent = (jnp.arange(n_chunks, dtype=jnp.int32) * r) // n_out
    cs = chunk_agent * n_stripes + chunk_first_gid // t
    first = jnp.concatenate(
        [jnp.ones((1,), jnp.int32),
         (cs[1:] != cs[:-1]).astype(jnp.int32)])

    local = (gids % t).astype(jnp.int32).reshape(n_chunks, r)
    pad8 = (-n_chunks) % 8
    if pad8:
        local = jnp.pad(local, ((0, pad8), (0, 0)))

    out = pl.pallas_call(
        partial(_kernel, t=t, r=r),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(n_chunks,),
            in_specs=[
                pl.BlockSpec((8, r), lambda c, cs, fr: (c // 8, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((r, c_ch), lambda c, cs, fr: (c, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((t, c_ch), lambda c, cs, fr: (cs[c], 0),
                                   memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct((s_total * t, c_ch), x.dtype),
        interpret=interpret,
    )(cs, first, local, x)

    visited = jnp.zeros((s_total,), bool).at[cs].set(True)
    out = jnp.where(visited[:, None, None],
                    out.reshape(s_total, t, c_ch), 0)
    # per-agent stripes are padded to n_stripes*t cells >= ncell
    return out.reshape(n_agents, n_stripes * t, c_ch)[:, :ncell]


def striped_pillar_canvas_reference(x, gids, n_agents: int, ncell: int):
    """XLA scatter-max reference (the production fallback path) for tests:
    identical contract to :func:`striped_pillar_canvas`."""
    m, c_ch = x.shape
    n_out = m // n_agents
    agent = jnp.arange(m, dtype=jnp.int32) // n_out
    flat = agent * ncell + jnp.minimum(gids, ncell - 1)
    canvas = jnp.zeros((n_agents * ncell, c_ch), x.dtype)
    canvas = canvas.at[flat].max(x)
    return canvas.reshape(n_agents, ncell, c_ch)
