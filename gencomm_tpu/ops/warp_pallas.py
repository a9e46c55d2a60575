"""MXU-native affine BEV warp (Pallas kernel).

The inter-agent feature warp (reference ``warp_affine_simple``,
torch_transformation_utils.py:323-332) is the hottest non-conv op in every
fusion method. A straight gather formulation (ops/warp.py) runs at ~1% of
HBM bandwidth on TPU — gathers do not vectorize. This kernel reformulates
EXACT bilinear affine sampling as dense matmuls:

    out[p, c] = sum_q G[p, q] * src[q, c]

where, for one output row, G[p, (ys, xs)] = wy[p, ys] * wx[p, xs] and the
triangle weights  w = max(0, 1 - |coord - idx|)  (zeroed out of range) are
EXACTLY the bilinear corner weights with zero padding. G is built on the
VPU from broadcasted iotas — no gather anywhere — and the contraction runs
on the MXU. Grid: (N, H_out, source-row blocks), accumulating over the
last axis.

Gradients: custom_vjp — d/dsrc reuses the differentiable gather warp
(training only, correctness over speed); theta gets no gradient (affines
come from agent poses).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gencomm_tpu.ops.warp import warp_affine as _gather_warp


def _pick_kb(h: int, w: int) -> int:
    """Source-row block so G (W, KB*W) stays ~<=4 MB fp32."""
    budget = 4 * 1024 * 1024 // 4
    kb = max(1, budget // max(w * w, 1))
    kb = min(kb, h, 64)
    return kb


def _warp_kernel(theta_ref, src_ref, out_ref, *, h_in, w_in, w_out, kb):
    # theta_ref: (1, 2, 3); src_ref: (1, KB, W_in, C); out_ref: (1, 1, W_out, C)
    ho = pl.program_id(1)
    kb_i = pl.program_id(2)

    th = theta_ref[0]  # (2, 3)
    # normalized output coords for this row (align_corners=False)
    j = jax.lax.broadcasted_iota(jnp.int32, (w_out, 1), 0)[:, 0].astype(jnp.float32)
    gx = (2.0 * j + 1.0) / w_out - 1.0
    # H_out is the size of grid axis 1 (one kernel instance per output row)
    gy = (2.0 * ho.astype(jnp.float32) + 1.0) / pl.num_programs(1) - 1.0
    sx = th[0, 0] * gx + th[0, 1] * gy + th[0, 2]
    sy = th[1, 0] * gx + th[1, 1] * gy + th[1, 2]
    # to source pixel coords
    x = (sx + 1.0) * w_in / 2.0 - 0.5  # (W_out,)
    y = (sy + 1.0) * h_in / 2.0 - 0.5

    # G built directly in 2D (q = r_local * W_in + xs); Mosaic does not
    # support reshapes that collapse the lane dimension, so no 3D interm.
    q = jax.lax.broadcasted_iota(jnp.int32, (w_out, kb * w_in), 1)
    r = (q // w_in + kb_i * kb).astype(jnp.float32)
    cx = (q % w_in).astype(jnp.float32)
    wy = jnp.maximum(0.0, 1.0 - jnp.abs(y[:, None] - r))
    wy = jnp.where(r <= h_in - 1, wy, 0.0)  # grid padding beyond H_in
    # zero-padding semantics: triangle weights vanish >1 px out of range
    wx = jnp.maximum(0.0, 1.0 - jnp.abs(x[:, None] - cx))
    g = wy * wx
    src = src_ref[0].reshape(kb * w_in, src_ref.shape[-1])
    # HIGHEST: fp32 multi-pass on the MXU — the default bf16 passes round
    # the interpolation weights and features to ~1e-2, failing parity
    acc = jnp.dot(g, src, preferred_element_type=jnp.float32,
                  precision=jax.lax.Precision.HIGHEST)

    @pl.when(kb_i == 0)
    def _():
        out_ref[0, 0] = acc.astype(out_ref.dtype)

    @pl.when(kb_i != 0)
    def _():
        out_ref[0, 0] = out_ref[0, 0] + acc.astype(out_ref.dtype)


def _warp_mxu_impl(src, theta, out_h):
    n, h_in, w_in, ch = src.shape
    kb = _pick_kb(h_in, w_in)
    n_kb = pl.cdiv(h_in, kb)
    kernel = partial(
        _warp_kernel, h_in=h_in, w_in=w_in, w_out=w_in, kb=kb
    )
    return pl.pallas_call(
        kernel,
        grid=(n, out_h, n_kb),
        in_specs=[
            pl.BlockSpec((1, 2, 3), lambda i, j, k: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, kb, w_in, ch), lambda i, j, k: (i, k, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, w_in, ch), lambda i, j, k: (i, j, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, out_h, w_in, ch), src.dtype),
        interpret=jax.default_backend() != "tpu",
    )(theta, src)


@jax.custom_vjp
def warp_affine_mxu(src, theta):
    """Exact bilinear affine warp, NHWC, MXU formulation.

    src: (N, H, W, C); theta: (N, 2, 3) normalized affine (torch
    ``affine_grid`` convention, align_corners=False). Returns (N, H, W, C).
    """
    return _warp_mxu_impl(src, theta, src.shape[1])


def _fwd(src, theta):
    return warp_affine_mxu(src, theta), (src, theta)


def _bwd(res, g):
    src, theta = res
    # differentiate through the (slow but exact) gather formulation
    nchw = jnp.moveaxis(src, -1, 1)

    def f(s):
        return _gather_warp(s, theta)

    _, vjp = jax.vjp(f, nchw)
    (d_nchw,) = vjp(jnp.moveaxis(g, -1, 1))
    return jnp.moveaxis(d_nchw, 1, -1), jnp.zeros_like(theta)


warp_affine_mxu.defvjp(_fwd, _bwd)


def warp_affine_auto(src_nchw, theta, force_mxu: bool = False):
    """Warp with the gather API's NCHW layout, optionally via the MXU
    kernel. With the precision fix in ops/warp.py the gather formulation
    benches faster at fusion-map sizes, so it is the default; the MXU
    kernel is kept for very large maps / gather-hostile backends.
    """
    if not force_mxu or jax.default_backend() != "tpu":
        return _gather_warp(src_nchw, theta)
    lead = src_nchw.shape[:-3]
    c, h, w = src_nchw.shape[-3:]
    nhwc = jnp.moveaxis(src_nchw, -3, -1).reshape((-1, h, w, c))
    out = warp_affine_mxu(nhwc, theta.reshape(-1, 2, 3))
    return jnp.moveaxis(out.reshape(lead + (h, w, c)), -1, -3)


def warp_to_ego_nhwc(x, affine):
    """(B, L, H, W, C) + (B, L, L, 2, 3) -> all agents warped into the ego
    frame, NHWC end to end (drop-in for fusion.warp_to_ego without the
    NCHW round-trip)."""
    b, l, h, w, c = x.shape
    theta = affine[:, 0].reshape(b * l, 2, 3)
    out = warp_affine_mxu(x.reshape(b * l, h, w, c), theta)
    return out.reshape(b, l, h, w, c)
