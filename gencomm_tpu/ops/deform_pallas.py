"""MXU-native deformable 3x3 convolution (Pallas kernel).

GenComm's Deformable Message Extractor wraps torchvision's CUDA
DeformConv2d (message_extractor_v2.py:68-109). The gather formulation
(ops/deform.py) issues 36 bilinear gathers per call — measured 15.6 ms on
v5e at the flagship size, the single most expensive op in the model.

This kernel reformulates each tap's bilinear sampling as a banded one-hot
weight matrix contracted on the MXU (same trick as ops/warp_pallas.py),
made bounded by clamping the learned offsets to ±MAX_OFFSET pixels — a
documented divergence from torchvision's unbounded offsets (learned DCN
offsets saturate at the clamp during training; the reference's typical
magnitudes are ~1-2 px). The clamp is applied in BOTH the kernel and the
reference gather path so backends agree.

Per (batch, output-row) grid instance:
  band = rows [ho-1-R, ho+1+R] of the source (dynamic slice from VMEM)
  for each of the 9 taps: G_k (W, band*W) built from iotas; two matmuls
  G_k @ src_band (bilinear sample) and sample @ W_k (channel mix).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

MAX_OFFSET = 4  # px; band = 2*MAX_OFFSET + 3 rows


def _deform_kernel(off_ref, w_ref, src_ref, out_ref, *, h, w, cin, cout,
                   band, r):
    ho = pl.program_id(1)
    start = jnp.clip(ho - 1 - r, 0, h - band)
    src_band = src_ref[0, pl.ds(start, band)]  # (band, W, C)
    srcf = src_band.reshape(band * w, cin)
    off = off_ref[0, 0]  # (W, 18)

    jx = jax.lax.broadcasted_iota(jnp.int32, (w, 1), 0)[:, 0].astype(
        jnp.float32
    )
    q = jax.lax.broadcasted_iota(jnp.int32, (w, band * w), 1)
    ry = (q // w).astype(jnp.float32)  # row within band
    cx = (q % w).astype(jnp.float32)

    acc = jnp.zeros((w, cout), jnp.float32)
    for k in range(9):
        ky, kx = k // 3 - 1, k % 3 - 1
        dy = jnp.clip(off[:, 2 * k], -r, r)
        dx = jnp.clip(off[:, 2 * k + 1], -r, r)
        y = (ho + ky).astype(jnp.float32) + dy - start.astype(jnp.float32)
        x = jx + kx + dx
        wy = jnp.maximum(0.0, 1.0 - jnp.abs(y[:, None] - ry))
        wx = jnp.maximum(0.0, 1.0 - jnp.abs(x[:, None] - cx))
        g = wy * wx
        sample = jnp.dot(g, srcf, preferred_element_type=jnp.float32)
        acc = acc + jnp.dot(
            sample, w_ref[k], preferred_element_type=jnp.float32
        )
    out_ref[0, 0] = acc.astype(out_ref.dtype)


def _deform_impl(x, offsets, weight):
    b, h, w, cin = x.shape
    cout = weight.shape[-1]
    band = min(h, 2 * MAX_OFFSET + 3)
    r = MAX_OFFSET
    wmat = weight.reshape(9, cin, cout)
    kernel = partial(
        _deform_kernel, h=h, w=w, cin=cin, cout=cout, band=band, r=r
    )
    return pl.pallas_call(
        kernel,
        grid=(b, h),
        in_specs=[
            pl.BlockSpec((1, 1, w, 18), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((9, cin, cout), lambda i, j: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h, w, cin), lambda i, j: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, w, cout), lambda i, j: (i, j, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, w, cout), x.dtype),
        interpret=jax.default_backend() != "tpu",
    )(offsets, wmat, x)


def _deform_bwd_kernel(off_ref, w_ref, src_ref, gout_ref,
                       dsrc_ref, doff_ref, dwt_ref, *, h, w, cin, cout,
                       band, r):
    """Backward of the banded one-hot matmul formulation, also on the MXU.

    Per (batch, output-row) grid instance and tap k (G_k = bilinear
    one-hot matrix, sample_k = G_k @ src):
      dW_k   += sample_k^T @ g                      (MXU)
      dsrc   += G_k^T @ (g @ W_k^T)                 (MXU, band-accumulated)
      dG_k    = (g @ W_k^T) @ src^T                 (MXU)
      d(dy,dx) = sum over source cells of dG_k * d(bilinear)/d(offset)
    The previous implementation fell back to the gather formulation's
    autodiff — ~30 ms/step of random scatter-adds on the flagship train
    step (the profiled top cost); this keeps the whole VJP dense.
    """
    i = pl.program_id(0)
    ho = pl.program_id(1)
    start = jnp.clip(ho - 1 - r, 0, h - band)
    src_band = src_ref[0, pl.ds(start, band)]  # (band, W, Cin)
    srcf = src_band.reshape(band * w, cin)
    off = off_ref[0, 0]       # (W, 18) — pre-clamped by the caller
    gout = gout_ref[0, 0].astype(jnp.float32)  # (W, Cout)

    @pl.when(ho == 0)
    def _init_dsrc():
        dsrc_ref[...] = jnp.zeros_like(dsrc_ref)

    @pl.when((i == 0) & (ho == 0))
    def _init_dwt():
        dwt_ref[...] = jnp.zeros_like(dwt_ref)

    jx = jax.lax.broadcasted_iota(jnp.int32, (w, 1), 0)[:, 0].astype(
        jnp.float32
    )
    q = jax.lax.broadcasted_iota(jnp.int32, (w, band * w), 1)
    ry = (q // w).astype(jnp.float32)
    cx = (q % w).astype(jnp.float32)

    dsrc_acc = jnp.zeros((band * w, cin), jnp.float32)
    doff_cols = []
    for k in range(9):
        ky, kx = k // 3 - 1, k % 3 - 1
        dy = jnp.clip(off[:, 2 * k], -r, r)
        dx = jnp.clip(off[:, 2 * k + 1], -r, r)
        y = (ho + ky).astype(jnp.float32) + dy - start.astype(jnp.float32)
        x = jx + kx + dx
        ey = y[:, None] - ry                       # (w, band*w)
        ex = x[:, None] - cx
        wy = jnp.maximum(0.0, 1.0 - jnp.abs(ey))
        wx = jnp.maximum(0.0, 1.0 - jnp.abs(ex))
        g = wy * wx

        sample = jnp.dot(g, srcf, preferred_element_type=jnp.float32)
        dwt_ref[k] = dwt_ref[k] + jnp.dot(
            sample.T, gout, preferred_element_type=jnp.float32
        ).astype(dwt_ref.dtype)

        u = jnp.dot(gout, w_ref[k].T,
                    preferred_element_type=jnp.float32)  # (w, cin)
        dsrc_acc = dsrc_acc + jnp.dot(
            g.T, u, preferred_element_type=jnp.float32
        )

        dg = jnp.dot(u, srcf.T, preferred_element_type=jnp.float32)
        # d(bilinear)/d(offset) with the two-corner (floor-based)
        # convention of the gather formulation's autodiff: cell floor(y)
        # gets -1, cell floor(y)+1 gets +1 — a one-sided difference at
        # exact integers (where clamped offsets saturate), NOT the
        # symmetric-window subgradient
        fy = jnp.floor(y)[:, None]
        fx = jnp.floor(x)[:, None]
        dwy = jnp.where(ry == fy, -1.0,
                        jnp.where(ry == fy + 1.0, 1.0, 0.0))
        dwx = jnp.where(cx == fx, -1.0,
                        jnp.where(cx == fx + 1.0, 1.0, 0.0))
        doff_cols.append((dg * dwy * wx).sum(axis=1))
        doff_cols.append((dg * wy * dwx).sum(axis=1))

    doff_ref[0, 0] = jnp.stack(doff_cols, axis=-1).astype(doff_ref.dtype)
    cur = dsrc_ref[0, pl.ds(start, band)]
    dsrc_ref[0, pl.ds(start, band)] = cur + dsrc_acc.reshape(
        band, w, cin
    ).astype(dsrc_ref.dtype)


def _deform_bwd_impl(x, offsets, weight, g):
    b, h, w, cin = x.shape
    cout = weight.shape[-1]
    # one row more than the forward band: at a saturated offset the sample
    # sits exactly on the band edge, where the VALUE weight of the next row
    # is 0 but the two-corner DERIVATIVE still reads it
    band = min(h, 2 * MAX_OFFSET + 4)
    r = MAX_OFFSET
    wmat = weight.reshape(9, cin, cout)
    kernel = partial(
        _deform_bwd_kernel, h=h, w=w, cin=cin, cout=cout, band=band, r=r
    )
    dsrc, doff, dwt = pl.pallas_call(
        kernel,
        grid=(b, h),
        in_specs=[
            pl.BlockSpec((1, 1, w, 18), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((9, cin, cout), lambda i, j: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h, w, cin), lambda i, j: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, w, cout), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, h, w, cin), lambda i, j: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, w, 18), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((9, cin, cout), lambda i, j: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, h, w, cin), x.dtype),
            jax.ShapeDtypeStruct((b, h, w, 18), offsets.dtype),
            jax.ShapeDtypeStruct((9, cin, cout), weight.dtype),
        ],
        # the backward holds src + dsrc blocks plus the (W, band*W)
        # one-hot / dG intermediates — above the default 16 MiB scoped
        # budget at flagship size (v5e has 128 MiB VMEM)
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=jax.default_backend() != "tpu",
    )(offsets, wmat, x, g)
    return dsrc, doff, dwt.reshape(3, 3, cin, cout)


@jax.custom_vjp
def deform_conv3x3_mxu(x, offsets, weight):
    """Deformable 3x3 conv, stride 1, pad 1, offsets clamped to
    ±MAX_OFFSET. x: (B, H, W, Cin); offsets: (B, H, W, 18) torchvision
    layout; weight: (3, 3, Cin, Cout). Bias is applied by the caller."""
    return _deform_impl(x, offsets, weight)


def _fwd(x, offsets, weight):
    return deform_conv3x3_mxu(x, offsets, weight), (x, offsets, weight)


def _bwd(res, g):
    x, offsets, weight = res
    # the kernel's contract is PRE-clamped offsets (deform_conv3x3_auto
    # clips); no re-clip masking here — jnp.clip's vjp would halve offset
    # gradients at exactly-saturated values (minimum-tie convention)
    return _deform_bwd_impl(x, offsets, weight, g)


deform_conv3x3_mxu.defvjp(_fwd, _bwd)


def deform_conv3x3_auto(x, offsets, weight, bias=None):
    """Backend-dispatched deformable conv with the shared offset clamp."""
    offsets = jnp.clip(offsets, -MAX_OFFSET, MAX_OFFSET)
    if jax.default_backend() == "tpu":
        out = deform_conv3x3_mxu(x, offsets, weight)
    else:
        from gencomm_tpu.ops.deform import deform_conv3x3_nhwc

        out = deform_conv3x3_nhwc(x, offsets, weight)
    return out + bias if bias is not None else out
