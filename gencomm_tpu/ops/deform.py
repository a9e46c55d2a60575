"""Deformable 3x3 convolution as a bilinear-gather contraction.

The reference uses torchvision's CUDA ``DeformConv2d`` inside GenComm's
message extractor (opencood/models/gencomm_modules/message_extractor_v2.py:
68-109). TPU-native formulation: for each of the 9 kernel taps, bilinearly
sample the input at (pixel + tap offset + learned offset) and contract the
stacked samples with the kernel weights — one gather + one matmul, fully
jittable and differentiable.
"""

from __future__ import annotations

import jax.numpy as jnp


def bilinear_sample_nhwc(img, coords):
    """img: (H, W, C); coords: (..., 2) as (y, x) pixel coords.

    Zero padding outside the image. Returns (..., C).
    """
    h, w, _ = img.shape
    y, x = coords[..., 0], coords[..., 1]
    y0, x0 = jnp.floor(y), jnp.floor(x)
    y1, x1 = y0 + 1, x0 + 1
    wy1, wx1 = y - y0, x - x0
    wy0, wx0 = 1 - wy1, 1 - wx1

    flat = img.reshape(h * w, -1)

    def gather(iy, ix):
        inb = (iy >= 0) & (iy <= h - 1) & (ix >= 0) & (ix <= w - 1)
        iyc = jnp.clip(iy, 0, h - 1).astype(jnp.int32)
        ixc = jnp.clip(ix, 0, w - 1).astype(jnp.int32)
        vals = flat[iyc * w + ixc]  # (..., C)
        return vals * inb[..., None].astype(img.dtype)

    return (
        gather(y0, x0) * (wy0 * wx0)[..., None]
        + gather(y0, x1) * (wy0 * wx1)[..., None]
        + gather(y1, x0) * (wy1 * wx0)[..., None]
        + gather(y1, x1) * (wy1 * wx1)[..., None]
    )


def deform_conv3x3_nhwc(x, offsets, weight, bias=None):
    """Deformable 3x3 conv, stride 1, padding 1 (torchvision semantics).

    x: (B, H, W, Cin); offsets: (B, H, W, 18) ordered as
    (dy0, dx0, dy1, dx1, ...) over taps in row-major (ky, kx) order —
    torchvision DeformConv2d layout; weight: (3, 3, Cin, Cout).
    """
    b, h, w, cin = x.shape
    cout = weight.shape[-1]
    gy = jnp.arange(h, dtype=x.dtype)
    gx = jnp.arange(w, dtype=x.dtype)
    base_y, base_x = jnp.meshgrid(gy, gx, indexing="ij")  # (H, W)

    off = offsets.reshape(b, h, w, 9, 2)
    taps = jnp.stack(
        jnp.meshgrid(jnp.arange(-1, 2), jnp.arange(-1, 2), indexing="ij"),
        axis=-1,
    ).reshape(9, 2).astype(x.dtype)  # (9, 2) as (dy, dx)

    coords_y = base_y[None, :, :, None] + taps[None, None, None, :, 0] + off[..., 0]
    coords_x = base_x[None, :, :, None] + taps[None, None, None, :, 1] + off[..., 1]
    coords = jnp.stack([coords_y, coords_x], axis=-1)  # (B, H, W, 9, 2)

    import jax

    samples = jax.vmap(bilinear_sample_nhwc)(x, coords)  # (B, H, W, 9, Cin)

    wmat = weight.reshape(9 * cin, cout)
    out = samples.reshape(b, h, w, 9 * cin) @ wmat
    if bias is not None:
        out = out + bias
    return out
