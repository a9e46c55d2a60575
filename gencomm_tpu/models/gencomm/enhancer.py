"""Post-generation feature Enhancer.

Parity: opencood/models/gencomm_modules/enhancer.py:335-383 — the *shipped*
configuration: one Enhancer_block whose window-attention branch is disabled
(enhancer.py:352 comments the attn call, leaving ``x = shortcut + norm1(x)``)
followed by the FRFN gated MLP, then a SplitAttn sigmoid channel gate
(radix=1 path). We reproduce that active computation exactly; the windowed
attention branch is available behind ``use_attn`` (default off = shipped
parity):

  * ``attn_mode="angle"`` — the Attention the commented call would invoke
    (enhancer.py:91-176): global token attention with a multiplicative
    angle-bin bias computed from each agent's affine into the ego frame
    (get_angle_attention_bias, :111-151). Quadratic in H*W — use on small
    grids or with ``win_size`` set.
  * ``attn_mode="window_sparse"`` — the sparse window attention machinery
    shipped alongside (sparse_attn.py:167-250 WindowAttention_sparse):
    non-overlapping windows, Swin-style relative-position bias, and a
    learned softmax(w)-blend of softmax-attention with ReLU-attention.

Operates on (N, H, W, C) NHWC, batched over all padded agent slots (the
reference loops per sample; the computation is per-agent so dense batching
is exact). Window partition is pure reshape/transpose (no gathers); the
relative-position bias is gathered once per call from a static index
matrix, exactly the Swin trick the reference uses.
"""

from __future__ import annotations

import numpy as np
import flax.linen as nn
import jax.numpy as jnp


class FRFN(nn.Module):
    """Partial-conv + gated MLP (enhancer.py:207-250)."""

    dim: int
    hidden_dim: int
    dtype: object = None

    @nn.compact
    def __call__(self, x):
        # x: (N, H, W, C)
        dim_conv = self.dim // 4
        x1, x2 = x[..., :dim_conv], x[..., dim_conv:]
        x1 = nn.Conv(dim_conv, (3, 3), padding="SAME", use_bias=False,
                     dtype=self.dtype, name="partial_conv")(x1)
        x = jnp.concatenate([x1, x2.astype(x1.dtype)], axis=-1)

        x = nn.Dense(self.hidden_dim * 2, dtype=self.dtype, name="linear1")(x)
        x = nn.gelu(x)
        g1, g2 = jnp.split(x, 2, axis=-1)
        g1 = nn.Conv(
            self.hidden_dim, (3, 3), padding="SAME",
            feature_group_count=self.hidden_dim, dtype=self.dtype,
            name="dwconv",
        )(g1)
        g1 = nn.gelu(g1)
        return nn.Dense(self.dim, dtype=self.dtype, name="linear2")(g1 * g2)


class SplitAttn(nn.Module):
    """Sigmoid channel gate from spatially-pooled stats (enhancer.py:303-333,
    radix=1 path)."""

    dim: int
    dtype: object = None

    @nn.compact
    def __call__(self, x):
        # global pool accumulates in fp32 (bf16 mean over H*W loses bits)
        gap = x.astype(jnp.float32).mean(axis=(1, 2), keepdims=True)
        gap = gap.astype(x.dtype)  # (N, 1, 1, C)
        y = nn.Dense(self.dim, use_bias=False, dtype=self.dtype,
                     name="fc1")(gap)
        y = nn.LayerNorm(dtype=self.dtype, name="ln")(y)
        y = nn.relu(y)
        y = nn.Dense(self.dim, use_bias=False, dtype=self.dtype,
                     name="fc2")(y)
        return x * nn.sigmoid(y).astype(x.dtype)


def _angle_bias(table, affine, h, w):
    """Per-query multiplicative bias from token angle around each agent's
    projected center (enhancer.py:111-151 get_angle_attention_bias).

    table: (angle_bins, heads) param; affine: (N, 2, 3) agent->ego affine.
    Returns (N, heads, h*w) in [1, 2].
    """
    bins = table.shape[0]
    gy, gx = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32),
                          jnp.arange(w, dtype=jnp.float32), indexing="ij")
    coords = jnp.stack([gx.reshape(-1), gy.reshape(-1)], axis=-1)  # (N,2)=x,y
    center = jnp.array([[w / 2.0], [h / 2.0]], jnp.float32)  # (2,1)
    ego = (affine[:, :2, :2] @ center + affine[:, :2, 2:3])[..., 0]  # (A,2)
    rel = coords[None] - ego[:, None]  # (A, N, 2)
    ang = jnp.arctan2(rel[..., 1], rel[..., 0])
    norm = (ang + jnp.pi) / (2.0 * jnp.pi)
    idx = (norm * (bins - 1)).astype(jnp.int32)  # ref truncates via .long()
    bias = 1.0 + nn.sigmoid(table[idx])  # (A, N, heads)
    return jnp.transpose(bias, (0, 2, 1))


class AngleBiasAttention(nn.Module):
    """Global token attention with the angle-bin bias (enhancer.py:91-176).

    The reference multiplies raw q@k^T logits by a per-query bias in [1,2]
    derived from the token's bearing around the agent's ego-projected
    position, then softmaxes.
    """

    dim: int
    num_heads: int
    angle_bins: int = 5  # enhancer.py:100
    dtype: object = None

    @nn.compact
    def __call__(self, x, affine=None, hw=None):
        # x: (B, N, C); affine: (B, 2, 3) or None; hw: (H, W) when affine
        b, n, c = x.shape
        h = self.num_heads
        hd = c // h
        q = nn.Dense(c, dtype=self.dtype, name="to_q")(x).reshape(b, n, h, hd)
        kv = nn.Dense(2 * c, dtype=self.dtype,
                      name="to_kv")(x).reshape(b, n, 2, h, hd)
        k, v = kv[:, :, 0], kv[:, :, 1]
        attn = jnp.einsum("bnhd,bmhd->bhnm", q * (hd ** -0.5), k)
        if affine is not None:
            table = self.param(
                "angle_bias_table", nn.initializers.ones,
                (self.angle_bins, h),
            )  # init ones, enhancer.py:102
            bias = _angle_bias(table, affine, hw[0], hw[1])  # (B, h, N)
            attn = attn * bias[..., None].astype(attn.dtype)
        attn = nn.softmax(attn.astype(jnp.float32), axis=-1).astype(v.dtype)
        out = jnp.einsum("bhnm,bmhd->bnhd", attn, v).reshape(b, n, c)
        return nn.Dense(c, dtype=self.dtype, name="proj")(out)


def _relative_position_index(wh, ww):
    """Static Swin relative-position index (sparse_attn.py:181-191)."""
    coords = np.stack(np.meshgrid(np.arange(wh), np.arange(ww),
                                  indexing="ij")).reshape(2, -1)
    rel = coords[:, :, None] - coords[:, None, :]  # (2, N, N)
    rel = rel.transpose(1, 2, 0)
    rel[:, :, 0] += wh - 1
    rel[:, :, 1] += ww - 1
    rel[:, :, 0] *= 2 * ww - 1
    return rel.sum(-1)  # (N, N)


class WindowAttentionSparse(nn.Module):
    """Swin-windowed attention with the learned softmax/ReLU blend
    (sparse_attn.py:167-250 WindowAttention_sparse): rel-pos bias added to
    the logits, then ``attn = softmax(attn)*w1 + relu(attn)*w2`` with
    (w1, w2) = softmax of a learned 2-vector."""

    dim: int
    num_heads: int
    win_size: tuple  # (Wh, Ww)
    dtype: object = None

    @nn.compact
    def __call__(self, x):
        # x: (B_, N, C) with N == Wh*Ww (already window-partitioned)
        b, n, c = x.shape
        h = self.num_heads
        hd = c // h
        wh, ww = self.win_size
        q = nn.Dense(c, dtype=self.dtype, name="to_q")(x).reshape(b, n, h, hd)
        kv = nn.Dense(2 * c, dtype=self.dtype,
                      name="to_kv")(x).reshape(b, n, 2, h, hd)
        k, v = kv[:, :, 0], kv[:, :, 1]
        attn = jnp.einsum("bnhd,bmhd->bhnm", q * (hd ** -0.5), k)
        attn = attn.astype(jnp.float32)

        table = self.param(
            "relative_position_bias_table",
            nn.initializers.truncated_normal(0.02),
            ((2 * wh - 1) * (2 * ww - 1), h),
        )
        idx = jnp.asarray(_relative_position_index(wh, ww))
        attn = attn + jnp.transpose(table[idx], (2, 0, 1))[None]

        blend = self.param("w", nn.initializers.ones, (2,))
        w1, w2 = nn.softmax(blend)
        attn = nn.softmax(attn, axis=-1) * w1 + nn.relu(attn) * w2
        attn = attn.astype(v.dtype)
        out = jnp.einsum("bhnm,bmhd->bnhd", attn, v).reshape(b, n, c)
        return nn.Dense(c, dtype=self.dtype, name="proj")(out)


def window_partition(x, wh, ww):
    """(B, H, W, C) -> (B * H/wh * W/ww, wh*ww, C), pure reshape/transpose
    (sparse_attn / enhancer.py:256-267 dilation=1 path)."""
    b, hgt, wid, c = x.shape
    x = x.reshape(b, hgt // wh, wh, wid // ww, ww, c)
    x = jnp.transpose(x, (0, 1, 3, 2, 4, 5))
    return x.reshape(-1, wh * ww, c)


def window_reverse(win, wh, ww, hgt, wid):
    """Inverse of window_partition (enhancer.py:269-278)."""
    c = win.shape[-1]
    x = win.reshape(-1, hgt // wh, wid // ww, wh, ww, c)
    x = jnp.transpose(x, (0, 1, 3, 2, 4, 5))
    return x.reshape(-1, hgt, wid, c)


class EnhancerBlock(nn.Module):
    dim: int
    use_attn: bool = False
    num_heads: int = 4
    attn_mode: str = "angle"  # "angle" | "window_sparse"
    win_size: tuple = (8, 8)
    dtype: object = None

    @nn.compact
    def __call__(self, x, affine=None):
        n, hgt, wid, c = x.shape
        if self.dtype is not None:
            x = x.astype(self.dtype)
        shortcut = x
        y = nn.LayerNorm(dtype=self.dtype, name="norm1")(x)
        if self.use_attn:
            # the re-enabled enhancer.py:352 branch
            if self.attn_mode == "angle":
                y = AngleBiasAttention(
                    self.dim, self.num_heads, dtype=self.dtype, name="attn",
                )(y.reshape(n, hgt * wid, c), affine, (hgt, wid))
                y = y.reshape(n, hgt, wid, c)
            elif self.attn_mode == "window_sparse":
                wh, ww = self.win_size
                pad_h = (-hgt) % wh
                pad_w = (-wid) % ww
                yp = jnp.pad(y, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
                win = window_partition(yp, wh, ww)
                win = WindowAttentionSparse(
                    self.dim, self.num_heads, (wh, ww), dtype=self.dtype,
                    name="attn",
                )(win)
                y = window_reverse(
                    win, wh, ww, hgt + pad_h, wid + pad_w
                )[:, :hgt, :wid]
            else:
                raise ValueError(f"unknown attn_mode {self.attn_mode!r}")
        x = shortcut + y  # with use_attn=False: the shipped residual quirk
        x = x + FRFN(self.dim, self.dim * 2, dtype=self.dtype, name="mlp")(
            nn.LayerNorm(dtype=self.dtype, name="norm2")(x)
        )
        return x


class Enhancer(nn.Module):
    dim: int
    use_attn: bool = False
    num_heads: int = 4
    attn_mode: str = "angle"
    win_size: tuple = (8, 8)
    dtype: object = None

    @nn.compact
    def __call__(self, x, affine=None):
        # x: (N, H, W, C); affine: (N, 2, 3) per-agent affine into the ego
        # frame (only consumed when use_attn and attn_mode == "angle")
        s = EnhancerBlock(
            self.dim, use_attn=self.use_attn, num_heads=self.num_heads,
            attn_mode=self.attn_mode, win_size=self.win_size,
            dtype=self.dtype, name="block_1",
        )(x, affine)
        return SplitAttn(self.dim, dtype=self.dtype, name="split_attn")(s)
