"""CoBEVT fused-axial ("swap") attention fusion.

Parity: opencood/models/fuse_modules/fusion_in_one.py:409-464 (CoBEVT) +
fuse_modules/swap_fusion_modules.py (SwapFusionBlockMask): depth x
[local window attention -> FFN -> grid (dilated) attention -> FFN] over
(agent x window) token groups with a 3D relative-position bias, masked for
agent validity, then mean over agents + LayerNorm + Linear head.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import jax.numpy as jnp
import flax.linen as nn
from einops import rearrange

from gencomm_tpu.models.fuse.fusion import warp_to_ego, _NEG
from gencomm_tpu.registry import FUSIONS


def _relative_position_index(ws3):
    """3D relative-position index table (agents, wh, ww) — parity with
    swap_fusion_modules.Attention:58-84."""
    d, h, w = ws3
    coords = np.stack(
        np.meshgrid(np.arange(d), np.arange(h), np.arange(w), indexing="ij")
    ).reshape(3, -1)
    rel = coords[:, :, None] - coords[:, None, :]
    rel = rel.transpose(1, 2, 0)
    rel[:, :, 0] += d - 1
    rel[:, :, 1] += h - 1
    rel[:, :, 2] += w - 1
    rel[:, :, 0] *= (2 * h - 1) * (2 * w - 1)
    rel[:, :, 1] *= 2 * w - 1
    return rel.sum(-1)


class SwapAttention(nn.Module):
    dim: int
    dim_head: int
    agent_size: int
    window_size: int
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, mask, train: bool = False):
        # x: (b, x, y, l, w1, w2, c) token groups; mask: (b, x, y, l, w1, w2)
        heads = self.dim // self.dim_head
        ws3 = (self.agent_size, self.window_size, self.window_size)
        b, gx, gy = x.shape[:3]
        n = int(np.prod(ws3))
        tokens = x.reshape(b * gx * gy, n, self.dim)
        qkv = nn.Dense(self.dim * 3, use_bias=False, name="to_qkv")(tokens)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def split_heads(t):
            return t.reshape(t.shape[0], n, heads, self.dim_head).transpose(
                0, 2, 1, 3
            )

        q, k, v = map(split_heads, (q, k, v))
        sim = jnp.einsum("bhid,bhjd->bhij", q * self.dim_head**-0.5, k)

        table = self.param(
            "rel_pos_bias",
            nn.initializers.normal(0.02),
            ((2 * ws3[0] - 1) * (2 * ws3[1] - 1) * (2 * ws3[2] - 1), heads),
        )
        idx = jnp.asarray(_relative_position_index(ws3))
        sim = sim + table[idx].transpose(2, 0, 1)[None]

        m = mask.reshape(b * gx * gy, 1, 1, n)
        sim = jnp.where(m, sim, _NEG)
        attn = nn.softmax(sim, axis=-1)
        out = jnp.einsum("bhij,bhjd->bhid", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(b, gx, gy, *ws3, self.dim)
        return nn.Dense(self.dim, use_bias=False, name="to_out")(out)


class SwapBlock(nn.Module):
    dim: int
    mlp_dim: int
    dim_head: int
    window_size: int
    agent_size: int

    def _ffn(self, x, name):
        h = nn.LayerNorm(name=f"{name}_norm")(x)
        h = nn.Dense(self.mlp_dim, name=f"{name}_fc1")(h)
        h = nn.gelu(h)
        return x + nn.Dense(self.dim, name=f"{name}_fc2")(h)

    @nn.compact
    def __call__(self, x, mask, train: bool = False):
        # x: (B, L, H, W, C); mask: (B, L, H, W) bool
        ws = self.window_size

        def attend(x, mask, pattern_in, pattern_out, name):
            xt = rearrange(x, pattern_in, w1=ws, w2=ws)
            mt = rearrange(mask, pattern_in.replace(" c", ""), w1=ws, w2=ws)
            norm = nn.LayerNorm(name=f"{name}_norm")(xt)
            xt = xt + SwapAttention(
                self.dim, self.dim_head, self.agent_size, ws, name=name
            )(norm, mt, train)
            xt = self._ffn(xt, f"{name}_ffn")
            return rearrange(xt, pattern_out, w1=ws, w2=ws)

        # local windows
        x = attend(
            x, mask,
            "b l (x w1) (y w2) c -> b x y l w1 w2 c",
            "b x y l w1 w2 c -> b l (x w1) (y w2) c",
            "window",
        )
        # grid (dilated) windows
        x = attend(
            x, mask,
            "b l (w1 x) (w2 y) c -> b x y l w1 w2 c",
            "b x y l w1 w2 c -> b l (w1 x) (w2 y) c",
            "grid",
        )
        return x


@FUSIONS.register("cobevt")
class CoBEVTFusion(nn.Module):
    input_dim: int
    mlp_dim: int = 256
    dim_head: int = 32
    window_size: int = 8
    agent_size: int = 5
    depth: int = 1

    @nn.compact
    def __call__(self, x, affine, agent_mask, train: bool = False):
        w = warp_to_ego(x, affine)  # (B, L, H, W, C)
        b, l, h, wd, c = w.shape
        mask = jnp.broadcast_to(agent_mask[:, :, None, None], (b, l, h, wd))
        for i in range(self.depth):
            w = SwapBlock(
                self.input_dim, self.mlp_dim, self.dim_head,
                self.window_size, l, name=f"block{i}",
            )(w, mask, train)
        # mlp head: masked mean over agents + LN + Linear
        mf = agent_mask[:, :, None, None, None].astype(w.dtype)
        pooled = (w * mf).sum(1) / jnp.clip(mf.sum(1), 1.0, None)
        pooled = nn.LayerNorm(name="head_norm")(pooled)
        return nn.Dense(self.input_dim, name="head_fc")(pooled)
