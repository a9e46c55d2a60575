"""V2X-ViT fusion: heterogeneous multi-agent self-attention (HMSA) +
multi-scale window attention (MSwin).

Parity: opencood/models/fuse_modules/fusion_in_one.py:355-407 (V2XViTFusion)
+ sub_modules/v2xvit_basic.py (V2XTransformer), hmsa.py (HGTCavAttention),
mswin.py (PyramidWindowAttention). The reference's per-batch/per-agent
Python loops over typed linears become one-hot type selection; the
per-pair relation matrices are gathered by relation index — all dense
einsums. STTF's spatial warp happens before the transformer (features are
pre-warped to ego, matching the caller fusion_in_one.py:396-399 which
passes identity correction matrices).
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn
from einops import rearrange

from gencomm_tpu.models.fuse.fusion import warp_to_ego, _NEG
from gencomm_tpu.registry import FUSIONS


class HGTCavAttention(nn.Module):
    """Heterogeneous graph-transformer attention over the agent axis
    (hmsa.py:7-150). num_types agent classes, num_types^2 relation types."""

    dim: int
    heads: int
    dim_head: int = 64
    num_types: int = 2

    @nn.compact
    def __call__(self, x, agent_types, mask):
        # x: (B, H, W, L, C); agent_types: (B, L) int; mask: (B, L)
        b, h, w, l, c = x.shape
        inner = self.heads * self.dim_head
        nt = self.num_types

        type_onehot = jax.nn.one_hot(agent_types, nt, dtype=x.dtype)

        def typed_proj(name, out_dim):
            # project with every type's linear, then select per agent type.
            # Selection = one-hot contraction over the tiny type axis — a
            # take_along_axis here is a per-ELEMENT gather over the full
            # (B,H,W,L,C) map, which XLA lowers catastrophically on TPU
            # (~190 ms per call at camera scale, the profiled top cost of
            # the whole V2X-ViT model)
            y = nn.DenseGeneral((nt, out_dim), name=name)(x)  # (B,H,W,L,nt,o)
            return jnp.einsum("bhwlno,bln->bhwlo", y, type_onehot)

        q = typed_proj("q_typed", inner)
        k = typed_proj("k_typed", inner)
        v = typed_proj("v_typed", inner)

        def heads_split(t):
            return t.reshape(b, h, w, l, self.heads, self.dim_head)

        q, k, v = map(heads_split, (q, k, v))

        rel_att = self.param(
            "relation_att", nn.initializers.xavier_uniform(),
            (nt * nt, self.heads, self.dim_head, self.dim_head),
        )
        rel_msg = self.param(
            "relation_msg", nn.initializers.xavier_uniform(),
            (nt * nt, self.heads, self.dim_head, self.dim_head),
        )
        rel_idx = agent_types[:, :, None] * nt + agent_types[:, None, :]
        w_att = rel_att[rel_idx]  # (B, L, L, heads, d, d)
        w_msg = rel_msg[rel_idx]
        # NOTE: a "homogeneous fast path" (all types 0 -> contract q/v with
        # rel_att[0] directly, skipping the per-pair bhwijme intermediates)
        # was tried and REGRESSED (63.1 -> 56-58 fps on the camera+v2xvit
        # bench row): at the bucketed L=2 eval scale XLA fuses the per-pair
        # einsum chain better than the two-step specialization.

        # score_ij = (q_i W_att[ij]) . k_j
        qw = jnp.einsum("bhwimd,bijmde->bhwijme", q, w_att)
        scores = jnp.einsum("bhwijme,bhwjme->bhwmij", qw, k) * (
            self.dim_head**-0.5
        )
        vmsg = jnp.einsum("bhwjmd,bijmde->bhwijme", v, w_msg)
        scores = jnp.where(mask[:, None, None, None, None, :], scores, _NEG)
        attn = nn.softmax(scores, axis=-1)
        out = jnp.einsum("bhwmij,bhwijme->bhwime", attn, vmsg)
        out = out.reshape(b, h, w, l, inner)

        # typed output projection (same one-hot contraction as typed_proj)
        dense_out = nn.DenseGeneral((nt, self.dim), name="out_typed")(out)
        return jnp.einsum("bhwlno,bln->bhwlo", dense_out, type_onehot)


class WindowAttention(nn.Module):
    """Per-agent windowed MHA with relative position bias (mswin.py:19-81)."""

    dim: int
    heads: int
    dim_head: int
    window_size: int
    # bf16 attention math (scores + softmax + weighted sum; the --half AMP
    # analog). Biggest win at the ws=16 scale, whose (tokens x tokens)
    # score tensor dominates the fusion's HBM traffic.
    half: bool = False

    @nn.compact
    def __call__(self, x):
        # x: (B, L, H, W, C)
        ws = self.window_size
        inner = self.heads * self.dim_head
        qkv = nn.Dense(inner * 3, use_bias=False, name="to_qkv")(x)
        if self.half:
            qkv = qkv.astype(jnp.bfloat16)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def windows(t):
            return rearrange(
                t, "b l (nh wh) (nw ww) (m c) -> (b l) m (nh nw) (wh ww) c",
                wh=ws, ww=ws, m=self.heads,
            )

        q, k, v = (windows(t) for t in (q, k, v))
        dots = jnp.einsum("bmhic,bmhjc->bmhij", q, k) * self.dim_head**-0.5

        table = self.param(
            "rel_pos", nn.initializers.normal(1.0),
            (2 * ws - 1, 2 * ws - 1),
        )
        coords = np.stack(
            np.meshgrid(np.arange(ws), np.arange(ws), indexing="ij")
        ).reshape(2, -1)
        rel = coords[:, :, None] - coords[:, None, :] + ws - 1  # (2, n, n)
        dots = dots + table[rel[0], rel[1]].astype(dots.dtype)

        attn = nn.softmax(dots, axis=-1)
        out = jnp.einsum("bmhij,bmhjc->bmhic", attn, v).astype(jnp.float32)
        b, l = x.shape[0], x.shape[1]
        nh, nw = x.shape[2] // ws, x.shape[3] // ws
        out = rearrange(
            out, "(b l) m (nh nw) (wh ww) c -> b l (nh wh) (nw ww) (m c)",
            b=b, l=l, nh=nh, wh=ws,
        )
        return nn.Dense(self.dim, name="to_out")(out)


class SplitAttn3(nn.Module):
    """Radix-3 split attention over the three window scales
    (split_attn.py:30-66): gap of the sum -> fc1(no bias) -> LN -> ReLU ->
    fc2(no bias, 3C) -> softmax over scales per channel -> weighted sum."""

    dim: int

    @nn.compact
    def __call__(self, windows):
        sw, mw, bw = windows
        gap = (sw + mw + bw).mean(axis=(2, 3), keepdims=True)  # (B,L,1,1,C)
        y = nn.Dense(self.dim, use_bias=False, name="fc1")(gap)
        y = nn.relu(nn.LayerNorm(name="ln")(y))
        y = nn.Dense(self.dim * 3, use_bias=False, name="fc2")(y)
        w = nn.softmax(
            y.reshape(y.shape[:-1] + (3, self.dim)), axis=-2
        )
        return (sw * w[..., 0, :] + mw * w[..., 1, :] + bw * w[..., 2, :])


class PyramidWindowAttention(nn.Module):
    dim: int
    heads: Sequence[int]
    dim_heads: Sequence[int]
    window_sizes: Sequence[int]
    # 'split_attn' is the shipped v2xvit config (m1m2m3_v2xvit.yaml
    # fusion_method); 'naive' averages (mswin.py:114-117)
    fuse_method: str = "split_attn"
    half: bool = False

    @nn.compact
    def __call__(self, x):
        outs = [
            WindowAttention(self.dim, h, dh, ws, half=self.half,
                            name=f"wmsa{i}")(x)
            for i, (h, dh, ws) in enumerate(
                zip(self.heads, self.dim_heads, self.window_sizes)
            )
        ]
        if self.fuse_method == "split_attn" and len(outs) == 3:
            return SplitAttn3(self.dim, name="split_attn")(outs)
        return sum(outs) / len(outs)


@FUSIONS.register("v2xvit")
class V2XViTFusion(nn.Module):
    dim: int
    depth: int = 3
    num_blocks: int = 1
    cav_heads: int = 8
    cav_dim_head: int = 32
    window_sizes: Sequence[int] = (4, 8, 16)
    pwindow_heads: Sequence[int] = (16, 8, 4)
    pwindow_dim_heads: Sequence[int] = (8, 16, 32)
    mlp_dim: int = 256
    half: bool = False

    @nn.compact
    def __call__(self, x, affine, agent_mask, train: bool = False):
        w = warp_to_ego(x, affine)  # (B, L, H, W, C)
        b, l, h, wd, c = w.shape
        # agent types: slot 0 vehicle... type comes from batch when present;
        # default all-vehicle (prior_encoding zeros, fusion_in_one.py:385)
        agent_types = jnp.zeros((b, l), jnp.int32)

        feats = w
        for d in range(self.depth):
            for nb in range(self.num_blocks):
                tokens = feats.transpose(0, 2, 3, 1, 4)  # (B, H, W, L, C)
                norm = nn.LayerNorm(name=f"d{d}b{nb}_cav_norm")(tokens)
                att = HGTCavAttention(
                    self.dim, self.cav_heads, self.cav_dim_head,
                    name=f"d{d}b{nb}_hmsa",
                )(norm, agent_types, agent_mask)
                feats = feats + att.transpose(0, 3, 1, 2, 4)
                norm2 = nn.LayerNorm(name=f"d{d}b{nb}_win_norm")(feats)
                feats = feats + PyramidWindowAttention(
                    self.dim, self.pwindow_heads, self.pwindow_dim_heads,
                    self.window_sizes, half=self.half,
                    name=f"d{d}b{nb}_mswin",
                )(norm2)
            ff = nn.LayerNorm(name=f"d{d}_ff_norm")(feats)
            ff = nn.Dense(self.mlp_dim, name=f"d{d}_ff1")(ff)
            ff = nn.gelu(ff)
            feats = feats + nn.Dense(self.dim, name=f"d{d}_ff2")(ff)
        return feats[:, 0]
