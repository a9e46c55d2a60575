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


class TypedDense(nn.Module):
    """Per-agent-type linear: weight bank (C, nt, out) gathered by the
    (B, L) type index — the nt-table gather is tiny, and each agent pays
    exactly ONE matmul. The previous formulation (DenseGeneral over all
    types + one-hot contraction) computed every type's projection and
    materialized (B,H,W,L,nt,o) layouts whose copies were the camera
    trace's biggest non-splat ops (~0.4 ms each at 64x64x256). The param
    tree matches nn.DenseGeneral((nt, out)) so checkpoints and the golden
    weight-transplant tests are unchanged. (A per-ELEMENT take_along_axis
    gather over the full map is still catastrophic — see r1 notes.)"""

    num_types: int
    out_dim: int

    @nn.compact
    def __call__(self, x, agent_types):
        c = x.shape[-1]
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(in_axis=0, out_axis=(1, 2)),
            (c, self.num_types, self.out_dim),
        )
        bias = self.param("bias", nn.initializers.zeros,
                          (self.num_types, self.out_dim))
        w_sel = jnp.transpose(kernel, (1, 0, 2))[agent_types]  # (B,L,C,o)
        b_sel = bias[agent_types]  # (B, L, o)
        y = jnp.einsum("bhwlc,blco->bhwlo", x,
                       w_sel.astype(x.dtype))
        return y + b_sel[:, None, None].astype(x.dtype)


class HGTCavAttention(nn.Module):
    """Heterogeneous graph-transformer attention over the agent axis
    (hmsa.py:7-150). num_types agent classes, num_types^2 relation types."""

    dim: int
    heads: int
    dim_head: int = 64
    num_types: int = 2
    # bf16 projection/attention math (the --half AMP analog); params and
    # the softmax mask constant stay fp32-representable
    half: bool = False

    @nn.compact
    def __call__(self, x, agent_types, mask):
        # x: (B, H, W, L, C); agent_types: (B, L) int; mask: (B, L)
        b, h, w, l, c = x.shape
        inner = self.heads * self.dim_head
        nt = self.num_types
        if self.half:
            x = x.astype(jnp.bfloat16)

        q = TypedDense(nt, inner, name="q_typed")(x, agent_types)
        k = TypedDense(nt, inner, name="k_typed")(x, agent_types)
        v = TypedDense(nt, inner, name="v_typed")(x, agent_types)

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
        w_att = rel_att[rel_idx].astype(q.dtype)  # (B, L, L, heads, d, d)
        w_msg = rel_msg[rel_idx].astype(q.dtype)
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
        scores = jnp.where(mask[:, None, None, None, None, :],
                           scores.astype(jnp.float32), _NEG)
        attn = nn.softmax(scores, axis=-1).astype(vmsg.dtype)
        out = jnp.einsum("bhwmij,bhwijme->bhwime", attn, vmsg)
        out = out.reshape(b, h, w, l, inner)

        out = TypedDense(nt, self.dim, name="out_typed")(out, agent_types)
        return out.astype(jnp.float32)


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

        b, l = x.shape[0], x.shape[1]
        nh, nw = x.shape[2] // ws, x.shape[3] // ws

        def windows(t):
            # window partition keeping the FULL inner dim (m*c = 128 lanes)
            # minor through the transpose — the einops form
            # "... (m c) -> ... m ... c" used to leave dim_head (8-32) as
            # the minor axis, and those sub-lane-width layout copies were
            # 32% of the camera forward in the device trace. The head
            # split is a free trailing reshape here; the einsum below
            # carries m as a batch dim instead.
            t = t.reshape(b, l, nh, ws, nw, ws, inner)
            t = t.transpose(0, 1, 2, 4, 3, 5, 6)
            return t.reshape(b * l, nh * nw, ws * ws,
                             self.heads, self.dim_head)

        q, k, v = (windows(t) for t in (q, k, v))
        dots = jnp.einsum("bwimc,bwjmc->bwmij", q, k) * self.dim_head**-0.5

        table = self.param(
            "rel_pos", nn.initializers.normal(1.0),
            (2 * ws - 1, 2 * ws - 1),
        )

        # Toeplitz expansion of the (2ws-1, 2ws-1) table to the (t, t)
        # bias WITHOUT a runtime gather: table[rel] was the single most
        # expensive fusion op after the splat in the device trace (0.54 ms
        # per ws=16 attention — XLA serializes random gathers at ~8 ns/
        # element). Static slices are layout-free.
        def skew(a, axis_last=True):
            # a (..., 2ws-1) -> (..., ws, ws): out[..., q, j] = a[..., q-j+ws-1]
            return jnp.stack(
                [a[..., q:q + ws][..., ::-1] for q in range(ws)], axis=-2
            )

        rows = skew(jnp.moveaxis(table, 0, -1))      # (31, ws, ws) -> dy
        rows = jnp.moveaxis(rows, 0, -1)             # (ws_yi, ws_yj, 31)
        bias4 = skew(rows)                           # (yi, yj, xi, xj)
        bias = bias4.transpose(0, 2, 1, 3).reshape(ws * ws, ws * ws)
        dots = dots + bias.astype(dots.dtype)

        attn = nn.softmax(dots, axis=-1)
        out = jnp.einsum("bwmij,bwjmc->bwimc", attn, v).astype(jnp.float32)
        out = out.reshape(b, l, nh, nw, ws, ws, inner)
        out = out.transpose(0, 1, 2, 4, 3, 5, 6).reshape(
            b, l, nh * ws, nw * ws, inner
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
                    half=self.half, name=f"d{d}b{nb}_hmsa",
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
