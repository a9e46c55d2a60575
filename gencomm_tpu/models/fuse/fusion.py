"""Intermediate-fusion family over the padded agent axis.

Reference (opencood/models/fuse_modules/fusion_in_one.py) loops per sample
in Python over ragged ``record_len`` splits and warps with torch grid_sample.
Here every fusion consumes dense ``(B, L, H, W, C)`` features (NHWC),
``affine (B, L, L, 2, 3)`` and ``agent_mask (B, L)`` and is fully vectorized:
padding handled by masked max/softmax. Slot 0 is the ego.

A further TPU win: the reference computes full LxL per-pixel self-attention
and then keeps only the ego row (fusion_in_one.py:126-151); we compute only
the ego-query attention — identical output, 1/L of the FLOPs.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp
import flax.linen as nn

from gencomm_tpu.ops.warp import warp_affine, warp_affine_nhwc
from gencomm_tpu.registry import FUSIONS

_NEG = -1e9


def warp_to_ego(x, affine):
    """Warp all agents' BEV features into the ego frame.

    x: (B, L, H, W, C); affine: (B, L, L, 2, 3) where affine[b, i, j] maps
    agent-i pixel coords into agent-j's map. Ego warp uses affine[b, 0, j]
    applied to agent j's feature (parity: fusion_in_one.py:73-81 uses
    t_matrix[0, :]).

    NOTE: the sampling-grid einsum must run at HIGHEST precision
    (ops/warp.py) — TPU's default bf16 passes round the coordinates.
    With that fix the gather formulation measures faster than the MXU
    Pallas kernel (ops/warp_pallas.py) at fusion sizes; the kernel remains
    available via warp_affine_auto for larger maps. Channels-last
    row-gather layout (warp_affine_nhwc): C contiguous elements per
    gathered pixel instead of one scalar per (c, pixel) — the scalar
    variant was the single hottest device op on the flagship (1.24 ms).
    """
    theta = affine[:, 0]  # (B, L, 2, 3)
    return warp_affine_nhwc(x, theta)


@FUSIONS.register("max")
class MaxFusion(nn.Module):
    """F-Cooper elementwise max (fusion_in_one.py:87-124)."""

    @nn.compact
    def __call__(self, x, affine, agent_mask, train: bool = False):
        w = warp_to_ego(x, affine)
        m = agent_mask[:, :, None, None, None]
        return jnp.where(m, w, _NEG).max(axis=1)


@FUSIONS.register("att")
class AttFusion(nn.Module):
    """Attentive fusion (OPV2V): per-pixel scaled-dot attention over agents
    (fusion_in_one.py:126-151), ego-query only."""

    feat_dim: int

    @nn.compact
    def __call__(self, x, affine, agent_mask, train: bool = False):
        w = warp_to_ego(x, affine)  # (B, L, H, W, C)
        c = w.shape[-1]
        q = w[:, 0]  # ego (B, H, W, C)
        scores = jnp.einsum("bhwc,blhwc->blhw", q, w) / np.sqrt(c)
        scores = jnp.where(agent_mask[:, :, None, None], scores, _NEG)
        attn = nn.softmax(scores, axis=1)
        return jnp.einsum("blhw,blhwc->bhwc", attn, w)


class PixelWeightLayer(nn.Module):
    """DiscoNet pixel-weight net (fuse_modules/disco_fuse.py)."""

    @nn.compact
    def __call__(self, x, train: bool = False):
        from gencomm_tpu.models.layers import ConvBNReLU

        x = ConvBNReLU(128, kernel=1)(x, train)
        x = ConvBNReLU(32, kernel=1)(x, train)
        x = ConvBNReLU(8, kernel=1)(x, train)
        return nn.Conv(1, (1, 1))(x)


@FUSIONS.register("disconet")
class DiscoFusion(nn.Module):
    """DiscoNet softmax-weighted sum (fusion_in_one.py:188-236)."""

    feat_dim: int = 0  # unused; kept for config compatibility

    @nn.compact
    def __call__(self, x, affine, agent_mask, train: bool = False):
        b, l, h, wd, c = x.shape
        w = warp_to_ego(x, affine)
        ego = jnp.broadcast_to(x[:, 0:1], w.shape)
        cat = jnp.concatenate([w, ego], axis=-1).reshape(b * l, h, wd, 2 * c)
        logits = PixelWeightLayer()(cat, train).reshape(b, l, h, wd, 1)
        logits = jnp.where(agent_mask[:, :, None, None, None], logits, _NEG)
        weights = nn.softmax(logits, axis=1)
        return (weights * w).sum(axis=1)


@FUSIONS.register("who2com")
class Who2comFusion(nn.Module):
    """Who2com-style attention + decode (fusion_in_one.py:521-573):
    query/key projections score each neighbor globally, weighted sum."""

    feat_dim: int

    @nn.compact
    def __call__(self, x, affine, agent_mask, train: bool = False):
        w = warp_to_ego(x, affine)  # (B, L, H, W, C)
        key = nn.Dense(self.feat_dim, name="key_proj")(w).mean(axis=(2, 3))
        query = nn.Dense(self.feat_dim, name="query_proj")(w[:, 0]).mean(axis=(1, 2))
        scores = jnp.einsum("bc,blc->bl", query, key) / np.sqrt(self.feat_dim)
        scores = jnp.where(agent_mask, scores, _NEG)
        attn = nn.softmax(scores, axis=1)
        fused = jnp.einsum("bl,blhwc->bhwc", attn, w)
        return nn.Conv(self.feat_dim, (1, 1), name="decode")(
            jnp.concatenate([x[:, 0], fused], axis=-1)
        )


def build_fusion(method: str, args: dict, name: str | None = None,
                 half: bool = False) -> nn.Module:
    """Instantiate a fusion module from the hypes model args
    (reference dispatch: heter_model_baseline.py:101-116)."""
    # import for registration side effects
    from gencomm_tpu.models.fuse import v2vnet as _v2v  # noqa: F401
    from gencomm_tpu.models.fuse import where2comm as _w2c  # noqa: F401
    from gencomm_tpu.models.fuse import cobevt as _cb  # noqa: F401
    from gencomm_tpu.models.fuse import v2xvit as _vx  # noqa: F401

    cls = FUSIONS.get(method)
    cfg = args.get(method, {})
    if method in ("att", "who2com", "where2comm"):
        return cls(feat_dim=cfg["feat_dim"], name=name)
    if method == "disconet":
        return cls(feat_dim=cfg.get("feat_dim", 0), name=name)
    if method == "v2vnet":
        return cls(
            in_channels=cfg["in_channels"],
            num_iteration=cfg.get("num_iteration", 2),
            gru_flag=cfg.get("gru_flag", True),
            agg_operator=cfg.get("agg_operator", "avg"),
            name=name,
        )
    if method == "cobevt":
        return cls(
            input_dim=cfg["input_dim"],
            mlp_dim=cfg.get("mlp_dim", 256),
            dim_head=cfg.get("dim_head", 32),
            window_size=cfg.get("window_size", 8),
            agent_size=cfg.get("agent_size", 5),
            depth=cfg.get("depth", 1),
            name=name,
        )
    if method == "v2xvit":
        return cls(
            dim=cfg.get("dim", cfg.get("feat_dim", 128)),
            depth=cfg.get("depth", 3),
            num_blocks=cfg.get("num_blocks", 1),
            window_sizes=tuple(cfg.get("window_sizes", (4, 8, 16))),
            pwindow_heads=tuple(cfg.get("pwindow_heads", (16, 8, 4))),
            pwindow_dim_heads=tuple(cfg.get("pwindow_dim_heads", (8, 16, 32))),
            mlp_dim=cfg.get("mlp_dim", 256),
            half=half or cfg.get("half", False),
            name=name,
        )
    return cls(name=name)
