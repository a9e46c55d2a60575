"""Where2comm: confidence-masked communication + per-pixel MHA fusion.

Parity:
  Communication module  opencood/models/comm_modules/where2comm.py:10-147
    (confidence map -> gaussian smooth -> threshold mask -> comm rate)
  Where2commFusion      fusion_in_one.py:466-519 + where2comm_attn.EncodeLayer
    (per-pixel 8-head attention: query = ego pixel, keys = agents).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from gencomm_tpu.models.fuse.fusion import warp_to_ego, _NEG
from gencomm_tpu.registry import FUSIONS


def gaussian_kernel(k_size: int = 5, sigma: float = 1.0) -> np.ndarray:
    center = k_size // 2
    x, y = np.mgrid[-center : k_size - center, -center : k_size - center]
    g = 1 / (2 * np.pi * sigma) * np.exp(-(x**2 + y**2) / (2 * sigma**2))
    return g.astype(np.float32)


class Communication(nn.Module):
    """Confidence-driven communication masking.

    Takes per-agent detection confidence maps (B, L, H, W, A), returns
    (masks (B, L, H, W, 1), rate scalar). Ego's mask is all-ones (the
    reference keeps slot 0 unmasked, where2comm.py:138-140).
    """

    thre: float = 0.01
    smooth: bool = True
    kernel_size: int = 5
    c_sigma: float = 1.0

    @nn.compact
    def __call__(self, confidence_maps, agent_mask):
        b, l, h, w, a = confidence_maps.shape
        conf = jax.nn.sigmoid(confidence_maps).max(axis=-1, keepdims=True)
        if self.smooth:
            k = gaussian_kernel(self.kernel_size, self.c_sigma)
            kernel = jnp.asarray(k)[:, :, None, None]  # HWIO
            conf = jax.lax.conv_general_dilated(
                conf.reshape(b * l, h, w, 1),
                kernel,
                window_strides=(1, 1),
                padding="SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            ).reshape(b, l, h, w, 1)
        mask = (conf > self.thre).astype(conf.dtype)
        mask = mask.at[:, 0].set(1.0)  # ego untouched
        valid = agent_mask[:, :, None, None, None].astype(conf.dtype)
        n_neighbors = jnp.clip(agent_mask[:, 1:].sum(), 1, None)
        rate = (mask[:, 1:] * valid[:, 1:]).sum() / (h * w * n_neighbors)
        return mask, rate


def where2comm_multi_scale(backbone, canvas, masks, affine, agent_mask,
                           agg_mode: str = "ATTEN", train: bool = False):
    """Multi-scale Where2comm fusion (where2comm_attn.Where2comm with
    multi_scale=True, opencood/models/fuse_modules/where2comm_attn.py:189-310).

    Re-runs the SHARED BEV backbone on communication-masked features via
    its ``level_fuse`` hook: every level is masked, warped into the ego
    frame, and fused across agents (ATTEN = per-pixel scaled-dot
    self-attention keeping the ego row, :44-54; MAX = elementwise max,
    :56-61) before the backbone's deconv heads run. The level-0
    communication mask is max-pooled down for deeper levels (:273-275).

    Must be called from the owning model's compact scope (the hook and
    this helper are parameter-free; ``backbone`` is the same bound module
    instance as the single-agent pass, so params are shared — the
    reference shares self.backbone, center_point_where2comm.py:127-131).

    canvas (B, L, H0, W0, C0); masks (B, L, Hc, Wc, 1) or None.
    Returns the fused, decoded (B, H', W', C') map.
    """
    b, l = agent_mask.shape
    flat = canvas.reshape((b * l,) + canvas.shape[2:])
    state = {"mask": masks}

    def level_fuse(i, feat):
        # feat (B*L, H, W, C) -> fused (B, H, W, C)
        x = feat.reshape((b, l) + feat.shape[1:])
        m = state["mask"]
        if m is not None:
            if m.shape[2:4] != x.shape[2:4]:
                if i == 0:
                    # confidence grid -> level-0 grid (the reference's
                    # configs match exactly; ours aligns by nearest)
                    m = jax.image.resize(
                        m, (b, l) + x.shape[2:4] + (1,), method="nearest",
                    )
                else:
                    # F.max_pool2d(mask, 2) per deeper level (:274)
                    ky = m.shape[2] // x.shape[2]
                    kx = m.shape[3] // x.shape[3]
                    m = nn.max_pool(
                        m.reshape((b * l,) + m.shape[2:]),
                        (ky, kx), strides=(ky, kx),
                    ).reshape((b, l) + x.shape[2:4] + (1,))
                state["mask"] = m
            x = x * m
        w = warp_to_ego(x, affine)  # (B, L, H, W, C)
        if agg_mode.upper() == "MAX":
            mm = agent_mask[:, :, None, None, None]
            return jnp.where(mm, w, _NEG).max(axis=1)
        # ATTEN: parameterless per-pixel scaled-dot attention, ego query
        c = w.shape[-1]
        q = w[:, 0]
        scores = jnp.einsum("bhwc,blhwc->blhw", q, w) / np.sqrt(c)
        scores = jnp.where(agent_mask[:, :, None, None], scores, _NEG)
        attn = nn.softmax(scores, axis=1)
        return jnp.einsum("blhw,blhwc->bhwc", attn, w)

    return backbone(flat, train, level_fuse=level_fuse)


@FUSIONS.register("where2comm")
class Where2commFusion(nn.Module):
    """Per-pixel multi-head attention fusion (EncodeLayer parity)."""

    feat_dim: int
    n_head: int = 8

    @nn.compact
    def __call__(self, x, affine, agent_mask, train: bool = False):
        w = warp_to_ego(x, affine)  # (B, L, H, W, C)
        b, l, hh, ww, c = w.shape
        q = w[:, 0:1]  # ego
        # (B, HW, L, C) tokens per pixel
        kv = w.transpose(0, 2, 3, 1, 4).reshape(b, hh * ww, l, c)
        qq = q.transpose(0, 2, 3, 1, 4).reshape(b, hh * ww, 1, c)

        d = c // self.n_head
        qp = nn.DenseGeneral((self.n_head, d), name="q_proj")(qq)
        kp = nn.DenseGeneral((self.n_head, d), name="k_proj")(kv)
        vp = nn.DenseGeneral((self.n_head, d), name="v_proj")(kv)
        scores = jnp.einsum("bpqhd,bplhd->bphql", qp, kp) / np.sqrt(d)
        scores = jnp.where(
            agent_mask[:, None, None, None, :], scores, _NEG
        )
        attn = nn.softmax(scores, axis=-1)
        ctx = jnp.einsum("bphql,bplhd->bpqhd", attn, vp)
        ctx = nn.DenseGeneral(c, axis=(-2, -1), name="out_proj")(ctx)

        out1 = nn.LayerNorm(name="norm1")(qq + ctx)
        ff = nn.Dense(c, name="linear2")(nn.relu(nn.Dense(c, name="linear1")(out1)))
        out2 = nn.LayerNorm(name="norm2")(out1 + ff)
        return out2.reshape(b, hh, ww, c)
