"""MPDA: multi-modal perception domain adaption modules, TPU-native.

Parity targets (opencood/models/mpda_modules/):
  resizer.py LearnableResizer:27-74 — 1x1 channel selector, window+grid
    self-attention (SwapFusionEncoder), bilinear resize to the ego's spatial
    size, residual conv stack, attention refine, shortcut sum.
  wg_fusion_modules.py CrossDomainFusionEncoder:306-339 — depth x windowed
    cross-attention blocks (query = cav feature, key/value = ego feature)
    with an MLP head.
  classfier.py DAImgHead + gradient_layer.py GradientScalarLayer(-9.1) —
    per-pixel domain logits behind a gradient-reversal scale (adversarial:
    the feature path is trained to FOOL the domain classifier).

Dense NHWC; window/grid attention are pure reshapes + batched MHSA (MXU
matmuls), no gather.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import flax.linen as nn


# --- gradient reversal / scaling ---------------------------------------

@partial(jax.custom_vjp, nondiff_argnums=(1,))
def gradient_scale(x, weight: float):
    return x


def _gs_fwd(x, weight):
    return x, None


def _gs_bwd(weight, _res, g):
    return (weight * g,)


gradient_scale.defvjp(_gs_fwd, _gs_bwd)


# --- attention building blocks ------------------------------------------

class WindowMHSA(nn.Module):
    """Multi-head self-attention within ws x ws windows; ``grid=True``
    swaps the partition (MaxViT-style grid attention)."""

    dim_head: int = 32
    heads: int = 8
    window_size: int = 8
    grid: bool = False

    @nn.compact
    def __call__(self, x):
        n, h, w, c = x.shape
        ws = self.window_size
        hh, ww = h // ws, w // ws
        if self.grid:
            # tokens = one pixel per window at the same offset
            t = x.reshape(n, ws, hh, ws, ww, c).transpose(0, 2, 4, 1, 3, 5)
            t = t.reshape(n * hh * ww, ws * ws, c)
        else:
            t = x.reshape(n, hh, ws, ww, ws, c).transpose(0, 1, 3, 2, 4, 5)
            t = t.reshape(n * hh * ww, ws * ws, c)
        inner = self.heads * self.dim_head
        q = nn.Dense(inner, use_bias=False, name="q")(t)
        k = nn.Dense(inner, use_bias=False, name="k")(t)
        v = nn.Dense(inner, use_bias=False, name="v")(t)

        def split(a):
            return a.reshape(a.shape[0], a.shape[1], self.heads,
                             self.dim_head).transpose(0, 2, 1, 3)

        attn = jax.nn.softmax(
            jnp.einsum("bhid,bhjd->bhij", split(q), split(k))
            / jnp.sqrt(float(self.dim_head)),
            axis=-1,
        )
        o = jnp.einsum("bhij,bhjd->bhid", attn, split(v))
        o = o.transpose(0, 2, 1, 3).reshape(t.shape[0], t.shape[1], inner)
        o = nn.Dense(c, name="out")(o)
        o = o.reshape(n, hh, ww, ws, ws, c)
        if self.grid:
            o = o.transpose(0, 3, 1, 4, 2, 5).reshape(n, h, w, c)
        else:
            o = o.transpose(0, 1, 3, 2, 4, 5).reshape(n, h, w, c)
        return o


class WindowGridEncoder(nn.Module):
    """SwapFusionEncoder analog: depth x (window attn -> grid attn -> FFN)."""

    dim: int
    depth: int = 1
    dim_head: int = 32
    heads: int = 8
    window_size: int = 8
    mlp_mult: int = 2

    @nn.compact
    def __call__(self, x):
        for i in range(self.depth):
            x = x + WindowMHSA(
                self.dim_head, self.heads, self.window_size,
                grid=False, name=f"win_{i}",
            )(nn.LayerNorm(name=f"norm_w_{i}")(x))
            x = x + WindowMHSA(
                self.dim_head, self.heads, self.window_size,
                grid=True, name=f"grid_{i}",
            )(nn.LayerNorm(name=f"norm_g_{i}")(x))
            h = nn.LayerNorm(name=f"norm_f_{i}")(x)
            h = nn.Dense(self.dim * self.mlp_mult, name=f"ff1_{i}")(h)
            x = x + nn.Dense(self.dim, name=f"ff2_{i}")(nn.gelu(h))
        return nn.Dense(self.dim, name="head")(
            nn.LayerNorm(name="head_norm")(x)
        )


class WindowCrossAttention(nn.Module):
    """Windowed cross attention: query from x, key/value from ctx."""

    dim_head: int = 32
    heads: int = 8
    window_size: int = 8

    @nn.compact
    def __call__(self, x, ctx):
        n, h, w, c = x.shape
        ws = self.window_size
        hh, ww = h // ws, w // ws

        def part(a):
            a = a.reshape(n, hh, ws, ww, ws, c).transpose(0, 1, 3, 2, 4, 5)
            return a.reshape(n * hh * ww, ws * ws, c)

        tq, tk = part(x), part(ctx)
        inner = self.heads * self.dim_head
        q = nn.Dense(inner, use_bias=False, name="q")(tq)
        k = nn.Dense(inner, use_bias=False, name="k")(tk)
        v = nn.Dense(inner, use_bias=False, name="v")(tk)

        def split(a):
            return a.reshape(a.shape[0], a.shape[1], self.heads,
                             self.dim_head).transpose(0, 2, 1, 3)

        attn = jax.nn.softmax(
            jnp.einsum("bhid,bhjd->bhij", split(q), split(k))
            / jnp.sqrt(float(self.dim_head)),
            axis=-1,
        )
        o = jnp.einsum("bhij,bhjd->bhid", attn, split(v))
        o = o.transpose(0, 2, 1, 3).reshape(tq.shape[0], tq.shape[1], inner)
        o = nn.Dense(c, name="out")(o)
        o = o.reshape(n, hh, ww, ws, ws, c).transpose(0, 1, 3, 2, 4, 5)
        return o.reshape(n, h, w, c)


# --- MPDA components ----------------------------------------------------

class ResidualBlockLeaky(nn.Module):
    dim: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        bn = lambda: nn.BatchNorm(  # noqa: E731
            use_running_average=not train, momentum=0.99, epsilon=1e-3
        )
        y = nn.Conv(self.dim, (3, 3), padding="SAME")(x)
        y = nn.leaky_relu(bn()(y))
        y = nn.Conv(self.dim, (3, 3), padding="SAME")(y)
        y = bn()(y)
        return x + y


class LearnableResizer(nn.Module):
    """resizer.py:27-74; spatial resize uses the ego's (H, W)."""

    out_channel: int
    wg_depth: int = 1
    wg_dim_head: int = 32
    wg_heads: int = 8
    window_size: int = 8
    res_depth: int = 2

    @nn.compact
    def __call__(self, ego, cav, train: bool = False):
        h, w = ego.shape[1:3]
        cav = nn.Conv(self.out_channel, (1, 1), name="channel_selector")(cav)
        c1 = WindowGridEncoder(
            self.out_channel, self.wg_depth, self.wg_dim_head,
            self.wg_heads, self.window_size, name="wg_att_1",
        )(cav)
        c1 = jax.image.resize(
            c1, (c1.shape[0], h, w, c1.shape[-1]), method="bilinear"
        )
        c2 = c1
        for i in range(self.res_depth):
            c2 = ResidualBlockLeaky(self.out_channel, name=f"res_{i}")(
                c2, train
            )
        c2 = c2 + c1
        c2 = WindowGridEncoder(
            self.out_channel, self.wg_depth, self.wg_dim_head,
            self.wg_heads, self.window_size, name="wg_att_2",
        )(c2)
        c0 = jax.image.resize(
            cav, (cav.shape[0], h, w, cav.shape[-1]), method="bilinear"
        )
        return c0 + c2


class CrossDomainFusionEncoder(nn.Module):
    """wg_fusion_modules.py:306-339."""

    dim: int
    depth: int = 1
    dim_head: int = 32
    heads: int = 8
    window_size: int = 8

    @nn.compact
    def __call__(self, ego, cav):
        x = cav
        for i in range(self.depth):
            x = x + WindowCrossAttention(
                self.dim_head, self.heads, self.window_size,
                name=f"block_{i}",
            )(nn.LayerNorm(name=f"norm_{i}")(x), ego)
        x = nn.LayerNorm(name="head_norm")(x)
        return nn.Dense(self.dim, name="head")(x)


class DAImgHead(nn.Module):
    """classfier.py DAImgHead: gradient-reversed per-pixel domain logits."""

    grl_weight: float = -9.1

    @nn.compact
    def __call__(self, x):
        x = gradient_scale(x, self.grl_weight)
        init = nn.initializers.normal(stddev=0.001)
        x = nn.relu(
            nn.Conv(512, (1, 1), kernel_init=init, name="conv1_da")(x)
        )
        return nn.Conv(1, (1, 1), kernel_init=init, name="conv2_da")(x)
