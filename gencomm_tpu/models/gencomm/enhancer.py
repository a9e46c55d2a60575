"""Post-generation feature Enhancer.

Parity: opencood/models/gencomm_modules/enhancer.py:335-383 — the *shipped*
configuration: one Enhancer_block whose window-attention branch is disabled
(enhancer.py:352 comments the attn call, leaving ``x = shortcut + norm1(x)``)
followed by the FRFN gated MLP, then a SplitAttn sigmoid channel gate
(radix=1 path). We reproduce that active computation exactly; the windowed
attention branch can be re-enabled later via ``use_attn``.

Operates on (N, H, W, C) NHWC, batched over all padded agent slots (the
reference loops per sample; the computation is per-agent so dense batching
is exact).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp


class FRFN(nn.Module):
    """Partial-conv + gated MLP (enhancer.py:207-250)."""

    dim: int
    hidden_dim: int

    @nn.compact
    def __call__(self, x):
        # x: (N, H, W, C)
        dim_conv = self.dim // 4
        x1, x2 = x[..., :dim_conv], x[..., dim_conv:]
        x1 = nn.Conv(dim_conv, (3, 3), padding="SAME", use_bias=False,
                     name="partial_conv")(x1)
        x = jnp.concatenate([x1, x2], axis=-1)

        x = nn.Dense(self.hidden_dim * 2, name="linear1")(x)
        x = nn.gelu(x)
        g1, g2 = jnp.split(x, 2, axis=-1)
        g1 = nn.Conv(
            self.hidden_dim, (3, 3), padding="SAME",
            feature_group_count=self.hidden_dim, name="dwconv",
        )(g1)
        g1 = nn.gelu(g1)
        return nn.Dense(self.dim, name="linear2")(g1 * g2)


class SplitAttn(nn.Module):
    """Sigmoid channel gate from spatially-pooled stats (enhancer.py:303-333,
    radix=1 path)."""

    dim: int

    @nn.compact
    def __call__(self, x):
        gap = x.mean(axis=(1, 2), keepdims=True)  # (N, 1, 1, C)
        y = nn.Dense(self.dim, use_bias=False, name="fc1")(gap)
        y = nn.LayerNorm(name="ln")(y)
        y = nn.relu(y)
        y = nn.Dense(self.dim, use_bias=False, name="fc2")(y)
        return x * nn.sigmoid(y)


class EnhancerBlock(nn.Module):
    dim: int
    use_attn: bool = False

    @nn.compact
    def __call__(self, x):
        shortcut = x
        y = nn.LayerNorm(name="norm1")(x)
        if self.use_attn:
            raise NotImplementedError(
                "window-attention branch is disabled in the reference "
                "(enhancer.py:352); enable once ported"
            )
        x = shortcut + y  # the shipped residual quirk
        x = x + FRFN(self.dim, self.dim * 2, name="mlp")(
            nn.LayerNorm(name="norm2")(x)
        )
        return x


class Enhancer(nn.Module):
    dim: int

    @nn.compact
    def __call__(self, x):
        # x: (N, H, W, C)
        s = EnhancerBlock(self.dim, name="block_1")(x)
        return SplitAttn(self.dim, name="split_attn")(s)
