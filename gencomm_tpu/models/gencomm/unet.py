"""DDPM UNet denoiser for GenComm feature generation.

Parity: opencood/models/gencomm_modules/unet.py (DiffusionUNet — the
ddim-lineage UNet): swish nonlinearity, GroupNorm(4), sinusoidal timestep
embedding -> 2-layer MLP (temb_ch = 4*ch), ResnetBlocks with temb injection,
optional attention (inactive at the flagship config's resolutions),
asymmetric-padded stride-2 downsample, nearest-neighbor upsample.

Flagship config (gencomm stage1 yamls): in=128+2 msg channels, ch=8,
ch_mult=(1,1), 2 res blocks -> a shallow 2-level UNet. NHWC.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import jax.numpy as jnp
import flax.linen as nn


def timestep_embedding(t, dim: int):
    """Sinusoidal embeddings, fairseq convention (unet.py:10-28):
    [sin | cos] halves."""
    half = dim // 2
    freqs = jnp.exp(
        -np.log(10000.0) * jnp.arange(half, dtype=jnp.float32) / (half - 1)
    )
    args = t.astype(jnp.float32)[:, None] * freqs[None, :]
    emb = jnp.concatenate([jnp.sin(args), jnp.cos(args)], axis=1)
    if dim % 2 == 1:
        emb = jnp.pad(emb, ((0, 0), (0, 1)))
    return emb


def swish(x):
    return x * nn.sigmoid(x)


class ResnetBlock(nn.Module):
    out_ch: int
    dropout: float = 0.0
    dtype: object = None

    @nn.compact
    def __call__(self, x, temb, train: bool = False):
        in_ch = x.shape[-1]
        h = nn.GroupNorm(num_groups=4, epsilon=1e-6, dtype=self.dtype)(x)
        h = swish(h)
        h = nn.Conv(self.out_ch, (3, 3), padding="SAME", dtype=self.dtype)(h)
        h = h + nn.Dense(self.out_ch, dtype=self.dtype)(
            swish(temb))[:, None, None, :]
        h = nn.GroupNorm(num_groups=4, epsilon=1e-6, dtype=self.dtype)(h)
        h = swish(h)
        h = nn.Dropout(self.dropout, deterministic=not train)(h)
        h = nn.Conv(self.out_ch, (3, 3), padding="SAME", dtype=self.dtype)(h)
        if in_ch != self.out_ch:
            x = nn.Conv(self.out_ch, (1, 1), dtype=self.dtype)(x)
        return x + h


class AttnBlock(nn.Module):
    dtype: object = None

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        y = nn.GroupNorm(num_groups=4, epsilon=1e-6, dtype=self.dtype)(x)
        q = nn.Conv(c, (1, 1), dtype=self.dtype)(y).reshape(b, h * w, c)
        k = nn.Conv(c, (1, 1), dtype=self.dtype)(y).reshape(b, h * w, c)
        v = nn.Conv(c, (1, 1), dtype=self.dtype)(y).reshape(b, h * w, c)
        attn = nn.softmax(
            (q @ k.transpose(0, 2, 1)).astype(jnp.float32) / np.sqrt(c),
            axis=-1,
        ).astype(v.dtype)
        out = (attn @ v).reshape(b, h, w, c)
        return x + nn.Conv(c, (1, 1), dtype=self.dtype)(out)


class Downsample(nn.Module):
    dtype: object = None

    @nn.compact
    def __call__(self, x):
        # asymmetric pad (0,1,0,1) + stride-2 valid conv (unet.py:59-78)
        x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
        return nn.Conv(x.shape[-1], (3, 3), strides=(2, 2), padding="VALID",
                       dtype=self.dtype)(x)


class Upsample(nn.Module):
    dtype: object = None

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        x = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
        return nn.Conv(c, (3, 3), padding="SAME", dtype=self.dtype)(x)


class DiffusionUNet(nn.Module):
    out_ch: int = 128
    ch: int = 8
    ch_mult: Sequence[int] = (1, 1)
    num_res_blocks: int = 2
    attn_resolutions: Sequence[int] = (16,)
    dropout: float = 0.0
    resolution: int = 128  # nominal, only drives attn placement
    # AMP (--half analog at inference): bf16 conv/GN activations; params
    # stay fp32, the final conv_out emits the compute dtype (the diffusion
    # chain arithmetic continues in it)
    dtype: object = None

    @nn.compact
    def __call__(self, x, t, train: bool = False):
        # x: (B, H, W, Cin) = concat(message 2ch or cond, noisy feature)
        if self.dtype is not None:
            x = x.astype(self.dtype)
        ch, ch_mult = self.ch, tuple(self.ch_mult)
        temb_ch = ch * 4
        temb = timestep_embedding(t, ch)
        temb = nn.Dense(temb_ch, dtype=self.dtype)(temb)
        temb = nn.Dense(temb_ch, dtype=self.dtype)(swish(temb))

        num_res = len(ch_mult)
        curr_res = self.resolution
        hs = [nn.Conv(ch, (3, 3), padding="SAME", dtype=self.dtype,
                      name="conv_in")(x)]
        for i_level in range(num_res):
            block_out = ch * ch_mult[i_level]
            for i_block in range(self.num_res_blocks):
                h = ResnetBlock(block_out, self.dropout, dtype=self.dtype,
                                name=f"down{i_level}_block{i_block}")(
                    hs[-1], temb, train
                )
                if curr_res in self.attn_resolutions:
                    h = AttnBlock(dtype=self.dtype,
                                  name=f"down{i_level}_attn{i_block}")(h)
                hs.append(h)
            if i_level != num_res - 1:
                hs.append(Downsample(dtype=self.dtype,
                                     name=f"down{i_level}_ds")(hs[-1]))
                curr_res //= 2

        h = hs[-1]
        h = ResnetBlock(h.shape[-1], self.dropout, dtype=self.dtype,
                        name="mid_block1")(h, temb, train)
        h = ResnetBlock(h.shape[-1], self.dropout, dtype=self.dtype,
                        name="mid_block2")(h, temb, train)

        for i_level in reversed(range(num_res)):
            block_out = ch * ch_mult[i_level]
            for i_block in range(self.num_res_blocks + 1):
                h = ResnetBlock(block_out, self.dropout, dtype=self.dtype,
                                name=f"up{i_level}_block{i_block}")(
                    jnp.concatenate([h, hs.pop()], axis=-1), temb, train
                )
                if curr_res in self.attn_resolutions:
                    h = AttnBlock(dtype=self.dtype,
                                  name=f"up{i_level}_attn{i_block}")(h)
            if i_level != 0:
                h = Upsample(dtype=self.dtype, name=f"up{i_level}_us")(h)
                curr_res *= 2

        h = nn.GroupNorm(num_groups=4, epsilon=1e-6, dtype=self.dtype)(h)
        h = swish(h)
        return nn.Conv(self.out_ch, (3, 3), padding="SAME", dtype=self.dtype,
                       name="conv_out")(h)
