"""CodeFilling's UMGM multi-stage vector quantizer, TPU-native.

Parity target: opencood/models/sub_modules/codebook.py:16-417 (UMGMQuantizer
with _multiCodebookQuantization / _quantizerEncoder / _quantizerDecoder):
  - per-pixel channel vectors split into m segments, each quantized against
    its own k-entry codebook (residual multi-level chain)
  - training: Gumbel-softmax straight-through sampling with a learned,
    lower-bounded per-segment temperature (:147-175)
  - decode: reverse chain with side heads adding coarser-level context
  - codebook loss = MSE(restored, stop_grad(input)) (:395-414)

All ops are dense matmuls/einsums over (n, m, k) — MXU-friendly; no
scatter. The entropy-coder bitstream path of the reference is host-side
tooling and intentionally out of scope (codes ARE the message payload).
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn

EPS = 1e-6


class UMGMQuantizer(nn.Module):
    channel: int
    seg_num: int  # m — number of codebook segments per vector
    dict_sizes: Sequence[int]  # k per level (reference: 3 equal levels)

    def _codebook(self, i: int, k: int):
        d = self.channel // self.seg_num
        std = (2.0 / (5.0 * self.channel / self.seg_num)) ** 0.5
        return self.param(
            f"codebook_{i}",
            lambda key, shape: jax.random.normal(key, shape) * std,
            (self.seg_num, k, d),
        )

    def _distance(self, x, codebook):
        """x: (n, c) -> (n, m, k) squared distances."""
        n = x.shape[0]
        xs = x.reshape(n, self.seg_num, -1)
        x2 = (xs ** 2).sum(-1, keepdims=True)
        c2 = (codebook ** 2).sum(-1)
        inter = jnp.einsum("nmd,mkd->nmk", xs, codebook)
        return x2 + c2[None] - 2 * inter

    @nn.compact
    def __call__(self, x, train: bool = False):
        """x: (n, channel). Returns (restored (n, channel), codes
        [(n, m)] per level, code_loss scalar)."""
        x_gt = jax.lax.stop_gradient(x)
        n_levels = len(self.dict_sizes)
        quantizeds = []
        codes = []
        h = x
        for i, k in enumerate(self.dict_sizes):
            codebook = self._codebook(i, k)
            z = nn.Dense(self.channel, name=f"latent_enc_{i}")(h)
            q_in = nn.Dense(self.channel, name=f"q_head_{i}")(z)

            dist = self._distance(q_in, codebook)  # (n, m, k)
            scale = jnp.sqrt(jnp.asarray(float(k)))
            logit = -dist / scale
            temp = self.param(
                f"temperature_{i}", nn.initializers.ones, (self.seg_num, 1)
            )
            logit = logit * jnp.clip(temp, EPS, None)[None]

            if train:
                g_rng = self.make_rng("dropout")
                sample = jax.nn.softmax(
                    (logit + jax.random.gumbel(g_rng, logit.shape)), axis=-1
                )
                hard = jax.nn.one_hot(
                    jnp.argmax(sample, -1), k, dtype=sample.dtype
                )
                # straight-through
                sample = hard + sample - jax.lax.stop_gradient(sample)
            else:
                sample = jax.nn.one_hot(
                    jnp.argmin(dist, -1), k, dtype=x.dtype
                )
            codes.append(jnp.argmax(sample, -1))
            q = jnp.einsum("nmk,mkd->nmd", sample, codebook).reshape(
                x.shape[0], -1
            )
            quantizeds.append(q)
            if i < n_levels - 1:
                z_next = nn.Dense(self.channel, name=f"latent_head_{i}")(z)
                h = z_next - q  # residual to the next level
        former = None
        for i in range(n_levels - 1, -1, -1):
            dq = nn.Dense(self.channel, name=f"deq_head_{i}")(quantizeds[i])
            if i < n_levels - 1:
                dq = dq + nn.Dense(self.channel, name=f"side_head_{i}")(former)
            former = nn.Dense(self.channel, name=f"restore_head_{i}")(dq)
        code_loss = jnp.mean((former - x_gt) ** 2)
        return former, codes, code_loss
