"""GenComm conditional DDPM: generate neighbors' BEV features at the
receiver from (a) the ego's own feature and (b) the neighbor's transmitted
2-channel spatial message.

Parity: opencood/models/gencomm_modules/cond_diff.py (class GenComm):
  - linear beta schedule betas = linspace(sqrt(5e-3), sqrt(5e-2), T)^2
    (linear_start/end are hardcoded in the reference ctor :196-198,
    overriding the yaml's beta_start/beta_end), T = 3
  - x0 parameterization, v_posterior = 0
  - chain: x_{T-1} = q_sample(ego_broadcast) -> T-1 reverse p_sample steps
    with posterior noise -> final step returns the model's x0 directly
    ("upsam" branch, :292-294)
  - denoiser input = concat(message(2ch), x_t), :317-319

TPU redesign: the reference runs the reverse chain per sample in a Python
loop (:342-360) and backprops through it. Here the chain runs batched over
all B*L padded agent slots at once; T=3 steps are statically unrolled
(weight-shared UNet calls). Gradients flow through the full chain, matching
the reference's training objective.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from gencomm_tpu.models.gencomm.unet import DiffusionUNet


def make_schedule(num_timesteps: int, linear_start: float = 5e-3,
                  linear_end: float = 5e-2) -> dict:
    betas = (
        np.linspace(np.sqrt(linear_start), np.sqrt(linear_end), num_timesteps) ** 2
    )
    alphas = 1.0 - betas
    ac = np.cumprod(alphas)
    ac_prev = np.append(1.0, ac[:-1])
    posterior_variance = betas * (1.0 - ac_prev) / (1.0 - ac)
    return {
        "betas": betas,
        "sqrt_alphas_cumprod": np.sqrt(ac),
        "sqrt_one_minus_alphas_cumprod": np.sqrt(1.0 - ac),
        "posterior_mean_coef1": betas * np.sqrt(ac_prev) / (1.0 - ac),
        "posterior_mean_coef2": (1.0 - ac_prev) * np.sqrt(alphas) / (1.0 - ac),
        "posterior_log_variance_clipped": np.log(
            np.maximum(posterior_variance, 1e-20)
        ),
    }


class GenCommDiffusion(nn.Module):
    """Batched conditional DDPM over BEV features."""

    feat_ch: int = 128
    msg_ch: int = 2
    num_timesteps: int = 3
    unet_ch: int = 8
    unet_ch_mult: Sequence[int] = (1, 1)
    unet_num_res_blocks: int = 2
    unet_attn_resolutions: Sequence[int] = (16,)
    dropout: float = 0.0
    # AMP: run the denoiser chain in bf16 (the --half inference analog).
    # Schedule coefficients are applied as Python floats so they stay
    # weakly typed — a numpy float64 scalar would silently promote the
    # bf16 chain back to fp32.
    dtype: object = None

    def setup(self):
        self.denoiser = DiffusionUNet(
            out_ch=self.feat_ch,
            ch=self.unet_ch,
            ch_mult=tuple(self.unet_ch_mult),
            num_res_blocks=self.unet_num_res_blocks,
            attn_resolutions=tuple(self.unet_attn_resolutions),
            dropout=self.dropout,
            dtype=self.dtype,
        )
        self._sched = make_schedule(self.num_timesteps)

    def __call__(self, ego_feature, conditions, train: bool = False):
        """Generate per-agent features.

        ego_feature: (N, H, W, C) — each sample's EGO feature broadcast to
        all its agent slots (the generation starting point, cond_diff.py:
        332-337).
        conditions: (N, H, W, 2) — each agent's transmitted message.
        Returns pred_feature (N, H, W, C).
        """
        s = self._sched
        t_max = self.num_timesteps - 1
        n = ego_feature.shape[0]
        if self.dtype is not None:
            ego_feature = ego_feature.astype(self.dtype)
            conditions = conditions.astype(self.dtype)

        rng = self.make_rng("diffusion")
        rngs = jax.random.split(rng, self.num_timesteps + 1)

        # noise drawn in fp32 then cast: bf16 sampling uses different bits,
        # which would change the noise REALIZATION (not just its rounding)
        # between the fp32 and --half graphs
        noise = jax.random.normal(
            rngs[0], ego_feature.shape, jnp.float32
        ).astype(ego_feature.dtype)
        x = (
            float(s["sqrt_alphas_cumprod"][t_max]) * ego_feature
            + float(s["sqrt_one_minus_alphas_cumprod"][t_max]) * noise
        )

        for t in range(t_max, -1, -1):
            t_vec = jnp.full((n,), t, dtype=jnp.int32)
            model_out = self.denoiser(
                jnp.concatenate([conditions, x], axis=-1), t_vec, train
            )
            if t == 0:
                x = model_out  # x0-parameterization, final "upsam" step
            else:
                mean = (
                    float(s["posterior_mean_coef1"][t]) * model_out
                    + float(s["posterior_mean_coef2"][t]) * x
                )
                step_noise = jax.random.normal(
                    rngs[t], x.shape, jnp.float32
                ).astype(x.dtype)
                x = mean + float(np.exp(
                    0.5 * s["posterior_log_variance_clipped"][t]
                )) * step_noise
        return x
