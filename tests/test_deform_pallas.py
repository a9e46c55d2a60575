"""MXU deformable-conv kernel vs the gather formulation (interpret mode
on CPU; Mosaic-compiled on TPU)."""

import numpy as np
import jax
import jax.numpy as jnp

from gencomm_tpu.ops.deform import deform_conv3x3_nhwc
from gencomm_tpu.ops.deform_pallas import (
    deform_conv3x3_mxu, deform_conv3x3_auto, MAX_OFFSET,
)


def _inputs(seed=0, b=2, h=12, w=16, cin=8, cout=4, scale=2.0):
    rng = np.random.RandomState(seed)
    x = jnp.asarray(rng.randn(b, h, w, cin).astype(np.float32))
    off = jnp.asarray((rng.randn(b, h, w, 18) * scale).astype(np.float32))
    wt = jnp.asarray(rng.randn(3, 3, cin, cout).astype(np.float32) * 0.1)
    return x, off, wt


def test_matches_gather_formulation():
    x, off, wt = _inputs()
    off = jnp.clip(off, -MAX_OFFSET, MAX_OFFSET)
    a = deform_conv3x3_mxu(x, off, wt)
    b = deform_conv3x3_nhwc(x, off, wt)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               atol=1e-4, rtol=1e-4)


def test_auto_clamps_large_offsets():
    x, off, wt = _inputs(scale=20.0)  # offsets beyond the clamp
    a = deform_conv3x3_auto(x, off, wt)
    b = deform_conv3x3_nhwc(
        x, jnp.clip(off, -MAX_OFFSET, MAX_OFFSET), wt
    )
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               atol=1e-4, rtol=1e-4)


def test_gradients_match():
    x, off, wt = _inputs(seed=3)
    off = jnp.clip(off, -MAX_OFFSET, MAX_OFFSET)

    def fa(x_, o_, w_):
        return (deform_conv3x3_mxu(x_, o_, w_) ** 2).sum()

    def fb(x_, o_, w_):
        return (deform_conv3x3_nhwc(x_, o_, w_) ** 2).sum()

    ga = jax.grad(fa, argnums=(0, 1, 2))(x, off, wt)
    gb = jax.grad(fb, argnums=(0, 1, 2))(x, off, wt)
    for a, b in zip(ga, gb):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-3, rtol=1e-3)
