"""MXU warp kernel vs gather warp and a float64 oracle (interpret mode on
CPU; the same kernel compiles via Mosaic on TPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gencomm_tpu.ops.warp import warp_affine
from gencomm_tpu.ops.warp_pallas import warp_affine_mxu, warp_affine_auto

THETAS = np.asarray([
    [[1.0, 0, 0], [0, 1.0, 0]],
    [[0.9, -0.2, 0.1], [0.2, 0.9, -0.05]],
    [[0.5, 0.86, 0.3], [-0.86, 0.5, 0.2]],
    [[1.3, 0.0, -0.4], [0.0, 0.7, 0.6]],
], np.float32)


def test_matches_gather_warp():
    src = jax.random.normal(jax.random.PRNGKey(0), (4, 16, 24, 8))
    theta = jnp.asarray(THETAS)
    out = warp_affine_mxu(src, theta)
    ref = jnp.moveaxis(warp_affine(jnp.moveaxis(src, -1, 1), theta), 1, -1)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-4, rtol=1e-4)


def test_matches_float64_oracle():
    h, w, c = 12, 16, 3
    src = np.random.RandomState(0).randn(1, h, w, c).astype(np.float32)
    th = THETAS[1]
    out = np.asarray(warp_affine_mxu(jnp.asarray(src), jnp.asarray(th[None])))
    exp = np.zeros_like(src)
    for yo in range(h):
        for xo in range(w):
            gx = (2 * xo + 1) / w - 1
            gy = (2 * yo + 1) / h - 1
            sx = th[0, 0] * gx + th[0, 1] * gy + th[0, 2]
            sy = th[1, 0] * gx + th[1, 1] * gy + th[1, 2]
            x = (sx + 1) * w / 2 - 0.5
            y = (sy + 1) * h / 2 - 0.5
            x0, y0 = int(np.floor(x)), int(np.floor(y))
            for dy in (0, 1):
                for dx in (0, 1):
                    xi, yi = x0 + dx, y0 + dy
                    wt = (1 - abs(x - xi)) * (1 - abs(y - yi))
                    if 0 <= xi < w and 0 <= yi < h:
                        exp[0, yo, xo] += wt * src[0, yi, xi]
    np.testing.assert_allclose(out, exp, atol=1e-4)


def test_gradients_flow():
    src = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 16, 4))
    theta = jnp.asarray(THETAS[:2])
    g = jax.grad(lambda s: (warp_affine_mxu(s, theta) ** 2).sum())(src)
    gref = jax.grad(
        lambda s: (jnp.moveaxis(
            warp_affine(jnp.moveaxis(s, -1, 1), theta), 1, -1) ** 2).sum()
    )(src)
    np.testing.assert_allclose(np.asarray(g), np.asarray(gref),
                               atol=1e-4, rtol=1e-4)


def test_auto_dispatch_nchw_api():
    src = jax.random.normal(jax.random.PRNGKey(2), (2, 3, 4, 8, 16))
    theta = jnp.tile(jnp.asarray(THETAS[1])[None, None], (2, 3, 1, 1))
    out = warp_affine_auto(src, theta)
    ref = warp_affine(src, theta)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-4, rtol=1e-4)
