"""Parity tests for the MXU BEV splat kernel (ops/splat_pallas.py).

Reference semantics: the segment_sum splat in LSSEncoder.splat
(models/encoders/lss.py) — itself golden-tested against the reference's
QuickCumsum voxel pooling (opencood/utils/camera_utils.py:209-252).
These run the Pallas kernel in interpreter mode on CPU with tiny shapes.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gencomm_tpu.ops.splat_pallas import splat_topk


def _ref(dvals, feats, ids, num_cells):
    c = feats.shape[-1]
    upd = (dvals[..., None] * feats[:, None, :]).reshape(-1, c)
    upd = upd.astype(jnp.bfloat16).astype(jnp.float32)
    flat = jnp.where(ids < num_cells, ids, num_cells).reshape(-1)
    return jax.ops.segment_sum(upd, flat, num_segments=num_cells + 1)[:-1]


@pytest.mark.parametrize("seed,p,k,s", [(0, 700, 4, 1200), (1, 512, 2, 513)])
def test_splat_parity(seed, p, k, s):
    rng = np.random.default_rng(seed)
    c = 128
    dvals = jnp.asarray(rng.random((p, k), dtype=np.float32))
    feats = jnp.asarray(rng.standard_normal((p, c), dtype=np.float32))
    # include out-of-bounds ids (dropped) and heavy collisions
    ids = jnp.asarray(rng.integers(0, s + 40, (p, k)), jnp.int32)
    out = splat_topk(dvals, feats, ids, s)
    ref = _ref(dvals, feats, ids, s)
    scale = float(jnp.abs(ref).max())
    assert out.shape == (s, c)
    np.testing.assert_allclose(out, ref, atol=2e-3 * scale)


def test_splat_empty_and_dense_cells():
    # all rows land in ONE cell (worst-case collision) + empty stripes
    p, k, c, s = 256, 2, 128, 4096
    dvals = jnp.ones((p, k), jnp.float32) * 0.5
    feats = jnp.ones((p, c), jnp.float32)
    ids = jnp.full((p, k), 777, jnp.int32)
    out = splat_topk(dvals, feats, ids, s)
    np.testing.assert_allclose(out[777], p * k * 0.5, rtol=1e-2)
    mask = jnp.ones(s, bool).at[777].set(False)
    assert float(jnp.abs(out[mask]).max()) == 0.0

    # all rows out of bounds -> zero canvas (unvisited stripes masked)
    out0 = splat_topk(dvals, feats, jnp.full((p, k), s + 9, jnp.int32), s)
    assert float(jnp.abs(out0).max()) == 0.0


def test_splat_grad_matches_segment_sum():
    rng = np.random.default_rng(2)
    p, k, c, s = 300, 3, 128, 800
    dvals = jnp.asarray(rng.random((p, k), dtype=np.float32))
    feats = jnp.asarray(rng.standard_normal((p, c), dtype=np.float32))
    ids = jnp.asarray(rng.integers(0, s + 20, (p, k)), jnp.int32)
    w = jnp.asarray(rng.standard_normal((s, c), dtype=np.float32))

    def loss_pallas(d, f):
        return (splat_topk(d, f, ids, s) * w).sum()

    def loss_ref(d, f):
        upd = (d[..., None] * f[:, None, :]).reshape(-1, c)
        flat = jnp.where(ids < s, ids, s).reshape(-1)
        o = jax.ops.segment_sum(upd, flat, num_segments=s + 1)[:-1]
        return (o * w).sum()

    gd, gf = jax.grad(loss_pallas, argnums=(0, 1))(dvals, feats)
    gd_r, gf_r = jax.grad(loss_ref, argnums=(0, 1))(dvals, feats)
    np.testing.assert_allclose(gd, gd_r, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(gf, gf_r, rtol=1e-4, atol=1e-4)


def test_lss_encoder_pallas_path_matches_segment_sum():
    """End-to-end LSSEncoder.splat parity: splat_impl pallas vs segment_sum."""
    from gencomm_tpu.models.encoders.lss import LSSEncoder

    grid_conf = {
        "xbound": [-8.0, 8.0, 1.0], "ybound": [-8.0, 8.0, 1.0],
        "zbound": [-10.0, 10.0, 20.0], "ddiscr": [2, 18, 8], "mode": "LID",
    }
    kw = dict(grid_conf=grid_conf, final_dim=(32, 48), feat_ch=128,
              trunk_blocks=1, depth_topk=4)
    enc_p = LSSEncoder(**kw, splat_impl="pallas")
    enc_s = LSSEncoder(**kw, splat_impl="segment_sum")
    rng = np.random.default_rng(3)
    b, l, n = 1, 2, 2
    eye = np.broadcast_to(np.eye(3, dtype=np.float32), (b, l, n, 3, 3))
    intrins = np.array([[40.0, 0, 24], [0, 40.0, 16], [0, 0, 1]],
                       np.float32)
    cams = {
        "imgs": jnp.asarray(
            rng.random((b, l, n, 32, 48, 3), dtype=np.float32)),
        "rots": jnp.asarray(eye),
        "trans": jnp.zeros((b, l, n, 3)),
        "intrins": jnp.asarray(np.broadcast_to(intrins, (b, l, n, 3, 3))),
        "post_rots": jnp.asarray(eye),
        "post_trans": jnp.zeros((b, l, n, 3)),
    }
    variables = enc_p.init(jax.random.PRNGKey(0), cams)
    out_p, _ = enc_p.apply(variables, cams)
    out_s, _ = enc_s.apply(variables, cams)
    scale = float(jnp.abs(out_s).max()) + 1e-9
    np.testing.assert_allclose(out_p, out_s, atol=2e-2 * scale)
