"""Sparse 3D conv correctness vs dense XLA conv on tiny grids."""

import pytest
import numpy as np
import jax
import jax.numpy as jnp

from gencomm_tpu.ops import sparse as sp

# heavy suite: excluded from the fast subset (`pytest -m "not slow"`, VERDICT r3 #9)
pytestmark = pytest.mark.slow

GRID = (5, 6, 7)  # (D, H, W)


def _random_active(rng, n_agents=2, k=40):
    coords = np.stack(
        [
            rng.randint(0, n_agents, k),
            rng.randint(0, GRID[0], k),
            rng.randint(0, GRID[1], k),
            rng.randint(0, GRID[2], k),
        ],
        axis=1,
    ).astype(np.int32)
    # dedupe
    keys = ((coords[:, 0] * GRID[0] + coords[:, 1]) * GRID[1] + coords[:, 2]) \
        * GRID[2] + coords[:, 3]
    _, first = np.unique(keys, return_index=True)
    coords = coords[np.sort(first)]
    k = len(coords)
    feats = rng.randn(k, 3).astype(np.float32)
    return jnp.asarray(feats), jnp.asarray(coords), jnp.ones(k, bool)


def _densify(feats, coords, valid, n_agents):
    dense = np.zeros((n_agents, *GRID, feats.shape[-1]), np.float32)
    f, c, v = map(np.asarray, (feats, coords, valid))
    for i in range(len(f)):
        if v[i]:
            a, z, y, x = c[i]
            dense[a, z, y, x] = f[i]
    return dense


def _dense_conv(dense, w, stride=(1, 1, 1), padding=((1, 1), (1, 1), (1, 1))):
    return jax.lax.conv_general_dilated(
        jnp.asarray(dense), jnp.asarray(w),
        window_strides=stride, padding=padding,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
    )


def test_subm_conv_matches_dense_at_active_sites():
    rng = np.random.RandomState(0)
    feats, coords, valid = _random_active(rng)
    w = rng.randn(3, 3, 3, 3, 4).astype(np.float32)
    out = sp.subm_conv3d(feats, coords, valid, jnp.asarray(w), GRID, chunk=16)
    dense = _densify(feats, coords, valid, 2)
    ref = np.asarray(_dense_conv(dense, w))
    c = np.asarray(coords)
    for i in range(len(c)):
        a, z, y, x = c[i]
        np.testing.assert_allclose(
            np.asarray(out[i]), ref[a, z, y, x], atol=1e-4
        )


def test_spconv_downsample_matches_dense():
    rng = np.random.RandomState(1)
    feats, coords, valid = _random_active(rng)
    w = rng.randn(3, 3, 3, 3, 4).astype(np.float32)
    out, ocoords, ovalid, ogrid = sp.spconv3d_downsample(
        feats, coords, valid, jnp.asarray(w), GRID,
        stride=(2, 2, 2), padding=(1, 1, 1), out_capacity=256, chunk=16,
    )
    dense = _densify(feats, coords, valid, 2)
    ref = np.asarray(
        _dense_conv(dense, w, stride=(2, 2, 2))
    )
    assert ref.shape[1:4] == ogrid
    oc, ov = np.asarray(ocoords), np.asarray(ovalid)
    got = np.asarray(out)
    covered = np.zeros(ref.shape[:4], bool)
    for i in range(len(oc)):
        if ov[i]:
            a, z, y, x = oc[i]
            np.testing.assert_allclose(got[i], ref[a, z, y, x], atol=1e-4)
            covered[a, z, y, x] = True
    # every nonzero dense output cell must be in the active set
    nonzero = np.abs(ref).sum(-1) > 1e-5
    assert (covered | ~nonzero).all()


def test_asymmetric_padding_and_z_stride():
    rng = np.random.RandomState(2)
    feats, coords, valid = _random_active(rng)
    w = rng.randn(3, 1, 1, 3, 2).astype(np.float32)
    out, ocoords, ovalid, ogrid = sp.spconv3d_downsample(
        feats, coords, valid, jnp.asarray(w), GRID,
        stride=(2, 1, 1), padding=(0, 0, 0), out_capacity=256, chunk=16,
    )
    dense = _densify(feats, coords, valid, 2)
    ref = np.asarray(
        _dense_conv(dense, w, stride=(2, 1, 1),
                    padding=((0, 0), (0, 0), (0, 0)))
    )
    assert ref.shape[1:4] == ogrid
    oc, ov, got = np.asarray(ocoords), np.asarray(ovalid), np.asarray(out)
    for i in range(len(oc)):
        if ov[i]:
            a, z, y, x = oc[i]
            np.testing.assert_allclose(got[i], ref[a, z, y, x], atol=1e-4)


def test_voxelize_mean():
    pts = np.array(
        [
            [[0.05, 0.05, 0.05, 1.0],
             [0.15, 0.05, 0.05, 3.0],   # same voxel (0.1 voxels)... no: x differs
             [0.05, 0.08, 0.01, 5.0],
             [99.0, 0.0, 0.0, 7.0]],    # out of range
        ],
        np.float32,
    )
    mask = np.ones((1, 4), bool)
    pc_range = (0, 0, 0, 0.7, 0.6, 0.5)
    feats, coords, valid = sp.voxelize_mean(
        jnp.asarray(pts), jnp.asarray(mask), pc_range, (0.1, 0.1, 0.1),
        (5, 6, 7), capacity=8,
    )
    v = np.asarray(valid)
    assert v.sum() == 2  # voxel (0,0,0) holds pts 0 and 2; (0,0,1) holds pt 1
    f, c = np.asarray(feats)[v], np.asarray(coords)[v]
    k = [((cc[1] * 6 + cc[2]) * 7 + cc[3]) for cc in c]
    order = np.argsort(k)
    f = f[order]
    np.testing.assert_allclose(f[0], [0.05, 0.065, 0.03, 3.0], atol=1e-5)
    np.testing.assert_allclose(f[1], [0.15, 0.05, 0.05, 3.0], atol=1e-5)


def test_second_encoder_smoke():
    from gencomm_tpu.models.encoders.second import SECONDEncoder

    rng = np.random.RandomState(3)
    lidar_range = (0.0, 0.0, -2.0, 12.8, 6.4, 1.2)
    enc = SECONDEncoder(
        voxel_size=(0.1, 0.1, 0.1), lidar_range=lidar_range,
        voxel_capacity_per_agent=2048, out_ch=32,
    )
    pts = np.stack(
        [
            rng.uniform(0, 12.8, (1, 2, 500)),
            rng.uniform(0, 6.4, (1, 2, 500)),
            rng.uniform(-2, 1.2, (1, 2, 500)),
            rng.uniform(0, 1, (1, 2, 500)),
        ],
        axis=-1,
    ).astype(np.float32)
    mask = np.ones((1, 2, 500), bool)
    variables = jax.jit(
        lambda p, m: enc.init(jax.random.PRNGKey(0), p, m, train=False)
    )(jnp.asarray(pts), jnp.asarray(mask))
    out = jax.jit(lambda v, p, m: enc.apply(v, p, m, train=False))(
        variables, jnp.asarray(pts), jnp.asarray(mask)
    )
    # z: 33 -> 17 -> 9 -> 4 -> conv_out -> 1 plane; BEV C = 1 * out_ch
    assert out.shape[0:2] == (1, 2)
    assert out.shape[-1] == 32
    assert bool(jnp.isfinite(out).all())
    assert float(jnp.abs(out).sum()) > 0
