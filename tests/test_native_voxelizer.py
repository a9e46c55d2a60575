"""Native C++ voxelizer + voxel-list encoder path.

Checks the ctypes-bound C++ pillar generator (gencomm_tpu/native) against
reference semantics (spconv VoxelGeneratorV2: first-come order, per-voxel
cap, zyx coords) and that the list-based encoder path reproduces the flat
on-device path's canvas bit-for-bit when no pillar overflows the cap.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gencomm_tpu.native import PillarVoxelizer, native_available
from gencomm_tpu.models.encoders.point_pillar import PointPillarEncoder

PC_RANGE = (-8.0, -4.0, -3.0, 8.0, 4.0, 1.0)
VOXEL = (0.4, 0.4, 4.0)


def test_native_lib_builds():
    assert native_available(), "g++ build of libvoxelizer.so failed"


def test_voxelize_basic():
    vz = PillarVoxelizer(PC_RANGE, VOXEL, max_voxels=64, max_points=4)
    pts = np.array([
        [0.1, 0.1, 0.0, 1.0],   # pillar A
        [0.15, 0.12, 0.0, 2.0],  # pillar A
        [-3.0, 2.0, 0.0, 3.0],   # pillar B
        [99.0, 0.0, 0.0, 4.0],   # out of range
        [0.11, 0.13, 0.5, 5.0],  # pillar A
    ], np.float32)
    voxels, coords, counts, nv = vz(pts)
    assert nv == 2
    assert counts[0] == 3 and counts[1] == 1
    # first-come order: pillar A first
    np.testing.assert_allclose(voxels[0, 0], pts[0])
    np.testing.assert_allclose(voxels[0, 2], pts[4])
    # zyx coords; x index of 0.1 is (0.1+8)/0.4 = 20
    assert tuple(coords[0]) == (0, 10, 20)
    assert tuple(coords[1]) == (0, 15, 12)


def test_voxelize_cap_and_reuse():
    vz = PillarVoxelizer(PC_RANGE, VOXEL, max_voxels=8, max_points=2)
    pts = np.tile(np.array([[0.1, 0.1, 0.0, 1.0]], np.float32), (5, 1))
    voxels, coords, counts, nv = vz(pts)
    assert nv == 1 and counts[0] == 2  # cap enforced
    # scratch table must be clean for the next call
    voxels2, coords2, counts2, nv2 = vz(pts[:1])
    assert nv2 == 1 and counts2[0] == 1


def test_matches_numpy_fallback():
    rng = np.random.RandomState(0)
    pts = rng.uniform(-8, 8, (500, 4)).astype(np.float32)
    pts[:, 1] /= 2.0
    pts[:, 2] = rng.uniform(-3, 1, 500)
    vz = PillarVoxelizer(PC_RANGE, VOXEL, max_voxels=256, max_points=8)
    v1, c1, n1, k1 = vz(pts)
    v2 = PillarVoxelizer(PC_RANGE, VOXEL, max_voxels=256, max_points=8)
    v2v, c2, n2, k2 = v2._numpy_fallback(
        pts, np.zeros_like(v1), np.zeros_like(c1), np.zeros_like(n1)
    )
    if native_available():
        assert k1 == k2
        np.testing.assert_array_equal(c1[:k1], c2[:k2])
        np.testing.assert_array_equal(n1[:k1], n2[:k2])
        np.testing.assert_allclose(v1[:k1], v2v[:k2])


def test_list_path_matches_flat_path():
    rng = np.random.RandomState(1)
    B, L, P = 1, 2, 400
    pts = np.zeros((B, L, P, 4), np.float32)
    pts[..., 0] = rng.uniform(-8, 8, (B, L, P))
    pts[..., 1] = rng.uniform(-4, 4, (B, L, P))
    pts[..., 2] = rng.uniform(-3, 1, (B, L, P))
    pts[..., 3] = rng.rand(B, L, P)
    mask = np.ones((B, L, P), bool)

    enc = PointPillarEncoder(
        voxel_size=VOXEL, lidar_range=PC_RANGE, num_filters=(16,),
        use_norm=True,
    )
    variables = enc.init(jax.random.PRNGKey(0), jnp.asarray(pts),
                         jnp.asarray(mask), False)
    flat = enc.apply(variables, jnp.asarray(pts), jnp.asarray(mask), False)

    # host voxelize per agent; generous caps so nothing is dropped
    vz = PillarVoxelizer(PC_RANGE, VOXEL, max_voxels=512, max_points=32)
    M, K = 512, 32
    voxels = np.zeros((B, L, M, K, 4), np.float32)
    coords = np.zeros((B, L, M, 3), np.int32)
    counts = np.zeros((B, L, M), np.int32)
    for b in range(B):
        for l in range(L):
            v, c, n, k = vz(pts[b, l])
            voxels[b, l], coords[b, l], counts[b, l] = v, c, n
    lst = enc.apply(
        variables, None, None, False,
        voxels=jnp.asarray(voxels), coords=jnp.asarray(coords),
        counts=jnp.asarray(counts),
    )
    np.testing.assert_allclose(np.asarray(flat), np.asarray(lst),
                               atol=1e-5, rtol=1e-5)


def test_decorated_path_matches_device_flat_path():
    """Host C++/numpy decoration (sorted-by-gid emission) must produce the
    same BEV canvas as the pure on-device flat path — the scatter-max is
    order-insensitive, and the sorted emission feeds the device's
    indices_are_sorted fast path."""
    rng = np.random.RandomState(2)
    B, L, P = 1, 2, 600
    pts = np.zeros((B, L, P, 4), np.float32)
    pts[..., 0] = rng.uniform(-10, 10, (B, L, P))  # some out of range
    pts[..., 1] = rng.uniform(-5, 5, (B, L, P))
    pts[..., 2] = rng.uniform(-4, 2, (B, L, P))
    pts[..., 3] = rng.rand(B, L, P)
    mask = np.ones((B, L, P), bool)

    enc = PointPillarEncoder(
        voxel_size=VOXEL, lidar_range=PC_RANGE, num_filters=(16,),
        use_norm=True,
    )
    variables = enc.init(jax.random.PRNGKey(0), jnp.asarray(pts),
                         jnp.asarray(mask), False)
    flat = enc.apply(variables, jnp.asarray(pts), jnp.asarray(mask), False)

    vz = PillarVoxelizer(PC_RANGE, VOXEL)
    feats, gids, valid = vz.decorate_batch(pts.reshape(B * L, P, 4))
    # sorted emission invariant: per agent, gids ascending
    for a in range(B * L):
        assert np.all(np.diff(gids[a]) >= 0)
    dec = enc.apply(
        variables, None, None, False,
        decorated=jnp.asarray(feats.reshape(B, L, P, 10)),
        gids=jnp.asarray(gids.reshape(B, L, P)),
        dvalid=jnp.asarray(valid.reshape(B, L, P)),
    )
    # the decorated path scatters in bf16 (monotone rounding commutes with
    # max, so it equals bf16(f32 canvas) up to PFN fp noise at bf16 scale)
    assert dec.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(flat, np.float32), np.asarray(dec, np.float32),
        atol=2e-2, rtol=2e-2)


def test_host_decorate_pillars_respects_padding_mask():
    """data/decorate.host_decorate_pillars: padded points (point_mask
    False) must not contribute to pillar statistics — canvas equals the
    raw on-device path with the same mask."""
    from gencomm_tpu.data.decorate import host_decorate_pillars

    rng = np.random.RandomState(5)
    B, L, P = 1, 2, 400
    pts = np.zeros((B, L, P, 4), np.float32)
    pts[..., 0] = rng.uniform(-8, 8, (B, L, P))
    pts[..., 1] = rng.uniform(-4, 4, (B, L, P))
    pts[..., 2] = rng.uniform(-3, 1, (B, L, P))
    pts[..., 3] = rng.rand(B, L, P)
    mask = np.ones((B, L, P), bool)
    mask[..., 300:] = False           # padded tail
    pts[..., 300:, :] = 0.0           # zeros land in the center pillar!

    enc = PointPillarEncoder(voxel_size=VOXEL, lidar_range=PC_RANGE,
                             num_filters=(16,), use_norm=True)
    variables = enc.init(jax.random.PRNGKey(0), jnp.asarray(pts),
                         jnp.asarray(mask), False)
    raw = enc.apply(variables, jnp.asarray(pts), jnp.asarray(mask), False)

    hypes = {"model": {"args": {"m1": {
        "core_method": "point_pillar",
        "encoder_args": {"voxel_size": list(VOXEL),
                         "lidar_range": list(PC_RANGE)},
    }}}}
    batch = host_decorate_pillars(
        {"points_m1": pts, "point_mask_m1": mask}, hypes)
    assert "points_m1" not in batch and "decorated_m1" in batch
    dec = enc.apply(
        variables, None, None, False,
        decorated=jnp.asarray(batch["decorated_m1"]),
        gids=jnp.asarray(batch["gids_m1"]),
        dvalid=jnp.asarray(batch["dvalid_m1"]),
    )
    np.testing.assert_allclose(np.asarray(raw, np.float32),
                               np.asarray(dec, np.float32),
                               atol=2e-2, rtol=2e-2)
