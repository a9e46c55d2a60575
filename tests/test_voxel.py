import numpy as np
import jax.numpy as jnp

from gencomm_tpu.ops import voxel


PC_RANGE = (0.0, 0.0, -3.0, 4.0, 2.0, 1.0)
VOXEL = (1.0, 1.0, 4.0)
NX, NY = 4, 2


def test_pillar_ids_and_bounds():
    pts = jnp.asarray(
        np.array(
            [
                [0.5, 0.5, 0.0, 1.0],   # cell (0,0) -> id 0
                [3.5, 1.5, 0.0, 1.0],   # cell (3,1) -> id 7
                [9.0, 0.5, 0.0, 1.0],   # out of range x
                [1.5, 0.5, 0.0, 1.0],   # cell (1,0) -> id 1, but masked out
            ],
            np.float32,
        )
    )
    mask = jnp.asarray([True, True, True, False])
    ids, valid = voxel.pillar_ids(pts, mask, PC_RANGE, VOXEL, NX, NY)
    assert ids.tolist() == [0, 7, 8, 8]
    assert valid.tolist() == [True, True, False, False]


def test_pillar_decorate_mean_and_center():
    pts = np.array(
        [
            [0.25, 0.5, 0.0, 1.0],
            [0.75, 0.5, 0.0, 2.0],
        ],
        np.float32,
    )
    ids = jnp.asarray([0, 0])
    valid = jnp.asarray([True, True])
    feat = voxel.pillar_decorate(jnp.asarray(pts), ids, valid, PC_RANGE, VOXEL, NX, NY)
    assert feat.shape == (2, 10)
    # cluster offset: x mean = 0.5
    assert np.allclose(np.asarray(feat[:, 4]), [-0.25, 0.25], atol=1e-6)
    # center offset: pillar center x=0.5, y=0.5, z=-1
    assert np.allclose(np.asarray(feat[0, 7:10]), [0.25 - 0.5, 0.0, 1.0], atol=1e-6)


def test_scatter_pillar_max():
    feats = jnp.asarray(np.array([[1.0, -5.0], [3.0, -7.0], [9.9, 9.9]], np.float32))
    ids = jnp.asarray([5, 5, 8])  # id 8 = dump slot
    valid = jnp.asarray([True, True, False])
    canvas = voxel.scatter_pillar_max(feats, ids, valid, NX, NY)
    assert canvas.shape == (NY, NX, 2)
    # id 5 -> iy=1, ix=1
    assert np.allclose(np.asarray(canvas[1, 1]), [3.0, -5.0])
    assert np.allclose(np.asarray(canvas[0, 0]), [0.0, 0.0])  # empty = zeros


def test_cap_points_per_pillar():
    ids = jnp.asarray([0, 0, 0, 1, 0, 1])
    valid = jnp.asarray([True] * 6)
    capped = voxel.cap_points_per_pillar(
        jnp.zeros((6, 4)), ids, valid, NX, NY, max_points=2
    )
    # ids 0 appear at positions 0,1,2,4 -> first two kept
    assert capped.tolist() == [True, True, False, True, False, True]
