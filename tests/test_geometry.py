import numpy as np
import jax.numpy as jnp

from gencomm_tpu.utils import box_utils, transformation_utils as tfu
from gencomm_tpu.ops import warp


def test_box_corners_axis_aligned():
    # hwl order: x y z h w l yaw
    box = np.array([[1.0, 2.0, 0.5, 2.0, 1.0, 4.0, 0.0]])
    corners = box_utils.boxes_to_corners_3d(box, order="hwl")
    assert corners.shape == (1, 8, 3)
    xs, ys, zs = corners[0, :, 0], corners[0, :, 1], corners[0, :, 2]
    assert np.allclose([xs.min(), xs.max()], [1 - 2, 1 + 2])  # l=4
    assert np.allclose([ys.min(), ys.max()], [2 - 0.5, 2 + 0.5])  # w=1
    assert np.allclose([zs.min(), zs.max()], [0.5 - 1, 0.5 + 1])  # h=2
    # bottom face corners 0..3
    assert np.allclose(corners[0, :4, 2], 0.5 - 1)


def test_box_corners_rotation_90deg():
    box = np.array([[0.0, 0.0, 0.0, 1.0, 2.0, 6.0, np.pi / 2]])
    corners = box_utils.boxes_to_corners_3d(box, order="hwl")
    xs, ys = corners[0, :, 0], corners[0, :, 1]
    # after 90deg rotation, length(6, x) is along y and width(2) along x
    assert np.allclose([xs.min(), xs.max()], [-1, 1], atol=1e-5)
    assert np.allclose([ys.min(), ys.max()], [-3, 3], atol=1e-5)


def test_pairwise_transform_roundtrip():
    poses = np.array(
        [
            [10.0, 5.0, 0.0, 0.0, 30.0, 0.0],
            [-3.0, 8.0, 0.0, 0.0, -45.0, 0.0],
        ]
    )
    pw = tfu.get_pairwise_transformation(poses, max_cav=3, n_valid=2)
    # T(i->j) @ T(j->i) = I
    assert np.allclose(pw[0, 1] @ pw[1, 0], np.eye(4), atol=1e-6)
    # padded slots identity
    assert np.allclose(pw[2, 1], np.eye(4))
    # a point at agent0 origin maps to agent0's position in agent1's frame
    p = pw[0, 1] @ np.array([0.0, 0, 0, 1])
    world0 = tfu.x_to_world(poses[0]) @ np.array([0.0, 0, 0, 1])
    expect = np.linalg.solve(tfu.x_to_world(poses[1]), world0)
    assert np.allclose(p, expect, atol=1e-6)


def test_limit_period():
    assert np.isclose(box_utils.limit_period(np.array(3 * np.pi / 2)), -np.pi / 2)
    v = box_utils.limit_period(np.array(0.3), 0, np.pi)
    assert np.isclose(v, 0.3)


def test_warp_identity():
    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.randn(2, 3, 8, 16).astype(np.float32))
    theta = jnp.tile(jnp.asarray([[1.0, 0, 0], [0, 1.0, 0]]), (2, 1, 1))
    out = warp.warp_affine(img, theta)
    assert np.allclose(out, img, atol=1e-5)


def test_warp_translation_shifts_content():
    # theta translation of +2/W *2 in normalized coords -> sample from x+2
    img = np.zeros((1, 1, 4, 8), np.float32)
    img[0, 0, :, 3] = 1.0
    tx = 2 * 2.0 / 8  # two pixels to the right in source
    theta = jnp.asarray([[[1.0, 0, tx], [0, 1.0, 0]]])
    out = np.asarray(warp.warp_affine(jnp.asarray(img), theta))
    # output pixel x sees source x+2: column 1 now holds the line
    assert np.allclose(out[0, 0, :, 1], 1.0, atol=1e-5)
    assert np.allclose(out[0, 0, :, 3], 0.0, atol=1e-5)


def test_normalize_pairwise_tfm_identity():
    pw = jnp.asarray(np.tile(np.eye(4, dtype=np.float32), (1, 2, 2, 1, 1)))
    aff = tfu.normalize_pairwise_tfm(pw, 256, 512, 0.4)
    assert aff.shape == (1, 2, 2, 2, 3)
    assert np.allclose(aff[0, 0, 0], np.array([[1, 0, 0], [0, 1, 0]]), atol=1e-6)
