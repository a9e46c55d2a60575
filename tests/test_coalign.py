"""CoAlign pose refinement: Gauss-Newton SE2 alignment recovers an
injected pose error."""

import numpy as np
import jax.numpy as jnp

from gencomm_tpu.models.coalign import box_align_relative, refine_poses_np


def make_scene(rng, err_xy=(0.8, -0.5), err_yaw=0.05):
    """Two agents observing the same 6 world boxes; agent 1's pose is
    perturbed by (err_xy, err_yaw)."""
    K = 8
    world_xy = rng.uniform(-20, 20, (6, 2))
    world_yaw = rng.uniform(-np.pi, np.pi, 6)

    true_poses = np.array([[0.0, 0.0, 0.0], [10.0, 2.0, 0.3]])

    def to_local(pose, xy, yaw):
        c, s = np.cos(pose[2]), np.sin(pose[2])
        rot = np.array([[c, s], [-s, c]])  # world -> local
        return (xy - pose[:2]) @ rot.T, yaw - pose[2]

    centers = np.zeros((2, K, 2))
    yaws = np.zeros((2, K))
    mask = np.zeros((2, K), bool)
    for i in range(2):
        lx, ly = to_local(true_poses[i], world_xy, world_yaw)
        centers[i, :6] = lx
        yaws[i, :6] = ly
        mask[i, :6] = True

    noisy = true_poses.copy()
    noisy[1, 0] += err_xy[0]
    noisy[1, 1] += err_xy[1]
    noisy[1, 2] += err_yaw
    return centers, yaws, mask, noisy, true_poses


def test_recovers_injected_pose_error():
    rng = np.random.RandomState(0)
    centers, yaws, mask, noisy, true_poses = make_scene(rng)
    refined = np.asarray(box_align_relative(
        jnp.asarray(centers, jnp.float32), jnp.asarray(yaws, jnp.float32),
        jnp.asarray(mask), jnp.asarray(noisy, jnp.float32),
        thres=3.0,
    ))
    # ego untouched
    np.testing.assert_allclose(refined[0], noisy[0], atol=1e-6)
    # agent 1 pulled back towards the truth
    err_before = np.abs(noisy[1] - true_poses[1])
    err_after = np.abs(refined[1] - true_poses[1])
    assert err_after[0] < 0.15 and err_after[1] < 0.15
    assert err_after[2] < 0.03
    assert (err_after < err_before + 1e-6).all()


def test_refine_poses_np_wrapper():
    rng = np.random.RandomState(1)
    centers, yaws, mask, noisy, true_poses = make_scene(rng)
    boxes = np.zeros((2, mask.shape[1], 7), np.float32)
    boxes[:, :, 0:2] = centers
    boxes[:, :, 6] = yaws
    poses6 = np.zeros((2, 6))
    poses6[:, 0] = noisy[:, 0]
    poses6[:, 1] = noisy[:, 1]
    poses6[:, 4] = np.degrees(noisy[:, 2])
    out = refine_poses_np(boxes, mask, poses6, thres=3.0)
    assert abs(out[1, 0] - true_poses[1, 0]) < 0.15
    assert abs(np.radians(out[1, 4]) - true_poses[1, 2]) < 0.03


def test_no_matches_is_stable():
    rng = np.random.RandomState(2)
    centers, yaws, mask, noisy, _ = make_scene(rng)
    # empty neighbor boxes: refinement must not blow up
    mask[1] = False
    refined = np.asarray(box_align_relative(
        jnp.asarray(centers, jnp.float32), jnp.asarray(yaws, jnp.float32),
        jnp.asarray(mask), jnp.asarray(noisy, jnp.float32),
    ))
    assert np.isfinite(refined).all()
    np.testing.assert_allclose(refined[1], noisy[1], atol=1e-4)
