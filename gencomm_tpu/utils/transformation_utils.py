"""Pose / transformation-matrix geometry.

CARLA-convention poses ``[x, y, z, roll, yaw, pitch]`` in degrees (left-handed
coordinate frame as in OPV2V). Numpy implementations for the host data
pipeline; jnp variants where in-graph use is needed.

Reference parity: opencood/utils/transformation_utils.py
  x_to_world              :141-189 (same rotation composition)
  x1_to_x2                (solve(T2w, T1w))
  get_pairwise_transformation :21-66
  normalize_pairwise_tfm  :68-92  (4x4 -> 2x3 affine for feature warping)
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def x_to_world(pose) -> np.ndarray:
    """Pose [x,y,z,roll,yaw,pitch] (deg) -> 4x4 transform agent->world."""
    x, y, z, roll, yaw, pitch = pose
    c_y, s_y = np.cos(np.radians(yaw)), np.sin(np.radians(yaw))
    c_r, s_r = np.cos(np.radians(roll)), np.sin(np.radians(roll))
    c_p, s_p = np.cos(np.radians(pitch)), np.sin(np.radians(pitch))

    matrix = np.identity(4)
    matrix[0, 3], matrix[1, 3], matrix[2, 3] = x, y, z

    matrix[0, 0] = c_p * c_y
    matrix[0, 1] = c_y * s_p * s_r - s_y * c_r
    matrix[0, 2] = -c_y * s_p * c_r - s_y * s_r
    matrix[1, 0] = s_y * c_p
    matrix[1, 1] = s_y * s_p * s_r + c_y * c_r
    matrix[1, 2] = -s_y * s_p * c_r + c_y * s_r
    matrix[2, 0] = s_p
    matrix[2, 1] = -c_p * s_r
    matrix[2, 2] = c_p * c_r
    return matrix


def x_to_world_batch(poses: np.ndarray) -> np.ndarray:
    """Vectorized x_to_world: (N, 6) poses (deg) -> (N, 4, 4)."""
    poses = np.asarray(poses, np.float64)
    x, y, z = poses[:, 0], poses[:, 1], poses[:, 2]
    roll, yaw, pitch = (np.radians(poses[:, 3]), np.radians(poses[:, 4]),
                        np.radians(poses[:, 5]))
    c_y, s_y = np.cos(yaw), np.sin(yaw)
    c_r, s_r = np.cos(roll), np.sin(roll)
    c_p, s_p = np.cos(pitch), np.sin(pitch)
    m = np.zeros((len(poses), 4, 4))
    m[:, 0, 0] = c_p * c_y
    m[:, 0, 1] = c_y * s_p * s_r - s_y * c_r
    m[:, 0, 2] = -c_y * s_p * c_r - s_y * s_r
    m[:, 1, 0] = s_y * c_p
    m[:, 1, 1] = s_y * s_p * s_r + c_y * c_r
    m[:, 1, 2] = -s_y * s_p * c_r + c_y * s_r
    m[:, 2, 0] = s_p
    m[:, 2, 1] = -c_p * s_r
    m[:, 2, 2] = c_p * c_r
    m[:, 0, 3], m[:, 1, 3], m[:, 2, 3], m[:, 3, 3] = x, y, z, 1.0
    return m


def x1_to_x2(x1, x2) -> np.ndarray:
    """Transform from frame of pose x1 to frame of pose x2 (both CARLA poses,
    or already-4x4 matrices)."""
    t1 = x1 if isinstance(x1, np.ndarray) and x1.shape == (4, 4) else x_to_world(x1)
    t2 = x2 if isinstance(x2, np.ndarray) and x2.shape == (4, 4) else x_to_world(x2)
    return np.linalg.solve(t2, t1)  # T2w^-1 @ T1w


def get_pairwise_transformation(poses: np.ndarray, max_cav: int, n_valid: int,
                                proj_first: bool = False) -> np.ndarray:
    """(L, L, 4, 4) pairwise transforms; [i, j] maps agent-i coords into
    agent-j's frame (Tji). Identity for padded slots and when proj_first."""
    pairwise = np.tile(np.eye(4), (max_cav, max_cav, 1, 1))
    if proj_first:
        return pairwise
    t_list = [x_to_world(poses[i]) for i in range(n_valid)]
    for i in range(n_valid):
        for j in range(n_valid):
            if i != j:
                pairwise[i, j] = np.linalg.solve(t_list[j], t_list[i])
    return pairwise


def normalize_pairwise_tfm(pairwise_t_matrix, H: float, W: float,
                           discrete_ratio: float, downsample_rate: float = 1.0):
    """4x4 metric transforms -> 2x3 normalized affine matrices for the BEV
    feature warp (the analog of torch ``F.affine_grid`` input).

    ``pairwise_t_matrix``: (..., 4, 4). Returns (..., 2, 3).
    H, W: feature-map height/width in *pixels or meters* — only the ratio and
    the product ``downsample_rate * discrete_ratio * {W,H}`` matter; callers
    follow the reference in passing grid dims with a matching discrete_ratio.
    """
    p = jnp.asarray(pairwise_t_matrix)
    affine = p[..., (0, 1), :][..., :, (0, 1, 3)]  # (..., 2, 3)
    a00 = affine[..., 0, 0]
    a01 = affine[..., 0, 1] * H / W
    a10 = affine[..., 1, 0] * W / H
    a11 = affine[..., 1, 1]
    a02 = affine[..., 0, 2] / (downsample_rate * discrete_ratio * W) * 2
    a12 = affine[..., 1, 2] / (downsample_rate * discrete_ratio * H) * 2
    row0 = jnp.stack([a00, a01, a02], axis=-1)
    row1 = jnp.stack([a10, a11, a12], axis=-1)
    return jnp.stack([row0, row1], axis=-2)


def pose_to_tfm_2d(pose: np.ndarray) -> np.ndarray:
    """[N, 3] (x, y, yaw deg) -> [N, 4, 4]."""
    n = pose.shape[0]
    tfm = np.tile(np.eye(4), (n, 1, 1))
    yaw = np.radians(pose[:, 2])
    tfm[:, 0, 0] = np.cos(yaw)
    tfm[:, 0, 1] = -np.sin(yaw)
    tfm[:, 1, 0] = np.sin(yaw)
    tfm[:, 1, 1] = np.cos(yaw)
    tfm[:, 0, 3] = pose[:, 0]
    tfm[:, 1, 3] = pose[:, 1]
    return tfm
