"""Pose-error injection for robustness evaluation.

Parity: opencood/utils/pose_utils.py:9-106 — Gaussian (or Laplace) noise on
x, y and yaw of every non-ego agent's lidar pose; the clean pose is kept
alongside for GT generation (``lidar_pose_clean`` convention).
"""

from __future__ import annotations

import numpy as np


def generate_noise(pos_std: float, rot_std: float, pos_mean: float = 0.0,
                   rot_mean: float = 0.0, rng: np.random.RandomState | None = None):
    """(6,) additive pose noise on x, y, yaw (deg) — pose_utils.py:42-73."""
    rng = rng or np.random
    xy = rng.normal(pos_mean, pos_std, 2)
    yaw = rng.normal(rot_mean, rot_std)
    return np.array([xy[0], xy[1], 0.0, 0.0, yaw, 0.0])


def generate_noise_laplace(pos_b: float, rot_b: float,
                           rng: np.random.RandomState | None = None):
    """Laplace-distributed variant — pose_utils.py:76-104."""
    rng = rng or np.random
    xy = rng.laplace(0.0, pos_b, 2)
    yaw = rng.laplace(0.0, rot_b)
    return np.array([xy[0], xy[1], 0.0, 0.0, yaw, 0.0])


def generate_noise_von_mises(poses: np.ndarray, pos_std: float,
                             rot_std: float, pos_mean: float = 0.0,
                             rot_mean: float = 0.0,
                             rng: np.random.RandomState | None = None):
    """(N, 6) additive noise batch with von-Mises-distributed yaw (radians)
    — pose_utils.py:107-140 ``generate_noise_torch``, the V2VNet-robust
    variant. Gaussian x/y in meters; yaw concentration ``(180/(pi*std))^2``
    mirrors the reference's degree-std parameterization."""
    rng = rng or np.random
    n = poses.shape[0]
    noise = np.zeros_like(poses)
    if pos_std > 0:
        noise[:, :2] = rng.normal(pos_mean, pos_std, (n, 2))
    if rot_std > 0:
        concentration = (180.0 / (np.pi * rot_std)) ** 2
        noise[:, 4] = rng.vonmises(rot_mean, concentration, n)
    return noise


def remove_z_axis(T: np.ndarray) -> np.ndarray:
    """Zero the z translation/rotation of a 4x4 transform (in place, like
    the reference) — pose_utils.py:144-160, used by the V2VNet-robust path."""
    T[2, 3] = 0.0
    T[0, 2] = 0.0
    T[1, 2] = 0.0
    T[2, 0] = 0.0
    T[2, 1] = 0.0
    T[2, 2] = 1.0
    return T


def pose_noise_enabled(noise_setting: dict | None) -> bool:
    """Reference gate (pose_utils.py:14): pose noise requires BOTH
    ``add_noise`` and ``add_pose_noise`` present-and-true. Our CLI writers
    (inference --pos_std/--rot_std) set both keys."""
    ns = noise_setting or {}
    return bool(ns.get("add_noise", False)) and bool(
        "add_pose_noise" in ns and ns["add_pose_noise"]
    )


def add_noise_to_poses(poses: np.ndarray, noise_setting: dict | None,
                       rng: np.random.RandomState | None = None) -> np.ndarray:
    """poses: (N, 6) with slot 0 = ego (kept clean, as the reference keeps
    the ego pose noiseless only when noise_target_ratio logic is absent —
    reference noises ALL agents incl. ego in add_noise_data_dict; we follow
    that: every agent's pose is perturbed)."""
    if not pose_noise_enabled(noise_setting):
        return poses.copy()
    args = noise_setting.get("args", {})
    pos_std = args.get("pos_std", 0.0)
    rot_std = args.get("rot_std", 0.0)
    laplace = args.get("laplace", False)
    out = poses.copy()
    for i in range(out.shape[0]):
        if laplace:
            out[i] += generate_noise_laplace(pos_std, rot_std, rng)
        else:
            out[i] += generate_noise(pos_std, rot_std, rng=rng)
    return out
