"""CoAlign: agent-pose refinement by aligning exchanged detection boxes.

Parity target: opencood/models/sub_modules/box_align_v2.py
(box_alignment_relative_sample_np:105-399) + pose_graph_optim.py (g2o SE2
pose-graph optimization). The reference builds an SE2 pose graph — nodes =
agent poses, landmarks = clustered boxes — and runs g2o Levenberg-
Marquardt. Here the same objective is solved with a fixed-size masked
Gauss-Newton in JAX: the graphs are tiny (<=5 agents, <=100 boxes), so a
dense solve per iteration is cheap and jittable.

Interface: box centers/yaws per agent in each agent's OWN frame, plus the
(noisy) world poses; returns refined SE2 poses (x, y, yaw). The ego (agent
0) is the gauge anchor and stays fixed (same convention as the reference:
relative correction, ego pose untouched).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def _se2_apply(pose, xy):
    """pose: (3,) [x, y, yaw]; xy: (..., 2)."""
    c, s = jnp.cos(pose[2]), jnp.sin(pose[2])
    rot = jnp.stack([jnp.stack([c, -s]), jnp.stack([s, c])])
    return xy @ rot.T + pose[:2]


@partial(jax.jit, static_argnames=("iterations",))
def box_align_relative(centers, yaws, box_mask, poses_se2,
                       thres: float = 1.5, iterations: int = 10,
                       damping: float = 1e-3, landmark_se2: bool = True):
    """Refine agent SE2 poses so their boxes agree in the world frame.

    centers: (L, K, 2) box centers in each agent's own frame
    yaws: (L, K) box yaw in own frame
    box_mask: (L, K) bool
    poses_se2: (L, 3) noisy world poses [x, y, yaw(rad)]
    Returns: (L, 3) refined poses (agent 0 unchanged).
    """
    L, K = box_mask.shape

    # landmarks: ego boxes in world frame under the (fixed) ego pose
    ego_pose = poses_se2[0]
    lm_xy = _se2_apply(ego_pose, centers[0])  # (K, 2)
    lm_yaw = yaws[0] + ego_pose[2]
    lm_mask = box_mask[0]

    def residuals(delta_flat):
        # delta for agents 1..L-1; ego gauge-fixed at zero
        delta = jnp.concatenate(
            [jnp.zeros((1, 3)), delta_flat.reshape(L - 1, 3)], axis=0
        )
        poses = poses_se2 + delta
        res = []
        for i in range(1, L):
            world_xy = _se2_apply(poses[i], centers[i])  # (K, 2)
            world_yaw = yaws[i] + poses[i, 2]
            # nearest ego landmark per box (masked)
            d2 = ((world_xy[:, None, :] - lm_xy[None]) ** 2).sum(-1)
            d2 = jnp.where(lm_mask[None], d2, 1e9)
            j = jnp.argmin(d2, axis=1)
            matched = (jnp.take_along_axis(d2, j[:, None], 1)[:, 0]
                       < thres ** 2) & box_mask[i]
            w = matched.astype(jnp.float32)[:, None]
            r_xy = (world_xy - lm_xy[j]) * w
            dyaw = world_yaw - lm_yaw[j]
            dyaw = jnp.arctan2(jnp.sin(dyaw), jnp.cos(dyaw))
            r_yaw = (dyaw * w[:, 0])[:, None] if landmark_se2 else \
                jnp.zeros((K, 1))
            res.append(jnp.concatenate([r_xy, r_yaw], axis=1).reshape(-1))
        return jnp.concatenate(res)

    def gn_step(delta, _):
        r = residuals(delta)
        J = jax.jacfwd(residuals)(delta)
        H = J.T @ J + damping * jnp.eye(delta.shape[0])
        g = J.T @ r
        return delta - jnp.linalg.solve(H, g), None

    delta0 = jnp.zeros(((L - 1) * 3,))
    delta, _ = jax.lax.scan(gn_step, delta0, None, length=iterations)
    full = jnp.concatenate(
        [jnp.zeros((1, 3)), delta.reshape(L - 1, 3)], axis=0
    )
    return poses_se2 + full


def refine_poses_np(pred_boxes, box_masks, noisy_poses_6dof,
                    thres: float = 1.5, iterations: int = 10):
    """numpy convenience wrapper for the data pipeline.

    pred_boxes: (L, K, 7) hwl boxes in each agent's own frame
    box_masks: (L, K)
    noisy_poses_6dof: (L, 6) [x, y, z, roll, yaw(deg), pitch]
    Returns (L, 6) with x, y, yaw refined.
    """
    poses = np.asarray(noisy_poses_6dof, np.float64)
    se2 = np.stack(
        [poses[:, 0], poses[:, 1], np.radians(poses[:, 4])], axis=1
    )
    refined = np.asarray(box_align_relative(
        jnp.asarray(pred_boxes[:, :, :2], jnp.float32),
        jnp.asarray(pred_boxes[:, :, 6], jnp.float32),
        jnp.asarray(box_masks, bool),
        jnp.asarray(se2, jnp.float32),
        thres=thres, iterations=iterations,
    ))
    out = poses.copy()
    out[:, 0] = refined[:, 0]
    out[:, 1] = refined[:, 1]
    out[:, 4] = np.degrees(refined[:, 2])
    return out
