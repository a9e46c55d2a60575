"""CoAlign: agent-pose refinement by aligning exchanged detection boxes.

Parity target: opencood/models/sub_modules/box_align_v2.py
(box_alignment_relative_sample_np:105-399) + pose_graph_optim.py (g2o SE2
pose-graph optimization). The reference:
  1. projects every agent's predicted boxes to the world frame under the
     noisy poses, concatenates them (box_align_v2.py:162-186),
  2. clusters boxes from DIFFERENT agents whose world centers are within
     ``thres`` (same-agent pairs are excluded by setting their distance to
     MAX_DIST, :211-215; BFS over the threshold graph :222-291),
  3. builds an SE2 pose graph — agent vertices (ego fixed) + one free
     landmark vertex per cluster, edges carry the box pose measured in the
     agent's own frame with information = exp(-log_sigma2) from the
     stage-1 uncertainty head, xy scaled by 1/d_a^2 (:188-201, :359-388),
  4. runs g2o Levenberg-Marquardt (:390).

TPU-first redesign: fixed-capacity padded arrays, no ragged lists.
Clustering is connected components by iterated min-label propagation over
the (M, M) threshold adjacency (components have diameter <= number of
agents, so a handful of sweeps is exact). The free SE2 landmark of each
cluster is eliminated analytically (Schur complement): for quadratic xy
residuals the optimal landmark given poses is the certainty-weighted mean
of its member boxes, so the per-box residual becomes the deviation from
its cluster's weighted mean (weighted circular mean for yaw). That keeps
the Gauss-Newton state at 3*(L-1) while coupling non-ego agents to each
other through any shared cluster — boxes the ego never saw still
constrain the solution, matching the reference's joint graph. The graphs
are tiny (<=5 agents, <=100 boxes), so a dense masked Gauss-Newton in JAX
is cheap and jittable.

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

# reference box_align_v2.py:189-191 — anchor diag normalizes xy certainty
_W_A, _L_A = 1.6, 3.9
_D_A_SQUARE = _W_A ** 2 + _L_A ** 2


def _se2_apply(pose, xy):
    """pose: (3,) [x, y, yaw]; xy: (..., 2)."""
    c, s = jnp.cos(pose[2]), jnp.sin(pose[2])
    rot = jnp.stack([jnp.stack([c, -s]), jnp.stack([s, c])])
    return xy @ rot.T + pose[:2]


def _wrap(a):
    return jnp.arctan2(jnp.sin(a), jnp.cos(a))


def _cluster_labels(init_xy, valid, agent_of, thres, n_sweeps):
    """Connected components of the cross-agent threshold graph.

    init_xy: (M, 2) world box centers under the initial noisy poses —
    clusters are fixed before optimization, exactly as the reference
    clusters once on the noisy-pose projections (box_align_v2.py:208-291).
    Returns (M,) int labels; each component is labelled by its minimum
    member index, invalid boxes keep their own index.
    """
    m = init_xy.shape[0]
    d2 = ((init_xy[:, None, :] - init_xy[None, :, :]) ** 2).sum(-1)
    adj = (
        (d2 < thres ** 2)
        & (agent_of[:, None] != agent_of[None, :])  # ref :211-215 MAX_DIST
        & valid[:, None] & valid[None, :]
    )
    label = jnp.arange(m)

    def sweep(label, _):
        neigh = jnp.where(adj, label[None, :], m)
        label = jnp.minimum(label, neigh.min(axis=1))
        return label, None

    label, _ = jax.lax.scan(sweep, label, None, length=n_sweeps)
    return label


@partial(jax.jit,
         static_argnames=("iterations", "landmark_se2", "adaptive_landmark"))
def box_align_relative(centers, yaws, box_mask, poses_se2, uncertainty=None,
                       thres: float = 1.5, iterations: int = 10,
                       damping: float = 1e-3, landmark_se2: bool = True,
                       adaptive_landmark: bool = False,
                       yaw_var_thres: float = 0.2):
    """Refine agent SE2 poses so their boxes agree in the world frame.

    centers: (L, K, 2) box centers in each agent's own frame
    yaws: (L, K) box yaw in own frame
    box_mask: (L, K) bool
    poses_se2: (L, 3) noisy world poses [x, y, yaw(rad)]
    uncertainty: optional (L, K, 3) log sigma^2 from the stage-1
      uncertainty head (x, y, yaw regression targets); converted to
      information weights exp(-u) with xy scaled by 1/d_a^2, matching
      box_align_v2.py:194-201. None -> unit weights.
    landmark_se2: SE2 landmarks (xy + yaw residuals) vs R^2 (xy only),
      reference flag of the same name.
    adaptive_landmark: if True, clusters whose member yaws disagree
      (circular variance > yaw_var_thres) degrade to R^2 landmarks,
      reference box_align_v2.py:263-274.
    Returns: (L, 3) refined poses (agent 0 unchanged).
    """
    L, K = box_mask.shape
    M = L * K
    agent_of = jnp.repeat(jnp.arange(L), K)
    valid = box_mask.reshape(M)
    c_flat = centers.reshape(M, 2)
    y_flat = yaws.reshape(M)

    # certainty weights (information diagonal), box_align_v2.py:194-201
    if uncertainty is None:
        w = jnp.ones((M, 3))
    else:
        w = jnp.exp(-uncertainty.reshape(M, 3))
        w = w.at[:, :2].divide(_D_A_SQUARE)
    w = w * valid[:, None]

    def world(poses):
        xy = jax.vmap(_se2_apply)(poses, centers).reshape(M, 2)
        yw = (yaws + poses[:, 2:3]).reshape(M)
        return xy, yw

    init_xy, init_yaw = world(poses_se2)
    # component diameter <= L (one box per agent per object), so L sweeps
    # of min-label propagation are exact
    label = _cluster_labels(init_xy, valid, agent_of, thres, n_sweeps=L)

    # cluster sizes & the adaptive SE2->R2 downgrade, evaluated once on the
    # initial projections (the reference computes yaw_var at cluster build,
    # box_align_v2.py:258-274)
    ones = valid.astype(jnp.float32)
    size = jax.ops.segment_sum(ones, label, num_segments=M)
    wy = w[:, 2]
    sin_s = jax.ops.segment_sum(wy * jnp.sin(init_yaw), label, M)
    cos_s = jax.ops.segment_sum(wy * jnp.cos(init_yaw), label, M)
    wy_s = jax.ops.segment_sum(wy, label, M)
    # circular variance in [0, 1]: 1 - |mean resultant|
    rbar = jnp.sqrt(sin_s ** 2 + cos_s ** 2) / jnp.maximum(wy_s, 1e-9)
    yaw_ok = (1.0 - rbar) <= yaw_var_thres
    use_yaw_cluster = (
        (yaw_ok if adaptive_landmark else jnp.ones((M,), bool))
        if landmark_se2 else jnp.zeros((M,), bool)
    )

    sqw = jnp.sqrt(w)

    def residuals(delta_flat):
        # delta for agents 1..L-1; ego gauge-fixed at zero (reference pins
        # agent 0, box_align_v2.py:341-344)
        delta = jnp.concatenate(
            [jnp.zeros((1, 3)), delta_flat.reshape(L - 1, 3)], axis=0
        )
        xy, yw = world(poses_se2 + delta)
        # Schur-eliminated landmark = certainty-weighted mean over cluster
        wx_s = jax.ops.segment_sum(w[:, 0], label, M)
        wyy_s = jax.ops.segment_sum(w[:, 1], label, M)
        mean_x = jax.ops.segment_sum(w[:, 0] * xy[:, 0], label, M) / \
            jnp.maximum(wx_s, 1e-9)
        mean_y = jax.ops.segment_sum(w[:, 1] * xy[:, 1], label, M) / \
            jnp.maximum(wyy_s, 1e-9)
        ssin = jax.ops.segment_sum(wy * jnp.sin(yw), label, M)
        scos = jax.ops.segment_sum(wy * jnp.cos(yw), label, M)
        # zero-weight clusters: arctan2(0, 0) has a NaN gradient — pin to
        # (0, 1); their residuals are zero-weighted anyway
        safe = wy_s > 1e-9
        mean_yaw = jnp.arctan2(jnp.where(safe, ssin, 0.0),
                               jnp.where(safe, scos, 1.0))
        # singleton clusters: mean == self -> zero residual; no constraint,
        # matching the reference dropping single boxes (:230-249)
        r_x = sqw[:, 0] * (xy[:, 0] - mean_x[label])
        r_y = sqw[:, 1] * (xy[:, 1] - mean_y[label])
        r_yaw = sqw[:, 2] * _wrap(yw - mean_yaw[label]) * \
            use_yaw_cluster[label].astype(xy.dtype)
        return jnp.stack([r_x, r_y, r_yaw], axis=1).reshape(-1)

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
                    uncertainty=None, thres: float = 1.5,
                    iterations: int = 10, **kwargs):
    """numpy convenience wrapper for the data pipeline.

    pred_boxes: (L, K, 7) hwl boxes in each agent's own frame
    box_masks: (L, K)
    noisy_poses_6dof: (L, 6) [x, y, z, roll, yaw(deg), pitch]
    uncertainty: optional (L, K, 3) log sigma^2 (see box_align_relative)
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
        None if uncertainty is None
        else jnp.asarray(uncertainty, jnp.float32),
        thres=thres, iterations=iterations, **kwargs,
    ))
    out = poses.copy()
    out[:, 0] = refined[:, 0]
    out[:, 1] = refined[:, 1]
    out[:, 4] = np.degrees(refined[:, 2])
    return out
