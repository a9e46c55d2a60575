"""Early fusion (Cooper): merge raw point clouds into the ego frame.

Parity: opencood/data_utils/datasets/early_fusion_dataset.py — every CAV's
cloud is projected to ego with its pairwise transform, concatenated, masked
to the ego lidar range, and the result is treated as ONE agent. Runs host
side in numpy (it is data prep, exactly where the reference does it);
outputs keep static shapes: capacity = L * P points with a validity mask.
"""

from __future__ import annotations

from typing import Dict

import numpy as np


def merge_points_to_ego(batch: Dict[str, np.ndarray],
                        lidar_range=None,
                        modality: str = "m1") -> Dict[str, np.ndarray]:
    """Collapse the (B, L, P, 4) per-agent clouds into (B, 1, L*P, 4).

    Returns a new batch dict where only the ego slot exists: single-agent
    models (or any model at L=1) consume it unchanged.
    """
    pts = np.asarray(batch[f"points_{modality}"])  # (B, L, P, 4)
    mask = np.asarray(batch[f"point_mask_{modality}"])  # (B, L, P)
    tfm = np.asarray(batch["pairwise_t_matrix"])  # (B, L, L, 4, 4)
    amask = np.asarray(batch["agent_mask"])  # (B, L)
    b, l, p, _ = pts.shape

    out_pts = np.zeros((b, 1, l * p, 4), pts.dtype)
    out_mask = np.zeros((b, 1, l * p), mask.dtype)
    for i in range(b):
        chunks, valids = [], []
        for j in range(l):
            xyz1 = np.concatenate(
                [pts[i, j, :, :3], np.ones((p, 1), pts.dtype)], axis=1
            )
            # T[j -> ego]: row 0 of the pairwise matrix (x1_to_x2 parity)
            proj = xyz1 @ tfm[i, j, 0].T.astype(pts.dtype)
            merged = np.concatenate([proj[:, :3], pts[i, j, :, 3:4]], axis=1)
            chunks.append(merged)
            valids.append(mask[i, j] * amask[i, j])
        allp = np.concatenate(chunks, axis=0)
        allv = np.concatenate(valids, axis=0)
        if lidar_range is not None:
            r = lidar_range
            inside = (
                (allp[:, 0] >= r[0]) & (allp[:, 0] <= r[3])
                & (allp[:, 1] >= r[1]) & (allp[:, 1] <= r[4])
                & (allp[:, 2] >= r[2]) & (allp[:, 2] <= r[5])
            )
            allv = allv * inside
        out_pts[i, 0] = allp
        out_mask[i, 0] = allv

    out = dict(batch)
    out[f"points_{modality}"] = out_pts
    out[f"point_mask_{modality}"] = out_mask
    out["agent_mask"] = np.ones((b, 1), amask.dtype)
    out["pairwise_t_matrix"] = np.broadcast_to(
        np.eye(4, dtype=tfm.dtype), (b, 1, 1, 4, 4)
    ).copy()
    if f"modality_mask_{modality}" in batch:
        out[f"modality_mask_{modality}"] = np.ones((b, 1), np.float32)
    return out
