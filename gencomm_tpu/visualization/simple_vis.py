"""BEV visualization of detections vs ground truth.

Parity: opencood/visualization/simple_vis.py:13 (visualize: BEV png dumps
of point cloud + pred/GT boxes, called periodically from inference) and
vis_bevfeat.py (feature-map dumps). matplotlib instead of the reference's
cv2/open3d stack — headless-safe.
"""

from __future__ import annotations

import numpy as np

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402


def _draw_boxes_bev(ax, corners3d: np.ndarray, color: str, label: str):
    """corners3d: (N, 8, 3); draws the bottom quad in BEV."""
    first = True
    for c in corners3d:
        quad = np.concatenate([c[:4, :2], c[:1, :2]], axis=0)
        ax.plot(quad[:, 0], quad[:, 1], color=color, linewidth=1.0,
                label=label if first else None)
        first = False


def visualize(pred_corners3d, gt_corners3d, points, lidar_range,
              save_path: str, method: str = "bev", scores=None):
    """Dump one frame's BEV png.

    pred/gt_corners3d: (N, 8, 3) numpy; points: (P, 3+) lidar in ego frame;
    lidar_range: [xmin, ymin, zmin, xmax, ymax, zmax].
    """
    fig, ax = plt.subplots(figsize=(12, 6))
    if points is not None and len(points):
        pts = np.asarray(points)
        keep = (
            (pts[:, 0] >= lidar_range[0]) & (pts[:, 0] <= lidar_range[3])
            & (pts[:, 1] >= lidar_range[1]) & (pts[:, 1] <= lidar_range[4])
        )
        pts = pts[keep]
        ax.scatter(pts[:, 0], pts[:, 1], s=0.1, c="gray", alpha=0.5)
    if gt_corners3d is not None and len(gt_corners3d):
        _draw_boxes_bev(ax, np.asarray(gt_corners3d), "tab:green", "GT")
    if pred_corners3d is not None and len(pred_corners3d):
        _draw_boxes_bev(ax, np.asarray(pred_corners3d), "tab:red", "pred")
    ax.set_xlim(lidar_range[0], lidar_range[3])
    ax.set_ylim(lidar_range[1], lidar_range[4])
    ax.set_aspect("equal")
    ax.legend(loc="upper right")
    fig.savefig(save_path, dpi=100, bbox_inches="tight")
    plt.close(fig)
    return save_path


def vis_bev_feature(feature: np.ndarray, save_path: str, mode: str = "mean"):
    """Feature-map dump (vis_bevfeat.py parity): (H, W, C) -> png."""
    f = np.asarray(feature)
    img = f.mean(-1) if mode == "mean" else f.max(-1)
    fig, ax = plt.subplots(figsize=(10, 5))
    ax.imshow(img, cmap="viridis", origin="lower")
    ax.axis("off")
    fig.savefig(save_path, dpi=100, bbox_inches="tight")
    plt.close(fig)
    return save_path
