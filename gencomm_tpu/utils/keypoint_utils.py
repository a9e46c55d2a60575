"""Offline CPM keypoint generation from raw point clouds.

Parity: opencood/utils/keypoint_utils.py — project the cloud to a BEV
occupancy image, detect structural edges/lines (Canny + HoughLinesP),
keep the points that fall in structural cells, then FPS-sample the CPM
keypoint budget. Used to precompute keypoint cooperative-perception
messages (FPV-RCNN-style pipelines); see also misc_utils.cpm_size_bytes
for the transmitted-size accounting.
"""

from __future__ import annotations

import numpy as np

from gencomm_tpu.utils.misc_utils import fps_numpy


def mask_points_by_range(points: np.ndarray, limit_range) -> np.ndarray:
    r = limit_range
    m = (
        (points[:, 0] >= r[0]) & (points[:, 0] <= r[3])
        & (points[:, 1] >= r[1]) & (points[:, 1] <= r[4])
    )
    if len(r) >= 6:
        m &= (points[:, 2] >= r[2]) & (points[:, 2] <= r[5])
    return points[m]


def project_bev(points: np.ndarray, lidar_range, voxel_size: float = 0.2):
    """Rasterize the cloud to a uint8 BEV occupancy image
    (keypoint_utils.project_bev:35-74). Returns (img, rows, cols) where
    rows/cols are each point's raster cell."""
    w = int(round((lidar_range[3] - lidar_range[0]) / voxel_size))
    h = int(round((lidar_range[4] - lidar_range[1]) / voxel_size))
    cols = np.clip(((points[:, 0] - lidar_range[0]) / voxel_size).astype(
        np.int64), 0, w - 1)
    rows = np.clip(((points[:, 1] - lidar_range[1]) / voxel_size).astype(
        np.int64), 0, h - 1)
    img = np.zeros((h, w), np.uint8)
    img[rows, cols] = 255
    return img, rows, cols


def line_detection(bev_img: np.ndarray) -> np.ndarray:
    """Canny + probabilistic Hough structural mask
    (keypoint_utils.line_detection:76-108)."""
    import cv2

    edges = cv2.Canny(bev_img, 100, 200)
    line_image = np.zeros_like(bev_img)
    lines = cv2.HoughLinesP(edges, 1, np.pi / 180, 25, np.array([]), 20, 20)
    if lines is None:
        return edges  # fall back to raw edges when no lines found
    for x1, y1, x2, y2 in np.asarray(lines).reshape(-1, 4):
        cv2.line(line_image, (int(x1), int(y1)), (int(x2), int(y2)), 255, 1)
    return line_image


def bev_sample(points: np.ndarray, lidar_range, n_samples: int,
               voxel_size: float = 0.2, mode: str = "farthest",
               all_samples: bool = False) -> np.ndarray:
    """Structure-aware keypoint sampling (keypoint_utils.bev_sample:156-187):
    prefer points in line/edge cells of the BEV raster; FPS the budget."""
    pts = mask_points_by_range(points, lidar_range)
    if len(pts) == 0:
        return pts
    img, rows, cols = project_bev(pts, lidar_range, voxel_size)
    structural = line_detection(img)
    # Canny/Hough responses sit a pixel off the occupied cells; dilate so
    # the mask actually covers the structural points
    import cv2

    structural = cv2.dilate(structural, np.ones((3, 3), np.uint8))
    on_structure = structural[rows, cols] > 0
    select = pts[on_structure] if on_structure.any() else pts
    if all_samples:
        return select
    if mode == "random":
        rng = np.random.default_rng(0)
        k = min(n_samples, len(select))
        return select[rng.choice(len(select), k, replace=False)]
    return fps_numpy(select, n_samples)
