"""Camera / LSS geometry helpers.

Parity: opencood/utils/camera_utils.py — gen_dx_bx:129, depth_discretization
(UD/LID):188, bin_depths:137 (for depth supervision targets).
"""

from __future__ import annotations

import numpy as np


def gen_dx_bx(xbound, ybound, zbound):
    """Returns (dx, bx, nx): cell sizes, first-cell centers, cell counts."""
    dx = np.array([row[2] for row in (xbound, ybound, zbound)], np.float32)
    bx = np.array(
        [row[0] + row[2] / 2.0 for row in (xbound, ybound, zbound)], np.float32
    )
    nx = np.array(
        [int((row[1] - row[0]) / row[2]) for row in (xbound, ybound, zbound)],
        np.int32,
    )
    return dx, bx, nx


def depth_discretization(depth_min, depth_max, num_bins, mode: str):
    """Depth bin centers: uniform (UD) or linearly-increasing (LID)."""
    if mode == "UD":
        bin_size = (depth_max - depth_min) / num_bins
        return depth_min + bin_size * np.arange(num_bins)
    if mode == "LID":
        bin_size = 2 * (depth_max - depth_min) / (num_bins * (1 + num_bins))
        return depth_min + bin_size * (
            np.arange(num_bins) * np.arange(1, 1 + num_bins)
        ) / 2
    raise NotImplementedError(mode)


def bin_depths_np(depth_map, mode, depth_min, depth_max, num_bins):
    """Depth map -> (bin indices, in-range mask) for depth supervision."""
    if mode == "UD":
        bin_size = (depth_max - depth_min) / num_bins
        idx = (depth_map - depth_min) / bin_size
    elif mode == "LID":
        bin_size = 2 * (depth_max - depth_min) / (num_bins * (1 + num_bins))
        idx = -0.5 + 0.5 * np.sqrt(1 + 8 * (depth_map - depth_min) / bin_size)
    else:
        raise NotImplementedError(mode)
    mask = (idx >= 0) & (idx < num_bins) & np.isfinite(idx)
    idx = np.clip(np.nan_to_num(idx, nan=num_bins - 1), 0, num_bins - 1)
    return idx.astype(np.int64), mask


def box_is_visible(x: float, y: float, visibility_map: "np.ndarray",
                   meters_per_pixel: float = 0.39) -> bool:
    """One ego-frame box center against the BEV visibility raster.

    Raster convention (box_utils.box_is_visible:1512-1542): 256x256,
    0.39 m/px, ego at (127, 127), +x (forward) maps to -row, +y to +col.
    Out-of-raster centers count as invisible.
    """
    h, w = visibility_map.shape[:2]
    py = h // 2 - 1 - int(x / meters_per_pixel)
    px = w // 2 - 1 + int(y / meters_per_pixel)
    if py < 0 or py >= h or px < 0 or px >= w:
        return False
    return bool(visibility_map[py, px] > 0)


def filter_visible_objects(boxes7: "np.ndarray", mask: "np.ndarray",
                           visibility_map: "np.ndarray",
                           meters_per_pixel: float = 0.39):
    """Keep only GT boxes whose center raster cell is camera-visible.

    Parity: base_postprocessor.generate_visible_object_center:614-690 +
    box_utils.project_world_visible_objects — the reference reads the
    dataset's ``bev_visibility.png`` (grayscale; nonzero = visible) and
    drops objects whose center pixel is invisible.

    boxes7: (N, 7) ego-frame boxes; mask: (N,). Returns an updated copy of
    ``mask``.
    """
    out = mask.copy()
    for i in range(len(boxes7)):
        if not out[i]:
            continue
        if not box_is_visible(boxes7[i, 0], boxes7[i, 1], visibility_map,
                              meters_per_pixel):
            out[i] = 0
    return out
