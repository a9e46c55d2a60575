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


def filter_visible_objects(boxes7: "np.ndarray", mask: "np.ndarray",
                           visibility_map: "np.ndarray",
                           pixels_per_meter: float = 1.0 / 0.39,
                           min_visible_pixels: int = 2):
    """Keep only GT boxes whose BEV footprint overlaps the camera
    visibility raster.

    Parity: base_postprocessor.generate_visible_object_center:614-690 +
    box_utils.project_world_visible_objects — the reference reads the
    dataset's ``bev_visibility.png`` (256x256, 0.39 m/px, ego-centered,
    heading up) and drops objects whose raster cells are all invisible.

    boxes7: (N, 7) ego-frame hwl boxes; mask: (N,); visibility_map: (H, W)
    grayscale (nonzero = visible). Returns an updated copy of ``mask``.
    """
    import numpy as np

    h, w = visibility_map.shape[:2]
    cx, cy = w / 2.0, h / 2.0
    out = mask.copy()
    for i in range(len(boxes7)):
        if not out[i]:
            continue
        x, y = boxes7[i, 0], boxes7[i, 1]
        # object center + a 3x3 neighborhood in raster coords
        px = int(round(cx + x * pixels_per_meter))
        py = int(round(cy - y * pixels_per_meter))
        if not (0 <= px < w and 0 <= py < h):
            out[i] = 0
            continue
        x0, x1 = max(px - 1, 0), min(px + 2, w)
        y0, y1 = max(py - 1, 0), min(py + 2, h)
        visible = (visibility_map[y0:y1, x0:x1] > 0).sum()
        if visible < min_visible_pixels:
            out[i] = 0
    return out
