"""Minimal PCD file IO (no pypcd dependency) + point-cloud masks.

Parity: opencood/utils/pcd_utils.py (pcd_to_np, mask_points_by_range,
mask_ego_points, shuffle_points). Supports ascii and binary PCD with
x/y/z/intensity fields.
"""

from __future__ import annotations

import numpy as np

_DTYPES = {("F", 4): "f4", ("F", 8): "f8", ("I", 4): "i4",
           ("I", 1): "i1", ("U", 4): "u4", ("U", 1): "u1"}


def read_pcd(path: str) -> np.ndarray:
    """Read a PCD file -> (N, 4) [x, y, z, intensity] float32.

    Missing intensity is filled with 1.0.
    """
    with open(path, "rb") as f:
        header = {}
        while True:
            line = f.readline().decode("ascii", errors="replace").strip()
            if line.startswith("#") or not line:
                continue
            key, _, val = line.partition(" ")
            header[key] = val
            if key == "DATA":
                break
        fields = header["FIELDS"].split()
        sizes = [int(s) for s in header["SIZE"].split()]
        types = header["TYPE"].split()
        counts = [int(c) for c in header.get("COUNT", " ".join(["1"] * len(fields))).split()]
        n = int(header["POINTS"])
        data_kind = header["DATA"]

        if data_kind == "ascii":
            raw = np.loadtxt(f, dtype=np.float64, max_rows=n)
            raw = np.atleast_2d(raw)
            cols = {}
            ci = 0
            for fld, cnt in zip(fields, counts):
                cols[fld] = raw[:, ci]
                ci += cnt
        elif data_kind == "binary":
            dtype = np.dtype(
                [
                    (fld, _DTYPES[(t, s)], (cnt,) if cnt > 1 else ())
                    for fld, t, s, cnt in zip(fields, types, sizes, counts)
                ]
            )
            raw = np.frombuffer(f.read(dtype.itemsize * n), dtype=dtype, count=n)
            cols = {fld: np.asarray(raw[fld], np.float64).reshape(n, -1)[:, 0]
                    for fld in fields}
        else:
            raise ValueError(f"unsupported PCD DATA kind: {data_kind}")

    xyz = np.stack([cols["x"], cols["y"], cols["z"]], axis=1)
    inten = cols.get("intensity", np.ones(len(xyz)))
    pts = np.concatenate([xyz, np.asarray(inten).reshape(-1, 1)], axis=1)
    return pts[np.isfinite(pts).all(axis=1)].astype(np.float32)


def load_lidar_bin(path: str, zero_intensity: bool = False) -> np.ndarray:
    """KITTI-style .bin -> (N, 4) float32, NaN rows dropped (V2X-Real
    lidar format; reference pcd_utils.load_lidar_bin:218-227)."""
    pts = np.fromfile(path, dtype=np.float32).reshape(-1, 4)
    pts = pts[~np.isnan(pts[:, :3]).any(axis=1)]
    if zero_intensity:
        pts[:, -1] = 0
    return pts


def write_pcd(path: str, points: np.ndarray) -> None:
    """Write (N, 4) points as an ascii PCD (test fixtures / export)."""
    n = len(points)
    header = (
        "VERSION 0.7\nFIELDS x y z intensity\nSIZE 4 4 4 4\n"
        "TYPE F F F F\nCOUNT 1 1 1 1\n"
        f"WIDTH {n}\nHEIGHT 1\nVIEWPOINT 0 0 0 1 0 0 0\n"
        f"POINTS {n}\nDATA ascii\n"
    )
    with open(path, "w") as f:
        f.write(header)
        np.savetxt(f, points, fmt="%.6f")


def mask_points_by_range(points: np.ndarray, limit_range) -> np.ndarray:
    m = (
        (points[:, 0] > limit_range[0]) & (points[:, 0] < limit_range[3])
        & (points[:, 1] > limit_range[1]) & (points[:, 1] < limit_range[4])
        & (points[:, 2] > limit_range[2]) & (points[:, 2] < limit_range[5])
    )
    return points[m]


def mask_ego_points(points: np.ndarray) -> np.ndarray:
    """Remove returns from the ego vehicle body (pcd_utils parity:
    x in [-1.95, 2.95], y in [-1.1, 1.1])."""
    m = (
        (points[:, 0] >= -1.95) & (points[:, 0] <= 2.95)
        & (points[:, 1] >= -1.1) & (points[:, 1] <= 1.1)
    )
    return points[~m]


def shuffle_points(points: np.ndarray,
                   rng: np.random.RandomState | None = None) -> np.ndarray:
    rng = rng or np.random
    idx = rng.permutation(len(points))
    return points[idx]
