"""Native (C++) host-side components, bound via ctypes.

The reference's data path leans on native code (spconv's CPU voxelizer,
Cython bbox_overlaps); here the equivalent host hot loops are C++ compiled
on first use (g++ is in the image; pybind11 is not — plain C ABI + ctypes).

Falls back to a numpy implementation when no compiler/so is available, so
the package stays importable everywhere.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_THIS_DIR = os.path.dirname(os.path.abspath(__file__))
_SO_PATH = os.path.join(_THIS_DIR, "libvoxelizer.so")
_SRC_PATH = os.path.join(_THIS_DIR, "voxelizer.cpp")

_lib = None
_build_err: str | None = None


def _load():
    global _lib, _build_err
    if _lib is not None or _build_err is not None:
        return _lib
    try:
        if (not os.path.exists(_SO_PATH)
                or os.path.getmtime(_SO_PATH) < os.path.getmtime(_SRC_PATH)):
            subprocess.run(
                ["g++", "-O3", "-march=native", "-shared", "-fPIC",
                 _SRC_PATH, "-o", _SO_PATH],
                check=True, capture_output=True,
            )
        lib = ctypes.CDLL(_SO_PATH)
        lib.voxelize.restype = ctypes.c_int32
        lib.decorate_pillars.restype = None
        lib.decorate_pillars_batch.restype = None
        _lib = lib
    except Exception as e:  # no compiler / load failure -> numpy fallback
        _build_err = str(e)
        _lib = None
    return _lib


def native_available() -> bool:
    return _load() is not None


class PillarVoxelizer:
    """points -> (voxels, coords, counts) fixed-capacity lists.

    Parity: sp_voxel_preprocessor.SpVoxelPreprocessor (spconv
    VoxelGeneratorV2 semantics: first-come voxel order, per-voxel point cap,
    overflow voxels dropped, coords in zyx order).
    """

    def __init__(self, pc_range, voxel_size, max_voxels: int = 32000,
                 max_points: int = 32):
        self.pc_range = np.asarray(pc_range, np.float32)
        self.voxel_size = np.asarray(voxel_size, np.float32)
        self.max_voxels = int(max_voxels)
        self.max_points = int(max_points)
        nx = int(round((pc_range[3] - pc_range[0]) / voxel_size[0]))
        ny = int(round((pc_range[4] - pc_range[1]) / voxel_size[1]))
        nz = int(round((pc_range[5] - pc_range[2]) / voxel_size[2]))
        self.grid = (nx, ny, nz)
        self._table = np.full(nx * ny * nz, -1, np.int32)

    def __call__(self, points: np.ndarray):
        """points: (N, D>=3) float32. Returns
        (voxels (M_cap, K, D), coords (M_cap, 3) zyx, counts (M_cap,),
        n_voxels int). Buffers are freshly allocated per call."""
        points = np.ascontiguousarray(points, np.float32)
        n, d = points.shape
        voxels = np.zeros((self.max_voxels, self.max_points, d), np.float32)
        coords = np.zeros((self.max_voxels, 3), np.int32)
        counts = np.zeros(self.max_voxels, np.int32)
        lib = _load()
        if lib is not None:
            nv = lib.voxelize(
                points.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                ctypes.c_int64(n), ctypes.c_int32(d),
                self.pc_range.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                self.voxel_size.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                ctypes.c_int32(self.max_voxels),
                ctypes.c_int32(self.max_points),
                self._table.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
                voxels.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                coords.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
                counts.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            )
            return voxels, coords, counts, int(nv)
        return self._numpy_fallback(points, voxels, coords, counts)

    def decorate(self, points: np.ndarray):
        """Host-side pillar decoration: (P, 4) points -> (P, 10) decorated
        features + flat pillar gids + valid mask (pillar_vfe.py:105-149).
        Replaces the device segment_sum/gather of ops/voxel.py for loaders
        that preprocess on CPU."""
        points = np.ascontiguousarray(points, np.float32)
        n = len(points)
        nx, ny, _ = self.grid
        feats = np.empty((n, 10), np.float32)
        gids = np.empty(n, np.int32)
        valid = np.empty(n, np.uint8)
        lib = _load()
        if lib is None:
            return self._decorate_numpy(points, feats, gids, valid)
        if not hasattr(self, "_sums"):
            self._sums = np.zeros((nx * ny, 4), np.float32)
            self._touched = np.empty(nx * ny, np.int32)
        lib.decorate_pillars(
            points.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            ctypes.c_int64(n),
            self.pc_range.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            self.voxel_size.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            ctypes.c_int32(nx * ny),
            self._sums.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            self._touched.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            feats.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            gids.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            valid.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        )
        return feats, gids, valid.astype(bool)

    def decorate_batch(self, points: np.ndarray):
        """Threaded host decoration over agents.

        points: (A, P, 4) (pass (B*L, P, 4)); returns
        (feats (A, P, 10), gids (A, P), valid (A, P)).
        """
        points = np.ascontiguousarray(points, np.float32)
        a, p, _ = points.shape
        nx, ny, _ = self.grid
        feats = np.empty((a, p, 10), np.float32)
        gids = np.empty((a, p), np.int32)
        valid = np.empty((a, p), np.uint8)
        lib = _load()
        if lib is None:
            for i in range(a):
                feats[i], gids[i], valid_i = self.decorate(points[i])
                valid[i] = valid_i
            return feats, gids, valid.astype(bool)
        if getattr(self, "_batch_sums", None) is None or \
                self._batch_sums.shape[0] < a:
            self._batch_sums = np.zeros((a, nx * ny, 4), np.float32)
            self._batch_touched = np.empty((a, nx * ny), np.int32)
        lib.decorate_pillars_batch(
            points.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            ctypes.c_int32(a), ctypes.c_int64(p),
            self.pc_range.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            self.voxel_size.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            ctypes.c_int32(nx * ny),
            self._batch_sums.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            self._batch_touched.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            feats.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            gids.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            valid.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        )
        return feats, gids, valid.astype(bool)

    def _decorate_numpy(self, points, feats, gids, valid):
        pr, vs = self.pc_range, self.voxel_size
        nx, ny, _ = self.grid
        xyz = points[:, :3]
        inb = np.all((xyz >= pr[:3]) & (xyz < pr[3:]), axis=1) & (
            points[:, 2] <= pr[5]
        )
        ix = np.minimum(((points[:, 0] - pr[0]) / vs[0]).astype(np.int64),
                        nx - 1)
        iy = np.minimum(((points[:, 1] - pr[1]) / vs[1]).astype(np.int64),
                        ny - 1)
        cell = np.where(inb, iy * nx + ix, nx * ny)
        sums = np.zeros((nx * ny + 1, 4), np.float64)
        np.add.at(sums, cell, np.concatenate(
            [xyz, np.ones((len(points), 1))], axis=1) * inb[:, None])
        mean = sums[:, :3] / np.maximum(sums[:, 3:4], 1.0)
        cx = (ix + 0.5) * vs[0] + pr[0]
        cy = (iy + 0.5) * vs[1] + pr[1]
        cz = np.full_like(cx, 0.5 * vs[2] + pr[2], dtype=np.float64)
        feats[:, :4] = points
        feats[:, 4:7] = xyz - mean[cell]
        feats[:, 7] = points[:, 0] - cx
        feats[:, 8] = points[:, 1] - cy
        feats[:, 9] = points[:, 2] - cz
        feats[~inb] = 0.0
        # emit sorted by gid (invalid last) — parity with the C++ path; the
        # device consumes with indices_are_sorted=True
        order = np.argsort(cell, kind="stable")
        feats[:] = feats[order]
        gids[:] = cell[order].astype(np.int32)
        valid[:] = inb[order]
        return feats, gids, valid.astype(bool)

    def _numpy_fallback(self, points, voxels, coords, counts):
        pr, vs = self.pc_range, self.voxel_size
        nx, ny, nz = self.grid
        xyz = points[:, :3]
        inb = np.all((xyz >= pr[:3]) & (xyz < pr[3:]), axis=1)
        pts = points[inb]
        idx = np.minimum(
            ((pts[:, :3] - pr[:3]) / vs).astype(np.int64),
            np.asarray([nx - 1, ny - 1, nz - 1]),
        )
        cell = (idx[:, 2] * ny + idx[:, 1]) * nx + idx[:, 0]
        # first-come voxel order
        first_seen, inverse = {}, np.empty(len(cell), np.int64)
        order = []
        for i, c in enumerate(cell):
            s = first_seen.get(c)
            if s is None:
                s = len(order)
                first_seen[c] = s
                order.append(i)
            inverse[i] = s
        nv = min(len(order), self.max_voxels)
        for i, s in zip(range(len(cell)), inverse):
            if s >= self.max_voxels:
                continue
            k = counts[s]
            if k >= self.max_points:
                continue
            voxels[s, k] = pts[i]
            counts[s] = k + 1
        for s in range(nv):
            i = order[s]
            coords[s] = (idx[i, 2], idx[i, 1], idx[i, 0])
        return voxels, coords, counts, nv


def stripe_pad_sorted(feats: np.ndarray, gids: np.ndarray,
                      valid: np.ndarray, ncell: int,
                      stripe_cells: int, chunk_rows: int):
    """Re-emit sorted decorated rows in STRIPE-PADDED layout for the
    Pallas segment-max canvas kernel (ops/pillar_pallas.py).

    Contract: rows of each canvas *stripe* (``stripe_cells`` contiguous
    cells) are padded to a multiple of ``chunk_rows`` so every chunk's rows
    map into exactly one stripe, and chunk stripe ids are non-decreasing.
    Invalid rows are dropped; pad rows have valid=0, feats=0 and repeat the
    previous real gid (joining its run — max sees a 0, a no-op for the
    >= 0 post-ReLU features).

    feats (A, P, F), gids (A, P) sorted asc with invalid == dump >= ncell,
    valid (A, P) -> (A, N_out, F), (A, N_out), (A, N_out) with
    N_out = striped_rows(P, ncell, stripe_cells, chunk_rows) static.
    """
    a, p, f = feats.shape
    n_out = striped_rows(p, ncell, stripe_cells, chunk_rows)
    out_f = np.zeros((a, n_out, f), feats.dtype)
    out_g = np.zeros((a, n_out), np.int32)
    out_v = np.zeros((a, n_out), bool)
    for i in range(a):
        g = gids[i]
        v = valid[i].astype(bool)
        n_real = int(v.sum())  # valid rows sort first (invalid gid = dump)
        if n_real == 0:
            continue
        g = g[:n_real]
        stripe = g // stripe_cells
        # stripe run boundaries in the sorted order
        starts = np.flatnonzero(np.concatenate(
            [[True], stripe[1:] != stripe[:-1]]))
        ends = np.append(starts[1:], n_real)
        pos = 0
        for s0, s1 in zip(starts, ends):
            ln = s1 - s0
            out_f[i, pos:pos + ln] = feats[i, s0:s1]
            out_g[i, pos:pos + ln] = g[s0:s1]
            out_v[i, pos:pos + ln] = True
            end = pos + ln
            pad_to = -(-end // chunk_rows) * chunk_rows
            out_g[i, end:pad_to] = g[s1 - 1]  # join last run, value 0
            pos = pad_to
        out_g[i, pos:] = g[n_real - 1]  # tail chunks: stay in last stripe
    return out_f, out_g, out_v


def striped_rows(p: int, ncell: int, stripe_cells: int,
                 chunk_rows: int) -> int:
    """Static worst-case row count of the stripe-padded layout."""
    n_stripes = -(-ncell // stripe_cells)
    n_nonempty = min(n_stripes, p)
    n = p + n_nonempty * (chunk_rows - 1)
    return -(-n // chunk_rows) * chunk_rows
