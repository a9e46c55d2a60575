"""Miscellaneous parity utilities.

Covers the reference's small helper modules:
  opencood/utils/pe.py                 -> position_embedding_sine (jnp)
  opencood/utils/seg_iou.py            -> mean_IU segmentation metric
  opencood/utils/subsampling_utils.py  -> voxel-grid / FPS / fraction /
                                          closest-point subsampling, plane
                                          fit + road removal
  opencood/utils/max_consensus.py      -> grid-search SE2 consensus
                                          alignment of two keypoint sets
  opencood/utils/draco_compression.py  -> CPM (cooperative perception
                                          message) size accounting; the
                                          external draco binary is replaced
                                          by zlib (always available) with
                                          the same bytes-per-message report
"""

from __future__ import annotations

import zlib
from typing import Dict, Tuple

import numpy as np
import jax.numpy as jnp


# ------------------------------------------------------------------ pe ----

def position_embedding_sine(h: int, w: int, d_model: int,
                            temperature: float = 10000.0) -> jnp.ndarray:
    """(h, w, 2*d_model) sine/cosine image position embedding
    (pe.py PositionEmbeddingSine.forward:16-38; cumsum convention kept)."""
    y = jnp.cumsum(jnp.ones((h, w)), axis=0)
    x = jnp.cumsum(jnp.ones((h, w)), axis=1)
    dim_t = jnp.arange(0, d_model, 2, dtype=jnp.float32)
    dim_t = temperature ** (2 * (dim_t // 2) / d_model)
    px = x[..., None] / dim_t
    py = y[..., None] / dim_t
    px = jnp.stack([jnp.sin(px), jnp.cos(px)], axis=-1).reshape(h, w, -1)
    py = jnp.stack([jnp.sin(py), jnp.cos(py)], axis=-1).reshape(h, w, -1)
    return jnp.concatenate([py, px], axis=-1)


# ------------------------------------------------------------- seg iou ----

def mean_iu(eval_segm: np.ndarray, gt_segm: np.ndarray) -> float:
    """Mean intersection-over-union across classes present in the GT
    (seg_iou.py mean_IU)."""
    if eval_segm.shape != gt_segm.shape:
        raise ValueError("segmentation shapes differ")
    classes = np.union1d(np.unique(eval_segm), np.unique(gt_segm))
    ious = []
    for c in classes:
        gt_c = gt_segm == c
        if gt_c.sum() == 0:
            continue
        pred_c = eval_segm == c
        inter = np.logical_and(gt_c, pred_c).sum()
        union = np.logical_or(gt_c, pred_c).sum()
        ious.append(inter / union if union else 0.0)
    return float(np.mean(ious)) if ious else 0.0


# -------------------------------------------------------- subsampling ----

def voxel_grid_filter(pc: np.ndarray, num_requested: int,
                      iters: int = 8) -> np.ndarray:
    """Subsample to ~num_requested points by keeping one point per voxel,
    bisecting the voxel size (subsampling_utils.voxelGrid_filter:61-118)."""
    if len(pc) <= num_requested:
        return pc
    lo, hi = 1e-3, float(np.ptp(pc[:, :3], axis=0).max())
    best = pc
    for _ in range(iters):
        size = (lo + hi) / 2
        keys = np.floor(pc[:, :3] / size).astype(np.int64)
        _, idx = np.unique(keys, axis=0, return_index=True)
        if len(idx) > num_requested:
            lo = size
        else:
            hi = size
            best = pc[np.sort(idx)]
    return best


def fps_numpy(pts: np.ndarray, k: int, seed: int = 0) -> np.ndarray:
    """Farthest-point subsampling (subsampling_utils.fps_from_given_pc)."""
    n = len(pts)
    if n <= k:
        return pts
    rng = np.random.default_rng(seed)
    idx = np.zeros(k, np.int64)
    idx[0] = rng.integers(n)
    d = np.sum((pts[:, :3] - pts[idx[0], :3]) ** 2, axis=1)
    for i in range(1, k):
        idx[i] = int(np.argmax(d))
        d = np.minimum(d, np.sum((pts[:, :3] - pts[idx[i], :3]) ** 2, axis=1))
    return pts[idx]


def subsample_fraction(pc: np.ndarray, fraction: float,
                       seed: int = 0) -> np.ndarray:
    """Random fraction keep (subsampling_utils.subsample_fraction:203)."""
    n = max(1, int(len(pc) * fraction))
    rng = np.random.default_rng(seed)
    return pc[rng.choice(len(pc), n, replace=False)]


def keep_closest(pc: np.ndarray, max_dist: float) -> np.ndarray:
    """Range crop (subsampling_utils.keep_closest:210)."""
    return pc[np.linalg.norm(pc[:, :3], axis=1) < max_dist]


def fit_plane(pc: np.ndarray) -> np.ndarray:
    """LSQ plane z = a x + b y + c (subsampling_utils.fit_plane:215)."""
    a = np.c_[pc[:, 0], pc[:, 1], np.ones(len(pc))]
    coef, *_ = np.linalg.lstsq(a, pc[:, 2], rcond=None)
    return coef


def remove_road(pc: np.ndarray, thickness: float = 0.3,
                refits: int = 2) -> np.ndarray:
    """Drop points near the fitted ground plane
    (subsampling_utils.remove_road:230, plus inlier refits so elevated
    structures don't skew the fit)."""
    inliers = pc
    abc = fit_plane(inliers)
    for _ in range(refits):
        pred_z = abc[0] * inliers[:, 0] + abc[1] * inliers[:, 1] + abc[2]
        near = np.abs(inliers[:, 2] - pred_z) <= thickness
        if near.sum() < 3:
            break
        inliers = inliers[near]
        abc = fit_plane(inliers)
    pred_z = abc[0] * pc[:, 0] + abc[1] * pc[:, 1] + abc[2]
    return pc[np.abs(pc[:, 2] - pred_z) > thickness]


# ------------------------------------------------------ max consensus ----

def max_consensus_align(points_l: np.ndarray, points_r: np.ndarray,
                        search_range=(1.0, 1.0, np.deg2rad(6.0)),
                        resolution=(0.25, 0.25, np.deg2rad(1.0)),
                        radius: float = 0.5) -> Tuple[np.ndarray, int]:
    """Brute-force SE2 grid search maximizing nearest-neighbor consensus
    between two 2D keypoint sets (max_consensus.py:27-76, sans sklearn).

    Returns (T (3, 3) homogeneous 2D transform l<-r, consensus count).
    """
    xs = np.arange(-search_range[0], search_range[0] + 1e-9, resolution[0])
    ys = np.arange(-search_range[1], search_range[1] + 1e-9, resolution[1])
    rs = np.arange(-search_range[2], search_range[2] + 1e-9, resolution[2])
    pl = points_l[:, :2]
    pr = points_r[:, :2]
    best_T, best_c = np.eye(3), -1
    for r in rs:
        c_, s_ = np.cos(r), np.sin(r)
        rot = np.array([[c_, -s_], [s_, c_]])
        pr_rot = pr @ rot.T
        for tx in xs:
            for ty in ys:
                moved = pr_rot + np.array([tx, ty])
                d2 = ((moved[:, None] - pl[None]) ** 2).sum(-1)
                cons = int((d2.min(axis=1) < radius * radius).sum())
                if cons > best_c:
                    best_c = cons
                    best_T = np.eye(3)
                    best_T[:2, :2] = rot
                    best_T[:2, 2] = (tx, ty)
    return best_T, best_c


# ----------------------------------------------------------- CPM size ----

def cpm_size_bytes(payload: np.ndarray,
                   quantize: str | None = "float16") -> Dict[str, int]:
    """Cooperative-perception-message size accounting.

    The reference measures keypoint CPMs by writing .ply files and invoking
    the external draco binary (draco_compression.py:16-52). draco is not
    available here; we report raw and zlib-deflate sizes of the (optionally
    fp16-quantized) payload — the same role: an octet count per message.
    """
    arr = np.asarray(payload)
    if quantize == "float16":
        arr = arr.astype(np.float16)
    raw = arr.tobytes()
    return {"raw_bytes": len(raw),
            "compressed_bytes": len(zlib.compress(raw, 6))}


def code_stream_bytes(codes: np.ndarray, dict_size: int) -> Dict[str, int]:
    """Entropy accounting for a CodeFilling code-index stream.

    The reference measures CPM size with the external draco entropy coder
    (draco_compression.py:34-51); for integer code streams we can do the
    accounting exactly: fixed-width packed bits, the empirical Shannon
    lower bound, and a real zlib pass over the packed stream.
    """
    codes = np.asarray(codes).reshape(-1).astype(np.int64)
    n = codes.size
    bits_per_code = max(int(np.ceil(np.log2(max(dict_size, 2)))), 1)
    packed_bits = np.zeros(n * bits_per_code, np.uint8)
    for b in range(bits_per_code):
        packed_bits[b::bits_per_code] = (codes >> b) & 1
    packed = np.packbits(packed_bits).tobytes()
    hist = np.bincount(codes, minlength=dict_size).astype(np.float64)
    p = hist[hist > 0] / max(n, 1)
    entropy_bits = float(-(p * np.log2(p)).sum()) * n
    return {
        "raw_bytes": (n * bits_per_code + 7) // 8,
        "entropy_bytes": int(np.ceil(entropy_bits / 8)),
        "compressed_bytes": len(zlib.compress(packed, 6)),
    }
