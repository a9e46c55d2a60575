"""TPU-native sparse 3D convolution (the spconv replacement).

The reference SECOND encoder depends on spconv's CUDA submanifold/strided
sparse convolutions (opencood/models/sub_modules/sparse_backbone_3d.py).
There is no sparse support in XLA, and densifying a 41 x 1024 x 2048 grid is
infeasible — so we build sparse conv from TPU-friendly primitives:

  - active voxels live in fixed-capacity flat arrays
    (feats (K, C), coords (K, 4) = [agent, z, y, x], valid (K,));
  - coordinate lookup = binary search over sorted linear keys
    (jnp.searchsorted — log K vectorized steps, no hash tables);
  - submanifold conv = neighbor-index gather (K, 27) + ONE chunked matmul
    (K, 27*Cin) @ (27*Cin, Cout) on the MXU;
  - strided conv ("spconv") dilates the active set exactly as spconv does:
    each input voxel proposes the <=2^ndim output sites whose receptive
    field covers it; sites are deduplicated by sort + first-occurrence
    compaction into a fixed-capacity output list.

All shapes static; everything jit/grad-compatible.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import numpy as np
import jax
import jax.numpy as jnp

INVALID_KEY = jnp.iinfo(jnp.int32).max


def linear_key(coords, grid_dhw: Tuple[int, int, int], valid=None):
    """coords (..., 4) [agent, z, y, x] -> int32 keys; invalid -> INVALID_KEY.

    Caller must ensure n_agents * D * H * W < 2^31.
    """
    d, h, w = grid_dhw
    a, z, y, x = coords[..., 0], coords[..., 1], coords[..., 2], coords[..., 3]
    key = ((a * d + z) * h + y) * w + x
    inb = (z >= 0) & (z < d) & (y >= 0) & (y < h) & (x >= 0) & (x < w)
    if valid is not None:
        inb = inb & valid
    return jnp.where(inb, key, INVALID_KEY)


def key_to_coords(keys, grid_dhw: Tuple[int, int, int]):
    d, h, w = grid_dhw
    x = keys % w
    y = (keys // w) % h
    z = (keys // (w * h)) % d
    a = keys // (w * h * d)
    return jnp.stack([a, z, y, x], axis=-1)


def lookup(sorted_keys, sorted_idx, query_keys):
    """Find positions of query keys in the active set.

    sorted_keys: (K,) ascending with INVALID_KEY padding; sorted_idx: (K,)
    the permutation mapping into the original arrays.
    Returns indices into the original arrays, or K (one-past-end) on miss.
    """
    k = sorted_keys.shape[0]
    pos = jnp.searchsorted(sorted_keys, query_keys)
    pos_c = jnp.clip(pos, 0, k - 1)
    hit = (sorted_keys[pos_c] == query_keys) & (query_keys != INVALID_KEY)
    return jnp.where(hit, sorted_idx[pos_c], k)


def build_index(keys):
    """Sort keys ascending (invalid last); returns (sorted_keys, sorted_idx)."""
    order = jnp.argsort(keys)
    return keys[order], order


def unique_compact(keys, capacity: int):
    """Deduplicate keys into a fixed-capacity list.

    Returns (out_keys (capacity,), count). Overflow beyond capacity is
    dropped (callers size capacity to the workload; spconv analog: max_voxels).
    """
    sorted_keys = jnp.sort(keys)
    first = jnp.concatenate(
        [jnp.array([True]), sorted_keys[1:] != sorted_keys[:-1]]
    ) & (sorted_keys != INVALID_KEY)
    pos = jnp.cumsum(first) - 1
    dump = jnp.where(first & (pos < capacity), pos, capacity)
    out = jnp.full((capacity + 1,), INVALID_KEY, dtype=keys.dtype)
    out = out.at[dump].set(sorted_keys, mode="drop")
    count = jnp.minimum(first.sum(), capacity)
    return out[:capacity], count


def _offsets(kernel: Tuple[int, int, int]) -> np.ndarray:
    kz, ky, kx = kernel
    zz, yy, xx = np.meshgrid(
        np.arange(kz) - kz // 2,
        np.arange(ky) - ky // 2,
        np.arange(kx) - kx // 2,
        indexing="ij",
    )
    return np.stack([zz, yy, xx], axis=-1).reshape(-1, 3)


def _chunked_gather_matmul(feats_padded, idx, weight, chunk: int = 8192):
    """out[k] = sum_n feats_padded[idx[k, n]] @ weight[n]  without
    materializing the full (K, N, Cin) gather.

    feats_padded: (K+1, Cin) with zero row at K; idx: (K, N);
    weight: (N, Cin, Cout).
    """
    k, n = idx.shape
    cin, cout = weight.shape[1], weight.shape[2]
    wmat = weight.reshape(n * cin, cout)
    pad = (-k) % chunk
    idx_p = jnp.pad(idx, ((0, pad), (0, 0)), constant_values=feats_padded.shape[0] - 1)

    def one(chunk_idx):
        g = feats_padded[chunk_idx]  # (chunk, N, Cin)
        return g.reshape(chunk_idx.shape[0], n * cin) @ wmat

    out = jax.lax.map(one, idx_p.reshape(-1, chunk, n))
    return out.reshape(-1, cout)[:k]


def subm_conv3d(feats, coords, valid, weight, grid_dhw,
                sorted_keys=None, sorted_idx=None, chunk: int = 8192):
    """Submanifold sparse conv: outputs at exactly the input active sites.

    feats (K, Cin); coords (K, 4); valid (K,); weight (kz, ky, kx, Cin, Cout).
    Passing a prebuilt (sorted_keys, sorted_idx) amortizes the sort across
    the convs sharing an indice_key (spconv's 'subm1'/'subm2'... reuse).
    """
    k = feats.shape[0]
    kernel = weight.shape[:3]
    if sorted_keys is None:
        keys = linear_key(coords, grid_dhw, valid)
        sorted_keys, sorted_idx = build_index(keys)
    offs = jnp.asarray(_offsets(kernel), dtype=coords.dtype)  # (N, 3)
    n_off = offs.shape[0]
    ncoords = jnp.concatenate(
        [
            jnp.broadcast_to(coords[:, None, :1], (k, n_off, 1)),
            coords[:, None, 1:] + offs[None],
        ],
        axis=-1,
    )
    nkeys = linear_key(
        ncoords, grid_dhw, jnp.broadcast_to(valid[:, None], (k, n_off))
    )
    idx = lookup(sorted_keys, sorted_idx, nkeys.reshape(-1)).reshape(k, -1)
    feats_p = jnp.concatenate([feats, jnp.zeros((1, feats.shape[1]), feats.dtype)])
    n = int(np.prod(kernel))
    out = _chunked_gather_matmul(
        feats_p, idx, weight.reshape(n, *weight.shape[3:]), chunk
    )
    return out * valid[:, None]


def spconv3d_downsample(feats, coords, valid, weight, grid_dhw,
                        stride: Tuple[int, int, int],
                        padding: Tuple[int, int, int],
                        out_capacity: int, chunk: int = 8192):
    """Strided ("regular") sparse conv with spconv-exact output-site dilation.

    Returns (out_feats (K_out, Cout), out_coords (K_out, 4),
    out_valid (K_out,), out_grid_dhw).
    """
    kernel = weight.shape[:3]
    out_grid = tuple(
        (grid_dhw[i] + 2 * padding[i] - kernel[i]) // stride[i] + 1
        for i in range(3)
    )

    # candidate output sites per input voxel: per dim, the integer o with
    # s*o - p <= c <= s*o - p + k - 1  =>  ceil((c+p-k+1)/s) <= o <= (c+p)/s
    cand_per_dim = []
    for i, axis in enumerate((1, 2, 3)):
        c = coords[:, axis]
        lo = -(-(c + padding[i] - kernel[i] + 1) // stride[i])
        hi = (c + padding[i]) // stride[i]
        # k=3, s<=2 => at most 2 candidates per dim
        c0 = lo
        c1 = jnp.minimum(lo + 1, hi)
        cand_per_dim.append((c0, c1, hi >= lo))
    a = coords[:, 0]
    cand_list = []
    for dz in range(2):
        for dy in range(2):
            for dx in range(2):
                z = cand_per_dim[0][dz]
                y = cand_per_dim[1][dy]
                x = cand_per_dim[2][dx]
                cand_list.append(jnp.stack([a, z, y, x], axis=-1))
    cands = jnp.stack(cand_list, axis=1)  # (K, 8, 4)
    ckeys = linear_key(cands, out_grid, valid[:, None].repeat(8, 1))
    out_keys, out_count = unique_compact(ckeys.reshape(-1), out_capacity)
    out_valid = out_keys != INVALID_KEY
    out_coords = key_to_coords(
        jnp.where(out_valid, out_keys, 0), out_grid
    ).astype(coords.dtype)

    # gather inputs: input coord = s*o - p + offset
    in_keys = linear_key(coords, grid_dhw, valid)
    sorted_keys, sorted_idx = build_index(in_keys)
    offs = jnp.asarray(_offsets(kernel), dtype=coords.dtype)
    # offsets here are raw kernel positions (0..k-1), not centered
    offs_raw = offs + jnp.asarray(
        [kernel[0] // 2, kernel[1] // 2, kernel[2] // 2], dtype=coords.dtype
    )
    s = jnp.asarray(stride, dtype=coords.dtype)
    p = jnp.asarray(padding, dtype=coords.dtype)
    base = out_coords[:, None, 1:] * s[None, None] - p[None, None]
    ncoords = jnp.concatenate(
        [
            jnp.broadcast_to(
                out_coords[:, None, :1], (out_coords.shape[0], offs.shape[0], 1)
            ),
            base + offs_raw[None],
        ],
        axis=-1,
    )
    nkeys = linear_key(ncoords, grid_dhw, out_valid[:, None].repeat(offs.shape[0], 1))
    idx = lookup(sorted_keys, sorted_idx, nkeys.reshape(-1)).reshape(
        out_coords.shape[0], -1
    )
    feats_p = jnp.concatenate([feats, jnp.zeros((1, feats.shape[1]), feats.dtype)])
    n = int(np.prod(kernel))
    out = _chunked_gather_matmul(
        feats_p, idx, weight.reshape(n, *weight.shape[3:]), chunk
    )
    return out * out_valid[:, None], out_coords, out_valid, out_grid


def voxelize_mean(points, point_mask, pc_range, voxel_size,
                  grid_dhw: Tuple[int, int, int], capacity: int):
    """Points -> fixed-capacity voxel list with mean features (MeanVFE).

    points: (A, P, 4); point_mask: (A, P). Returns
    (feats (capacity, 4), coords (capacity, 4), valid (capacity,)).
    Replaces the reference's CPU spconv voxel generator + MeanVFE
    (sp_voxel_preprocessor.py + mean_vfe) with one sort-free device pass:
    unique-compact voxel keys, then segment-mean of point features.
    """
    a, p, dfeat = points.shape
    d, h, w = grid_dhw
    x, y, z = points[..., 0], points[..., 1], points[..., 2]
    ix = jnp.floor((x - pc_range[0]) / voxel_size[0]).astype(jnp.int32)
    iy = jnp.floor((y - pc_range[1]) / voxel_size[1]).astype(jnp.int32)
    iz = jnp.floor((z - pc_range[2]) / voxel_size[2]).astype(jnp.int32)
    agent = jnp.broadcast_to(
        jnp.arange(a, dtype=jnp.int32)[:, None], (a, p)
    )
    coords_pt = jnp.stack([agent, iz, iy, ix], axis=-1)
    keys_pt = linear_key(coords_pt, grid_dhw, point_mask).reshape(-1)

    vox_keys, _ = unique_compact(keys_pt, capacity)  # sorted ascending
    vox_valid = vox_keys != INVALID_KEY
    vox_coords = key_to_coords(jnp.where(vox_valid, vox_keys, 0), grid_dhw)

    idx = lookup(vox_keys, jnp.arange(capacity), keys_pt)  # (A*P,)
    flat_pts = points.reshape(a * p, dfeat)
    vmask = (keys_pt != INVALID_KEY).astype(points.dtype)[:, None]
    sums = jax.ops.segment_sum(flat_pts * vmask, idx, num_segments=capacity + 1)
    cnts = jax.ops.segment_sum(vmask, idx, num_segments=capacity + 1)
    feats = (sums / jnp.maximum(cnts, 1.0))[:capacity]
    return feats * vox_valid[:, None], vox_coords.astype(jnp.int32), vox_valid


def scatter_to_dense(feats, coords, valid, grid_dhw, n_agents: int):
    """Sparse voxels -> dense (A, D, H, W, C) canvas (HeightCompression
    prep; reference sub_modules/height_compression)."""
    d, h, w = grid_dhw
    keys = linear_key(coords, grid_dhw, valid)
    total = n_agents * d * h * w
    flat_idx = jnp.where(keys != INVALID_KEY, keys, total)
    canvas = jnp.zeros((total + 1, feats.shape[1]), feats.dtype)
    canvas = canvas.at[flat_idx].set(feats, mode="drop")
    return canvas[:total].reshape(n_agents, d, h, w, feats.shape[1])
