"""Feature-gap analysis between agent modalities: t-SNE plots + MMD.

Parity: opencood/visualization/tsne/* (per-modality BEV feature embeddings
colored by domain, used in the paper's feature-gap figures) and the MMD
domain-distance it reports, plus vis_bevfeat.py (feature-map channel dumps).
"""

from __future__ import annotations

import os
from typing import Dict, Sequence

import numpy as np


def mmd_rbf(x: np.ndarray, y: np.ndarray, gamma: float | None = None) -> float:
    """Unbiased-ish RBF maximum-mean-discrepancy between two feature sets
    (N, D) x (M, D). gamma defaults to 1/(median pairwise distance^2)."""
    x = np.asarray(x, np.float64)
    y = np.asarray(y, np.float64)

    def sq_dists(a, b):
        return (
            (a**2).sum(1)[:, None] + (b**2).sum(1)[None] - 2 * a @ b.T
        ).clip(0)

    dxx, dyy, dxy = sq_dists(x, x), sq_dists(y, y), sq_dists(x, y)
    if gamma is None:
        med = np.median(np.concatenate(
            [dxx.ravel(), dyy.ravel(), dxy.ravel()]))
        gamma = 1.0 / max(med, 1e-9)
    kxx = np.exp(-gamma * dxx).mean()
    kyy = np.exp(-gamma * dyy).mean()
    kxy = np.exp(-gamma * dxy).mean()
    return float(kxx + kyy - 2 * kxy)


def tsne_embed(features: Dict[str, np.ndarray], max_per_domain: int = 500,
               seed: int = 0) -> Dict[str, np.ndarray]:
    """2D t-SNE embedding of per-domain feature vectors.

    features: {domain_name: (N_i, D)} -> {domain_name: (n_i, 2)}.
    """
    from sklearn.manifold import TSNE

    rng = np.random.default_rng(seed)
    names, chunks = [], []
    for name, f in features.items():
        f = np.asarray(f).reshape(-1, np.asarray(f).shape[-1])
        if len(f) > max_per_domain:
            f = f[rng.choice(len(f), max_per_domain, replace=False)]
        names.append((name, len(f)))
        chunks.append(f)
    allf = np.concatenate(chunks, axis=0)
    emb = TSNE(n_components=2, random_state=seed,
               perplexity=min(30, max(2, len(allf) // 4))).fit_transform(allf)
    out, i = {}, 0
    for name, n in names:
        out[name] = emb[i:i + n]
        i += n
    return out


def plot_tsne(features: Dict[str, np.ndarray], save_path: str,
              title: str = "modality feature gap") -> str:
    """Scatter the t-SNE embedding per domain and annotate pairwise MMD."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    emb = tsne_embed(features)
    fig, ax = plt.subplots(figsize=(6, 5))
    for name, pts in emb.items():
        ax.scatter(pts[:, 0], pts[:, 1], s=4, alpha=0.6, label=name)
    keys = list(features)
    if len(keys) >= 2:
        m = mmd_rbf(np.asarray(features[keys[0]]).reshape(
            -1, np.asarray(features[keys[0]]).shape[-1]),
            np.asarray(features[keys[1]]).reshape(
            -1, np.asarray(features[keys[1]]).shape[-1]))
        title = f"{title} (MMD {keys[0]}|{keys[1]} = {m:.4f})"
    ax.set_title(title)
    ax.legend(markerscale=3)
    os.makedirs(os.path.dirname(save_path) or ".", exist_ok=True)
    fig.savefig(save_path, dpi=120, bbox_inches="tight")
    plt.close(fig)
    return save_path


def save_bev_feature(feature: np.ndarray, save_path: str,
                     channels: Sequence[int] | None = None,
                     reduce: str = "mean") -> str:
    """Dump a BEV feature map (H, W, C) as a PNG heat image
    (vis_bevfeat.py parity, without the author-local paths)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    f = np.asarray(feature)
    if f.ndim == 4:
        f = f[0]
    if channels is not None:
        img = f[..., list(channels)].mean(-1)
    elif reduce == "max":
        img = f.max(-1)
    else:
        img = f.mean(-1)
    fig, ax = plt.subplots(figsize=(8, 4))
    ax.imshow(img, cmap="magma", origin="lower")
    ax.axis("off")
    os.makedirs(os.path.dirname(save_path) or ".", exist_ok=True)
    fig.savefig(save_path, dpi=120, bbox_inches="tight")
    plt.close(fig)
    return save_path
