"""VoxelNet loss and the contrastive feature-alignment loss.

Parity targets:
  opencood/loss/voxel_net_loss.py:12-62 — VoxelNet's original BCE-style
    pos/neg confidence terms (alpha/beta weighted) + smooth-L1 regression
    normalized by positive count.
  opencood/loss/contrastive_learning_loss.py:9-100 — InfoNCE between
    ego-generated (q) and cav (k) features pooled inside GT box regions:
    region-averaged embeddings, cosine similarity / tau, CE to the matching
    region index.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from gencomm_tpu.loss.point_pillar_loss import weighted_smooth_l1
from gencomm_tpu.registry import LOSSES


@LOSSES.register("voxel_net_loss")
class VoxelNetLoss:
    def __init__(self, args: dict):
        self.alpha = args.get("alpha", 1.5)
        self.beta = args.get("beta", 1.0)
        self.reg_coe = args.get("reg", 2.0)

    def __call__(self, output: dict, target: dict, suffix: str = "") -> dict:
        cls_preds = output.get(f"psm{suffix}", output.get(f"cls_preds{suffix}"))
        reg_preds = output.get(f"rm{suffix}", output.get(f"reg_preds{suffix}"))
        pos = target["pos_equal_one"]
        neg = target["neg_equal_one"]
        targets = target["targets"]

        p = jax.nn.sigmoid(cls_preds.reshape(pos.shape))
        cls_pos = -(pos * jnp.log(p + 1e-6)).sum() / (pos.sum() + 1e-6)
        cls_neg = -(neg * jnp.log(1 - p + 1e-6)).sum() / (neg.sum() + 1e-6)
        conf_loss = self.alpha * cls_pos + self.beta * cls_neg

        rm = reg_preds.reshape(pos.shape + (7,))
        tg = targets.reshape(pos.shape + (7,))
        reg = weighted_smooth_l1(rm, tg, pos[..., None], sigma=1.0)
        reg_loss = reg.sum() / (pos.sum() + 1e-6) * self.reg_coe

        total = conf_loss + reg_loss
        return {"cls_loss": conf_loss, "reg_loss": reg_loss,
                "total_loss": total}


def region_pooled_embeddings(features, region_masks):
    """Average-pool features (B, H, W, C) inside each region mask
    (B, R, H, W) -> (B, R, C) + validity (B, R)."""
    w = region_masks[..., None]  # (B, R, H, W, 1)
    s = (features[:, None] * w).sum(axis=(2, 3))
    n = jnp.clip(w.sum(axis=(2, 3)), 1e-6, None)
    valid = region_masks.sum(axis=(2, 3)) > 0
    return s / n, valid


@LOSSES.register("contrastive_learning_loss")
class ContrastiveLearningLoss:
    """InfoNCE over per-GT-region embeddings (q = ego/generated features,
    k = cav features); positives are same-region pairs."""

    def __init__(self, args: dict):
        self.tau = args.get("tau", 0.07)

    def __call__(self, output: dict, target: dict, suffix: str = "") -> dict:
        q = output["features_q"]
        k = output["features_k"]
        masks = target["pos_region_ranges"].astype(q.dtype)  # (B, R, H, W)
        eq, vq = region_pooled_embeddings(q, masks)
        ek, vk = region_pooled_embeddings(k, masks)
        valid = (vq & vk)

        nq = eq / jnp.clip(
            jnp.linalg.norm(eq, axis=-1, keepdims=True), 1e-6, None)
        nk = ek / jnp.clip(
            jnp.linalg.norm(ek, axis=-1, keepdims=True), 1e-6, None)
        # (B, R, R) similarity between k regions and q regions
        sim = jnp.einsum("brc,bsc->brs", nk, nq) / self.tau
        # mask invalid q columns out of the softmax
        sim = jnp.where(valid[:, None, :], sim, -1e9)
        logp = jax.nn.log_softmax(sim, axis=-1)
        r = sim.shape[1]
        diag = jnp.eye(r, dtype=bool)[None]
        ce = -(logp * diag).sum(-1)  # (B, R)
        n_valid = jnp.clip(valid.sum(), 1.0, None)
        loss = jnp.where(valid, ce, 0.0).sum() / n_valid
        return {"contrastive_loss": loss, "total_loss": loss}
