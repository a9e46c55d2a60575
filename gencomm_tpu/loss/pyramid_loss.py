"""Depth-supervision and HEAL pyramid losses.

Parity targets:
  opencood/loss/point_pillar_depth_loss.py (PointPillarDepthLoss:11-103 +
  FocalLoss:105-186): detection loss + categorical-depth focal CE over the
  LSS depth distribution.
  opencood/loss/point_pillar_pyramid_loss.py (PointPillarPyramidLoss):
  + per-level occupancy focal BCE against max-pooled pos/neg anchor maps
  (calc_occ_loss:69-105).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from gencomm_tpu.loss.point_pillar_loss import (
    PointPillarLoss, sigmoid_focal_loss,
)
from gencomm_tpu.registry import LOSSES


def _maxpool2d(x, k: int):
    """(N, H, W, C) max pool with kernel=stride=k."""
    if k == 1:
        return x
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, k, k, 1), (1, k, k, 1), "VALID"
    )


def categorical_depth_focal(logits, gt_indices, alpha=0.25, gamma=2.0):
    """Focal CE over the depth-bin axis (point_pillar_depth_loss.py:105-186).

    logits: (N, H, W, D) channel-last; gt_indices: (N, H, W) int.
    Returns per-pixel loss (N, H, W).
    """
    d = logits.shape[-1]
    p = jax.nn.softmax(logits, axis=-1)
    logp = jax.nn.log_softmax(logits, axis=-1)
    onehot = jax.nn.one_hot(gt_indices, d, dtype=logits.dtype)
    focal = -alpha * (1.0 - p) ** gamma * logp
    return (onehot * focal).sum(-1)


@LOSSES.register("point_pillar_depth_loss")
class PointPillarDepthLoss(PointPillarLoss):
    def __init__(self, args: dict):
        super().__init__(args)
        self.depth = args.get("depth", {})
        self.depth_weight = self.depth.get("weight", 1.0)

    def __call__(self, output: dict, target: dict, suffix: str = "") -> dict:
        losses = super().__call__(output, target, suffix)
        depth_keys = [
            k for k in output if k.startswith(f"depth_items{suffix}")
            or (suffix == "" and k.startswith("depth_items_"))
        ]
        depth_loss = 0.0
        found = False
        for k in depth_keys:
            item = output[k]
            # (logits, gt_indices[, weight]); entries without GT (pure
            # inference) are skipped
            if not isinstance(item, (tuple, list)) or len(item) < 2:
                continue
            logits, gt = item[0], item[1]
            per_px = categorical_depth_focal(logits, gt)
            if len(item) >= 3:
                # per-slot weight (fg_mask analog, point_pillar_depth_loss.py
                # use_fg_mask; here: modality mask over padded agent slots) —
                # masked mean so empty slots don't dilute the loss
                w = jnp.broadcast_to(item[2], per_px.shape)
                mean = (per_px * w).sum() / jnp.maximum(w.sum(), 1.0)
            else:
                mean = per_px.mean()
            depth_loss = depth_loss + mean * self.depth_weight
            found = True
        if found:
            losses["depth_loss"] = depth_loss
            losses["total_loss"] = losses["total_loss"] + depth_loss
        return losses


@LOSSES.register("point_pillar_pyramid_loss")
class PointPillarPyramidLoss(PointPillarDepthLoss):
    """Detection (+depth) loss plus per-level occupancy supervision."""

    def __init__(self, args: dict):
        super().__init__(args)
        pyr = args["pyramid"]
        self.relative_downsample = pyr["relative_downsample"]
        self.pyramid_weight = pyr["weight"]
        # "collab" | "single" — the reference tags this in the model's
        # output_dict (heter_pyramid_collab.py:134); here it is loss config
        # so jitted model outputs stay array-only.
        self.mode = pyr.get("mode", "collab")

    def occ_loss(self, occ_list, pos_equal_one, neg_equal_one):
        """occ_list: [(N, Hi, Wi, 1)]; pos/neg_equal_one: (N, H, W, A).

        Parity: point_pillar_pyramid_loss.py calc_occ_loss:69-105.
        """
        n = pos_equal_one.shape[0]
        occ_pos = jnp.any(pos_equal_one > 0, axis=-1, keepdims=True).astype(
            jnp.float32
        )
        occ_neg = jnp.all(neg_equal_one > 0, axis=-1, keepdims=True).astype(
            jnp.float32
        )
        total = 0.0
        for i, occ_pred in enumerate(occ_list):
            k = self.relative_downsample[i]
            pos_l = _maxpool2d(occ_pos, k).reshape(n, -1, 1)
            neg_l = (1.0 - _maxpool2d(1.0 - occ_neg, k)).reshape(n, -1, 1)
            pos_norm = jnp.clip(pos_l.sum(axis=1, keepdims=True), 1.0, None)
            weights = (pos_l * self.pos_cls_weight + neg_l * 1.0) / pos_norm
            preds = occ_pred.reshape(n, -1, 1)
            loss = sigmoid_focal_loss(
                preds, pos_l, weights,
                alpha=self.cls["alpha"], gamma=self.cls["gamma"],
            ).sum() / n
            total = total + loss * self.pyramid_weight[i]
        return total

    @staticmethod
    def _per_agent_targets(target: dict) -> dict:
        """The single model / collab "_single" pass supervise (B*L, ...)
        per-agent head maps (reference trains heter_pyramid_single with one
        agent per sample); when the loader provides per-agent labels
        (*_single keys, intermediate_heter_fusion_dataset.py
        label_dict_single), flatten their (B, L) lead to match."""
        if "pos_equal_one_single" not in target:
            return target

        def flat(a):
            return a.reshape((-1,) + a.shape[2:])

        return dict(
            target,
            pos_equal_one=flat(target["pos_equal_one_single"]),
            neg_equal_one=flat(target["neg_equal_one_single"]),
            targets=flat(target["targets_single"]),
        )

    def __call__(self, output: dict, target: dict, suffix: str = "") -> dict:
        mode = self.mode
        if mode == "collab" and suffix == "":
            # fused-head pass: plain detection loss
            # (point_pillar_pyramid_loss.py:46-50)
            return super().__call__(output, target, suffix)
        if mode == "collab":
            # "_single" pass supervises only the occupancy maps
            tgt = self._per_agent_targets(target)
            occ = self.occ_loss(
                output["occ_single_list"],
                tgt["pos_equal_one"], tgt["neg_equal_one"],
            )
            return {"pyramid_loss": occ, "total_loss": occ}
        # single model: detection + occupancy over every agent's head maps
        tgt = self._per_agent_targets(target)
        losses = super().__call__(output, tgt, suffix)
        occ = self.occ_loss(
            output["occ_single_list"],
            tgt["pos_equal_one"], tgt["neg_equal_one"],
        )
        losses["pyramid_loss"] = occ
        losses["total_loss"] = losses["total_loss"] + occ
        return losses
