"""CIA-SSD stage-1 loss and the uncertainty (KL) loss family.

Parity targets:
  opencood/loss/ciassd_loss.py:9-115 — pos-weighted focal cls + sin-diff
    smooth-L1 reg + dir-bin CE + IoU-rescore smooth-L1 against aligned
    rotated-3D-IoU targets (2*iou - 1).
  opencood/loss/point_pillar_uncertainty_loss.py:16-290 — detection loss
    plus a KL term on (x, y[, yaw]) residuals with predicted log-scale s:
    l2 0.5(e^{-s} d^2 + s), l1 0.5 e^{-s}|d| + s, or von-Mises
    log(i0e(e^{-s}) e^{e^{-s}}) - e^{-s} cos(d) + lambda_V elu(s - s0).

The IoU targets need the anchor grid; ``create_loss`` injects it as
``args["_anchors"]`` derived from the hypes postprocess block.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from gencomm_tpu.loss.point_pillar_loss import (
    PointPillarLoss,
    add_sin_difference,
    sigmoid_focal_loss,
    weighted_smooth_l1,
)
from gencomm_tpu.registry import LOSSES


def _iou_rescore_loss(iou_preds, reg_preds_map, reg_targets_map, reg_weights,
                      anchors, sigma: float):
    """Smooth-L1 between predicted IoU and (2*aligned_iou3d - 1)
    (ciassd_loss.py:81-101). Static shapes: every anchor position
    contributes, weighted by the positive mask. ``*_map`` args are the raw
    channel-last (B, H', W', A*7) prediction maps."""
    from gencomm_tpu.data.postprocessor import delta_to_boxes3d
    from gencomm_tpu.ops.rotated_iou import boxes_iou3d_elementwise

    b = iou_preds.shape[0]
    boxes_pred = delta_to_boxes3d(
        jax.lax.stop_gradient(reg_preds_map), anchors
    ).reshape(-1, 7)
    boxes_tgt = delta_to_boxes3d(reg_targets_map, anchors).reshape(-1, 7)
    # boxes are (x y z h w l yaw): hwl order
    iou_tgt = boxes_iou3d_elementwise(boxes_pred, boxes_tgt, order="hwl")
    iou_tgt = jax.lax.stop_gradient(2.0 * iou_tgt - 1.0).reshape(b, -1)
    loss = weighted_smooth_l1(
        iou_preds.reshape(b, -1), iou_tgt,
        reg_weights.reshape(b, -1), sigma=sigma,
    )
    return loss.sum() / b


@LOSSES.register("ciassd_loss")
class CiassdLoss:
    """Stage-1 loss of CIA-SSD / FPV-RCNN (ciassd_loss.py:9-115)."""

    def __init__(self, args: dict, keyname: str = ""):
        self.pos_cls_weight = args["pos_cls_weight"]
        self.encode_rad_by_sin = args.get("encode_rad_error_by_sin", True)
        self.cls = args["cls"]
        self.reg = args["reg"]
        self.dir = args.get("dir")
        self.iou = args.get("iou")
        self.anchors = args.get("_anchors")
        self.keyname = keyname

    def __call__(self, output: dict, target: dict, suffix: str = "") -> dict:
        src = output[self.keyname] if self.keyname else output
        cls_preds = src[f"cls_preds{suffix}"]
        reg_preds = src[f"reg_preds{suffix}"]
        b = cls_preds.shape[0]

        cls_labels = target["pos_equal_one"].reshape(b, -1, 1)
        positives = cls_labels > 0
        negatives = target["neg_equal_one"].reshape(b, -1, 1) > 0
        cared = jnp.logical_or(positives, negatives)
        cls_labels = cls_labels * cared
        pos_norm = jnp.clip(
            positives.sum(axis=1, keepdims=True).astype(jnp.float32), 1.0, None
        )

        cls_flat = cls_preds.reshape(b, -1, 1)
        cls_weights = (positives * self.pos_cls_weight + negatives) / pos_norm
        cls_loss = sigmoid_focal_loss(
            cls_flat, cls_labels.astype(cls_flat.dtype), cls_weights,
            alpha=self.cls["alpha"], gamma=self.cls["gamma"],
        ).sum() * self.cls["weight"] / b

        reg_weights = positives / pos_norm
        reg_flat = reg_preds.reshape(b, -1, 7)
        reg_targets = target["targets"].reshape(b, -1, 7)
        if self.encode_rad_by_sin:
            reg_enc, tgt_enc = add_sin_difference(reg_flat, reg_targets)
        else:
            reg_enc, tgt_enc = reg_flat, reg_targets
        reg_loss = weighted_smooth_l1(
            reg_enc, tgt_enc, reg_weights, sigma=self.reg["sigma"]
        ).sum() * self.reg["weight"] / b

        losses = {"cls_loss": cls_loss, "reg_loss": reg_loss}
        total = cls_loss + reg_loss

        if self.dir is not None and f"dir_preds{suffix}" in src:
            from gencomm_tpu.loss.point_pillar_loss import direction_targets

            args = self.dir["args"]
            num_bins = args["num_bins"]
            dir_logits = src[f"dir_preds{suffix}"].reshape(b, -1, num_bins)
            dir_tgt = direction_targets(
                reg_targets, args["anchor_yaw"],
                args.get("dir_offset", 0.0), num_bins,
            )
            logp = jax.nn.log_softmax(dir_logits, axis=-1)
            ce = -(dir_tgt * logp).sum(-1)
            dir_loss = (
                (ce * reg_weights.squeeze(-1)).sum() * self.dir["weight"] / b
            )
            losses["dir_loss"] = dir_loss
            total = total + dir_loss

        if self.iou is not None and self.anchors is not None \
                and f"iou_preds{suffix}" in src:
            iou_loss = _iou_rescore_loss(
                src[f"iou_preds{suffix}"], reg_preds,
                target["targets"].reshape(reg_preds.shape),
                reg_weights, self.anchors, self.iou["sigma"],
            ) * self.iou["weight"]
            losses["iou_loss"] = iou_loss
            total = total + iou_loss

        losses["total_loss"] = total
        return losses


def kl_loss_l2(diff, s):
    return 0.5 * (jnp.exp(-s) * diff**2 + s)


def kl_loss_l1(diff, s):
    return 0.5 * jnp.exp(-s) * jnp.abs(diff) + s


def kl_loss_angular(diff, s, lambda_v: float = 1.0, s0: float = 1.0,
                    use_limit_period: bool = False):
    """von-Mises NLL with an elu regularizer on s
    (point_pillar_uncertainty_loss.py:243-260). The reference's CUDA i0e is
    jax.scipy.special.i0e."""
    kappa = jnp.exp(-s)
    log_norm = jnp.log(jax.scipy.special.i0e(kappa)) + kappa
    cos_term = jnp.abs(jnp.cos(diff)) if use_limit_period else jnp.cos(diff)
    if use_limit_period:
        # the reference also detaches |cos| in this mode
        # (point_pillar_uncertainty_loss.py:256: `cos_abs.detach()`) — only
        # the log-scale s trains through this branch, by design
        cos_term = jax.lax.stop_gradient(cos_term)
    return log_norm - kappa * cos_term + lambda_v * jax.nn.elu(s - s0)


@LOSSES.register("point_pillar_uncertainty_loss")
class PointPillarUncertaintyLoss(PointPillarLoss):
    """Detection loss + KL uncertainty term
    (point_pillar_uncertainty_loss.py:16-165)."""

    def __init__(self, args: dict):
        super().__init__(args)
        ka = args["kl"]
        self.uncertainty_dim = ka.get("dim", args.get("uncertainty_dim", 3))
        self.unc_weight = args.get("uncertainty", {}).get("weight", 1.0)
        self.angle_weight = ka.get("angle_weight", 1.0)
        xy = ka.get("xy_loss_type", "l2")
        self.xy_loss = kl_loss_l2 if xy == "l2" else kl_loss_l1
        ang = ka.get("angle_loss_type", "l2")
        if ang == "von-mise":
            lv, s0 = ka.get("lambda_V", 1.0), ka.get("s0", 1.0)
            lp = ka.get("limit_period", False)
            self.angle_loss = lambda d, s: kl_loss_angular(d, s, lv, s0, lp)
        else:
            self.angle_loss = kl_loss_l2

    def __call__(self, output: dict, target: dict, suffix: str = "") -> dict:
        losses = super().__call__(output, target, suffix)
        b = output[f"cls_preds{suffix}"].shape[0]
        reg_preds = output[f"reg_preds{suffix}"].reshape(b, -1, 7)
        reg_targets = target["targets"].reshape(b, -1, 7)
        positives = target["pos_equal_one"].reshape(b, -1, 1) > 0
        pos_norm = jnp.clip(
            positives.sum(axis=1, keepdims=True).astype(jnp.float32), 1.0, None
        )
        reg_weights = positives / pos_norm

        unc = output[f"unc_preds{suffix}"].reshape(b, -1, self.uncertainty_dim)
        xy_diff = reg_preds[..., :2] - reg_targets[..., :2]
        if self.uncertainty_dim == 3:
            theta_diff = reg_preds[..., 6:7] - reg_targets[..., 6:7]
            kl = jnp.concatenate(
                [self.xy_loss(xy_diff, unc[..., :2]),
                 self.angle_weight * self.angle_loss(
                     theta_diff, unc[..., 2:3])],
                axis=-1,
            )
        elif self.uncertainty_dim == 7:
            diff = reg_preds - reg_targets
            kl = self.xy_loss(diff, unc)
        else:  # dim == 2
            kl = self.xy_loss(xy_diff, unc[..., :2])
        unc_loss = (kl * reg_weights).sum() / unc.shape[0] * self.unc_weight
        losses["unc_loss"] = unc_loss
        losses["total_loss"] = losses["total_loss"] + unc_loss
        return losses


@LOSSES.register("fpvrcnn_loss")
class FpvrcnnLoss:
    """Stage-1 CIASSD loss + RCNN refinement losses
    (opencood/loss/fpvrcnn_loss.py:7-89): BCE cls on roi/GT-IoU>0.3 labels,
    smooth-L1 on the IoU-rectification target 2*(iou-0.5), smooth-L1 on
    canonical box residuals over positives."""

    def __init__(self, args: dict):
        s1 = dict(args["stage1"])
        if "_anchors" in args:
            s1.setdefault("_anchors", args["_anchors"])
        self.stage1 = CiassdLoss(s1)
        self.cls = args["stage2"]["cls"]
        self.reg = args["stage2"]["reg"]
        self.iou = args["stage2"]["iou"]

    def __call__(self, output: dict, target: dict, suffix: str = "") -> dict:
        losses = self.stage1(output, target, suffix)
        losses = {f"stage1_{k}": v for k, v in losses.items()}
        total = losses["stage1_total_loss"]
        if "stage2_out" in output and "rcnn_label_dict" in output:
            s2 = output["stage2_out"]
            lbl = output["rcnn_label_dict"]
            rv = output["roi_valid"].reshape(-1).astype(jnp.float32)
            cls_tgt = lbl["cls_tgt"].reshape(-1)
            cls_logit = s2["rcnn_cls"].reshape(-1)
            bce = jnp.clip(cls_logit, 0, None) - cls_logit * cls_tgt \
                + jnp.log1p(jnp.exp(-jnp.abs(cls_logit)))
            n_valid = jnp.clip(rv.sum(), 1.0, None)
            cls_loss = (bce * rv).sum() / n_valid * self.cls["weight"]

            iou_tgt = 2.0 * (lbl["iou_tgt"].reshape(-1) - 0.5)
            iou_loss = weighted_smooth_l1(
                s2["rcnn_iou"].reshape(-1), iou_tgt, cls_tgt * rv,
                sigma=self.iou["sigma"],
            ).sum() / n_valid * self.iou["weight"]

            w = cls_tgt * rv
            wsum = jnp.clip(w.sum(), 1.0, None)
            reg_loss = weighted_smooth_l1(
                s2["rcnn_reg"].reshape(-1, 7), lbl["reg_tgt"].reshape(-1, 7),
                (w / wsum)[:, None], sigma=self.reg["sigma"],
            ).sum() * self.reg["weight"]

            rcnn = cls_loss + iou_loss + reg_loss
            losses.update(rcnn_cls_loss=cls_loss, rcnn_iou_loss=iou_loss,
                          rcnn_reg_loss=reg_loss, rcnn_loss=rcnn)
            total = total + rcnn
        losses["total_loss"] = total
        return losses
