"""PointPillars detection loss (+ GenComm generation MSE variant).

Parity: opencood/loss/point_pillar_loss.py:15-252 — sigmoid focal cls,
weighted smooth-L1 reg with sin-difference yaw, softmax dir-bin CE;
opencood/loss/point_pillar_gencomm_loss.py:44-52 adds
``generate_weight * MSE(gt_feature, pred_feature)``.

All functions are pure jnp; channel-last prediction maps (B, H', W', C).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from gencomm_tpu.utils.box_utils import limit_period
from gencomm_tpu.registry import LOSSES


def sigmoid_focal_loss(logits, targets, weights, alpha: float, gamma: float):
    """Elementwise focal loss on logits (point_pillar_loss.py:237-252)."""
    per_entry = jnp.clip(logits, 0, None) - logits * targets + jnp.log1p(
        jnp.exp(-jnp.abs(logits))
    )
    prob = jax.nn.sigmoid(logits)
    p_t = targets * prob + (1 - targets) * (1 - prob)
    modulating = (1.0 - p_t) ** gamma
    alpha_w = targets * alpha + (1 - targets) * (1 - alpha)
    return modulating * alpha_w * per_entry * weights


def weighted_smooth_l1(preds, targets, weights, sigma: float = 3.0):
    diff = preds - targets
    abs_diff = jnp.abs(diff)
    lt = (abs_diff <= 1.0 / sigma**2).astype(preds.dtype)
    loss = lt * 0.5 * (abs_diff * sigma) ** 2 + (abs_diff - 0.5 / sigma**2) * (1 - lt)
    return loss * weights


def add_sin_difference(preds, targets):
    """Encode yaw channel as sin(a-b) split (point_pillar_loss.py:126-138)."""
    rad_pred = jnp.sin(preds[..., 6:7]) * jnp.cos(targets[..., 6:7])
    rad_tg = jnp.cos(preds[..., 6:7]) * jnp.sin(targets[..., 6:7])
    preds = jnp.concatenate([preds[..., :6], rad_pred], axis=-1)
    targets = jnp.concatenate([targets[..., :6], rad_tg], axis=-1)
    return preds, targets


def direction_targets(reg_targets, anchor_yaw_deg, dir_offset: float,
                      num_bins: int):
    """One-hot dir-bin targets (point_pillar_loss.py:140-166).

    reg_targets: (B, N, 7) with N = H'*W'*A; anchor_yaw_deg: (A,) degrees.
    """
    anchor_yaw = jnp.asarray(np.radians(np.asarray(anchor_yaw_deg)))
    a = anchor_yaw.shape[0]
    n = reg_targets.shape[1]
    anchor_map = jnp.tile(anchor_yaw, (n // a,))
    rot_gt = reg_targets[..., 6] + anchor_map[None, :]
    offset_rot = limit_period(rot_gt - dir_offset, 0.0, 2 * jnp.pi)
    bins = jnp.floor(offset_rot / (2 * jnp.pi / num_bins)).astype(jnp.int32)
    bins = jnp.clip(bins, 0, num_bins - 1)
    return jax.nn.one_hot(bins, num_bins)


@LOSSES.register("point_pillar_loss")
class PointPillarLoss:
    """Configured with the hypes ``loss.args`` dict."""

    def __init__(self, args: dict):
        self.pos_cls_weight = args["pos_cls_weight"]
        self.cls = args["cls"]
        self.reg = args["reg"]
        self.dir = args.get("dir")

    def __call__(self, output: dict, target: dict, suffix: str = "") -> dict:
        """output: cls_preds (B,H,W,A), reg_preds (B,H,W,A*7),
        dir_preds (B,H,W,A*nb); target: pos/neg_equal_one (B,H,W,A),
        targets (B,H,W,A*7). Returns dict of scalar losses.

        A "_single" suffix pass (reference train.py:152-158 passes
        ``label_dict_single`` as the target dict) supervises per-agent
        head maps against the loader's per-agent labels, whose (B, L)
        lead is flattened to the heads' (B*L, ...).
        """
        if suffix == "_single" and "pos_equal_one_single" in target:
            target = dict(
                target,
                **{k: target[f"{k}_single"].reshape(
                    (-1,) + target[f"{k}_single"].shape[2:])
                   for k in ("pos_equal_one", "neg_equal_one", "targets")},
            )
        cls_preds = output[f"cls_preds{suffix}"]
        reg_preds = output[f"reg_preds{suffix}"]
        b = cls_preds.shape[0]

        cls_labels = target["pos_equal_one"].reshape(b, -1, 1)
        positives = cls_labels > 0
        negatives = target["neg_equal_one"].reshape(b, -1, 1) > 0
        pos_norm = jnp.clip(positives.sum(axis=1, keepdims=True), 1.0, None)

        cls_flat = cls_preds.reshape(b, -1, 1)
        cls_weights = (
            positives * self.pos_cls_weight + negatives * 1.0
        ) / pos_norm
        cls_loss = sigmoid_focal_loss(
            cls_flat, cls_labels.astype(cls_flat.dtype), cls_weights,
            alpha=self.cls["alpha"], gamma=self.cls["gamma"],
        ).sum() * self.cls["weight"] / b

        reg_weights = positives / pos_norm
        reg_flat = reg_preds.reshape(b, -1, 7)
        reg_targets = target["targets"].reshape(b, -1, 7)
        reg_enc, tgt_enc = add_sin_difference(reg_flat, reg_targets)
        reg_loss = weighted_smooth_l1(
            reg_enc, tgt_enc, reg_weights, sigma=self.reg["sigma"]
        ).sum() * self.reg["weight"] / b

        losses = {"cls_loss": cls_loss, "reg_loss": reg_loss}
        total = cls_loss + reg_loss

        if self.dir is not None:
            num_bins = self.dir["args"]["num_bins"]
            dir_logits = output[f"dir_preds{suffix}"].reshape(b, -1, num_bins)
            dir_tgt = direction_targets(
                reg_targets,
                self.dir["args"]["anchor_yaw"],
                self.dir["args"]["dir_offset"],
                num_bins,
            )
            logp = jax.nn.log_softmax(dir_logits, axis=-1)
            ce = -(dir_tgt * logp).sum(-1)
            dir_loss = (
                (ce * reg_weights.squeeze(-1)).sum() * self.dir["weight"] / b
            )
            losses["dir_loss"] = dir_loss
            total = total + dir_loss

        losses["total_loss"] = total
        return losses


@LOSSES.register("point_pillar_codebook_loss")
class PointPillarCodebookLoss(PointPillarLoss):
    """Detection loss + UMGM reconstruction MSE
    (point_pillar_codebook_loss.py:54-57, unit weight)."""

    def __call__(self, output: dict, target: dict, suffix: str = "") -> dict:
        losses = super().__call__(output, target, suffix)
        if "codebook_loss" in output:
            cb = output["codebook_loss"]
            losses["codebook_loss"] = cb
            losses["total_loss"] = losses["total_loss"] + cb
        return losses


@LOSSES.register("point_pillar_mpda_loss")
class PointPillarMPDALoss(PointPillarLoss):
    """Detection loss + adversarial domain BCE
    (point_pillar_mpda_loss.py:125-151): per-pixel domain logits, target 1
    for the ego (source) slot and 0 for collaborators; the gradient-
    reversal layer in DAImgHead makes this adversarial for the features."""

    def __call__(self, output: dict, target: dict, suffix: str = "") -> dict:
        losses = super().__call__(output, target, suffix)
        if "da_feature" in output:
            logits = output["da_feature"]  # (B, L, H, W, 1)
            b, l = logits.shape[:2]
            labels = (
                jnp.arange(l)[None, :, None, None, None] == 0
            ).astype(logits.dtype)
            labels = jnp.broadcast_to(labels, logits.shape)
            bce = (
                jnp.clip(logits, 0, None) - logits * labels
                + jnp.log1p(jnp.exp(-jnp.abs(logits)))
            )
            mask = target.get("agent_mask")
            if mask is not None:
                m = mask[:, :, None, None, None].astype(logits.dtype)
                da = (bce * m).sum() / jnp.clip(
                    m.sum() * np.prod(logits.shape[2:]), 1.0, None
                )
            else:
                da = bce.mean()
            losses["da_loss"] = da
            losses["total_loss"] = losses["total_loss"] + da
        return losses


@LOSSES.register("point_pillar_disconet_loss")
class PointPillarDiscoNetLoss(PointPillarLoss):
    """DiscoNet knowledge distillation (point_pillar_disconet_loss.py):
    detection loss + KL(log_softmax(student_feature_ch) ||
    softmax(teacher_feature_ch)) over the channel axis.

    Reduction parity: the reference's ``nn.KLDivLoss(size_average=True,
    reduce=True)`` is torch's ELEMENTWISE mean — sum over rows AND
    channels divided by N*H*W*C (point_pillar_disconet_loss.py:34-39) —
    not the per-row KL averaged over rows (which would be C x larger)."""

    def __init__(self, args: dict):
        super().__init__(args)
        self.kd_weight = args.get("kd", {}).get("weight", 1.0) \
            if isinstance(args.get("kd"), dict) else args.get("kd", 1.0)

    def __call__(self, output: dict, target: dict, suffix: str = "") -> dict:
        losses = super().__call__(output, target, suffix)
        if "teacher_feature" in output and "student_feature" in output:
            t = output["teacher_feature"].reshape(
                -1, output["teacher_feature"].shape[-1]
            )
            s = output["student_feature"].reshape(-1, t.shape[-1])
            logp = jax.nn.log_softmax(s, axis=-1)
            q = jax.nn.softmax(jax.lax.stop_gradient(t), axis=-1)
            kd = (q * (jnp.log(q + 1e-12) - logp)).mean()
            kd = kd * self.kd_weight
            losses["kd_loss"] = kd
            losses["total_loss"] = losses["total_loss"] + kd
        return losses


@LOSSES.register("point_pillar_gmatch_loss")
class PointPillarGMatchLoss:
    """Gradient-matching criterion (point_pillar_gmatch_loss.py): returns
    loss_S (generated path), loss_T (original path) and gen_loss; the
    trainer combines them with the grad-match MSE
    (tools/train_gmatch.py:150-160)."""

    def __init__(self, args: dict):
        self.det = PointPillarLoss(args)
        self.generate_weight = args.get("generate_weight", 1.0)

    def __call__(self, output: dict, target: dict, suffix: str = "") -> dict:
        loss_s = self.det(output, target, suffix)["total_loss"]
        out_t = dict(output)
        out_t["cls_preds"] = output["cls_preds_T"]
        out_t["reg_preds"] = output["reg_preds_T"]
        out_t["dir_preds"] = output["dir_preds_T"]
        loss_t = self.det(out_t, target, suffix)["total_loss"]
        pred = output["pred_feature"].astype(jnp.float32)
        gt = output["gt_feature"].astype(jnp.float32)  # --half emits bf16
        gen = jnp.mean((pred - gt) ** 2)
        return {"loss_S": loss_s, "loss_T": loss_t, "gen_loss": gen,
                "total_loss": loss_s + self.generate_weight * gen}


@LOSSES.register("adapter_loss")
class AdapterLoss:
    """STAMP adapter cycle-consistency loss (adapter_loss.py:14-50):
    alpha_P2M * MSE(FM, P2M) + alpha_M2P2M * MSE(FM, M2P2M)
    + alpha_M2P * MSE(FP, M2P), summed over non-ego modalities."""

    def __init__(self, args: dict):
        self.alpha_p2m = args.get("alpha_P2M", 1.0)
        self.alpha_m2p2m = args.get("alpha_M2P2M", 1.0)
        self.alpha_m2p = args.get("alpha_M2P", 1.0)

    def __call__(self, output: dict, target: dict, suffix: str = "") -> dict:
        fp = output["stamp_FP"]
        total = 0.0
        losses = {}
        for key in output:
            if not key.startswith("stamp_FM_"):
                continue
            m = key[len("stamp_FM_"):]
            fm = output[key]
            p2m = jnp.mean((fm - output[f"stamp_P2M_{m}"]) ** 2)
            m2p2m = jnp.mean((fm - output[f"stamp_M2P2M_{m}"]) ** 2)
            m2p = jnp.mean((fp - output[f"stamp_M2P_{m}"]) ** 2)
            sub = (self.alpha_p2m * p2m + self.alpha_m2p2m * m2p2m
                   + self.alpha_m2p * m2p)
            losses[f"P2M_{m}"] = p2m
            losses[f"M2P2M_{m}"] = m2p2m
            losses[f"M2P_{m}"] = m2p
            total = total + sub
        losses["total_loss"] = total
        return losses


@LOSSES.register("point_pillar_gencomm_loss")
class PointPillarGenCommLoss(PointPillarLoss):
    """Detection loss + feature-generation MSE
    (point_pillar_gencomm_loss.py:44-52)."""

    def __init__(self, args: dict):
        super().__init__(args)
        self.generate_weight = args.get("generate_weight", 1.0)

    def __call__(self, output: dict, target: dict, suffix: str = "") -> dict:
        losses = super().__call__(output, target, suffix)
        if "pred_feature" in output and "gt_feature" in output:
            # NOTE: the reference does NOT detach gt_feature — gradients flow
            # into the encoder from the generation MSE too.
            pred = output["pred_feature"].astype(jnp.float32)
            gt = output["gt_feature"].astype(jnp.float32)  # --half emits bf16
            mask = output.get("feature_mask")  # (B*L,) or (B, L) valid agents
            err = (pred - gt) ** 2
            if mask is not None:
                m = mask.reshape(mask.shape + (1,) * (err.ndim - mask.ndim))
                err = err * m
                denom = jnp.clip(m.sum() * np.prod(err.shape[mask.ndim:]), 1.0, None)
                gen_loss = err.sum() / denom
            else:
                gen_loss = err.mean()
            gen_loss = gen_loss * self.generate_weight
            losses["gen_loss"] = gen_loss
            losses["total_loss"] = losses["total_loss"] + gen_loss
        return losses
