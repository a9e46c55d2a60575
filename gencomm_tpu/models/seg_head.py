"""BEV segmentation head (STAMP multi-task support).

Parity: opencood/models/sub_modules/bev_seg_head.py — 3x3 conv heads
producing dynamic (vehicle) and/or static (road/lane) class maps over the
fused BEV feature; evaluated with mean-IU (utils/misc_utils.mean_iu, used
by tools/inference_heter_task.py in the reference).
"""

from __future__ import annotations

import jax.numpy as jnp
import flax.linen as nn


class BevSegHead(nn.Module):
    target: str = "both"  # 'dynamic' | 'static' | 'both'
    dynamic_classes: int = 2
    static_classes: int = 3

    @nn.compact
    def __call__(self, x):
        """(N, H, W, C) -> dict with seg logit maps."""
        out = {}
        if self.target in ("dynamic", "both"):
            out["dynamic_seg"] = nn.Conv(
                self.dynamic_classes, (3, 3), padding="SAME",
                name="dynamic_head",
            )(x)
        if self.target in ("static", "both"):
            out["static_seg"] = nn.Conv(
                self.static_classes, (3, 3), padding="SAME",
                name="static_head",
            )(x)
        if "dynamic_seg" not in out:
            out["dynamic_seg"] = jnp.zeros(
                x.shape[:-1] + (self.dynamic_classes,), x.dtype)
        if "static_seg" not in out:
            out["static_seg"] = jnp.zeros(
                x.shape[:-1] + (self.static_classes,), x.dtype)
        return out


def seg_loss(dynamic_logits, static_logits, dynamic_gt, static_gt,
             dynamic_weight: float = 1.0, static_weight: float = 1.0):
    """Pixel CE for both seg targets (STAMP task loss)."""
    import jax

    def ce(logits, gt):
        logp = jax.nn.log_softmax(logits, axis=-1)
        oh = jax.nn.one_hot(gt, logits.shape[-1])
        return -(oh * logp).sum(-1).mean()

    ld = ce(dynamic_logits, dynamic_gt) * dynamic_weight
    ls = ce(static_logits, static_gt) * static_weight
    return {"dynamic_seg_loss": ld, "static_seg_loss": ls,
            "total_loss": ld + ls}
