"""PointPillars with aleatoric-uncertainty head.

Parity: opencood/models/point_pillar_uncertainty.py:14-80 — standard pillar
trunk plus a log-variance head predicting ``uncertainty_dim`` values per
anchor (3 = x, y, yaw; 2 = x, y; 7 = full box). Used by CoAlign's
uncertainty-aware pose-graph weighting.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import flax.linen as nn

from gencomm_tpu.models.heter_baseline import ModalityBranch
from gencomm_tpu.registry import MODELS


@MODELS.register("point_pillar_uncertainty")
class PointPillarUncertainty(nn.Module):
    modality_args: Dict[str, Any]
    lidar_range: Tuple[float, ...]
    anchor_num: int = 2
    uncertainty_dim: int = 3
    dir_bins: int = 0  # 0 = no dir head

    @nn.compact
    def __call__(self, batch: Dict[str, Any], train: bool = False):
        margs = self.modality_args["m1"]
        feat, _ = ModalityBranch(
            encoder_args=margs["encoder_args"],
            backbone_args=margs["backbone_args"],
            shrink_args=margs["shrink_header"],
            core_method="point_pillar",
            name="branch_m1",
        )({"points": batch["points_m1"],
           "point_mask": batch["point_mask_m1"]}, train)
        b, l = feat.shape[:2]
        flat = feat.reshape((b * l,) + feat.shape[2:])
        out = {
            "cls_preds": nn.Conv(self.anchor_num, (1, 1), name="cls_head")(flat),
            "reg_preds": nn.Conv(7 * self.anchor_num, (1, 1),
                                 name="reg_head")(flat),
            "unc_preds": nn.Conv(
                self.uncertainty_dim * self.anchor_num, (1, 1),
                name="unc_head",
            )(flat),
        }
        if self.dir_bins:
            out["dir_preds"] = nn.Conv(
                self.dir_bins * self.anchor_num, (1, 1), name="dir_head"
            )(flat)
        return out
