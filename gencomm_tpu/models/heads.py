"""Shared detection heads: cls/reg/dir 1x1 convs.

Parity: opencood/models/heter_model_baseline.py:130-135 (and the gencomm
variants). Channel-last: outputs (B, H', W', A), (B, H', W', 7A),
(B, H', W', bins*A).

Multi-class (V2X-Real, num_class=C>1): each grid cell carries A anchors
PER CLASS (class-major), and every anchor-class slot predicts C class
scores — cls has A*C*C channels, reg A*C*7
(heter_model_baseline.py:130-132 builds exactly these widths).
"""

from __future__ import annotations

import flax.linen as nn


class DetectionHeads(nn.Module):
    anchor_number: int = 2
    dir_bins: int = 2
    num_class: int = 1

    @nn.compact
    def __call__(self, x):
        cls = nn.Conv(
            self.anchor_number * self.num_class * self.num_class, (1, 1),
            name="cls_head",
        )(x)
        reg = nn.Conv(7 * self.anchor_number * self.num_class, (1, 1),
                      name="reg_head")(x)
        dirp = nn.Conv(self.dir_bins * self.anchor_number, (1, 1),
                       name="dir_head")(x)
        return cls, reg, dirp
