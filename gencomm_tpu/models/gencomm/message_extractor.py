"""Deformable Message Extractor: BEV feature -> 2-channel spatial message.

Parity: opencood/models/gencomm_modules/message_extractor_v2.py:70-120
(offset conv -> DeformConv2d 128->64 -> SE gate -> 1x1 fuse to 2 channels).
The deformable conv runs as a bilinear-gather contraction (ops/deform.py).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from gencomm_tpu.ops.deform_pallas import deform_conv3x3_auto


class MessageExtractor(nn.Module):
    in_ch: int = 128
    out_ch: int = 2
    mid_ch: int = 64

    @nn.compact
    def __call__(self, x):
        # x: (B, H, W, Cin) NHWC
        offsets = nn.Conv(18, (3, 3), padding="SAME", name="offset")(x)
        weight = self.param(
            "dcn_kernel",
            nn.initializers.lecun_normal(),
            (3, 3, self.in_ch, self.mid_ch),
        )
        dcn_bias = self.param("dcn_bias", nn.initializers.zeros, (self.mid_ch,))
        b1 = deform_conv3x3_auto(x, offsets, weight, dcn_bias)

        # SE attention over channels (message_extractor_v2.py:88-94)
        gap = b1.mean(axis=(1, 2), keepdims=True)
        a = nn.Conv(self.mid_ch // 2, (1, 1), name="se_reduce")(gap)
        a = nn.relu(a)
        a = nn.Conv(self.mid_ch, (1, 1), name="se_expand")(a)
        a = nn.sigmoid(a)
        enhanced = b1 * a

        y = nn.Conv(self.mid_ch, (1, 1), name="fuse0")(enhanced)
        y = nn.relu(y)
        return nn.Conv(self.out_ch, (1, 1), name="fuse1")(y)
