"""SSFA (Spatial-Semantic Feature Aggregation) BEV backbone + IoU-aware head.

Parity: opencood/models/sub_modules/cia_ssd_utils.py (SSFA:6-57, Head:81-110).
Two parallel bottom-up groups (spatial 128 @ full res, semantic 256 @ half
res), 1x1 transitions, two deconv paths back to full res, and a learned
per-pixel softmax blend of the spatial/semantic outputs. The head adds an
IoU-regression channel next to cls/reg/dir (the "CI" in CIA-SSD:
confidence-IoU-aware rectification).

NHWC, bf16-friendly convs; the softmax blend fuses into the conv epilogue
under XLA.
"""

from __future__ import annotations

from typing import Dict

import jax.numpy as jnp
import flax.linen as nn

from gencomm_tpu.models.layers import ConvBNReLU, DeconvBNReLU


class SSFA(nn.Module):
    """128-ch in -> 128-ch out at the same spatial resolution."""

    spatial_ch: int = 128
    semantic_ch: int = 256

    @nn.compact
    def __call__(self, x, train: bool = False):
        # bottom_up_block_0: 3x conv3x3 s1 (cia_ssd_utils.py:11-15)
        x0 = x
        for i in range(3):
            x0 = ConvBNReLU(self.spatial_ch, 3, 1, name=f"bottom_up_0_{i}")(
                x0, train
            )
        # bottom_up_block_1: conv s2 then 2x conv s1 (cia_ssd_utils.py:16-17)
        # torch_pad: the reference runs on SECOND's even grids, where
        # stride-2 SAME and torch pad-1 disagree (see ConvBNReLU)
        x1 = ConvBNReLU(self.semantic_ch, 3, 2, torch_pad=True,
                        name="bottom_up_1_0")(x0, train)
        for i in range(1, 3):
            x1 = ConvBNReLU(self.semantic_ch, 3, 1, name=f"bottom_up_1_{i}")(
                x1, train
            )
        t0 = ConvBNReLU(self.spatial_ch, 1, 1, name="trans_0")(x0, train)
        t1 = ConvBNReLU(self.semantic_ch, 1, 1, name="trans_1")(x1, train)
        h, w = t0.shape[1:3]
        # k3/s2/p1/op1 deconvs as the reference (cia_ssd_utils.py:21-24)
        up0 = DeconvBNReLU(self.spatial_ch, 2, kernel=3, name="deconv_0")(t1, train)
        up1 = DeconvBNReLU(self.spatial_ch, 2, kernel=3, name="deconv_1")(t1, train)
        # crop to the full-res branch (odd input dims round up under s2)
        mid0 = up0[:, :h, :w] + t0
        mid1 = up1[:, :h, :w]
        out0 = ConvBNReLU(self.spatial_ch, 3, 1, name="conv_0")(mid0, train)
        out1 = ConvBNReLU(self.spatial_ch, 3, 1, name="conv_1")(mid1, train)
        w0 = nn.Conv(1, (1, 1), name="w_0")(out0)
        w1 = nn.Conv(1, (1, 1), name="w_1")(out1)
        w = nn.softmax(jnp.concatenate([w0, w1], axis=-1), axis=-1)
        return out0 * w[..., 0:1] + out1 * w[..., 1:2]


class IoUAwareHead(nn.Module):
    """cls/reg/iou (+dir) 1x1 heads (cia_ssd_utils.py Head:81-110).

    Returns the reference's key names so CiassdLoss / the postprocessor can
    consume them directly.
    """

    anchor_num: int = 2
    use_dir: bool = True
    dir_bins: int = 2

    @nn.compact
    def __call__(self, x) -> Dict[str, jnp.ndarray]:
        reg = nn.Conv(7 * self.anchor_num, (1, 1), name="conv_box")(x)
        cls = nn.Conv(self.anchor_num, (1, 1), name="conv_cls")(x)
        iou = nn.Conv(self.anchor_num, (1, 1), use_bias=False,
                      name="conv_iou")(x)
        out = {"reg_preds": reg, "cls_preds": cls, "iou_preds": iou}
        if self.use_dir:
            out["dir_preds"] = nn.Conv(
                self.dir_bins * self.anchor_num, (1, 1), name="conv_dir"
            )(x)
        return out
