"""STAMP adapters/reverters: per-modality translation to a shared protocol
feature space.

Parity targets (opencood/models/stamp_modules/adapter.py):
  BaseAdapter:41-101 — spatial rescale by the ratio between the modality's
  and the protocol's (feature px / lidar meter) densities, then zero-pad /
  crop to the protocol grid (ranges may differ per modality).
  AdapterConvNext:120-146 — resize -> 1x1 channel convert -> ConvNeXt body
  -> 1x1 convert (the reference's 3x3 smoothing conv is
  constructed but never applied, adapter.py:132,134-144).
  AdapterIdentity:103-117, AdapterConv:220-245, AdapterFC:247-299 variants.
  Adapter/Reverter dispatch :759-806.

The adversarial/deformable DSA variant is approximated by the convnext
body (the reference's DSA needs multi-scale deformable attention whose
published configs default to convnext anyway).

Loss parity: opencood/loss/adapter_loss.py:14-50 — three MSE terms
(P2M, M2P2M, M2P) — implemented in gencomm_tpu.loss (AdapterLoss).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from gencomm_tpu.models.aligners import ConvNeXtBlock


def _resize_and_fit(x, in_range, out_range, out_hw):
    """Rescale features so meters-per-pixel matches the protocol grid, then
    center pad/crop to the protocol's (H, W) (BaseAdapter:63-94)."""
    n, h, w, c = x.shape
    in_mx = in_range[3] - in_range[0]
    in_my = in_range[4] - in_range[1]
    out_mx = out_range[3] - out_range[0]
    out_my = out_range[4] - out_range[1]
    # pixels per meter, in and out
    out_h, out_w = out_hw
    feat_ratio_y = (out_h / out_my) / (h / in_my)
    feat_ratio_x = (out_w / out_mx) / (w / in_mx)
    nh = max(1, int(round(h * feat_ratio_y)))
    nw = max(1, int(round(w * feat_ratio_x)))
    if (nh, nw) != (h, w):
        x = jax.image.resize(x, (n, nh, nw, c), method="bilinear")
    # center pad or crop to (out_h, out_w)
    dh, dw = out_h - nh, out_w - nw
    if dh > 0 or dw > 0:
        x = jnp.pad(
            x,
            ((0, 0),
             (max(dh // 2, 0), max(dh - dh // 2, 0)),
             (max(dw // 2, 0), max(dw - dw // 2, 0)),
             (0, 0)),
        )
    nh, nw = x.shape[1:3]
    if nh > out_h or nw > out_w:
        top = (nh - out_h) // 2
        left = (nw - out_w) // 2
        x = x[:, top : top + out_h, left : left + out_w, :]
    return x


class StampAdapter(nn.Module):
    """One translation direction (modality->protocol, or protocol->modality
    when used as a Reverter — same machinery, swapped ranges/shapes)."""

    in_channels: int
    out_channels: int
    in_range: Tuple[float, ...]
    out_range: Tuple[float, ...]
    out_hw: Tuple[int, int]
    core_method: str = "adapterconvnext"
    hidden_dim: int = 64
    num_of_blocks: int = 3
    kernel_size: int = 7

    @nn.compact
    def __call__(self, x, train: bool = False):
        method = self.core_method.lower()
        if method == "identity":
            x = _resize_and_fit(x, self.in_range, self.out_range, self.out_hw)
            if self.out_channels != self.in_channels:
                n, h, w, _ = x.shape
                x = jax.image.resize(
                    x, (n, h, w, self.out_channels), method="bilinear"
                )
            return x
        if method == "adapterconvnext":
            x = _resize_and_fit(x, self.in_range, self.out_range, self.out_hw)
            x = nn.Conv(self.hidden_dim, (1, 1), name="channel_convert1")(x)
            for i in range(self.num_of_blocks):
                x = ConvNeXtBlock(
                    self.hidden_dim, kernel_size=self.kernel_size,
                    name=f"convnext_{i}",
                )(x)
            # NOTE: the reference constructs a 3x3 ``smoothing`` conv
            # (adapter.py:132) but its forward never applies it
            # (adapter.py:134-144) — shipped behavior ends at the 1x1
            # channel convert, so ours does too.
            return nn.Conv(self.out_channels, (1, 1), name="channel_convert2")(x)
        if method == "adapterconv":
            x = _resize_and_fit(x, self.in_range, self.out_range, self.out_hw)
            x = nn.relu(nn.Conv(self.hidden_dim, (3, 3), padding="SAME",
                                name="conv1")(x))
            return nn.Conv(self.out_channels, (3, 3), padding="SAME",
                           name="conv2")(x)
        if method == "adapterfc":
            x = _resize_and_fit(x, self.in_range, self.out_range, self.out_hw)
            x = nn.gelu(nn.Dense(self.hidden_dim, name="fc1")(x))
            return nn.Dense(self.out_channels, name="fc2")(x)
        raise ValueError(f"unknown stamp adapter {self.core_method}")

    @staticmethod
    def from_config(cfg: dict, in_range, out_range, out_hw,
                    name: str | None = None) -> "StampAdapter":
        a = cfg.get("args", {})
        return StampAdapter(
            in_channels=a.get("in_channels", 128),
            out_channels=a.get("out_channels", 128),
            in_range=tuple(in_range),
            out_range=tuple(out_range),
            out_hw=tuple(out_hw),
            core_method=cfg.get("core_method", "adapterconvnext"),
            hidden_dim=a.get("dim", 64),
            num_of_blocks=a.get("num_of_blocks", 3),
            kernel_size=a.get("kernel_size", 7),
            name=name,
        )
