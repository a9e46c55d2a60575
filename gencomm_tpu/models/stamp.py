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

AdapterDSA (adapter.py:581-677, the live second definition which shadows
the rope variant at :447) is implemented natively: sinusoidal 2D positional
encodings (positional_encodings.PositionalEncoding2D semantics) with
learned scale factors, a 1x1-conv query path on the rescaled feature, and
``n_layers`` of deformable spatial attention
(sub_modules/deformable_attention.deformable_attn_pytorch:154-205 +
adapter.DeformableSpatialAttentionLayer:301-429): per-query learned
sampling offsets around a regular reference grid, bilinear samples of the
value map, softmax point weights, output projection, residual.

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


def sinusoidal_pe_2d(h: int, w: int, ch: int) -> jnp.ndarray:
    """positional_encodings.PositionalEncoding2D: (H, W, ch) with the first
    half of channels encoding the H axis and the second half the W axis,
    interleaved sin/cos per frequency; trailing channels zero."""
    import numpy as np

    chq = int(np.ceil(ch / 4) * 2)
    inv_freq = 1.0 / (10000 ** (np.arange(0, chq, 2, dtype=np.float32) / chq))

    def emb(n):
        sin_inp = np.arange(n, dtype=np.float32)[:, None] * inv_freq[None, :]
        e = np.stack([np.sin(sin_inp), np.cos(sin_inp)], axis=-1)
        return e.reshape(n, chq)

    out = np.zeros((h, w, 2 * chq), np.float32)
    out[:, :, :chq] = emb(h)[:, None, :]
    out[:, :, chq : 2 * chq] = emb(w)[None, :, :]
    return jnp.asarray(out[:, :, :ch])


def _dsa_offset_bias_init(num_heads: int, num_points: int):
    """Reference init (adapter.py:347-362): per-head unit directions at
    angles 2*pi*h/heads, L-inf normalized, scaled by (point index + 1)."""
    import numpy as np

    thetas = np.arange(num_heads, dtype=np.float32) * (
        2.0 * np.pi / num_heads
    )
    grid = np.stack([np.cos(thetas), np.sin(thetas)], -1)  # (heads, 2)
    grid = grid / np.abs(grid).max(-1, keepdims=True)
    grid = np.tile(grid[:, None, :], (1, num_points, 1))
    grid = grid * (np.arange(num_points, dtype=np.float32) + 1)[None, :, None]
    bias = grid.reshape(-1)

    def init(key, shape, dtype=jnp.float32):
        assert shape == bias.shape
        return jnp.asarray(bias, dtype)

    return init


class DeformableSpatialAttentionLayer(nn.Module):
    """One deformable spatial attention layer
    (adapter.DeformableSpatialAttentionLayer:301-429).

    query (B, Nq, C_out) tokens on the output grid; value_map
    (B, H, W, C_in). Sampling locations = reference grid + learned offsets
    normalized by the output grid size; samples are bilinear with zero
    padding (grid_sample align_corners=False parity); softmax weights over
    points; output projection + dropout + residual.
    """

    out_ch: int
    num_heads: int = 8
    num_points: int = 4
    dropout: float = 0.1
    scale_ratio: Tuple[float, float] = (1.0, 1.0)  # (x, y) = BaseAdapter.ratio

    @nn.compact
    def __call__(self, query, value_map, out_hw: Tuple[int, int],
                 train: bool = False):
        from gencomm_tpu.ops.deform import bilinear_sample_nhwc

        b, nq, _ = query.shape
        h, w = value_map.shape[1:3]
        outh, outw = out_hw
        heads, pts = self.num_heads, self.num_points
        dim = self.out_ch // heads

        value = nn.Dense(self.out_ch, name="value_proj")(value_map)
        value = value.reshape(b, h, w, heads, dim)
        offsets = nn.Dense(
            heads * pts * 2, name="sampling_offsets",
            kernel_init=nn.initializers.zeros,
            bias_init=_dsa_offset_bias_init(heads, pts),
        )(query).reshape(b, nq, heads, pts, 2)
        attw = nn.Dense(
            heads * pts, name="attention_weights",
            kernel_init=nn.initializers.zeros,
            bias_init=nn.initializers.zeros,
        )(query).reshape(b, nq, heads, pts)
        attw = nn.softmax(attw, axis=-1)

        # reference grid (get_reference_points:431-445): pixel centers of
        # the OUTPUT grid normalized to [0, ratio] of the value map,
        # (x, y) order; offsets normalized by (outW, outH) (:424-425)
        ry = (jnp.arange(outh, dtype=jnp.float32) + 0.5) / outh
        rx = (jnp.arange(outw, dtype=jnp.float32) + 0.5) / outw
        ref_y = jnp.repeat(ry, outw) * self.scale_ratio[1]
        ref_x = jnp.tile(rx, outh) * self.scale_ratio[0]
        ref = jnp.stack([ref_x, ref_y], axis=-1)  # (Nq, 2)
        norm = jnp.asarray([outw, outh], jnp.float32)
        locs = ref[None, :, None, None, :] + offsets / norm
        # normalized [0,1] -> pixel coords of the VALUE map, grid_sample
        # align_corners=False: pix = loc * size - 0.5
        py = locs[..., 1] * h - 0.5
        px = locs[..., 0] * w - 0.5
        coords = jnp.stack([py, px], axis=-1)  # (B, Nq, heads, pts, 2)

        def sample_one(vmap_hwc, coords_q):
            # vmap_hwc (H, W, dim); coords_q (Nq, pts, 2)
            return bilinear_sample_nhwc(vmap_hwc, coords_q)  # (Nq, pts, dim)

        # vmap over batch then heads
        samples = jax.vmap(
            lambda v, c: jax.vmap(sample_one, in_axes=(2, 1), out_axes=2)(
                v, c
            )
        )(value, coords)  # (B, Nq, pts, heads, dim)
        out = (samples * attw.transpose(0, 1, 3, 2)[..., None]).sum(axis=2)
        out = out.reshape(b, nq, self.out_ch)
        out = nn.Dense(self.out_ch, name="output_proj")(out)
        out = nn.Dropout(self.dropout)(out, deterministic=not train)
        return out + query


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
    # adapterdsa knobs (reference submodule_args, adapter.py:601-604)
    dsa_num_heads: int = 8
    dsa_num_points: int = 4
    dsa_dropout: float = 0.1

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
        if method == "adapterdsa":
            # AdapterDSA (adapter.py:581-677): sinusoidal in-PE with a
            # learned scale, 1x1-conv query on the rescaled grid, n_layers
            # of deformable spatial attention over the PE'd input map with
            # a per-layer out-PE, then fit to the protocol grid.
            n, h, w, c = x.shape
            in_scale = self.param(
                "in_pos_scale_factor",
                nn.initializers.constant(1.0 / 30.0), (1,),
            )
            out_scale = self.param(
                "out_pos_scale_factor",
                nn.initializers.constant(1.0 / 30.0), (1,),
            )
            x = x + sinusoidal_pe_2d(h, w, c)[None] * in_scale
            q_map = _resize_and_fit(x, self.in_range, self.out_range,
                                    self.out_hw)
            q_map = nn.Conv(self.out_channels, (1, 1), name="query_conv")(
                q_map
            )
            outh, outw = q_map.shape[1:3]
            out_pe = sinusoidal_pe_2d(outh, outw, self.out_channels)[None]
            output = q_map.reshape(n, outh * outw, self.out_channels)
            ratio = (
                (self.out_range[3] - self.out_range[0])
                / (self.in_range[3] - self.in_range[0]),
                (self.out_range[4] - self.out_range[1])
                / (self.in_range[4] - self.in_range[1]),
            )
            for i in range(self.num_of_blocks):
                output = output.reshape(n, outh, outw, self.out_channels)
                output = output + out_pe * out_scale
                output = output.reshape(n, outh * outw, self.out_channels)
                output = DeformableSpatialAttentionLayer(
                    out_ch=self.out_channels,
                    num_heads=self.dsa_num_heads,
                    num_points=self.dsa_num_points,
                    dropout=self.dsa_dropout,
                    scale_ratio=ratio,
                    name=f"dsa_{i}",
                )(output, x, (outh, outw), train)
            return output.reshape(n, outh, outw, self.out_channels)
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
        # adapterdsa: num_of_blocks doubles as n_layers (reference default
        # 8, adapter.py:601); kept small in shipped configs for cost
        return StampAdapter(
            in_channels=a.get("in_channels", 128),
            out_channels=a.get("out_channels", 128),
            in_range=tuple(in_range),
            out_range=tuple(out_range),
            out_hw=tuple(out_hw),
            core_method=cfg.get("core_method", "adapterconvnext"),
            hidden_dim=a.get("dim", 64),
            num_of_blocks=a.get("n_layers", a.get("num_of_blocks", 3)),
            kernel_size=a.get("kernel_size", 7),
            dsa_num_heads=a.get("num_heads", 8),
            dsa_num_points=a.get("num_points", 4),
            dsa_dropout=a.get("dropout", 0.1),
            name=name,
        )
