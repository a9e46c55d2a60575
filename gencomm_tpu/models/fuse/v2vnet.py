"""V2VNet fusion: iterative message passing with ConvGRU update.

Parity: opencood/models/fuse_modules/fusion_in_one.py:238-353 (V2VNetFusion)
+ sub_modules/convgru.py. The reference triple-loops (iteration x batch x
node) and re-warps per node; here each iteration warps all L x L agent pairs
at once via a lax.map over target slots (bounds memory to one target row at
a time) and updates every node in parallel. ROI masks come from warping a
ones-canvas, as in the reference.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import flax.linen as nn

from gencomm_tpu.ops.warp import warp_affine_nhwc
from gencomm_tpu.registry import FUSIONS


class ConvGRUCell(nn.Module):
    hidden_dim: int
    kernel: int = 3

    @nn.compact
    def __call__(self, x, h):
        combined = jnp.concatenate([x, h], axis=-1)
        gates = nn.Conv(2 * self.hidden_dim, (self.kernel, self.kernel),
                        padding="SAME", name="conv_gates")(combined)
        reset, update = jnp.split(nn.sigmoid(gates), 2, axis=-1)
        cand = nn.Conv(self.hidden_dim, (self.kernel, self.kernel),
                       padding="SAME", name="conv_can")(
            jnp.concatenate([x, reset * h], axis=-1)
        )
        cand = jnp.tanh(cand)
        return (1.0 - update) * h + update * cand


@FUSIONS.register("v2vnet")
class V2VNetFusion(nn.Module):
    in_channels: int
    num_iteration: int = 2
    gru_flag: bool = True
    agg_operator: str = "avg"

    @nn.compact
    def __call__(self, x, affine, agent_mask, train: bool = False):
        # x: (B, L, H, W, C)
        b, l, h, w, c = x.shape
        msg_conv = nn.Conv(c, (3, 3), padding="SAME", name="msg_cnn")
        gru = ConvGRUCell(hidden_dim=c, name="conv_gru")
        out_mlp = nn.Dense(c, name="mlp")

        ones = jnp.ones((b, l, h, w, 1), x.dtype)

        def warp_all_to(target_idx, feats_nhwc):
            """Warp every agent's map into agent ``target_idx``'s frame
            (NHWC row-gather — see ops/warp.grid_sample_bilinear_nhwc)."""
            theta = affine[:, target_idx]  # (B, L, 2, 3)
            return warp_affine_nhwc(feats_nhwc, theta)

        node = x  # (B, L, H, W, C)
        valid = agent_mask[..., None, None, None].astype(x.dtype)
        for _ in range(self.num_iteration):

            def update_one(i):
                warped = warp_all_to(i, node)  # (B, L, H, W, C)
                roi = warp_all_to(i, ones)  # (B, L, H, W, 1)
                ego = jnp.broadcast_to(node[:, i : i + 1], warped.shape)
                msg = msg_conv(
                    jnp.concatenate([warped, ego], axis=-1).reshape(
                        b * l, h, w, 2 * c
                    )
                ).reshape(b, l, h, w, c) * roi
                msg = msg * valid
                if self.agg_operator == "avg":
                    denom = jnp.clip(
                        agent_mask.sum(axis=1), 1, None
                    ).astype(x.dtype)[:, None, None, None]
                    agg = msg.sum(axis=1) / denom
                else:
                    agg = jnp.where(valid > 0, msg, -1e9).max(axis=1)
                if self.gru_flag:
                    hidden = jnp.zeros_like(agg)
                    return gru(
                        jnp.concatenate([node[:, i], agg], axis=-1), hidden
                    )
                return node[:, i] + agg

            # static unroll over L (small); each step bounds memory to one row
            node = jnp.stack([update_one(i) for i in range(l)], axis=1)

        return out_mlp(node[:, 0])
