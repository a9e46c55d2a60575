"""Native multi-agent communication over ICI collectives.

The reference SIMULATES V2X communication inside one process: agent
features are concatenated on the batch axis and "exchange" is a tensor
index (SURVEY.md §2.9). On TPU the agent axis can be a REAL device axis:
each chip embodies one agent — it encodes its own sensor data locally and
only the GenComm 2-channel spatial message crosses chips, as an
``all_gather`` over the ICI mesh (the reference's simulated comm boundary,
heter_model_baseline_w_gencomm_stage2.py:257, becomes a physical one).

Per-device program (SPMD, identical everywhere):
  1. encode OWN points -> BEV feature (128 ch)   [local only]
  2. extract 2-ch message                         [local only]
  3. all_gather(messages, 'agent')                [ICI — 64x less volume
                                                   than shipping features]
  4. diffusion-generate all agents' features from (my feature, messages)
  5. warp + fuse + heads — every device produces the detection map AS IF
     it were the ego; slice the ego agent's shard for the canonical output
     (the reference's in-order evaluation wants per-ego outputs anyway).

Data parallelism composes: mesh ('data', 'agent'); batch axis sharded over
'data' exactly like the DDP-analog in train/trainer.py.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Dict, Tuple

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn
from jax.sharding import Mesh, PartitionSpec as P
try:
    from jax import shard_map  # jax >= 0.8
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map

from gencomm_tpu.models.encoders.point_pillar import PointPillarEncoder
from gencomm_tpu.models.gencomm.message_extractor import MessageExtractor
from gencomm_tpu.models.gencomm.diffusion import GenCommDiffusion
from gencomm_tpu.models.backbones.bev_backbone import BEVBackbone
from gencomm_tpu.models.layers import DownsampleConv
from gencomm_tpu.models.heads import DetectionHeads
from gencomm_tpu.models.fuse.fusion import AttFusion
from gencomm_tpu.utils.transformation_utils import normalize_pairwise_tfm


class AgentLocalNet(nn.Module):
    """The per-agent (per-device) portion: encoder -> backbone -> shrink ->
    feature + message. Runs on each chip over ITS OWN agent only."""

    encoder_args: Dict[str, Any]
    backbone_args: Dict[str, Any]
    shrink_args: Dict[str, Any]
    message_ch: int = 2

    @nn.compact
    def __call__(self, points, point_mask, train: bool = False):
        enc = PointPillarEncoder(
            voxel_size=tuple(self.encoder_args["voxel_size"]),
            lidar_range=tuple(self.encoder_args["lidar_range"]),
            num_filters=tuple(self.encoder_args["pillar_vfe"]["num_filters"]),
            name="encoder",
        )
        canvas = enc(points, point_mask, train)  # (B, 1, ny, nx, C)
        b, l = canvas.shape[:2]
        flat = canvas.reshape((b * l,) + canvas.shape[2:])
        feat = BEVBackbone(
            layer_nums=tuple(self.backbone_args["layer_nums"]),
            layer_strides=tuple(self.backbone_args["layer_strides"]),
            num_filters=tuple(self.backbone_args["num_filters"]),
            upsample_strides=tuple(
                self.backbone_args.get("upsample_strides", ())
            ),
            num_upsample_filters=tuple(
                self.backbone_args.get("num_upsample_filter", ())
            ),
            name="backbone",
        )(flat, train)
        feat = DownsampleConv(
            dims=tuple(self.shrink_args["dim"]),
            kernels=tuple(self.shrink_args["kernal_size"]),
            strides=tuple(self.shrink_args["stride"]),
            name="shrinker",
        )(feat)
        msg = MessageExtractor(
            in_ch=feat.shape[-1], out_ch=self.message_ch,
            name="message_extractor",
        )(feat)
        return (feat.reshape((b, l) + feat.shape[1:]),
                msg.reshape((b, l) + msg.shape[1:]))


class EgoCollabNet(nn.Module):
    """The receiver-side portion: diffusion generation from (own feature,
    everyone's messages), fusion, heads. Runs on each chip with the
    gathered messages — SPMD-symmetric, every chip is 'ego' of its own
    output."""

    feat_dim: int
    anchor_number: int = 2
    dir_bins: int = 2
    gencomm_timesteps: int = 3

    @nn.compact
    def __call__(self, own_feat, messages, affine_rows, agent_mask,
                 train: bool = False):
        # own_feat: (B, 1, H, W, C); messages: (B, L, H, W, 2)
        b, l = messages.shape[:2]
        hw = messages.shape[2:4]
        ego_bc = jnp.broadcast_to(
            own_feat, (b, l) + own_feat.shape[2:]
        ).reshape((b * l,) + own_feat.shape[2:])
        cond = messages.reshape((b * l,) + hw + (messages.shape[-1],))
        pred = GenCommDiffusion(
            feat_ch=self.feat_dim, msg_ch=messages.shape[-1],
            num_timesteps=self.gencomm_timesteps, name="gencomm",
        )(ego_bc, cond, train)
        feat = pred.reshape((b, l) + hw + (self.feat_dim,))
        # own feature stays local and exact (slot = this device's index)
        fused = AttFusion(feat_dim=self.feat_dim, name="fusion_net")(
            feat, affine_rows, agent_mask, train
        )
        return DetectionHeads(
            self.anchor_number, self.dir_bins, name="heads"
        )(fused)


class AgentSPMDPipeline:
    """End-to-end SPMD wrapper: one agent per device along mesh axis
    'agent'; only 2-channel messages cross the ICI."""

    def __init__(self, local: AgentLocalNet, collab: EgoCollabNet,
                 mesh: Mesh, lidar_range):
        self.local = local
        self.collab = collab
        self.mesh = mesh
        self.lidar_range = lidar_range
        self.n_agents = mesh.shape["agent"]

    def init(self, rng, batch):
        """Initialize both nets on host shapes (single-agent slices)."""
        pts = batch["points"][:, :1]
        msk = batch["point_mask"][:, :1]
        lv = self.local.init({"params": rng}, pts, msk, False)
        feat, msg = self.local.apply(lv, pts, msk, False)
        msgs = jnp.broadcast_to(
            msg, (msg.shape[0], self.n_agents) + msg.shape[2:]
        )
        hm = self.lidar_range[4] - self.lidar_range[1]
        wm = self.lidar_range[3] - self.lidar_range[0]
        aff = normalize_pairwise_tfm(
            batch["pairwise_t_matrix"], hm, wm, 1.0
        ).astype(jnp.float32)
        cv = self.collab.init(
            {"params": jax.random.fold_in(rng, 1),
             "diffusion": jax.random.fold_in(rng, 2)},
            feat, msgs, aff, batch["agent_mask"], False,
        )
        return {"local": lv, "collab": cv}

    def apply(self, variables, batch, rng):
        """batch: points (B, L, P, 4), point_mask (B, L, P),
        agent_mask (B, L), pairwise_t_matrix (B, L, L, 4, 4) with
        L == mesh.shape['agent']. Returns per-ego detection maps
        (B, L, H', W', A) — slot i is the output with agent i as ego."""
        hm = self.lidar_range[4] - self.lidar_range[1]
        wm = self.lidar_range[3] - self.lidar_range[0]

        def step(lv, cv, points, point_mask, agent_mask, pairwise, key):
            # shapes inside: per-device L-slice of size 1
            i = jax.lax.axis_index("agent")
            feat, msg = self.local.apply(lv, points, point_mask, False)
            # [PHYSICAL COMM BOUNDARY] — 2-channel messages over ICI
            msgs = jax.lax.all_gather(
                msg[:, 0], "agent", axis=1, tiled=False
            )  # (B, L, H, W, 2)
            amask = jax.lax.all_gather(
                agent_mask[:, 0], "agent", axis=1, tiled=False
            )
            # every device fuses in ITS OWN frame: affine rows with this
            # agent as the target
            pairwise_full = jax.lax.all_gather(
                pairwise[:, 0], "agent", axis=1, tiled=False
            )  # (B, L, L, 4, 4)
            affine = normalize_pairwise_tfm(
                pairwise_full, hm, wm, 1.0
            ).astype(jnp.float32)
            # roll so this device's agent sits at slot 0 (the ego slot)
            affine_rows = jnp.roll(
                jnp.roll(affine, -i, axis=1), -i, axis=2
            )
            msgs = jnp.roll(msgs, -i, axis=1)
            amask_r = jnp.roll(amask, -i, axis=1)
            cls_preds, reg_preds, dir_preds = self.collab.apply(
                cv, feat, msgs, affine_rows, amask_r, False,
                rngs={"diffusion": jax.random.fold_in(key, i)},
            )
            return cls_preds[:, None], reg_preds[:, None], dir_preds[:, None]

        specs_in = (
            P(), P(),                      # params replicated
            P(None, "agent"), P(None, "agent"),  # points, mask
            P(None, "agent"), P(None, "agent"),  # agent_mask, pairwise rows
            P(),
        )
        specs_out = (P(None, "agent"), P(None, "agent"), P(None, "agent"))
        fn = shard_map(
            step, mesh=self.mesh, in_specs=specs_in, out_specs=specs_out,
        )
        return jax.jit(fn)(
            variables["local"], variables["collab"],
            batch["points"], batch["point_mask"], batch["agent_mask"],
            batch["pairwise_t_matrix"], rng,
        )
