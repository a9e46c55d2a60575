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
                                                   than shipping features;
                                                   optionally quantized to
                                                   fp16 on the wire]
  4. diffusion-generate all agents' features from (my feature, messages)
  5. warp + fuse + heads — every device produces the detection map AS IF
     it were the ego; slice the ego agent's shard for the canonical output
     (the reference's in-order evaluation wants per-ego outputs anyway).

Data parallelism composes: mesh ('data', 'agent'); batch axis sharded over
'data' exactly like the DDP-analog in train/trainer.py.

Beyond inference, this module provides:
  * ``AgentSPMDPipeline.make_train_step`` — the FULL training step through
    shard_map: per-device local encode + message all_gather + per-ego
    detection loss (each device supervises with labels in its own frame,
    the reference's supervise_single layout), gradients pmean'd over BOTH
    mesh axes (the DDP all-reduce rides the same ICI as the messages).
  * ``HeteroAgentSPMDPipeline`` — one camera (LSS) agent and lidar
    (PointPillars) agents on DIFFERENT devices: each chip runs only its
    own modality's encoder (flax ``nn.cond`` on the device's agent index),
    and only the 2-ch messages cross chips — heterogeneous collaboration
    over physical ICI.
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


class CameraAgentLocalNet(nn.Module):
    """LSS camera variant of the per-agent (per-device) portion: LSS
    encoder -> BEV backbone -> shrink -> feature + message. The BEV grid
    of ``grid_conf`` matches the lidar agents' canvas so the downstream
    collab net is modality-agnostic (the heter contract,
    heter_model_baseline.py:182-208)."""

    grid_conf: Dict[str, Any]
    final_dim: Tuple[int, int]
    backbone_args: Dict[str, Any]
    shrink_args: Dict[str, Any]
    message_ch: int = 2
    lss_feat_ch: int = 32
    downsample: int = 8

    @nn.compact
    def __call__(self, camera_inputs: Dict[str, Any], train: bool = False):
        from gencomm_tpu.models.encoders.lss import LSSEncoder

        canvas, _ = LSSEncoder(
            grid_conf=self.grid_conf, final_dim=tuple(self.final_dim),
            downsample=self.downsample, feat_ch=self.lss_feat_ch,
            trunk_blocks=1, name="encoder",
        )(camera_inputs, train)  # (B, L, ny, nx, C)
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


class AgentSPMDPipeline:
    """End-to-end SPMD wrapper: one agent per device along mesh axis
    'agent'; only 2-channel messages cross the ICI.

    ``quantize_msg_fp16=True`` casts the message to float16 before the
    all_gather (the wire payload) and back to float32 at the receiver —
    the CPM-byte story of the simulated paths (fp16 features, zlib'd in
    Communication.cpm_size_bytes) applied at the physical collective.
    """

    def __init__(self, local: AgentLocalNet, collab: EgoCollabNet,
                 mesh: Mesh, lidar_range, quantize_msg_fp16: bool = False):
        self.local = local
        self.collab = collab
        self.mesh = mesh
        self.lidar_range = lidar_range
        self.n_agents = mesh.shape["agent"]
        self.quantize_msg_fp16 = quantize_msg_fp16

    # ---- wire format ----------------------------------------------------
    def _to_wire(self, msg):
        return msg.astype(jnp.float16) if self.quantize_msg_fp16 else msg

    @staticmethod
    def _from_wire(msgs):
        return msgs.astype(jnp.float32)

    def cpm_bytes_per_sender(self, batch) -> int:
        """Bytes each agent puts on the ICI per frame (message payload of
        the all_gather) — the measured analog of the reference's CPM size
        accounting (utils/draco_compression.py / Communication)."""
        shapes = jax.eval_shape(
            lambda b: self.local.init_with_output(
                jax.random.PRNGKey(0), b["points"][:, :1],
                b["point_mask"][:, :1], False,
            )[0],
            batch,
        )
        msg_shape = shapes[1].shape  # (B, 1, H, W, ch)
        itemsize = 2 if self.quantize_msg_fp16 else 4
        per_frame = int(np.prod(msg_shape[2:])) * itemsize
        return per_frame

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
            # (optionally fp16 on the wire; see cpm_bytes_per_sender)
            msgs = self._from_wire(jax.lax.all_gather(
                self._to_wire(msg[:, 0]), "agent", axis=1, tiled=False
            ))  # (B, L, H, W, 2)
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

    # ---- training through shard_map --------------------------------------
    def create_train_state(self, rng, batch, tx):
        """TrainState over the combined {local, collab} parameter trees."""
        from gencomm_tpu.train.trainer import TrainState

        variables = self.init(rng, batch)
        params = {"local": variables["local"]["params"],
                  "collab": variables["collab"]["params"]}
        stats = {"local": dict(variables["local"].get("batch_stats", {})),
                 "collab": dict(variables["collab"].get("batch_stats", {}))}
        return TrainState(
            step=jnp.zeros((), jnp.int32), params=params,
            batch_stats=stats, opt_state=tx.init(params),
        )

    def _local_train_apply(self, params, stats, batch_slices, train):
        lv = {"params": params["local"]}
        if stats["local"]:
            lv["batch_stats"] = stats["local"]
        (feat, msg), lmut = self.local.apply(
            lv, batch_slices["points"], batch_slices["point_mask"], train,
            mutable=["batch_stats"],
        )
        return feat, msg, dict(lmut.get("batch_stats", {}))

    def make_train_step(self, criterion, tx):
        """The FULL training step as one shard_map program: every device
        encodes its own agent, all_gathers the (optionally fp16) messages
        over ICI, diffusion-generates + fuses AS EGO, and supervises with
        per-ego labels in its own frame (``*_single`` arrays, the
        reference's supervise_single layout). Gradients, BN statistics and
        loss scalars are pmean'd over BOTH mesh axes — the data-parallel
        all-reduce (reference train_ddp.py:120-125) and the multi-agent
        exchange ride the same ICI.

        batch layout (all sharded P('data', 'agent') where (B, L, ...)):
          points (B,L,P,4), point_mask, agent_mask (B,L),
          pairwise_t_matrix (B,L,L,4,4),
          pos/neg_equal_one_single (B,L,Hf,Wf,A), targets_single.
        Returns jitted (state, batch, key) -> (state, losses).
        """
        import optax

        hm = self.lidar_range[4] - self.lidar_range[1]
        wm = self.lidar_range[3] - self.lidar_range[0]

        def step(state, points, point_mask, agent_mask, pairwise,
                 pos_s, neg_s, tgt_s, key):
            i = jax.lax.axis_index("agent")
            key = jax.random.fold_in(key, state.step)

            def loss_fn(params):
                feat, msg, lstats = self._local_train_apply(
                    params, state.batch_stats,
                    {"points": points, "point_mask": point_mask}, True,
                )
                # [PHYSICAL COMM BOUNDARY] fp16-quantizable message gather
                msgs = self._from_wire(jax.lax.all_gather(
                    self._to_wire(msg[:, 0]), "agent", axis=1, tiled=False
                ))
                amask = jax.lax.all_gather(
                    agent_mask[:, 0], "agent", axis=1, tiled=False
                )
                pairwise_full = jax.lax.all_gather(
                    pairwise[:, 0], "agent", axis=1, tiled=False
                )
                affine = normalize_pairwise_tfm(
                    pairwise_full, hm, wm, 1.0
                ).astype(jnp.float32)
                affine_rows = jnp.roll(
                    jnp.roll(affine, -i, axis=1), -i, axis=2
                )
                msgs_r = jnp.roll(msgs, -i, axis=1)
                amask_r = jnp.roll(amask, -i, axis=1)
                cv = {"params": params["collab"]}
                if state.batch_stats["collab"]:
                    cv["batch_stats"] = state.batch_stats["collab"]
                (cls, reg, dirp), cmut = self.collab.apply(
                    cv, feat, msgs_r, affine_rows, amask_r, True,
                    rngs={"diffusion": jax.random.fold_in(key, i)},
                    mutable=["batch_stats"],
                )
                out = {"cls_preds": cls, "reg_preds": reg,
                       "dir_preds": dirp}
                target = {"pos_equal_one": pos_s[:, 0],
                          "neg_equal_one": neg_s[:, 0],
                          "targets": tgt_s[:, 0]}
                losses = criterion(out, target)
                stats = {"local": lstats,
                         "collab": dict(cmut.get("batch_stats", {}))}
                return losses["total_loss"], (losses, stats)

            grads, (losses, stats) = jax.grad(
                loss_fn, has_aux=True
            )(state.params)
            # DDP analog: one all-reduce over the whole mesh
            grads = jax.lax.pmean(grads, ("data", "agent"))
            stats = jax.lax.pmean(stats, ("data", "agent"))
            losses = jax.lax.pmean(losses, ("data", "agent"))
            updates, new_opt = tx.update(grads, state.opt_state,
                                         state.params)
            new_params = optax.apply_updates(state.params, updates)
            new_state = state.replace(
                step=state.step + 1, params=new_params,
                batch_stats=stats, opt_state=new_opt,
            )
            return new_state, losses

        data_specs = (P("data", "agent"),) * 7
        fn = shard_map(
            step, mesh=self.mesh,
            in_specs=(P(),) + data_specs + (P(),),
            out_specs=(P(), P()),
        )
        jitted = jax.jit(fn)

        def train_step(state, batch, key):
            return jitted(
                state, batch["points"], batch["point_mask"],
                batch["agent_mask"], batch["pairwise_t_matrix"],
                batch["pos_equal_one_single"],
                batch["neg_equal_one_single"],
                batch["targets_single"], key,
            )

        return train_step


class HeteroLocalNet(nn.Module):
    """Per-device modality dispatch: each device runs ONLY its own agent's
    encoder (flax ``nn.cond`` — one branch executes at runtime). Both
    encoders' parameters are replicated everywhere (they are a few MB;
    the per-frame sensor data and BEV activations are what stay local)."""

    lidar: AgentLocalNet
    camera: CameraAgentLocalNet

    @nn.compact
    def __call__(self, points, point_mask, camera_inputs: Dict[str, Any],
                 is_camera, train: bool = False):
        def cam_fn(mdl, pts, msk, cams):
            return mdl.camera(cams, train)

        def lidar_fn(mdl, pts, msk, cams):
            return mdl.lidar(pts, msk, train)

        if self.is_initializing():
            # init both branches (nn.cond requires identical variable
            # structure across branches, so creation happens unconditionally)
            fl, ml = lidar_fn(self, points, point_mask, camera_inputs)
            fc, mc = cam_fn(self, points, point_mask, camera_inputs)
            sel = jnp.asarray(is_camera)
            return (jnp.where(sel, fc, fl), jnp.where(sel, mc, ml))
        return nn.cond(is_camera, cam_fn, lidar_fn, self,
                       points, point_mask, camera_inputs)


class HeteroAgentSPMDPipeline(AgentSPMDPipeline):
    """Heterogeneous agents over ICI: agent slot i's modality is fixed by
    ``agent_modalities`` ('lidar' | 'camera'); the device holding slot i
    runs that modality's encoder via ``nn.cond`` on its agent index, and
    only the 2-channel messages cross chips. The collab net (diffusion +
    fusion + heads) is modality-agnostic — the GenComm property that makes
    new-agent-type integration cheap (BASELINE.md poster #P/#F columns)."""

    CAMERA_KEYS = ("imgs", "rots", "trans", "intrins", "post_rots",
                   "post_trans")

    def __init__(self, local: HeteroLocalNet, collab: EgoCollabNet,
                 mesh: Mesh, lidar_range, agent_modalities: Tuple[str, ...],
                 quantize_msg_fp16: bool = False):
        super().__init__(local, collab, mesh, lidar_range,
                         quantize_msg_fp16=quantize_msg_fp16)
        assert len(agent_modalities) == self.n_agents
        self.agent_modalities = tuple(agent_modalities)
        self._is_cam = np.asarray(
            [m == "camera" for m in agent_modalities]
        )

    def init(self, rng, batch):
        pts = batch["points"][:, :1]
        msk = batch["point_mask"][:, :1]
        cams = {k: batch[k][:, :1] for k in self.CAMERA_KEYS}
        lv = self.local.init(
            {"params": rng}, pts, msk, cams, jnp.asarray(False), False,
        )
        feat, msg = self.local.apply(
            lv, pts, msk, cams, jnp.asarray(False), False,
        )
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
        hm = self.lidar_range[4] - self.lidar_range[1]
        wm = self.lidar_range[3] - self.lidar_range[0]
        is_cam_table = jnp.asarray(self._is_cam)

        def step(lv, cv, points, point_mask, cams, agent_mask, pairwise,
                 key):
            i = jax.lax.axis_index("agent")
            feat, msg = self.local.apply(
                lv, points, point_mask, cams, is_cam_table[i], False,
            )
            msgs = self._from_wire(jax.lax.all_gather(
                self._to_wire(msg[:, 0]), "agent", axis=1, tiled=False
            ))
            amask = jax.lax.all_gather(
                agent_mask[:, 0], "agent", axis=1, tiled=False
            )
            pairwise_full = jax.lax.all_gather(
                pairwise[:, 0], "agent", axis=1, tiled=False
            )
            affine = normalize_pairwise_tfm(
                pairwise_full, hm, wm, 1.0
            ).astype(jnp.float32)
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

        cam_specs = {k: P(None, "agent") for k in self.CAMERA_KEYS}
        specs_in = (
            P(), P(),
            P(None, "agent"), P(None, "agent"), cam_specs,
            P(None, "agent"), P(None, "agent"), P(),
        )
        specs_out = (P(None, "agent"), P(None, "agent"), P(None, "agent"))
        fn = shard_map(
            step, mesh=self.mesh, in_specs=specs_in, out_specs=specs_out,
        )
        cams = {k: batch[k] for k in self.CAMERA_KEYS}
        return jax.jit(fn)(
            variables["local"], variables["collab"],
            batch["points"], batch["point_mask"], cams,
            batch["agent_mask"], batch["pairwise_t_matrix"], rng,
        )
