"""Native multi-agent communication over ICI collectives (shard_map).

Runs the one-agent-per-device SPMD pipeline on a ('data', 'agent') CPU
mesh and checks slot i of the sharded output equals an unsharded
single-process computation with agent i as ego — i.e. the all_gather of
2-channel messages reproduces the reference's simulated communication.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import Mesh

# shard_map compiles dominate (~9 min for this file on a 1-core VM);
# excluded from the fast subset (`pytest -m "not slow"`, VERDICT r3 #9)
pytestmark = pytest.mark.slow

from gencomm_tpu.parallel.agent_comm import (
    AgentLocalNet, CameraAgentLocalNet, EgoCollabNet, AgentSPMDPipeline,
    HeteroLocalNet, HeteroAgentSPMDPipeline,
)
from gencomm_tpu.utils.transformation_utils import (
    get_pairwise_transformation, normalize_pairwise_tfm,
)

RANGE = (-16.0, -8.0, -3.0, 16.0, 8.0, 1.0)
L = 4

LIDAR_ARGS = dict(
    encoder_args={"voxel_size": [0.4, 0.4, 4.0],
                  "lidar_range": list(RANGE),
                  "pillar_vfe": {"num_filters": [16]}},
    backbone_args={"layer_nums": [1, 1], "layer_strides": [2, 2],
                   "num_filters": [16, 32], "upsample_strides": [1, 2],
                   "num_upsample_filter": [16, 16]},
    shrink_args={"dim": [32], "kernal_size": [3], "stride": [2]},
)


def make_batch(rng, b=2, p=512):
    pts = np.zeros((b, L, p, 4), np.float32)
    pts[..., 0] = rng.uniform(-15, 15, (b, L, p))
    pts[..., 1] = rng.uniform(-7, 7, (b, L, p))
    pts[..., 2] = rng.uniform(-2.5, 0.5, (b, L, p))
    pts[..., 3] = rng.rand(b, L, p)
    poses = np.zeros((L, 6))
    poses[:, 0] = np.arange(L) * 3.0
    poses[:, 4] = np.arange(L) * 10.0  # yaw degrees
    pairwise = get_pairwise_transformation(poses, L, L).astype(np.float32)
    return {
        "points": jnp.asarray(pts),
        "point_mask": jnp.ones((b, L, p), bool),
        "agent_mask": jnp.ones((b, L), bool),
        "pairwise_t_matrix": jnp.asarray(
            np.broadcast_to(pairwise, (b, L, L, 4, 4))
        ),
    }


@pytest.fixture(scope="module")
def pipeline():
    devices = np.array(jax.devices()[:8]).reshape(2, 4)
    mesh = Mesh(devices, ("data", "agent"))
    local = AgentLocalNet(**LIDAR_ARGS)
    collab = EgoCollabNet(feat_dim=32, anchor_number=2)
    pipe = AgentSPMDPipeline(local, collab, mesh, RANGE)
    batch = make_batch(np.random.RandomState(0))
    variables = pipe.init(jax.random.PRNGKey(0), batch)
    return pipe, variables, batch


def test_spmd_runs_and_is_finite(pipeline):
    pipe, variables, batch = pipeline
    key = jax.random.PRNGKey(7)
    cls, reg, dirp = pipe.apply(variables, batch, key)
    assert cls.shape[:2] == (2, L)
    assert np.isfinite(np.asarray(cls)).all()
    assert np.isfinite(np.asarray(reg)).all()


def test_spmd_matches_unsharded_ego(pipeline):
    pipe, variables, batch = pipeline
    key = jax.random.PRNGKey(7)
    cls, _, _ = pipe.apply(variables, batch, key)

    # unsharded single-process replica for ego index 0 and 2
    hm = RANGE[4] - RANGE[1]
    wm = RANGE[3] - RANGE[0]
    feats, msgs = [], []
    for i in range(L):
        f, m = pipe.local.apply(
            variables["local"], batch["points"][:, i : i + 1],
            batch["point_mask"][:, i : i + 1], False,
        )
        feats.append(f)
        msgs.append(m[:, 0])
    msgs = jnp.stack(msgs, axis=1)  # (B, L, H, W, 2)
    affine = normalize_pairwise_tfm(
        batch["pairwise_t_matrix"], hm, wm, 1.0
    ).astype(jnp.float32)
    for ego in (0, 2):
        aff = jnp.roll(jnp.roll(affine, -ego, axis=1), -ego, axis=2)
        m_r = jnp.roll(msgs, -ego, axis=1)
        cls_ref, _, _ = pipe.collab.apply(
            variables["collab"], feats[ego], m_r, aff,
            batch["agent_mask"], False,
            rngs={"diffusion": jax.random.fold_in(key, ego)},
        )
        np.testing.assert_allclose(
            np.asarray(cls[:, ego]), np.asarray(cls_ref),
            atol=2e-4, rtol=2e-4,
        )


def test_spmd_fp16_wire_messages(pipeline):
    """fp16-on-the-wire: output close to the fp32-wire pipeline, and the
    CPM accounting reports exactly half the bytes."""
    pipe, variables, batch = pipeline
    key = jax.random.PRNGKey(7)
    cls32, _, _ = pipe.apply(variables, batch, key)

    qpipe = AgentSPMDPipeline(pipe.local, pipe.collab, pipe.mesh, RANGE,
                              quantize_msg_fp16=True)
    cls16, _, _ = qpipe.apply(variables, batch, key)
    assert np.isfinite(np.asarray(cls16)).all()
    # fp16 has ~3 decimal digits; messages are O(1) -> small logit delta
    np.testing.assert_allclose(np.asarray(cls16), np.asarray(cls32),
                               atol=5e-2, rtol=5e-2)
    assert not np.array_equal(np.asarray(cls16), np.asarray(cls32))

    b32 = pipe.cpm_bytes_per_sender(batch)
    b16 = qpipe.cpm_bytes_per_sender(batch)
    # message map is (H', W', 2) = (10, 20, 2)
    assert b32 == 10 * 20 * 2 * 4
    assert b16 == b32 // 2


def _scenes_batch(modalities, seed=0, b=2):
    from gencomm_tpu.data.synthetic import SyntheticConfig, SyntheticScenes

    cfg = SyntheticConfig(
        lidar_range=RANGE, voxel_size=(0.4, 0.4, 4.0), feature_stride=4,
        max_cav=L, num_agents=L, points_per_agent=512, num_vehicles=3,
        points_per_vehicle=120, comm_range=40.0, per_agent_labels=True,
        modalities=modalities,
    )
    scenes = SyntheticScenes(cfg)
    return scenes, scenes.sample(seed, b)


def test_spmd_train_step_through_shard_map():
    """The FULL train step through shard_map: per-ego supervised loss,
    gradients pmean'd over the mesh; loss decreases and params stay
    replicated (bitwise identical across devices)."""
    import optax

    from gencomm_tpu.loss.point_pillar_loss import PointPillarLoss

    devices = np.array(jax.devices()[:8]).reshape(2, 4)
    mesh = Mesh(devices, ("data", "agent"))
    local = AgentLocalNet(**LIDAR_ARGS)
    collab = EgoCollabNet(feat_dim=32, anchor_number=2)
    pipe = AgentSPMDPipeline(local, collab, mesh, RANGE,
                             quantize_msg_fp16=True)

    _, raw = _scenes_batch({"m1": {"sensor": "lidar"}})
    batch = {
        "points": jnp.asarray(raw["points_m1"]),
        "point_mask": jnp.asarray(raw["point_mask_m1"]),
        "agent_mask": jnp.asarray(raw["agent_mask"]),
        "pairwise_t_matrix": jnp.asarray(raw["pairwise_t_matrix"]),
        "pos_equal_one_single": jnp.asarray(raw["pos_equal_one_single"]),
        "neg_equal_one_single": jnp.asarray(raw["neg_equal_one_single"]),
        "targets_single": jnp.asarray(raw["targets_single"]),
    }
    criterion = PointPillarLoss({
        "pos_cls_weight": 2.0,
        "cls": {"alpha": 0.25, "gamma": 2.0, "weight": 1.0},
        "reg": {"sigma": 3.0, "weight": 2.0},
    })
    tx = optax.adam(2e-3)
    state = pipe.create_train_state(jax.random.PRNGKey(0), batch, tx)
    step = pipe.make_train_step(criterion, tx)

    key = jax.random.PRNGKey(11)
    losses0 = None
    state1 = state
    for i in range(8):
        state1, losses = step(state1, batch, key)
        if losses0 is None:
            losses0 = losses
    assert np.isfinite(float(losses["total_loss"]))
    assert float(losses["total_loss"]) < float(losses0["total_loss"])
    assert int(state1.step) == 8
    # params remain replicated: every device shard holds identical values
    p = jax.tree_util.tree_leaves(state1.params)[0]
    shards = [np.asarray(s.data) for s in p.addressable_shards]
    for s in shards[1:]:
        np.testing.assert_array_equal(shards[0], s)


CAM_GRID = {
    "xbound": [-16.0, 16.0, 0.4],
    "ybound": [-8.0, 8.0, 0.4],
    "zbound": [-10.0, 10.0, 20.0],
    "ddiscr": [2, 18, 16],
    "mode": "LID",
}
CAM_ARGS = dict(
    grid_conf=CAM_GRID,
    final_dim=(64, 96),
    backbone_args={"layer_nums": [1, 1], "layer_strides": [2, 2],
                   "num_filters": [32, 64], "upsample_strides": [1, 2],
                   "num_upsample_filter": [16, 16]},
    shrink_args={"dim": [32], "kernal_size": [3], "stride": [2]},
    lss_feat_ch=32,
)


@pytest.fixture(scope="module")
def hetero_pipeline():
    devices = np.array(jax.devices()[:8]).reshape(2, 4)
    mesh = Mesh(devices, ("data", "agent"))
    local = HeteroLocalNet(
        lidar=AgentLocalNet(**LIDAR_ARGS),
        camera=CameraAgentLocalNet(**CAM_ARGS),
    )
    collab = EgoCollabNet(feat_dim=32, anchor_number=2)
    # round-robin over (m1 lidar, m2 camera): slots 0,2 lidar / 1,3 camera
    pipe = HeteroAgentSPMDPipeline(
        local, collab, mesh, RANGE,
        agent_modalities=("lidar", "camera", "lidar", "camera"),
        quantize_msg_fp16=True,
    )
    _, raw = _scenes_batch({
        "m1": {"sensor": "lidar"},
        "m2": {"sensor": "camera", "final_dim": (64, 96), "ncam": 4,
               "focal": 60.0},
    })
    batch = {
        "points": jnp.asarray(raw["points_m1"]),
        "point_mask": jnp.asarray(raw["point_mask_m1"]),
        "agent_mask": jnp.asarray(raw["agent_mask"]),
        "pairwise_t_matrix": jnp.asarray(raw["pairwise_t_matrix"]),
    }
    for k in HeteroAgentSPMDPipeline.CAMERA_KEYS:
        batch[k] = jnp.asarray(raw[f"{k}_m2"])
    variables = pipe.init(jax.random.PRNGKey(0), batch)
    return pipe, variables, batch


def test_hetero_spmd_runs(hetero_pipeline):
    pipe, variables, batch = hetero_pipeline
    cls, reg, dirp = pipe.apply(variables, batch, jax.random.PRNGKey(3))
    assert cls.shape[:2] == (2, L)
    assert np.isfinite(np.asarray(cls)).all()


def test_hetero_spmd_matches_unsharded(hetero_pipeline):
    """Slot i of the hetero-sharded output == an unsharded replica where
    agent i's own-modality encoder ran in-process (camera agents really
    contribute LSS features; lidar agents PointPillars)."""
    pipe, variables, batch = hetero_pipeline
    key = jax.random.PRNGKey(3)
    cls, _, _ = pipe.apply(variables, batch, key)

    hm, wm = RANGE[4] - RANGE[1], RANGE[3] - RANGE[0]
    cams = {k: batch[k] for k in pipe.CAMERA_KEYS}
    feats, msgs = [], []
    for i in range(L):
        f, m = pipe.local.apply(
            variables["local"], batch["points"][:, i : i + 1],
            batch["point_mask"][:, i : i + 1],
            {k: v[:, i : i + 1] for k, v in cams.items()},
            jnp.asarray(pipe.agent_modalities[i] == "camera"), False,
        )
        feats.append(f)
        msgs.append(m[:, 0])
    # fp16 wire quantization applied exactly like the sharded path
    msgs = jnp.stack(msgs, axis=1).astype(jnp.float16).astype(jnp.float32)
    affine = normalize_pairwise_tfm(
        batch["pairwise_t_matrix"], hm, wm, 1.0
    ).astype(jnp.float32)
    for ego in (0, 1):
        aff = jnp.roll(jnp.roll(affine, -ego, axis=1), -ego, axis=2)
        m_r = jnp.roll(msgs, -ego, axis=1)
        cls_ref, _, _ = pipe.collab.apply(
            variables["collab"], feats[ego], m_r, aff,
            batch["agent_mask"], False,
            rngs={"diffusion": jax.random.fold_in(key, ego)},
        )
        np.testing.assert_allclose(
            np.asarray(cls[:, ego]), np.asarray(cls_ref),
            atol=2e-4, rtol=2e-4,
        )
