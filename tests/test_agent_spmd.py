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

from gencomm_tpu.parallel.agent_comm import (
    AgentLocalNet, EgoCollabNet, AgentSPMDPipeline,
)
from gencomm_tpu.utils.transformation_utils import (
    get_pairwise_transformation, normalize_pairwise_tfm,
)

RANGE = (-16.0, -8.0, -3.0, 16.0, 8.0, 1.0)
L = 4


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
    local = AgentLocalNet(
        encoder_args={"voxel_size": [0.4, 0.4, 4.0],
                      "lidar_range": list(RANGE),
                      "pillar_vfe": {"num_filters": [16]}},
        backbone_args={"layer_nums": [1, 1], "layer_strides": [2, 2],
                       "num_filters": [16, 32], "upsample_strides": [1, 2],
                       "num_upsample_filter": [16, 16]},
        shrink_args={"dim": [32], "kernal_size": [3], "stride": [2]},
    )
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
