"""True heterogeneous collaboration: PointPillars agent + SECOND agent."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gencomm_tpu.data.synthetic import SyntheticScenes
from gencomm_tpu.models.heter_baseline import HeterModel
from tests.test_model_forward import TINY, MODALITY_ARGS

M2_SECOND_ARGS = {
    "core_method": "second",
    "encoder_args": {
        # z voxel 0.1 over 4 m -> sparse D=41, same z path as full-scale
        "voxel_size": [0.2, 0.2, 0.1],
        "lidar_range": list(TINY.lidar_range),
        "max_voxels": 4096,
        "spconv": {"num_features_out": 32},
    },
    "backbone_args": {
        "layer_nums": [2, 2],
        "layer_strides": [1, 2],
        "num_filters": [32, 64],
        "upsample_strides": [1, 2],
        "num_upsample_filter": [32, 32],
    },
    "shrink_header": {
        "kernal_size": [3], "stride": [1], "padding": [1],
        "dim": [64], "input_dim": 64,
    },
}


@pytest.fixture(scope="module")
def hetero_batch():
    scenes = SyntheticScenes(TINY)
    b = scenes.sample(seed=5, batch_size=1)
    # agent 0 uses m1 (pillars), agent 1 uses m2 (SECOND)
    m1_mask = b["agent_mask"].copy()
    m1_mask[:, 1:] = False
    m2_mask = b["agent_mask"].copy()
    m2_mask[:, 0] = False
    b["modality_mask_m1"] = m1_mask
    b["points_m2"] = b["points_m1"].copy()
    b["point_mask_m2"] = b["point_mask_m1"].copy()
    b["modality_mask_m2"] = m2_mask
    return scenes, {k: jnp.asarray(v) for k, v in b.items()}


def test_hetero_pillar_plus_second_gencomm(hetero_batch):
    scenes, batch = hetero_batch
    model = HeterModel(
        modality_args={
            "m1": dict(MODALITY_ARGS["m1"], core_method="point_pillar"),
            "m2": M2_SECOND_ARGS,
        },
        fusion_method="att",
        fusion_args={"att": {"feat_dim": 64}},
        lidar_range=TINY.lidar_range,
        anchor_number=2,
        in_head=64,
        use_gencomm=True,
    )
    rngs = {
        "params": jax.random.PRNGKey(0),
        "diffusion": jax.random.PRNGKey(1),
        "dropout": jax.random.PRNGKey(2),
    }
    variables = jax.jit(lambda: model.init(rngs, batch, train=False))()
    out = jax.jit(
        lambda v, b: model.apply(
            v, b, train=False,
            rngs={"diffusion": jax.random.PRNGKey(3)},
        )
    )(variables, batch)
    hp, wp = scenes.anchors.shape[:2]
    assert out["cls_preds"].shape == (1, hp, wp, 2)
    assert bool(jnp.isfinite(out["cls_preds"]).all())
    # per-modality branches both contributed params
    assert "branch_m1" in variables["params"]
    assert "branch_m2" in variables["params"]
    assert "message_extractor_m1" in variables["params"]
    assert "message_extractor_m2" in variables["params"]

