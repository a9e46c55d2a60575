"""HEAL pyramid family: PyramidFusion, HeterPyramidModel, pyramid loss."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gencomm_tpu.data.synthetic import SyntheticScenes
from gencomm_tpu.models.heter_pyramid import HeterPyramidModel
from gencomm_tpu.models.fuse.pyramid import PyramidFusion, weighted_fuse
from gencomm_tpu.loss.pyramid_loss import PointPillarPyramidLoss
from tests.test_model_forward import TINY

PYR_MODALITY = {
    "m1": {
        "core_method": "point_pillar",
        "encoder_args": {
            "voxel_size": [0.4, 0.4, 4.0],
            "lidar_range": list(TINY.lidar_range),
            "pillar_vfe": {"use_norm": True, "num_filters": [32]},
        },
        "backbone_args": {
            "layer_nums": [1, 1],
            "layer_strides": [2, 2],
            "num_filters": [32, 48],
            "upsample_strides": [1, 2],
            "num_upsample_filter": [32, 32],
        },
        "aligner_args": {"core_method": "identity"},
    }
}

FUSION_BACKBONE = {
    "resnext": True,
    "layer_nums": [1, 1],
    "layer_strides": [2, 2],
    "num_filters": [64, 96],
    "upsample_strides": [1, 2],
    "num_upsample_filter": [64, 64],
}

LOSS_ARGS = {
    "pos_cls_weight": 2.0,
    "cls": {"alpha": 0.25, "gamma": 2.0, "weight": 2.0},
    "reg": {"sigma": 3.0, "weight": 2.0},
    "dir": {
        "weight": 0.2,
        "args": {"dir_offset": 0.7853, "num_bins": 2, "anchor_yaw": [0, 90]},
    },
    "pyramid": {"relative_downsample": [1, 2], "weight": [0.4, 0.2]},
}


@pytest.fixture(scope="module")
def pyr_setup():
    scenes = SyntheticScenes(TINY)
    host = scenes.sample(seed=3, batch_size=1)
    batch = {k: jnp.asarray(v) for k, v in host.items()}
    model = HeterPyramidModel(
        modality_args=PYR_MODALITY,
        fusion_backbone=FUSION_BACKBONE,
        lidar_range=TINY.lidar_range,
        shrink_args=None,
        anchor_number=2,
        collab=True,
    )
    variables = model.init(
        {"params": jax.random.PRNGKey(0)}, batch, train=False
    )
    return scenes, model, variables, batch


def test_pyramid_collab_forward(pyr_setup):
    scenes, model, variables, batch = pyr_setup
    out = model.apply(variables, batch, train=False)
    cls = out["cls_preds"]
    assert cls.shape[0] == 1
    assert np.isfinite(np.asarray(cls)).all()
    assert len(out["occ_single_list"]) == 2
    # occ maps cover all agent slots
    b, l = batch["agent_mask"].shape
    assert out["occ_single_list"][0].shape[0] == b * l


def test_pyramid_single_mode(pyr_setup):
    scenes, _, _, batch = pyr_setup
    model = HeterPyramidModel(
        modality_args=PYR_MODALITY,
        fusion_backbone=FUSION_BACKBONE,
        lidar_range=TINY.lidar_range,
        collab=False,
    )
    variables = model.init({"params": jax.random.PRNGKey(0)}, batch,
                           train=False)
    out = model.apply(variables, batch, train=False)
    b, l = batch["agent_mask"].shape
    assert out["cls_preds"].shape[0] == b * l
    assert np.isfinite(np.asarray(out["cls_preds"])).all()


def test_pyramid_loss_modes(pyr_setup):
    scenes, model, variables, batch = pyr_setup
    out = model.apply(variables, batch, train=True,
                      rngs={"dropout": jax.random.PRNGKey(1)},
                      mutable=["batch_stats"])[0]
    target = {k: batch[k] for k in ("pos_equal_one", "neg_equal_one",
                                    "targets")}
    crit = PointPillarPyramidLoss(LOSS_ARGS)
    losses = crit(out, target)
    assert np.isfinite(float(losses["total_loss"]))

    # collab "_single" pass: occupancy-only supervision over per-agent maps
    b, l = batch["agent_mask"].shape
    h, w = out["occ_single_list"][0].shape[1:3]
    tgt_single = {
        "pos_equal_one": jnp.zeros((b * l, h, w, 2)).at[:, 2, 2, 0].set(1.0),
        "neg_equal_one": jnp.ones((b * l, h, w, 2)).at[:, 2, 2, :].set(0.0),
    }
    occ_losses = crit(out, tgt_single, suffix="_single")
    assert np.isfinite(float(occ_losses["pyramid_loss"]))
    assert float(occ_losses["pyramid_loss"]) > 0


def test_weighted_fuse_masks_invalid_agents():
    b, l, h, w, c = 1, 3, 8, 8, 4
    feat = jnp.ones((b, l, h, w, c))
    # agent 1 has huge score but is masked out
    score = jnp.ones((b, l, h, w, 1)).at[:, 1].set(100.0)
    feat = feat.at[:, 1].set(1000.0)
    eye = jnp.tile(
        jnp.asarray([[1.0, 0, 0], [0, 1.0, 0]]), (b, l, l, 1, 1)
    )
    mask = jnp.asarray([[True, False, True]])
    fused = weighted_fuse(feat, score, eye, mask)
    assert np.isfinite(np.asarray(fused)).all()
    assert float(jnp.abs(fused).max()) < 10.0  # masked agent contributed 0

    # no valid agents at all -> zeros, not NaN
    fused0 = weighted_fuse(feat, score, eye, jnp.zeros((b, l), bool))
    assert float(jnp.abs(fused0).max()) == 0.0


def test_heter_ms_model_forward():
    """heter_model_baseline_ms: per-modality branch -> MsFusion (per-level
    att fusion over the fusion backbone) -> heads, with pre-fusion single
    supervision (heter_model_baseline_ms.py:188-210)."""
    from gencomm_tpu.models.heter_pyramid import HeterMsModel

    scenes = SyntheticScenes(TINY)
    host = scenes.sample(seed=5, batch_size=1)
    batch = {k: jnp.asarray(v) for k, v in host.items()}
    model = HeterMsModel(
        modality_args=PYR_MODALITY,
        fusion_backbone={
            "layer_nums": [1, 1],
            "layer_strides": [1, 2],
            "num_filters": [64, 96],
            "upsample_strides": [1, 2],
            "num_upsample_filter": [48, 48],
        },
        lidar_range=TINY.lidar_range,
        shrink_args=None,
        anchor_number=2,
        fusion_method="att",
        supervise_single=True,
    )
    variables = model.init({"params": jax.random.PRNGKey(0)}, batch,
                           train=False)
    out = model.apply(variables, batch, train=False)
    b, l = batch["agent_mask"].shape
    assert out["cls_preds"].shape[0] == b
    assert out["cls_preds"].shape[-1] == 2
    assert out["reg_preds"].shape[-1] == 14
    assert out["cls_preds_single"].shape[0] == b * l
    for v in out.values():
        assert np.isfinite(np.asarray(v)).all()

    # padded agent slots must not leak into the fused output
    pert = dict(batch)
    pm = np.asarray(batch["points_m1"]).copy()
    mask = np.asarray(batch["agent_mask"])
    pad_slots = np.where(~mask[0])[0]
    if pad_slots.size:
        pm[0, pad_slots[0]] += 37.0
        pert["points_m1"] = jnp.asarray(pm)
        out2 = model.apply(variables, pert, train=False)
        np.testing.assert_allclose(
            np.asarray(out["cls_preds"]), np.asarray(out2["cls_preds"]),
            rtol=1e-5, atol=1e-5,
        )
