"""Hetero collaboration baselines: BackAlign and CodeFilling variants of
HeterModel, plus the UMGM quantizer itself."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gencomm_tpu.data.synthetic import SyntheticScenes
from gencomm_tpu.models.heter_baseline import HeterModel, build_model
from gencomm_tpu.models.codebook import UMGMQuantizer
from gencomm_tpu.loss.point_pillar_loss import PointPillarCodebookLoss
from gencomm_tpu.train import trainer
from tests.test_model_forward import TINY, MODALITY_ARGS, LOSS_ARGS

# heavy suite: excluded from the fast subset (`pytest -m "not slow"`, VERDICT r3 #9)
pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def batch():
    scenes = SyntheticScenes(TINY)
    host = scenes.sample(seed=11, batch_size=1)
    return {k: jnp.asarray(v) for k, v in host.items()}


def test_umgm_quantizer_roundtrip():
    q = UMGMQuantizer(channel=32, seg_num=2, dict_sizes=(16, 16, 16))
    x = jax.random.normal(jax.random.PRNGKey(0), (64, 32))
    v = q.init({"params": jax.random.PRNGKey(1),
                "dropout": jax.random.PRNGKey(2)}, x, train=True)
    restored, codes, loss = q.apply(v, x, train=False)
    assert restored.shape == x.shape
    assert len(codes) == 3 and codes[0].shape == (64, 2)
    assert np.isfinite(float(loss))
    # training mode (gumbel ST) must be differentiable
    def f(params):
        r, _, l = q.apply({"params": params}, x, train=True,
                          rngs={"dropout": jax.random.PRNGKey(3)})
        return l
    g = jax.grad(f)(v["params"])
    gnorm = sum(float(jnp.abs(x).sum()) for x in jax.tree_util.tree_leaves(g))
    assert np.isfinite(gnorm) and gnorm > 0


def test_codebook_model_forward_and_loss(batch):
    model = HeterModel(
        modality_args=MODALITY_ARGS,
        fusion_method="att",
        fusion_args={"att": {"feat_dim": 64}},
        lidar_range=TINY.lidar_range,
        anchor_number=2,
        in_head=64,
        use_codebook=True,
        codebook_seg=2,
        codebook_dict_sizes=(16, 16, 16),
        use_comm_mask=True,
    )
    v = model.init({"params": jax.random.PRNGKey(0),
                    "dropout": jax.random.PRNGKey(1)}, batch, train=False)
    out = model.apply(v, batch, train=False)
    assert np.isfinite(np.asarray(out["cls_preds"])).all()
    assert "codebook_loss" in out and np.isfinite(float(out["codebook_loss"]))
    assert 0.0 <= float(out["comm_rate"]) <= 1.0

    target = {k: batch[k] for k in ("pos_equal_one", "neg_equal_one",
                                    "targets")}
    losses = PointPillarCodebookLoss(LOSS_ARGS)(out, target)
    assert "codebook_loss" in losses
    assert np.isfinite(float(losses["total_loss"]))

    # the code indices are the transmitted payload: surfaced per agent
    # with entropy-coded CPM accounting (draco_compression.py analog)
    from gencomm_tpu.utils.misc_utils import code_stream_bytes

    codes = np.asarray(out["codebook_codes"])
    b, l = np.asarray(batch["agent_mask"]).shape
    assert codes.shape[:3] == (b, l, 3)  # 3 UMGM stages
    assert codes.min() >= 0 and codes.max() < 16
    sizes = code_stream_bytes(codes[0, 1:, 0], 16)
    n_codes = codes[0, 1:, 0].size
    assert sizes["raw_bytes"] == (n_codes * 4 + 7) // 8  # 4 bits/code
    assert 0 < sizes["entropy_bytes"] <= sizes["raw_bytes"]
    assert sizes["compressed_bytes"] > 0


def test_gradient_scale_reverses_gradients():
    from gencomm_tpu.models.mpda import gradient_scale

    g = jax.grad(lambda x: gradient_scale(x, -9.1).sum())(jnp.ones(4))
    np.testing.assert_allclose(np.asarray(g), -9.1 * np.ones(4), rtol=1e-6)


def test_mpda_model_forward_and_loss(batch):
    from gencomm_tpu.loss.point_pillar_loss import PointPillarMPDALoss

    model = HeterModel(
        modality_args=MODALITY_ARGS,
        fusion_method="att",
        fusion_args={"att": {"feat_dim": 64}},
        lidar_range=TINY.lidar_range,
        anchor_number=2,
        in_head=64,
        use_mpda=True,
        mpda_window_size=5,
    )
    v = model.init({"params": jax.random.PRNGKey(0),
                    "dropout": jax.random.PRNGKey(1)}, batch, train=False)
    out = model.apply(v, batch, train=False)
    assert np.isfinite(np.asarray(out["cls_preds"])).all()
    assert out["da_feature"].shape[:2] == batch["agent_mask"].shape

    target = dict(batch)
    losses = PointPillarMPDALoss(LOSS_ARGS)(out, target)
    assert "da_loss" in losses
    assert np.isfinite(float(losses["total_loss"]))


def test_stamp_adapter_cycle_and_loss(batch):
    from gencomm_tpu.loss.point_pillar_loss import AdapterLoss
    from tests.test_heter_model import M2_SECOND_ARGS

    b2 = dict(batch)
    m1 = np.asarray(batch["agent_mask"]).copy()
    m1[:, 1:] = False
    m2 = np.asarray(batch["agent_mask"]).copy()
    m2[:, 0] = False
    b2["modality_mask_m1"] = jnp.asarray(m1)
    b2["points_m2"] = batch["points_m1"]
    b2["point_mask_m2"] = batch["point_mask_m1"]
    b2["modality_mask_m2"] = jnp.asarray(m2)

    stamp_cfg = {"core_method": "adapterconvnext",
                 "args": {"in_channels": 64, "out_channels": 64,
                          "dim": 32, "num_of_blocks": 1, "kernel_size": 3}}
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
        use_stamp=True,
        ego_modality="m1",
        stamp_args={"m2": {"adapter": stamp_cfg, "reverter": stamp_cfg}},
    )
    v = model.init({"params": jax.random.PRNGKey(0),
                    "dropout": jax.random.PRNGKey(1)}, b2, train=False)
    assert "adapter_m2" in v["params"] and "reverter_m2" in v["params"]
    out, _ = model.apply(v, b2, train=True, mutable=["batch_stats"],
                         rngs={"dropout": jax.random.PRNGKey(2)})
    assert out["stamp_M2P_m2"].shape == out["stamp_FP"].shape
    assert out["stamp_M2P2M_m2"].shape == out["stamp_FM_m2"].shape
    losses = AdapterLoss({"alpha_P2M": 1.0, "alpha_M2P2M": 1.0,
                          "alpha_M2P": 1.0})(out, {})
    assert np.isfinite(float(losses["total_loss"]))
    assert float(losses["total_loss"]) > 0
    # eval pass (no cycle tensors, adapter still applied)
    out_eval = model.apply(v, b2, train=False)
    assert np.isfinite(np.asarray(out_eval["cls_preds"])).all()
    assert "stamp_FM_m2" not in out_eval


def test_backalign_build_and_eval_corruption(batch):
    hypes = {"model": {
        "core_method": "heter_model_baseline_w_backalign",
        "args": {
            "ego_modality": "m1",
            "lidar_range": list(TINY.lidar_range),
            "m1": MODALITY_ARGS["m1"],
            "fusion_method": "att",
            "att": {"feat_dim": 64},
            "in_head": 64,
            "anchor_number": 2,
            "dir_args": {"num_bins": 2},
            "missing_message": True,
        },
    }}
    model = build_model(hypes)
    assert not model.use_gencomm
    assert model.feature_missing_rate == 0.05
    assert model.feature_noise_std == 3.0
    v = model.init({"params": jax.random.PRNGKey(0),
                    "dropout": jax.random.PRNGKey(1)}, batch, train=False)
    out = model.apply(v, batch, train=False,
                      rngs={"dropout": jax.random.PRNGKey(2)})
    assert np.isfinite(np.asarray(out["cls_preds"])).all()
    # freeze schedule
    frozen = trainer.backalign_frozen_modules(hypes)
    assert frozen == ["fusion_net", "heads", "branch_m1"]
    pred = trainer.freeze_exact(frozen)
    assert pred(("heads", "cls", "kernel"))
    assert not pred(("heads_single", "cls", "kernel"))
    assert not pred(("branch_m2", "encoder", "kernel"))
