"""bf16 (--half) inference path: the full GenComm graph in bf16 activations.

VERDICT r4 item 1: the flagship bench headline runs --half; these tests pin
the semantics on CPU at tiny shapes — params stay fp32, heads emit fp32,
and the bf16 predictions track the fp32 ones closely enough that score
ORDER (the AP-relevant statistic) is preserved. The full-scale evidence
lives in measurements/bf16_parity.json (scripts/bf16_parity.py).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gencomm_tpu.data.synthetic import SyntheticConfig, SyntheticScenes
from gencomm_tpu.models.heter_baseline import HeterModel

TINY = SyntheticConfig(
    lidar_range=(-16.0, -8.0, -3.0, 16.0, 8.0, 1.0),
    max_cav=2,
    num_agents=2,
    points_per_agent=1024,
    num_vehicles=3,
    points_per_vehicle=150,
    comm_range=10.0,
)

MODALITY_ARGS = {
    "m1": {
        "encoder_args": {
            "voxel_size": [0.4, 0.4, 4.0],
            "lidar_range": list(TINY.lidar_range),
            "pillar_vfe": {"use_norm": True, "num_filters": [32]},
        },
        "backbone_args": {
            "layer_nums": [1, 1],
            "layer_strides": [2, 2],
            "num_filters": [32, 64],
            "upsample_strides": [1, 2],
            "num_upsample_filter": [32, 32],
        },
        "shrink_header": {
            "kernal_size": [3], "stride": [2], "padding": [1],
            "dim": [64], "input_dim": 64,
        },
    }
}


def _model(half):
    return HeterModel(
        modality_args=MODALITY_ARGS,
        fusion_method="att",
        fusion_args={"att": {"feat_dim": 64}},
        lidar_range=TINY.lidar_range,
        anchor_number=2,
        in_head=64,
        use_gencomm=True,
        use_enhancer=True,
        half=half,
    )


def test_half_gencomm_matches_fp32():
    scenes = SyntheticScenes(TINY)
    batch = {k: jnp.asarray(v) for k, v in scenes.sample(0, 1).items()}
    rngs = {"diffusion": jax.random.PRNGKey(3),
            "dropout": jax.random.PRNGKey(7)}

    var = _model(False).init(
        {"params": jax.random.PRNGKey(0), **rngs}, batch, train=False)
    out32 = _model(False).apply(var, batch, train=False, rngs=rngs)
    out16 = _model(True).apply(var, batch, train=False, rngs=rngs)

    # same param tree works for both graphs; heads emit fp32 either way
    assert out16["cls_preds"].dtype == jnp.float32
    assert out16["reg_preds"].dtype == jnp.float32
    # generated features carry the compute dtype
    assert out16["pred_feature"].dtype == jnp.bfloat16

    p32 = np.asarray(jax.nn.sigmoid(out32["cls_preds"])).ravel()
    p16 = np.asarray(jax.nn.sigmoid(out16["cls_preds"])).ravel()
    assert np.all(np.isfinite(p16))
    # class probabilities track fp32 (bf16 has ~2-3 decimal digits; the
    # chain is shallow so drift stays small even at random init)
    assert np.abs(p16 - p32).max() < 0.12
    # score ORDER preserved: top-50 cells overlap
    t32 = set(np.argsort(-p32)[:50])
    t16 = set(np.argsort(-p16)[:50])
    assert len(t32 & t16) >= 35


@pytest.mark.slow
def test_half_gencomm_train_step_runs():
    """Gen/detection losses accept bf16 pred/gt features (cast in loss)."""
    from gencomm_tpu.loss.point_pillar_loss import PointPillarGenCommLoss

    scenes = SyntheticScenes(TINY)
    batch = {k: jnp.asarray(v) for k, v in scenes.sample(1, 1).items()}
    rngs = {"diffusion": jax.random.PRNGKey(3),
            "dropout": jax.random.PRNGKey(7)}
    model = _model(True)
    var = model.init(
        {"params": jax.random.PRNGKey(0), **rngs}, batch, train=True)
    crit = PointPillarGenCommLoss({
        "pos_cls_weight": 2.0,
        "cls": {"alpha": 0.25, "gamma": 2.0, "weight": 2.0},
        "reg": {"sigma": 3.0, "weight": 2.0},
        "generate_weight": 1.0,
    })

    def loss_fn(params):
        out, _ = model.apply(
            {"params": params, "batch_stats": var.get("batch_stats", {})},
            batch, train=True, rngs=rngs,
            mutable=["batch_stats"],
        )
        target = {"pos_equal_one": batch["pos_equal_one"],
                  "neg_equal_one": batch["neg_equal_one"],
                  "targets": batch["targets"]}
        return crit(out, target)["total_loss"]

    loss, grads = jax.value_and_grad(loss_fn)(var["params"])
    assert np.isfinite(float(loss))
    gnorm = sum(float(jnp.sum(g.astype(jnp.float32) ** 2))
                for g in jax.tree_util.tree_leaves(grads))
    assert np.isfinite(gnorm) and gnorm > 0
