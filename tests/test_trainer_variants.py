"""KD and gradient-matching training protocols + data augmentor."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gencomm_tpu.data.synthetic import SyntheticScenes
from gencomm_tpu.models.heter_baseline import HeterModel
from gencomm_tpu.train import trainer
from tests.test_model_forward import TINY, MODALITY_ARGS, LOSS_ARGS

# heavy suite: excluded from the fast subset (`pytest -m "not slow"`, VERDICT r3 #9)
pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def setup():
    scenes = SyntheticScenes(TINY)
    host = scenes.sample(seed=41, batch_size=1)
    batch = {k: jnp.asarray(v) for k, v in host.items()}
    return host, batch


def test_kd_train_step(setup):
    from gencomm_tpu.loss.point_pillar_loss import PointPillarDiscoNetLoss

    host, batch = setup
    kwargs = dict(
        modality_args=MODALITY_ARGS, fusion_method="att",
        fusion_args={"att": {"feat_dim": 64}},
        lidar_range=TINY.lidar_range, anchor_number=2, in_head=64,
        use_gencomm=True,
    )
    student = HeterModel(**kwargs)
    teacher = HeterModel(**kwargs)
    tx = trainer.make_optimizer({"optimizer": {"core_method": "Adam",
                                               "lr": 1e-3}})
    state = trainer.create_train_state(student, host, jax.random.PRNGKey(0),
                                       tx)
    tvars = trainer.cpu_init(teacher, host, jax.random.PRNGKey(5),
                             train=False)
    crit = PointPillarDiscoNetLoss(dict(LOSS_ARGS, kd={"weight": 0.5}))
    step = trainer.make_kd_train_step(student, teacher, tvars, crit, tx)
    state, losses = step(state, batch, jax.random.PRNGKey(1))
    assert "kd_loss" in losses
    assert np.isfinite(float(losses["total_loss"]))
    assert float(losses["kd_loss"]) != 0.0


def test_gmatch_train_step(setup):
    from gencomm_tpu.loss.point_pillar_loss import PointPillarGMatchLoss

    host, batch = setup
    model = HeterModel(
        modality_args=MODALITY_ARGS, fusion_method="att",
        fusion_args={"att": {"feat_dim": 64}},
        lidar_range=TINY.lidar_range, anchor_number=2, in_head=64,
        use_gencomm=True, gmatch=True,
    )
    tx = trainer.make_optimizer({"optimizer": {"core_method": "Adam",
                                               "lr": 1e-3}})
    state = trainer.create_train_state(model, host, jax.random.PRNGKey(0),
                                       tx)
    crit = PointPillarGMatchLoss(LOSS_ARGS)
    step = trainer.make_gmatch_train_step(model, crit, tx)
    state, losses = step(state, batch, jax.random.PRNGKey(1))
    for k in ("loss_S", "loss_T", "gen_loss", "grad_match_loss"):
        assert np.isfinite(float(losses[k])), k
    assert float(losses["grad_match_loss"]) > 0


def test_data_augmentor():
    from gencomm_tpu.data.augmentor import DataAugmentor

    rng = np.random.RandomState(0)
    pts = rng.randn(100, 4).astype(np.float32)
    boxes = np.array([[2.0, 1.0, 0.0, 1.5, 1.8, 4.0, 0.3]], np.float32)
    aug = DataAugmentor([
        {"NAME": "random_world_flip"},
        {"NAME": "random_world_rotation",
         "WORLD_ROT_ANGLE": [-0.5, 0.5]},
        {"NAME": "random_world_scaling",
         "WORLD_SCALE_RANGE": [0.9, 1.1]},
    ], train=True)
    p2, b2 = aug(pts, boxes)
    assert p2.shape == pts.shape and b2.shape == boxes.shape
    # distances from origin scale consistently for points and boxes
    assert not np.allclose(p2, pts)
    # eval mode is identity
    aug_eval = DataAugmentor([{"NAME": "random_world_flip"}], train=False)
    p3, b3 = aug_eval(pts, boxes)
    np.testing.assert_array_equal(p3, pts)

    with pytest.raises(KeyError):
        DataAugmentor([{"NAME": "nope"}])
