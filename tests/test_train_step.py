import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gencomm_tpu.data.synthetic import SyntheticConfig, SyntheticScenes
from gencomm_tpu.models.heter_baseline import HeterModel
from gencomm_tpu.loss.point_pillar_loss import PointPillarLoss
from gencomm_tpu.train import trainer, checkpoint
from flax.traverse_util import flatten_dict

from tests.test_model_forward import TINY, MODALITY_ARGS, LOSS_ARGS, _model

HYPES = {
    "optimizer": {"core_method": "Adam", "lr": 0.002,
                  "args": {"eps": 1e-10, "weight_decay": 1e-4}},
    "lr_scheduler": {"core_method": "multistep", "gamma": 0.1,
                     "step_size": [10, 15]},
}


@pytest.fixture(scope="module")
def setup():
    scenes = SyntheticScenes(TINY)
    batch = {k: jnp.asarray(v) for k, v in scenes.sample(0, 2).items()}
    model = _model()
    tx = trainer.make_optimizer(HYPES)
    state = trainer.create_train_state(model, batch, jax.random.PRNGKey(0), tx)
    criterion = PointPillarLoss(LOSS_ARGS)
    return model, tx, state, criterion, batch


def test_train_step_reduces_loss(setup):
    model, tx, state, criterion, batch = setup
    step = trainer.make_train_step(model, criterion, tx)
    losses0 = None
    for i in range(4):
        state, losses = step(state, batch, jax.random.PRNGKey(i))
        if losses0 is None:
            losses0 = losses
    assert np.isfinite(float(losses["total_loss"]))
    assert float(losses["total_loss"]) < float(losses0["total_loss"])


def test_freezing_blocks_updates(setup):
    model, _, state, criterion, batch = setup
    # NB: AttFusion is parameter-free, so the only trainable groups here are
    # branch_m1 and heads; freeze the encoder branch and expect heads to move.
    pred = trainer.freeze_by_prefixes(["branch_m1"])
    tx = trainer.make_optimizer(HYPES, frozen_predicate=pred)
    fstate = trainer.TrainState(
        step=state.step, params=state.params,
        batch_stats=state.batch_stats, opt_state=tx.init(state.params),
    )
    step = trainer.make_train_step(model, criterion, tx, frozen_predicate=pred)
    new_state, _ = step(fstate, batch, jax.random.PRNGKey(0))

    before = flatten_dict(jax.device_get(state.params))
    after = flatten_dict(jax.device_get(new_state.params))
    frozen_same = [np.allclose(before[k], after[k]) for k in before if pred(k)]
    trainable_changed = [
        not np.allclose(before[k], after[k]) for k in before if not pred(k)
    ]
    assert all(frozen_same)
    assert any(trainable_changed)
    # frozen BN stats untouched
    bs_before = flatten_dict(jax.device_get(state.batch_stats))
    bs_after = flatten_dict(jax.device_get(new_state.batch_stats))
    for k in bs_before:
        if pred(k):
            assert np.allclose(bs_before[k], bs_after[k])


def test_checkpoint_roundtrip_and_merge(tmp_path, setup):
    model, tx, state, criterion, batch = setup
    path = checkpoint.save_checkpoint(str(tmp_path / "ck"), state, step=0)
    restored = checkpoint.load_checkpoint(path)
    rparams = checkpoint.load_into(
        jax.device_get(state.params), restored["params"], verbose=False
    )
    before = flatten_dict(jax.device_get(state.params))
    after = flatten_dict(rparams)
    assert all(np.allclose(before[k], after[k]) for k in before)

    # merge: base + modified head -> prefer new
    mod = jax.tree_util.tree_map(lambda x: x + 1.0, jax.device_get(state.params))
    merged = checkpoint.merge_params(
        jax.device_get(state.params), {"heads": mod["heads"]}, prefer="new",
        verbose=False,
    )
    mflat = flatten_dict(merged)
    assert any(
        not np.allclose(before[k], mflat[k]) for k in before if k[0] == "heads"
    )
    assert all(
        np.allclose(before[k], mflat[k]) for k in before if k[0] != "heads"
    )


def test_data_parallel_mesh(setup):
    model, tx, state, criterion, _ = setup
    from jax.sharding import Mesh

    scenes = SyntheticScenes(TINY)
    batch = scenes.sample(1, 8)
    devices = np.array(jax.devices())
    mesh = Mesh(devices, ("data",))
    sharded = trainer.shard_batch(batch, mesh)
    rstate = trainer.replicate_state(state, mesh)
    step = trainer.make_train_step(model, criterion, tx)
    new_state, losses = step(rstate, sharded, jax.random.PRNGKey(0))
    assert np.isfinite(float(losses["total_loss"]))
