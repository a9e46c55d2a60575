"""Late / no-fusion inference paths (inference_utils parity)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gencomm_tpu.data.synthetic import SyntheticScenes
from gencomm_tpu.models.heter_baseline import HeterModel
from gencomm_tpu.pipeline import InferencePipeline
from tests.test_model_forward import TINY, MODALITY_ARGS


@pytest.fixture(scope="module")
def single_head_model():
    scenes = SyntheticScenes(TINY)
    host = scenes.sample(seed=21, batch_size=1)
    batch = {k: jnp.asarray(v) for k, v in host.items()}
    model = HeterModel(
        modality_args=MODALITY_ARGS,
        fusion_method="att",
        fusion_args={"att": {"feat_dim": 64}},
        lidar_range=TINY.lidar_range,
        anchor_number=2,
        in_head=64,
        supervise_single=True,
    )
    variables = model.init({"params": jax.random.PRNGKey(0)}, batch,
                           train=False)
    cfg = {
        "gt_range": list(TINY.lidar_range),
        "target_args": {"score_threshold": 0.05},
        "nms_thresh": 0.15,
        "dir_args": {"dir_offset": 0.7853, "num_bins": 2},
        "nms_topk": 64,
    }
    return scenes, model, variables, batch, cfg


def test_late_fusion_pipeline(single_head_model):
    scenes, model, variables, batch, cfg = single_head_model
    pipe = InferencePipeline(model, variables, scenes.anchors, cfg,
                             mode="late")
    dets = pipe.run(batch, seed=0)
    assert dets.scores.shape[0] == 1
    assert np.isfinite(np.asarray(dets.scores)).all()
    assert np.isfinite(np.asarray(dets.corners3d)).all()
    # union over agents: buffer covers L * per-agent topk
    l = batch["agent_mask"].shape[1]
    assert dets.corners3d.shape[1] <= l * cfg["nms_topk"]


def test_no_fusion_pipeline(single_head_model):
    scenes, model, variables, batch, cfg = single_head_model
    pipe = InferencePipeline(model, variables, scenes.anchors, cfg,
                             mode="no")
    dets = pipe.run(batch, seed=0)
    assert dets.scores.shape[0] == 1
    assert np.isfinite(np.asarray(dets.scores)).all()
