"""CIASSD / FPV-RCNN / uncertainty family tests.

Reference behaviors covered: SSFA blend backbone (cia_ssd_utils.py:6-57),
IoU-aware head + CiassdLoss (ciassd_loss.py:9-115), pointnet2-style ops
(pcdet_utils/pointnet2), Matcher clustering/fusion (matcher.py:16-147),
RoI target assignment + canonical encode/decode (roi_head.py:133-221,
box_utils.box_encode), KL uncertainty losses
(point_pillar_uncertainty_loss.py:195-290).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tests.test_model_forward import TINY, MODALITY_ARGS
from gencomm_tpu.data.synthetic import SyntheticScenes

# heavy suite: excluded from the fast subset (`pytest -m "not slow"`, VERDICT r3 #9)
pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def batch():
    scenes = SyntheticScenes(TINY)
    raw = scenes.sample(0, 1)
    return raw, {
        k: jnp.asarray(v) if isinstance(v, np.ndarray) else v
        for k, v in raw.items()
    }


ANCHOR_ARGS = {
    "W": 160, "H": 80, "l": 3.9, "w": 1.6, "h": 1.56, "r": [0, 90],
    "feature_stride": 8, "num": 2, "vw": 0.2, "vh": 0.2,
    "cav_lidar_range": list(TINY.lidar_range),
}


# ---------------------------------------------------------------- ops ----

def test_farthest_point_sample_spreads_and_masks():
    from gencomm_tpu.ops.pointnet2 import farthest_point_sample

    pts = jnp.array([[0.0, 0, 0], [0.1, 0, 0], [10.0, 0, 0], [5.0, 0, 0],
                     [99.0, 99, 99]])
    valid = jnp.array([True, True, True, True, False])
    idx = np.asarray(farthest_point_sample(pts, valid, 3))
    assert 4 not in idx  # masked point never sampled
    assert idx[0] == 0 and idx[1] == 2  # farthest from 0 is x=10
    assert idx[2] == 3  # then the midpoint


def test_radius_group_respects_radius_and_mask():
    from gencomm_tpu.ops.pointnet2 import radius_group

    src = jnp.array([[0.0, 0, 0], [0.5, 0, 0], [3.0, 0, 0]])
    src_valid = jnp.array([True, True, True])
    feats = jnp.arange(3, dtype=jnp.float32)[:, None]
    new = jnp.array([[0.0, 0, 0]])
    g_xyz, g_feats, ok = radius_group(
        src, src_valid, feats, new, jnp.array([True]), radius=1.0, nsample=3
    )
    assert np.asarray(ok).sum() == 2  # point at 3.0 outside radius
    got = sorted(np.asarray(g_feats)[0, np.asarray(ok)[0], 0].tolist())
    assert got == [0.0, 1.0]


def test_points_in_rotated_boxes():
    from gencomm_tpu.models.fpvrcnn import points_in_rotated_boxes

    # box rotated 90deg: extents swap between x and y
    boxes = jnp.array([[0.0, 0, 0, 4.0, 1.0, 2.0, np.pi / 2]])
    valid = jnp.array([True])
    pts = jnp.array([[0.0, 1.5, 0], [1.5, 0.0, 0], [0.0, 0.0, 1.5]])
    inside = np.asarray(points_in_rotated_boxes(pts, boxes, valid))
    assert inside.tolist() == [True, False, False]


def test_boxes_iou3d_matches_bev_times_z():
    from gencomm_tpu.ops.rotated_iou import boxes_iou3d

    a = jnp.array([[0.0, 0, 0, 4.0, 2.0, 2.0, 0.0]])
    b = jnp.array([[0.0, 0, 1.0, 4.0, 2.0, 2.0, 0.0]])  # half z-overlap
    iou = float(boxes_iou3d(a, b, order="lwh")[0, 0])
    assert abs(iou - 1.0 / 3.0) < 1e-5  # inter=0.5V, union=1.5V


# ------------------------------------------------------------- matcher ----

def test_cluster_and_fuse_weighted():
    from gencomm_tpu.models.fpvrcnn import cluster_boxes, fuse_clusters

    boxes = jnp.array([
        [0.0, 0, 0, 4.0, 2.0, 1.5, 0.0],    # agent A
        [0.4, 0, 0, 4.0, 2.0, 1.5, 0.0],    # agent B, same object
        [20.0, 0, 0, 4.0, 2.0, 1.5, 0.0],   # another object
        [0.0, 0, 0, 1.0, 1.0, 1.0, 0.0],    # padding
    ])
    scores = jnp.array([0.5, 0.4, 0.9, 0.0])
    valid = jnp.array([True, True, True, False])
    cid = cluster_boxes(boxes, scores, valid)
    assert int(cid[0]) == int(cid[1]) == 0
    assert int(cid[2]) == 2
    fused, s_fused, seed = fuse_clusters(boxes, scores, valid, cid)
    np.testing.assert_array_equal(np.asarray(seed), [True, False, True, False])
    # weighted x center: (0.5*0 + 0.4*0.4)/0.9
    assert abs(float(fused[0, 0]) - 0.4 * 0.4 / 0.9) < 1e-5
    # fused score: min(s0 + s1^2, 1) rank powers (matcher.py:123-129)
    assert abs(float(s_fused[0]) - (0.5 + 0.4**2)) < 1e-5
    assert abs(float(s_fused[2]) - 0.9) < 1e-6


def test_fuse_clusters_direction_flip():
    from gencomm_tpu.models.fpvrcnn import cluster_boxes, fuse_clusters

    # same object, opposite headings: low-score member must be flipped
    boxes = jnp.array([
        [0.0, 0, 0, 4.0, 2.0, 1.5, 0.1],
        [0.1, 0, 0, 4.0, 2.0, 1.5, 0.1 + np.pi],
    ])
    scores = jnp.array([0.9, 0.5])
    valid = jnp.array([True, True])
    cid = cluster_boxes(boxes, scores, valid)
    fused, _, seed = fuse_clusters(boxes, scores, valid, cid)
    assert abs(float(fused[0, 6]) - 0.1) < 1e-4


# --------------------------------------------------------- roi targets ----

def test_box_encode_decode_roundtrip():
    from gencomm_tpu.models.fpvrcnn import box_encode, box_decode

    rng = np.random.default_rng(0)
    anchors = jnp.asarray(
        np.concatenate(
            [rng.normal(size=(8, 3)), rng.uniform(1, 4, (8, 3)),
             rng.uniform(-np.pi, np.pi, (8, 1))], axis=1
        ), jnp.float32)
    boxes = jnp.asarray(
        np.concatenate(
            [rng.normal(size=(8, 3)), rng.uniform(1, 4, (8, 3)),
             rng.uniform(-np.pi, np.pi, (8, 1))], axis=1
        ), jnp.float32)
    rec = box_decode(box_encode(boxes, anchors), anchors)
    np.testing.assert_allclose(np.asarray(rec), np.asarray(boxes), atol=1e-4)


def test_assign_roi_targets_positive_and_negative():
    from gencomm_tpu.models.fpvrcnn import assign_roi_targets

    gt = jnp.array([[0.0, 0, 0, 4.0, 2.0, 1.5, 0.0]])
    gt_mask = jnp.array([1.0])
    rois = jnp.array([
        [0.2, 0.1, 0, 4.0, 2.0, 1.5, 0.05],   # near the gt -> positive
        [30.0, 0, 0, 4.0, 2.0, 1.5, 0.0],     # far -> negative
    ])
    rv = jnp.array([1.0, 1.0])
    t = assign_roi_targets(rois, rv, gt, gt_mask)
    assert float(t["cls_tgt"][0]) == 1.0 and float(t["cls_tgt"][1]) == 0.0
    assert float(t["iou_tgt"][0]) > 0.3
    # negative regresses to itself -> zero residual
    np.testing.assert_allclose(np.asarray(t["reg_tgt"][1]), 0.0, atol=1e-5)
    # positive residual x (canonical frame) approx -0.2 / diag
    diag = np.sqrt(4.0**2 + 2.0**2)
    assert abs(float(t["reg_tgt"][0, 0]) + 0.2 / diag) < 0.02


# --------------------------------------------------------------- models ----

def test_ciassd_forward_and_loss(batch):
    from gencomm_tpu.models.ciassd import CIASSDModel
    from gencomm_tpu.loss.ciassd_loss import CiassdLoss
    from gencomm_tpu.data.postprocessor import generate_anchor_box

    raw, jb = batch
    m = CIASSDModel(voxel_size=(0.2, 0.2, 0.1), lidar_range=TINY.lidar_range,
                    max_voxels=4096, use_unc=True)
    vars_ = m.init({"params": jax.random.PRNGKey(0)}, jb, False)
    out = m.apply(vars_, jb, False)
    assert out["cls_preds"].shape == (3, 10, 20, 2)
    assert out["iou_preds"].shape == (3, 10, 20, 2)
    assert out["unc_preds"].shape == (3, 10, 20, 6)

    anchors = generate_anchor_box(ANCHOR_ARGS)
    b, h, w, a = out["cls_preds"].shape
    tgt = {"pos_equal_one": jnp.zeros((b, h, w, a)).at[:, 3, 4, 0].set(1.0),
           "neg_equal_one": jnp.ones((b, h, w, a)).at[:, 3, 4, 0].set(0.0),
           "targets": jnp.zeros((b, h, w, a * 7))}
    args = {"pos_cls_weight": 1.5,
            "cls": {"alpha": 0.25, "gamma": 2.0, "weight": 1.0},
            "reg": {"sigma": 3.0, "weight": 2.0},
            "dir": {"weight": 0.2, "args": {"num_bins": 2,
                    "anchor_yaw": [0, 90], "dir_offset": 0.7853}},
            "iou": {"sigma": 3.0, "weight": 1.0},
            "_anchors": jnp.asarray(anchors)}
    losses = CiassdLoss(args)(out, tgt)
    for k in ("cls_loss", "reg_loss", "dir_loss", "iou_loss", "total_loss"):
        assert np.isfinite(float(losses[k])), k


def test_fpvrcnn_forward_loss_grads(batch):
    from gencomm_tpu.models.fpvrcnn import FPVRCNN
    from gencomm_tpu.loss.ciassd_loss import FpvrcnnLoss
    from gencomm_tpu.data.postprocessor import (
        generate_anchor_box, generate_label,
    )

    raw, jb = batch
    m = FPVRCNN(voxel_size=(0.2, 0.2, 0.1), lidar_range=TINY.lidar_range,
                anchor_args=ANCHOR_ARGS, max_voxels=4096, num_keypoints=64,
                num_proposals=8, num_rois=8, roi_grid_size=3)
    vars_ = m.init({"params": jax.random.PRNGKey(0)}, jb, False)
    out = m.apply(vars_, jb, False)
    assert out["det_boxes"].shape == (1, 3, 8, 7)
    assert out["boxes_fused"].shape == (1, 8, 7)
    assert out["stage2_out"]["rcnn_reg"].shape == (1, 8, 7)
    # even masked slots must stay finite (0 * inf = NaN regression guard)
    for k in ("det_boxes", "boxes_fused", "scores_fused"):
        assert bool(jnp.isfinite(out[k]).all()), k

    anchors = generate_anchor_box(ANCHOR_ARGS)
    lab = generate_label(raw["gt_boxes"][0], raw["gt_mask"][0],
                         anchors, 0.6, 0.45)
    tgt = {k: jnp.tile(jnp.asarray(lab[k])[None], (3, 1, 1, 1))
           for k in ("pos_equal_one", "neg_equal_one", "targets")}
    largs = {"stage1": {"pos_cls_weight": 1.5,
                        "cls": {"alpha": 0.25, "gamma": 2.0, "weight": 1.0},
                        "reg": {"sigma": 3.0, "weight": 2.0},
                        "dir": {"weight": 0.2, "args": {
                            "num_bins": 2, "anchor_yaw": [0, 90],
                            "dir_offset": 0.7853}},
                        "iou": {"sigma": 3.0, "weight": 1.0}},
             "stage2": {"cls": {"weight": 1.0},
                        "reg": {"sigma": 3.0, "weight": 1.0},
                        "iou": {"sigma": 3.0, "weight": 1.0}},
             "_anchors": jnp.asarray(anchors)}
    crit = FpvrcnnLoss(largs)
    val, grads = jax.value_and_grad(
        lambda p: crit(m.apply(p, jb, False), tgt)["total_loss"]
    )(vars_)
    assert np.isfinite(float(val))
    assert all(bool(jnp.isfinite(x).all())
               for x in jax.tree_util.tree_leaves(grads))


def test_decode_stage2_roundtrip():
    from gencomm_tpu.models.fpvrcnn import (
        assign_roi_targets, decode_stage2,
    )

    gt = jnp.array([[1.0, 2.0, 0.0, 4.2, 1.9, 1.6, 0.3]])
    gt_mask = jnp.array([1.0])
    rois = jnp.array([[0.8, 2.1, 0.1, 4.0, 2.0, 1.5, 0.25]])
    rv = jnp.array([1.0])
    t = assign_roi_targets(rois, rv, gt, gt_mask)
    # feeding the perfect residual back through decode recovers the gt box
    stage2 = {"rcnn_reg": t["reg_tgt"],
              "rcnn_cls": jnp.full((1, 1), 10.0),
              "rcnn_iou": jnp.full((1, 1), 1.0)}
    boxes, scores, valid = decode_stage2(rois, rv > 0, stage2)
    np.testing.assert_allclose(np.asarray(boxes[0]), np.asarray(gt[0]),
                               atol=1e-3)
    assert bool(valid[0])


def test_second_models_and_uncertainty(batch):
    from gencomm_tpu.models.ciassd import SecondModel
    from gencomm_tpu.models.uncertainty import PointPillarUncertainty
    from gencomm_tpu.loss.ciassd_loss import (
        PointPillarUncertaintyLoss, kl_loss_l2, kl_loss_angular,
    )

    raw, jb = batch
    sm = SecondModel(voxel_size=(0.2, 0.2, 0.1),
                     lidar_range=TINY.lidar_range,
                     backbone_args=MODALITY_ARGS["m1"]["backbone_args"],
                     max_voxels=4096, intermediate=True)
    o = sm.apply(sm.init({"params": jax.random.PRNGKey(0)}, jb, False),
                 jb, False)
    assert o["cls_preds"].shape[0] == 1  # fused to ego sample

    pu = PointPillarUncertainty(modality_args=MODALITY_ARGS,
                                lidar_range=TINY.lidar_range)
    o3 = pu.apply(pu.init({"params": jax.random.PRNGKey(0)}, jb, False),
                  jb, False)
    assert o3["unc_preds"].shape[-1] == 6  # 3 dims x 2 anchors

    b, h, w, a = o3["cls_preds"].shape
    tgt = {"pos_equal_one": jnp.zeros((b, h, w, a)).at[:, 2, 2, 0].set(1.0),
           "neg_equal_one": jnp.ones((b, h, w, a)).at[:, 2, 2, 0].set(0.0),
           "targets": jnp.zeros((b, h, w, a * 7))}
    args = {"pos_cls_weight": 2.0,
            "cls": {"alpha": 0.25, "gamma": 2.0, "weight": 1.0},
            "reg": {"sigma": 3.0, "weight": 2.0},
            "kl": {"dim": 3, "angle_weight": 1.0, "xy_loss_type": "l1",
                   "angle_loss_type": "von-mise", "lambda_V": 1.0,
                   "s0": 1.0, "limit_period": False},
            "uncertainty": {"weight": 0.5}}
    losses = PointPillarUncertaintyLoss(args)(o3, tgt)
    assert np.isfinite(float(losses["unc_loss"]))

    # closed-form checks of the KL penalties
    assert float(kl_loss_l2(jnp.array(2.0), jnp.array(0.0))) == 2.0
    v = kl_loss_angular(jnp.array(0.0), jnp.array(0.0))
    assert np.isfinite(float(v))
