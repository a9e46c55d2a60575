import numpy as np
import jax.numpy as jnp

from gencomm_tpu.data.postprocessor import (
    generate_anchor_box,
    generate_label,
    delta_to_boxes3d,
    decode_and_nms,
)
from gencomm_tpu.utils import box_utils
from gencomm_tpu.utils import eval_utils

ANCHOR_ARGS = {
    "W": 80, "H": 40,
    "l": 3.9, "w": 1.6, "h": 1.56,
    "r": [0, 90],
    "vw": 0.4, "vh": 0.4,
    "cav_lidar_range": [-16, -8, -3, 16, 8, 1],
    "feature_stride": 4,
}


def test_anchor_grid_shape_and_coverage():
    anchors = generate_anchor_box(ANCHOR_ARGS)
    assert anchors.shape == (10, 20, 2, 7)
    assert np.isclose(anchors[0, 0, 0, 0], -16 + 0.4)  # x start
    assert np.isclose(anchors[-1, -1, 0, 0], 16 - 0.4)
    assert np.allclose(anchors[..., 0, 6], 0.0)
    assert np.allclose(anchors[..., 1, 6], np.pi / 2)


def test_label_assignment_roundtrip():
    anchors = generate_anchor_box(ANCHOR_ARGS)
    gt = np.zeros((150, 7), np.float32)
    gt[0] = [2.0, 1.0, -1.0, 1.56, 1.6, 3.9, 0.0]
    mask = np.zeros(150, np.float32)
    mask[0] = 1
    label = generate_label(gt, mask, anchors, 0.6, 0.45)
    assert label["pos_equal_one"].sum() >= 1
    # decoding the targets at positive anchors recovers the GT box
    deltas = jnp.asarray(label["targets"][None])  # (1, H', W', A*7)
    decoded = np.asarray(delta_to_boxes3d(deltas, jnp.asarray(anchors)))[0]
    pos_flat = label["pos_equal_one"].reshape(-1).astype(bool)
    rec = decoded[pos_flat]
    assert np.allclose(rec[:, :3], gt[0, :3], atol=1e-4)
    assert np.allclose(rec[:, 3:6], gt[0, 3:6], atol=1e-4)
    assert np.allclose(
        np.sin(rec[:, 6] - gt[0, 6]), 0.0, atol=1e-4
    )


def test_decode_and_nms_perfect_predictions():
    anchors_np = generate_anchor_box(ANCHOR_ARGS)
    anchors = jnp.asarray(anchors_np)
    gt = np.zeros((150, 7), np.float32)
    gt[0] = [2.0, 1.0, -1.0, 1.56, 1.6, 3.9, 0.0]
    gt[1] = [-5.0, -2.0, -1.0, 1.56, 1.6, 3.9, np.pi / 2]
    mask = np.zeros(150, np.float32)
    mask[:2] = 1
    label = generate_label(gt, mask, anchors_np, 0.6, 0.45)

    hp, wp, a = anchors_np.shape[:3]
    cls_logits = np.where(label["pos_equal_one"] > 0, 8.0, -8.0).astype(np.float32)
    reg = label["targets"].astype(np.float32)
    # dir logits: bin 0 for yaw in [dir_offset-, ...) -> both gts have
    # rot_gt in [0, pi) -> bin 0
    dirp = np.zeros((hp, wp, a * 2), np.float32)
    dirp[..., 0::2] = 5.0

    dets = decode_and_nms(
        jnp.asarray(cls_logits),
        jnp.asarray(reg),
        jnp.asarray(dirp),
        anchors,
        jnp.eye(4),
        tuple(ANCHOR_ARGS["cav_lidar_range"]),
        topk=64,
    )
    kept = np.asarray(dets.valid)
    corners = np.asarray(dets.corners3d)[kept]
    scores = np.asarray(dets.scores)[kept]
    assert corners.shape[0] == 2

    stat = eval_utils.new_result_stat()
    gt_corners = box_utils.boxes_to_corners_3d(gt[:2], "hwl")
    for t in (0.3, 0.5, 0.7):
        eval_utils.calculate_tp_fp(corners, scores, gt_corners, stat, t)
    res = eval_utils.eval_final_results(stat)
    assert res["ap50"] > 0.99 and res["ap70"] > 0.99


def test_eval_ap_with_false_positive():
    stat = eval_utils.new_result_stat()
    gt = box_utils.boxes_to_corners_3d(
        np.array([[0, 0, 0, 1.5, 1.6, 3.9, 0.0]]), "hwl"
    )
    # one perfect det + one spurious high-score det elsewhere
    det = box_utils.boxes_to_corners_3d(
        np.array([[0, 0, 0, 1.5, 1.6, 3.9, 0.0], [20, 5, 0, 1.5, 1.6, 3.9, 0.3]]),
        "hwl",
    )
    eval_utils.calculate_tp_fp(det, np.array([0.9, 0.95]), gt, stat, 0.5)
    ap = eval_utils.calculate_ap(stat, 0.5, global_sort_detections=False)
    # VOC-2010: precision at recall 1 is 0.5 after the FP ranks first
    assert 0.4 < ap < 0.75


def test_generate_label_sparse_matches_dense():
    """The structured-grid sparse label path (r5 host optimization) is
    BIT-EXACT vs the dense IoU path on random GT sets."""
    from gencomm_tpu.data.postprocessor import (
        _anchor_statics, _finish_label_dense, generate_label,
    )
    from gencomm_tpu.utils import box_utils

    anchor_args = {
        "W": 128, "H": 64, "l": 4.5, "w": 2.0, "h": 1.56, "r": [0, 90],
        "feature_stride": 2, "num": 2,
        "cav_lidar_range": [-25.6, -12.8, -3, 25.6, 12.8, 1],
        "vh": 0.4, "vw": 0.4,
    }
    anchors = generate_anchor_box(anchor_args, "hwl")
    assert _anchor_statics(anchors, "hwl")["structured"]
    rng = np.random.default_rng(7)
    for _ in range(5):
        n = int(rng.integers(1, 8))
        gt = np.zeros((10, 7), np.float32)
        mask = np.zeros(10, np.int32)
        gt[:n, 0] = rng.uniform(-24, 24, n)
        gt[:n, 1] = rng.uniform(-12, 12, n)
        gt[:n, 3] = rng.uniform(1.2, 2.2, n)
        gt[:n, 4] = rng.uniform(1.6, 2.6, n)
        gt[:n, 5] = rng.uniform(3.5, 5.5, n)
        gt[:n, 6] = rng.uniform(-np.pi, np.pi, n)
        mask[:n] = 1
        got = generate_label(gt, mask, anchors, 0.6, 0.45)

        fm = anchors.shape[:2]
        a_num = anchors.shape[2]
        af = anchors.reshape(-1, 7)
        ad = np.sqrt(af[:, 4] ** 2 + af[:, 5] ** 2)
        gv = gt[mask == 1]
        asu = box_utils.corners_to_standup_2d(
            box_utils.boxes_to_corners_3d(af, "hwl")[:, :4])
        gsu = box_utils.corners_to_standup_2d(
            box_utils.boxes_to_corners_3d(gv, "hwl")[:, :4])
        iou = box_utils.aligned_iou_2d(asu, gsu)
        want = _finish_label_dense(
            iou, gv, af, ad, fm, a_num, 0.6, 0.45,
            np.zeros((*fm, a_num), np.float32),
            np.zeros((*fm, a_num), np.float32),
            np.zeros((*fm, a_num * 7), np.float32))
        for k in got:
            assert np.array_equal(got[k], want[k]), k
