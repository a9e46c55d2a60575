"""V2X-Sim pickle loader, V2X-Real class mapping, multiclass eval."""

import os
import pickle

import numpy as np
import pytest

from gencomm_tpu.utils import eval_utils


def make_anchor_args():
    return {
        "cav_lidar_range": [-32, -16, -3, 32, 16, 1],
        "l": 3.9, "w": 1.6, "h": 1.56, "r": [0, 90],
        "feature_stride": 4, "num": 2,
        "vw": 0.4, "vh": 0.4, "vd": 4.0, "W": 160, "H": 80, "D": 1,
    }


@pytest.fixture()
def v2xsim_pkl(tmp_path):
    rng = np.random.RandomState(0)
    infos = []
    for s in range(2):
        rec = {"agent_num": 2}
        for i in (1, 2):
            pts = rng.uniform(-20, 20, (300, 5)).astype(np.float32)
            path = tmp_path / f"s{s}_a{i}.bin"
            pts.tofile(path)
            pose = np.eye(4)
            pose[0, 3] = 10.0 * s + 5.0 * (i - 1)
            rec[f"lidar_path_{i}"] = str(path)
            rec[f"lidar_pose_{i}"] = pose
            rec[f"labels_{i}"] = {
                "gt_boxes_global": np.array(
                    [[10.0 * s + 6.0, 2.0, 0.0, 4.0, 1.8, 1.5, 0.2]]
                ),
                "gt_object_ids": np.array([7]),
            }
        infos.append(rec)
    pkl = tmp_path / "train.pkl"
    with open(pkl, "wb") as f:
        pickle.dump(infos, f)
    return str(pkl)


def test_v2xsim_loader(v2xsim_pkl):
    from gencomm_tpu.data.v2xsim import V2XSimDataset

    params = {
        "root_dir": v2xsim_pkl,
        "validate_dir": v2xsim_pkl,
        "train_params": {"max_cav": 3},
        "preprocess": {"cav_lidar_range": [-32, -16, -3, 32, 16, 1]},
        "postprocess": {
            "max_num": 10,
            "anchor_args": make_anchor_args(),
            "target_args": {"pos_threshold": 0.6, "neg_threshold": 0.45},
            "order": "hwl",
        },
    }
    ds = V2XSimDataset(params, train=False)
    assert len(ds) == 2
    s = ds[0]
    assert s["points_m1"].shape[0] == 3
    assert s["agent_mask"].tolist() == [True, True, False]
    # gt box at world x=6 with ego at x=0 (scene 0) -> ego-frame x=6
    assert s["gt_mask"].sum() == 1
    assert abs(s["gt_boxes"][0][0] - 6.0) < 1e-4
    # object union dedups by id across both agents
    batch = ds.collate([s, ds[1]])
    assert batch["points_m1"].shape[0] == 2


def test_v2xreal_class_mapping():
    from gencomm_tpu.data.v2xreal import class_id, CLASS_NAMES

    assert CLASS_NAMES == ["vehicle", "pedestrian", "truck"]
    # 1-indexed super-class ids; names outside the vocabulary are dropped
    # (reference filter_boxes_by_class, v2xreal_basedataset.py:753-770)
    assert class_id({"obj_type": "Car"}) == 1
    assert class_id({"obj_type": "Pedestrian"}) == 2
    assert class_id({"obj_type": "Bus"}) == 3
    assert class_id({"obj_type": "???"}) is None


def test_multiclass_eval():
    stats = eval_utils.new_multiclass_stat(["vehicle", "pedestrian"])
    # one perfect detection for vehicle, one miss for pedestrian
    gt = np.array([[[0, 0], [4, 0], [4, 2], [0, 2]]], np.float32)
    gt3 = np.concatenate([gt, gt], axis=0)[:1]
    det = gt.copy()
    corners3d = np.zeros((1, 8, 3), np.float32)
    corners3d[:, :4, :2] = det
    gtc = corners3d.copy()
    for t in (0.3, 0.5, 0.7):
        eval_utils.calculate_tp_fp(corners3d, np.array([0.9]), gtc,
                                   stats["vehicle"], t)
        eval_utils.calculate_tp_fp(np.zeros((0, 8, 3)), np.zeros(0), gtc,
                                   stats["pedestrian"], t)
    res = eval_utils.eval_multiclass_results(stats)
    assert res["vehicle"]["ap50"] > 0.99
    assert res["pedestrian"]["ap50"] == 0.0
    assert abs(res["map50"] - 0.5 * res["vehicle"]["ap50"]) < 1e-6
