"""DAIR-V2X-C loader against a synthetic on-disk fixture."""

import json
import os

import numpy as np
import pytest

from gencomm_tpu.data.dairv2x import (
    DAIRV2XDataset, veh_side_pose_tfm, inf_side_pose_tfm, tfm_to_pose,
)


def write_pcd(path, pts):
    with open(path, "w") as f:
        f.write("VERSION 0.7\nFIELDS x y z intensity\nSIZE 4 4 4 4\n"
                "TYPE F F F F\nCOUNT 1 1 1 1\n"
                f"WIDTH {len(pts)}\nHEIGHT 1\nVIEWPOINT 0 0 0 1 0 0 0\n"
                f"POINTS {len(pts)}\nDATA ascii\n")
        for p in pts:
            f.write(" ".join(str(float(v)) for v in p) + "\n")


def box_world_8_points(cx, cy, cz, l, w, h, yaw):
    xs = np.array([l, l, -l, -l, l, l, -l, -l]) / 2
    ys = np.array([w, -w, -w, w, w, -w, -w, w]) / 2
    zs = np.array([-h, -h, -h, -h, h, h, h, h]) / 2
    c, s = np.cos(yaw), np.sin(yaw)
    px = c * xs - s * ys + cx
    py = s * xs + c * ys + cy
    return np.stack([px, py, zs + cz], axis=1).tolist()


@pytest.fixture(scope="module")
def dair_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("dair")
    for sub in ("cooperative", "vehicle-side/calib/lidar_to_novatel",
                "vehicle-side/calib/novatel_to_world",
                "infrastructure-side/calib/virtuallidar_to_world",
                "vehicle-side/velodyne", "infrastructure-side/velodyne",
                "cooperative/label_world"):
        (root / sub).mkdir(parents=True, exist_ok=True)

    vid, iid = "000001", "900001"
    info = [{
        "vehicle_image_path": f"vehicle-side/image/{vid}.jpg",
        "infrastructure_image_path": f"infrastructure-side/image/{iid}.jpg",
        "vehicle_pointcloud_path": f"vehicle-side/velodyne/{vid}.pcd",
        "infrastructure_pointcloud_path":
            f"infrastructure-side/velodyne/{iid}.pcd",
        "cooperative_label_path": f"cooperative/label_world/{vid}.json",
        "system_error_offset": {"delta_x": 0.1, "delta_y": -0.2},
    }]
    (root / "cooperative/data_info.json").write_text(json.dumps(info))
    (root / f"vehicle-side/calib/lidar_to_novatel/{vid}.json").write_text(
        json.dumps({"transform": {
            "rotation": np.eye(3).tolist(),
            "translation": [[0.0], [0.0], [0.0]],
        }})
    )
    (root / f"vehicle-side/calib/novatel_to_world/{vid}.json").write_text(
        json.dumps({"rotation": np.eye(3).tolist(),
                    "translation": [[10.0], [5.0], [0.0]]})
    )
    (root / f"infrastructure-side/calib/virtuallidar_to_world/{iid}.json"
     ).write_text(json.dumps({"rotation": np.eye(3).tolist(),
                              "translation": [[30.0], [5.0], [0.0]]}))
    rng = np.random.RandomState(0)
    write_pcd(root / f"vehicle-side/velodyne/{vid}.pcd",
              rng.uniform(-20, 20, (200, 4)))
    write_pcd(root / f"infrastructure-side/velodyne/{iid}.pcd",
              rng.uniform(-20, 20, (150, 4)))
    # one vehicle 6 m ahead of the ego (world x = 16, y = 5)
    (root / f"cooperative/label_world/{vid}.json").write_text(json.dumps([
        {"world_8_points": box_world_8_points(16.0, 5.0, 0.0,
                                              4.0, 1.8, 1.5, 0.3)}
    ]))
    (root / "split.json").write_text(json.dumps([vid]))
    return str(root)


def make_params(root):
    return {
        "data_dir": root,
        "root_dir": os.path.join(root, "split.json"),
        "validate_dir": os.path.join(root, "split.json"),
        "preprocess": {"cav_lidar_range": [-32, -16, -3, 32, 16, 1]},
        "postprocess": {
            "max_num": 20,
            "anchor_args": {
                "cav_lidar_range": [-32, -16, -3, 32, 16, 1],
                "l": 3.9, "w": 1.6, "h": 1.56, "r": [0, 90],
                "feature_stride": 4, "num": 2,
                "vw": 0.4, "vh": 0.4, "vd": 4.0,
                "W": 160, "H": 80, "D": 1,
            },
            "target_args": {"pos_threshold": 0.6, "neg_threshold": 0.45},
            "order": "hwl",
        },
    }


def test_calib_chains():
    veh = veh_side_pose_tfm(
        {"transform": {"rotation": np.eye(3).tolist(),
                       "translation": [[1.0], [2.0], [0.0]]}},
        {"rotation": np.eye(3).tolist(),
         "translation": [[10.0], [0.0], [0.0]]},
    )
    np.testing.assert_allclose(veh[:3, 3], [11.0, 2.0, 0.0])
    inf = inf_side_pose_tfm(
        {"rotation": np.eye(3).tolist(),
         "translation": [[5.0], [5.0], [1.0]]},
        {"delta_x": 0.5, "delta_y": -0.5},
    )
    np.testing.assert_allclose(inf[:3, 3], [5.5, 4.5, 1.0])
    pose = tfm_to_pose(np.eye(4))
    np.testing.assert_allclose(pose, np.zeros(6))


def test_dair_sample_layout(dair_root):
    ds = DAIRV2XDataset(make_params(dair_root), train=False)
    assert len(ds) == 1
    s = ds[0]
    assert s["points_m1"].shape[0] == 2  # veh + inf slots
    assert s["agent_mask"].all()
    assert s["gt_mask"].sum() == 1
    # GT box lands ~6 m ahead of ego in its lidar frame
    box = s["gt_boxes"][0]
    assert abs(box[0] - 6.0) < 0.5 and abs(box[1]) < 0.5
    # t[0, 1] maps ego coords into the inf frame (sampling convention,
    # fusion.py warp_to_ego): veh at world x=10, inf at 30.1 -> -20.1
    t = s["pairwise_t_matrix"]
    assert abs(t[0, 1, 0, 3] + 20.1) < 1e-3
    batch = ds.collate([s])
    assert batch["points_m1"].shape[0] == 1


def test_dair_heter_masks(dair_root):
    params = make_params(dair_root)
    params["heter"] = {"ego_modality": "m1",
                       "mapping_dict": {"m1": "m1", "m2": "m2"},
                       "modality_setting": {"m1": {}, "m2": {}}}
    ds = DAIRV2XDataset(params, train=False)
    s = ds[0]
    assert s["modality_mask_m1"].tolist() == [True, False]
    assert s["modality_mask_m2"].tolist() == [False, True]
