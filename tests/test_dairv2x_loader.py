"""DAIR-V2X-C loader against a synthetic on-disk fixture."""

import json
import os

import numpy as np
import pytest

from gencomm_tpu.data.dairv2x import (
    DAIRV2XDataset, veh_side_pose_tfm, inf_side_pose_tfm, tfm_to_pose,
)

# heavy suite: excluded from the fast subset (`pytest -m "not slow"`, VERDICT r3 #9)
pytestmark = pytest.mark.slow


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


def single_obj(x, y, z, l, w, h, rot, typ="Car"):
    return {"type": typ, "rotation": rot,
            "3d_location": {"x": x, "y": y, "z": z},
            "3d_dimensions": {"l": l, "w": w, "h": h}}


@pytest.fixture(scope="module")
def dair_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("dair")
    for sub in ("cooperative", "vehicle-side/calib/lidar_to_novatel",
                "vehicle-side/calib/novatel_to_world",
                "vehicle-side/calib/lidar_to_camera",
                "vehicle-side/calib/camera_intrinsic",
                "infrastructure-side/calib/virtuallidar_to_world",
                "infrastructure-side/calib/virtuallidar_to_camera",
                "infrastructure-side/calib/camera_intrinsic",
                "vehicle-side/velodyne", "infrastructure-side/velodyne",
                "vehicle-side/label/lidar",
                "infrastructure-side/label/virtuallidar",
                "vehicle-side/image", "infrastructure-side/image",
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
    # ---- single-side labels (heter / late-fusion GT source) -----------
    # veh frame is world - (10, 5). Car at world (16, 5) -> veh (6, 0)
    # duplicates the coop box; Van at veh (3, 2); plus filter bait: a
    # Pedestrian (type outside the Car/Van/Truck/Bus set) and a zero-dim
    # box (both must be dropped, box_utils.load_single_objects_dairv2x).
    (root / f"vehicle-side/label/lidar/{vid}.json").write_text(json.dumps([
        single_obj(6.0, 0.0, 0.0, 4.0, 1.8, 1.5, 0.3),
        single_obj(3.0, 2.0, 0.0, 4.2, 1.9, 1.6, 0.0, "Van"),
        single_obj(1.0, -2.0, 0.0, 0.6, 0.5, 1.7, 0.0, "Pedestrian"),
        single_obj(2.0, -3.0, 0.0, 0.0, 1.8, 1.5, 0.0),
    ]))
    # inf frame is world - (30.1, 4.8) after the system offset. The same
    # Car seen at inf (-14.1, 0.2) (drops in the IoU merge) + a Truck at
    # world (20, 3) -> inf (-10.1, -1.8) -> ego (10, -2). String coords
    # exercise the camera-label parsing path.
    (root / f"infrastructure-side/label/virtuallidar/{iid}.json").write_text(
        json.dumps([
            single_obj(-14.1, 0.2, 0.0, 4.0, 1.8, 1.5, 0.3),
            single_obj("-10.1", "-1.8", "0.0", 8.0, 2.6, 3.0, 0.1, "Truck"),
        ]))
    # ---- camera files --------------------------------------------------
    from PIL import Image
    rgb = (rng.uniform(0, 255, (64, 96, 3))).astype("uint8")
    Image.fromarray(rgb).save(root / f"vehicle-side/image/{vid}.jpg")
    Image.fromarray(rgb[::-1]).save(
        root / f"infrastructure-side/image/{iid}.jpg")
    cam_rot = np.array([[0, -1, 0], [0, 0, -1], [1, 0, 0]], float)
    for side, fid in (("vehicle-side/calib/lidar_to_camera", vid),
                      ("infrastructure-side/calib/virtuallidar_to_camera",
                       iid)):
        (root / side / f"{fid}.json").write_text(json.dumps(
            {"rotation": cam_rot.tolist(), "translation": [[0.1], [0.2], [0.3]]}
        ))
    intr = [400.0, 0.0, 48.0, 0.0, 400.0, 32.0, 0.0, 0.0, 1.0]
    for side, fid in (("vehicle-side/calib/camera_intrinsic", vid),
                      ("infrastructure-side/calib/camera_intrinsic", iid)):
        (root / side / f"{fid}.json").write_text(json.dumps(
            {"cam_D": [0] * 5, "cam_K": intr}))
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


def _heter_params(root):
    params = make_params(root)
    params["heter"] = {"ego_modality": "m1",
                       "mapping_dict": {"m1": "m1", "m2": "m2"},
                       "modality_setting": {"m1": {}, "m2": {}}}
    return params


def test_single_label_iou_merge(dair_root):
    """Hetero GT = per-side single labels in the ego frame merged by IoU:
    the duplicated Car collapses, veh Van + inf Truck survive, the
    Pedestrian/zero-dim bait is filtered
    (intermediate_heter_fusion_dataset.py:294-323)."""
    ds = DAIRV2XDataset(_heter_params(dair_root), train=False)
    s = ds[0]
    n = int(s["gt_mask"].sum())
    assert n == 3
    centers = sorted(s["gt_boxes"][:n, :2].tolist())
    np.testing.assert_allclose(centers[0], [3.0, 2.0], atol=0.05)   # Van
    np.testing.assert_allclose(centers[1], [6.0, 0.0], atol=0.05)   # Car
    np.testing.assert_allclose(centers[2], [10.0, -2.0], atol=0.05)  # Truck
    # the truck came through the string-coordinate camera-label path and
    # kept its dims (hwl order: l last)
    truck_i = int(np.argmax(s["gt_boxes"][:n, 5]))
    assert abs(s["gt_boxes"][truck_i, 5] - 8.0) < 0.05


def test_per_agent_single_labels(dair_root):
    """Each agent's supervise_single labels come from its OWN single list
    in its own frame (generate_object_center_single_hetero)."""
    ds = DAIRV2XDataset(_heter_params(dair_root), train=False)
    s = ds[0]
    assert s["pos_equal_one_single"].shape[0] == 2
    # both sides have at least one positive anchor
    assert (s["pos_equal_one_single"][0] > 0).any()
    assert (s["pos_equal_one_single"][1] > 0).any()
    # inf side sees 2 in-range objects in its own frame, veh sees 2 -> the
    # label maps must differ
    assert not np.array_equal(s["pos_equal_one_single"][0],
                              s["pos_equal_one_single"][1])


def test_train_ego_swap(dair_root):
    """Train draws ego = veh or RSU with p=0.5
    (dairv2x_basedataset.py:176-181)."""
    ds = DAIRV2XDataset(_heter_params(dair_root), train=True)
    # veh pcd has 200 points, inf 150 — slot 0's count reveals the ego side
    slot0_counts = set()
    for _ in range(20):
        s = ds[0]
        slot0_counts.add(int(s["point_mask_m1"][0].sum()))
    assert slot0_counts == {200, 150}
    # eval never swaps (ego modality m1 = vehicle side first)
    ds_eval = DAIRV2XDataset(_heter_params(dair_root), train=False)
    for _ in range(5):
        s = ds_eval[0]
        assert int(s["point_mask_m1"][0].sum()) == 200
        assert s["modality_mask_m1"].tolist() == [True, False]


def test_late_fusion_iou_merged_gt(dair_root):
    """DAIR late fusion evaluates against the IoU-merged veh+inf single
    labels (generate_gt_bbx_by_iou), not the cooperative labels."""
    params = make_params(dair_root)
    params["fusion"] = {"core_method": "latefusion"}
    ds = DAIRV2XDataset(params, train=False)
    s = ds[0]
    assert int(s["gt_mask"].sum()) == 3  # coop labels would give 1


def test_dair_camera_loading(dair_root):
    """Camera modality loads the side's jpg through the LSS aug chain with
    the DAIR calib chain (lidar_to_camera inverted, cam_K intrinsics)."""
    params = _heter_params(dair_root)
    params["heter"]["modality_setting"]["m2"] = {
        "sensor_type": "camera",
        "data_aug_conf": {
            "H": 64, "W": 96, "final_dim": [32, 48], "Ncams": 1,
            "resize_lim": [0.55, 0.6], "bot_pct_lim": [0.0, 0.05],
            "rot_lim": [-1.0, 1.0], "rand_flip": False,
        },
    }
    ds = DAIRV2XDataset(params, train=False)
    s = ds[0]
    assert s["imgs_m2"].shape == (2, 1, 32, 48, 3)
    assert s["modality_mask_m2"].tolist() == [False, True]
    assert s["modality_mask_m1"].tolist() == [True, False]
    # infra slot carries real pixels, veh slot stays zero-padded
    assert np.abs(s["imgs_m2"][1]).sum() > 0
    assert np.abs(s["imgs_m2"][0]).sum() == 0
    np.testing.assert_allclose(s["intrins_m2"][1, 0, 0, 0], 400.0)
    # rots = inverse(lidar->camera) rotation = cam_rot.T
    cam_rot = np.array([[0, -1, 0], [0, 0, -1], [1, 0, 0]], float)
    np.testing.assert_allclose(s["rots_m2"][1, 0], cam_rot.T, atol=1e-6)
    # lidar side untouched
    assert s["point_mask_m1"][0].sum() > 0
    assert s["point_mask_m1"][1].sum() == 0


@pytest.mark.slow
def test_dair_hetero_train_cli(dair_root, tmp_path):
    """Hetero DAIR training runs end-to-end through the real loader (ego
    swap + single-label IoU merge feeding the padded batches) via the
    train CLI."""
    import yaml

    from gencomm_tpu.tools import train as train_cli
    from gencomm_tpu.train import checkpoint

    rng6 = [-32.0, -16.0, -3.0, 32.0, 16.0, 1.0]
    hypes = {
        "name": "dair_heter_e2e",
        "data_dir": dair_root,
        "root_dir": os.path.join(dair_root, "split.json"),
        "validate_dir": os.path.join(dair_root, "split.json"),
        "train_params": {"batch_size": 1, "epoches": 1, "save_freq": 1,
                         "max_cav": 2},
        "input_source": ["lidar"],
        "label_type": "lidar",
        "comm_range": 100,
        "heter": {"ego_modality": "m1",
                  "mapping_dict": {"m1": "m1", "m2": "m2"},
                  "modality_setting": {"m1": {"sensor_type": "lidar"},
                                       "m2": {"sensor_type": "lidar"}}},
        "preprocess": {"core_method": "SpVoxelPreprocessor",
                       "args": {"voxel_size": [0.4, 0.4, 4.0]},
                       "cav_lidar_range": list(rng6)},
        "postprocess": {
            "core_method": "VoxelPostprocessor",
            "max_num": 20, "order": "hwl", "nms_thresh": 0.15,
            "gt_range": list(rng6),
            "anchor_args": {"cav_lidar_range": list(rng6),
                            "l": 3.9, "w": 1.6, "h": 1.56, "r": [0, 90],
                            "vw": 0.4, "vh": 0.4, "W": 160, "H": 80,
                            "feature_stride": 4, "num": 2},
            "target_args": {"pos_threshold": 0.6, "neg_threshold": 0.45,
                            "score_threshold": 0.2},
            "dir_args": {"dir_offset": 0.7853, "num_bins": 2,
                         "anchor_yaw": [0, 90]},
        },
        "model": {"core_method": "heter_model_baseline", "args": {
            "ego_modality": "m1",
            "lidar_range": list(rng6),
            "supervise_single": True,
            "m1": {
                "core_method": "point_pillar", "sensor_type": "lidar",
                "encoder_args": {
                    "voxel_size": [0.4, 0.4, 4.0],
                    "lidar_range": list(rng6),
                    "pillar_vfe": {"use_norm": True, "num_filters": [32]},
                },
                "backbone_args": {"layer_nums": [1], "layer_strides": [2],
                                  "num_filters": [32],
                                  "upsample_strides": [1],
                                  "num_upsample_filter": [32]},
                "shrink_header": {"kernal_size": [3], "stride": [2],
                                  "padding": [1], "dim": [64],
                                  "input_dim": 32},
            },
            "m2": {
                "core_method": "point_pillar", "sensor_type": "lidar",
                "encoder_args": {
                    "voxel_size": [0.4, 0.4, 4.0],
                    "lidar_range": list(rng6),
                    "pillar_vfe": {"use_norm": True, "num_filters": [32]},
                },
                "backbone_args": {"layer_nums": [1], "layer_strides": [2],
                                  "num_filters": [32],
                                  "upsample_strides": [1],
                                  "num_upsample_filter": [32]},
                "shrink_header": {"kernal_size": [3], "stride": [2],
                                  "padding": [1], "dim": [64],
                                  "input_dim": 32},
            },
            "fusion_method": "max",
            "in_head": 64, "anchor_number": 2,
            "dir_args": {"dir_offset": 0.7853, "num_bins": 2,
                         "anchor_yaw": [0, 90]},
        }},
        "loss": {"core_method": "point_pillar_loss", "args": {
            "pos_cls_weight": 2.0,
            "cls": {"alpha": 0.25, "gamma": 2.0, "weight": 1.0},
            "reg": {"sigma": 3.0, "weight": 2.0},
            "dir": {"weight": 0.2,
                    "args": {"dir_offset": 0.7853, "num_bins": 2,
                             "anchor_yaw": [0, 90]}},
        }},
        "optimizer": {"core_method": "Adam", "lr": 0.002,
                      "args": {"eps": 1e-10, "weight_decay": 1e-4}},
        "lr_scheduler": {"core_method": "constant"},
    }
    cfg = tmp_path / "dair_heter.yaml"
    cfg.write_text(yaml.safe_dump(hypes))
    model_dir = str(tmp_path / "dair_run")
    train_cli.main(["-y", str(cfg), "--model_dir", model_dir,
                    "--dataset", "dairv2x", "--epochs", "1",
                    "--steps_per_epoch", "1", "--val_steps", "1"])
    assert checkpoint.latest_checkpoint(model_dir) is not None

    from gencomm_tpu.tools import inference as infer_cli

    res = infer_cli.main(["--model_dir", model_dir, "--dataset", "dairv2x",
                          "--frames", "1"])
    assert 0.0 <= res["ap30"] <= 1.0
