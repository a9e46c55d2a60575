"""Real camera data path: OPV2V-format directory WITH images end-to-end.

Covers VERDICT r1 item #1: per-CAV camera ring loading (png + imgs.hdf5),
intrinsics/extrinsics from the yaml, LSS image augmentation homography,
GT depth maps, camera-visible GT filtering, and an LSS model forward on
the real-loader batch.

Reference behavior targets:
  opv2v_basedataset.py:340-404 (hdf5/png camera loading)
  camera_utils.py:33-110 (sample_augmentation / img_transform)
  base_postprocessor.generate_visible_object_center:614
"""

import os

import numpy as np
import pytest
import yaml

from gencomm_tpu.data.opv2v import OPV2VDataset
from gencomm_tpu.utils import pcd_utils
from gencomm_tpu.utils.transformation_utils import x_to_world

LIDAR_RANGE = [-16, -8, -3, 16, 8, 1]
IMG_H, IMG_W = 120, 160       # original camera resolution (yaml-scale mock)
FINAL_DIM = (48, 64)          # post-aug (fH, fW)

DATA_AUG_CONF = {
    "resize_lim": [0.42, 0.46],
    "final_dim": list(FINAL_DIM),
    "rot_lim": [-3.6, 3.6],
    "H": IMG_H, "W": IMG_W,
    "rand_flip": True,
    "bot_pct_lim": [0.0, 0.05],
    "cams": ["camera0", "camera1", "camera2", "camera3"],
    "Ncams": 4,
}

# intrinsics: fx=fy=100, principal point at image center
K = [[100.0, 0.0, IMG_W / 2.0], [0.0, 100.0, IMG_H / 2.0], [0.0, 0.0, 1.0]]

MARK_UV = (40, 30)  # distinctive red pixel at original (u, v) in camera0
CONST_DEPTH = 20.0  # meters, everywhere in the mock depth maps


def _write_cams(cav_dir, ts, pose, rng, hdf5=False, vis_value=255):
    """4-camera ring at the cav pose (yaw offsets 0/90/180/270), constant
    depth maps, one marked pixel in camera0, plus bev_visibility.png."""
    from PIL import Image

    cam_imgs, depth_imgs = [], []
    for i in range(4):
        img = np.zeros((IMG_H, IMG_W, 3), np.uint8)
        img[..., 2] = 30 + 10 * i  # camera-identifying blue level
        if i == 0:
            u, v = MARK_UV
            img[v - 2:v + 3, u - 2:u + 3] = (255, 0, 0)
        cam_imgs.append(img)
        depth_imgs.append(np.full((IMG_H, IMG_W), CONST_DEPTH, np.uint8))
    if hdf5:
        import h5py

        with h5py.File(os.path.join(cav_dir, f"{ts}_imgs.hdf5"), "w") as f:
            for i in range(4):
                f.create_dataset(f"camera{i}", data=cam_imgs[i])
                f.create_dataset(f"depth{i}", data=depth_imgs[i])
    else:
        for i in range(4):
            Image.fromarray(cam_imgs[i]).save(
                os.path.join(cav_dir, f"{ts}_camera{i}.png"))
            Image.fromarray(depth_imgs[i]).save(
                os.path.join(cav_dir, f"{ts}_depth{i}.png"))
    vis = np.full((256, 256), vis_value, np.uint8)
    Image.fromarray(vis).save(
        os.path.join(cav_dir, f"{ts}_bev_visibility.png"))

    cams = {}
    for i in range(4):
        cam_pose = [pose[0], pose[1], pose[2] + 0.3,
                    pose[3], (pose[4] + 90.0 * i) % 360.0, pose[5]]
        cams[f"camera{i}"] = {
            "cords": [float(x) for x in cam_pose],
            "intrinsic": K,
        }
    return cams


def _write_mock(root, n_ts=2, vis_value=255, hdf5_ts=()):
    rng = np.random.RandomState(0)
    sc = os.path.join(root, "scenario_00")
    cav_poses = [[0.0, 0, 1.9, 0, 0, 0], [8.0, 2, 1.9, 0, 30, 0]]
    veh = {
        100: {
            "location": [6.0, 0.5, 0.0],
            "angle": [0.0, 15.0, 0.0],
            "center": [0.0, 0.0, 0.75],
            "extent": [2.2, 0.95, 0.75],
        }
    }
    for c, pose in enumerate(cav_poses):
        cav_dir = os.path.join(sc, str(200 + c))
        os.makedirs(cav_dir, exist_ok=True)
        for t in range(n_ts):
            ts = f"{t:06d}"
            cams = _write_cams(cav_dir, ts, pose, rng,
                               hdf5=(t in hdf5_ts), vis_value=vis_value)
            params = {
                "lidar_pose": [float(x) for x in pose],
                "true_ego_pos": [float(x) for x in pose],
                "vehicles": veh,
            }
            params.update(cams)
            with open(os.path.join(cav_dir, f"{ts}.yaml"), "w") as f:
                yaml.dump(params, f)
            world_pts = np.array(veh[100]["location"]) + rng.uniform(
                -1.5, 1.5, (400, 3)
            ) * np.array([1.0, 0.5, 0.3]) + np.array([0, 0, 0.75])
            hom = np.concatenate([world_pts, np.ones((400, 1))], 1)
            local = (hom @ np.linalg.inv(x_to_world(pose)).T)[:, :3]
            pts = np.concatenate(
                [local, rng.uniform(0, 1, (400, 1))], 1
            ).astype(np.float32)
            pcd_utils.write_pcd(os.path.join(cav_dir, f"{ts}.pcd"), pts)


def _params(root, assignment_path, label_type="lidar", with_depth=True):
    return {
        "root_dir": root,
        "validate_dir": root,
        "train_params": {"max_cav": 3},
        "comm_range": 70,
        "input_source": (
            ["lidar", "camera", "depth"] if with_depth
            else ["lidar", "camera"]),
        "label_type": label_type,
        "preprocess": {"cav_lidar_range": LIDAR_RANGE},
        "heter": {
            "ego_modality": "m1",
            "assignment_path": assignment_path,
            "mapping_dict": {"m1": "m1", "m2": "m2"},
            "modality_setting": {
                "m1": {"sensor_type": "lidar"},
                "m2": {"sensor_type": "camera",
                       "data_aug_conf": DATA_AUG_CONF},
            },
        },
        "postprocess": {
            "max_num": 10,
            "order": "hwl",
            "anchor_args": {
                "W": 80, "H": 40, "l": 3.9, "w": 1.6, "h": 1.56,
                "r": [0, 90], "vw": 0.4, "vh": 0.4,
                "cav_lidar_range": LIDAR_RANGE, "feature_stride": 4,
            },
            "target_args": {"pos_threshold": 0.6, "neg_threshold": 0.45,
                            "score_threshold": 0.2},
        },
    }


@pytest.fixture(scope="module")
def cam_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("opv2v_cam"))
    _write_mock(root, n_ts=2, hdf5_ts=(1,))
    assign = os.path.join(root, "assign.json")
    import json

    with open(assign, "w") as f:
        json.dump({"scenario_00": {"200": "m1", "201": "m2"}}, f)
    return root, assign


def test_camera_batch_keys_and_shapes(cam_root):
    root, assign = cam_root
    ds = OPV2VDataset(_params(root, assign), train=False, max_points=512)
    s = ds[0]
    fH, fW = FINAL_DIM
    assert s["imgs_m2"].shape == (3, 4, fH, fW, 3)
    assert s["rots_m2"].shape == (3, 4, 3, 3)
    assert s["intrins_m2"].shape == (3, 4, 3, 3)
    assert s["post_rots_m2"].shape == (3, 4, 3, 3)
    assert s["depths_m2"].shape == (3, 4, fH, fW)
    # slot 1 (cav 201) is the camera agent
    assert s["modality_mask_m2"].tolist() == [False, True, False]
    assert s["modality_mask_m1"].tolist() == [True, False, False]
    # lidar buffers still populated for the lidar agent only
    assert s["point_mask_m1"][0].any() and not s["point_mask_m1"][1].any()
    # intrinsics straight from the yaml
    assert np.allclose(s["intrins_m2"][1, 0], np.asarray(K), atol=1e-5)
    # constant depth survives resize/crop (nearest)
    d = s["depths_m2"][1]
    assert np.allclose(d[d > 0], CONST_DEPTH, atol=1e-4)


def test_camera_extrinsic_axes(cam_root):
    """camera0 sits 0.3 m above the lidar, same yaw -> camera->lidar is the
    pure UE4->OpenCV axis permutation plus a +z offset."""
    root, assign = cam_root
    ds = OPV2VDataset(_params(root, assign), train=False, max_points=512)
    s = ds[0]
    rot = s["rots_m2"][1, 0]
    expect = np.array([[0, 0, 1], [1, 0, 0], [0, -1, 0]], np.float32)
    assert np.allclose(rot, expect, atol=1e-5)
    assert np.allclose(s["trans_m2"][1, 0], [0, 0, 0.3], atol=1e-5)


def test_post_homography_tracks_pixels(cam_root):
    """The marked original pixel must land where post_rot/post_tran say,
    validating the accumulated augmentation homography against real PIL
    resize/crop ops (camera_utils.img_transform:62-98)."""
    root, assign = cam_root
    ds = OPV2VDataset(_params(root, assign), train=False, max_points=512)
    s = ds[0]
    img = s["imgs_m2"][1, 0]  # (fH, fW, 3) normalized
    # un-normalize the red channel to find the mark
    from gencomm_tpu.data.camera import IMG_MEAN, IMG_STD

    red = img[..., 0] * IMG_STD[0] + IMG_MEAN[0]
    blue = img[..., 2] * IMG_STD[2] + IMG_MEAN[2]
    redness = red - blue
    v_found, u_found = np.unravel_index(np.argmax(redness), redness.shape)
    pr = s["post_rots_m2"][1, 0]
    pt = s["post_trans_m2"][1, 0]
    uv = pr[:2, :2] @ np.array(MARK_UV, np.float32) + pt[:2]
    assert abs(uv[0] - u_found) <= 2.0 and abs(uv[1] - v_found) <= 2.0


def test_hdf5_and_png_paths_agree(cam_root):
    """ts 0 is png-backed, ts 1 hdf5-backed with identical content; eval
    aug is deterministic so camera tensors must match."""
    root, assign = cam_root
    ds = OPV2VDataset(_params(root, assign), train=False, max_points=512)
    s0, s1 = ds[0], ds[1]
    assert np.allclose(s0["imgs_m2"], s1["imgs_m2"], atol=1e-6)
    assert np.allclose(s0["depths_m2"], s1["depths_m2"], atol=1e-6)


def test_train_augmentation_varies(cam_root):
    root, assign = cam_root
    ds = OPV2VDataset(_params(root, assign), train=True, max_points=512)
    # find a sample where slot of m2 is active (train redraws modalities)
    got = []
    for idx in range(len(ds)):
        s = ds[idx]
        if s["modality_mask_m2"].any():
            got.append(s["post_rots_m2"][s["modality_mask_m2"]][0, 0])
    assert got, "train draw never produced a camera agent"
    # augmented homography differs from the deterministic eval one
    ds_eval = OPV2VDataset(_params(root, assign), train=False,
                           max_points=512)
    pr_eval = ds_eval[0]["post_rots_m2"][1, 0]
    assert any(not np.allclose(g, pr_eval, atol=1e-6) for g in got)


def test_visibility_filter_drops_gt(tmp_path):
    root = str(tmp_path / "opv2v_dark")
    _write_mock(root, n_ts=1, vis_value=0)
    assign = os.path.join(root, "assign.json")
    import json

    with open(assign, "w") as f:
        json.dump({"scenario_00": {"200": "m1", "201": "m2"}}, f)
    ds = OPV2VDataset(_params(root, assign, label_type="camera"),
                      train=False, max_points=512)
    s = ds[0]
    assert s["gt_mask"].sum() == 0
    # same directory, lidar labels: GT kept
    ds2 = OPV2VDataset(_params(root, assign, label_type="lidar"),
                       train=False, max_points=512)
    assert ds2[0]["gt_mask"].sum() == 1


def test_visibility_filter_keeps_visible_gt(cam_root):
    root, assign = cam_root
    ds = OPV2VDataset(_params(root, assign, label_type="camera"),
                      train=False, max_points=512)
    assert ds[0]["gt_mask"].sum() == 1


@pytest.mark.slow
def test_train_cli_camera_through_real_loader(cam_root, tmp_path):
    """VERDICT r1 #1 'done' criterion: train + eval an LSS camera config
    through the REAL OPV2V loader (images on disk), with depth supervision,
    via the train CLI."""
    from gencomm_tpu.tools import train as train_cli
    from gencomm_tpu.train import checkpoint

    root, assign = cam_root
    base = _params(root, assign)
    hypes = {
        "name": "cam_e2e",
        "root_dir": root,
        "validate_dir": root,
        "train_params": {"batch_size": 1, "epoches": 1, "save_freq": 1,
                         "max_cav": 3},
        "input_source": ["lidar", "camera", "depth"],
        "label_type": "camera",
        "comm_range": 70,
        "heter": base["heter"],
        "preprocess": {"core_method": "SpVoxelPreprocessor",
                       "args": {"voxel_size": [0.4, 0.4, 4.0]},
                       "cav_lidar_range": list(map(float, LIDAR_RANGE))},
        "postprocess": dict(base["postprocess"], **{
            "core_method": "VoxelPostprocessor",
            "gt_range": list(map(float, LIDAR_RANGE)),
            "nms_thresh": 0.15,
            "dir_args": {"dir_offset": 0.7853, "num_bins": 2,
                         "anchor_yaw": [0, 90]},
        }),
        "model": {"core_method": "heter_model_baseline", "args": {
            "ego_modality": "m1",
            "lidar_range": list(map(float, LIDAR_RANGE)),
            "m1": {
                "core_method": "point_pillar", "sensor_type": "lidar",
                "encoder_args": {
                    "voxel_size": [0.4, 0.4, 4.0],
                    "lidar_range": list(map(float, LIDAR_RANGE)),
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
                "core_method": "lift_splat_shoot", "sensor_type": "camera",
                "encoder_args": {
                    "grid_conf": {
                        "xbound": [LIDAR_RANGE[0], LIDAR_RANGE[3], 0.4],
                        "ybound": [LIDAR_RANGE[1], LIDAR_RANGE[4], 0.4],
                        "zbound": [-10.0, 10.0, 20.0],
                        "ddiscr": [2, 36, 12],
                        "mode": "LID",
                    },
                    "data_aug_conf": DATA_AUG_CONF,
                    "img_downsample": 8, "img_features": 32,
                    "trunk_blocks": 1, "depth_topk": 4,
                    "lidar_range": list(map(float, LIDAR_RANGE)),
                },
                "camera_mask_args": None,
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
        "loss": {"core_method": "point_pillar_depth_loss", "args": {
            "pos_cls_weight": 2.0,
            "cls": {"alpha": 0.25, "gamma": 2.0, "weight": 1.0},
            "reg": {"sigma": 3.0, "weight": 2.0},
            "depth": {"weight": 1.0},
        }},
        "optimizer": {"core_method": "Adam", "lr": 0.002,
                      "args": {"eps": 1e-10, "weight_decay": 1e-4}},
        "lr_scheduler": {"core_method": "constant"},
    }
    cfg_path = tmp_path / "cam_e2e.yaml"
    cfg_path.write_text(yaml.safe_dump(hypes))
    model_dir = str(tmp_path / "cam_run")
    train_cli.main(["-y", str(cfg_path), "--model_dir", model_dir,
                    "--dataset", "opv2v", "--epochs", "1",
                    "--steps_per_epoch", "2", "--val_steps", "1"])
    assert checkpoint.latest_checkpoint(model_dir) is not None

    # full AP eval through the real loader (inference.py parity: decode +
    # NMS + VOC AP, both global-sort and per-frame variants written)
    from gencomm_tpu.tools import inference as infer_cli

    infer_cli.main(["--model_dir", model_dir, "--dataset", "opv2v",
                    "--frames", "2"])
    import glob

    evals = sorted(glob.glob(os.path.join(model_dir, "eval*.yaml")))
    assert len(evals) >= 2  # per-frame + global-sort
    for p in evals:
        res = yaml.safe_load(open(p))
        for t in ("30", "50", "70"):
            assert 0.0 <= float(res[f"ap{t}"]) <= 1.0


def test_lss_model_forward_on_real_loader(cam_root):
    """End-to-end: real-loader camera batch through the heter LSS branch."""
    import jax
    import jax.numpy as jnp

    from gencomm_tpu.models.heter_baseline import HeterModel

    root, assign = cam_root
    ds = OPV2VDataset(_params(root, assign), train=False, max_points=512)
    batch = {k: jnp.asarray(v[None]) for k, v in ds[0].items()}

    m2_args = {
        "core_method": "lift_splat_shoot",
        "sensor_type": "camera",
        "encoder_args": {
            "grid_conf": {
                "xbound": [LIDAR_RANGE[0], LIDAR_RANGE[3], 0.4],
                "ybound": [LIDAR_RANGE[1], LIDAR_RANGE[4], 0.4],
                "zbound": [-10.0, 10.0, 20.0],
                "ddiscr": [2, 36, 12],
                "mode": "LID",
            },
            "data_aug_conf": DATA_AUG_CONF,
            "img_downsample": 8,
            "img_features": 32,
            "trunk_blocks": 1,
            "depth_topk": 4,
            "lidar_range": list(LIDAR_RANGE),
        },
        "camera_mask_args": None,
        "backbone_args": {
            "layer_nums": [2], "layer_strides": [1], "num_filters": [32],
            "upsample_strides": [1], "num_upsample_filter": [32],
        },
        "shrink_header": {
            "kernal_size": [3], "stride": [1], "padding": [1],
            "dim": [64], "input_dim": 32,
        },
    }
    m1_args = {
        "core_method": "point_pillar",
        "encoder_args": {
            "voxel_size": [0.4, 0.4, 4],
            "lidar_range": list(LIDAR_RANGE),
            "max_voxels": 2048,
            "pillar_vfe": {"num_filters": [32], "use_norm": True,
                           "with_distance": False, "use_absolute_xyz": True},
        },
        "backbone_args": {
            "layer_nums": [2], "layer_strides": [1], "num_filters": [32],
            "upsample_strides": [1], "num_upsample_filter": [32],
        },
        "shrink_header": {
            "kernal_size": [3], "stride": [1], "padding": [1],
            "dim": [64], "input_dim": 32,
        },
    }
    model = HeterModel(
        modality_args={"m1": m1_args, "m2": m2_args},
        fusion_method="max",
        fusion_args={},
        lidar_range=LIDAR_RANGE,
        anchor_number=2,
        in_head=64,
    )
    rngs = {"params": jax.random.PRNGKey(0)}
    variables = model.init(rngs, batch, train=False)
    out = model.apply(variables, batch, train=False)
    assert bool(jnp.isfinite(out["cls_preds"]).all())
