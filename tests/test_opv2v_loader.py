"""OPV2V directory-format loader roundtrip on a generated mock dataset."""

import os

import numpy as np
import pytest
import yaml

from gencomm_tpu.data.opv2v import OPV2VDataset
from gencomm_tpu.utils import pcd_utils
from gencomm_tpu.utils.transformation_utils import x_to_world

LIDAR_RANGE = [-16, -8, -3, 16, 8, 1]


def _write_mock_opv2v(root, n_scenarios=1, n_cavs=2, n_ts=3, seed=0):
    rng = np.random.RandomState(seed)
    for s in range(n_scenarios):
        sc = os.path.join(root, f"scenario_{s:02d}")
        cav_poses = [
            [0.0, 0, 1.9, 0, 0, 0],
            [8.0, 2, 1.9, 0, 30, 0],
        ][:n_cavs]
        # one vehicle in front of ego (world frame)
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
                params = {
                    "lidar_pose": [float(x) for x in pose],
                    "true_ego_pos": [float(x) for x in pose],
                    "vehicles": veh,
                }
                with open(os.path.join(cav_dir, f"{ts}.yaml"), "w") as f:
                    yaml.dump(params, f)
                # points on the vehicle surface in THIS cav's lidar frame
                world_pts = np.array(veh[100]["location"]) + rng.uniform(
                    -1.5, 1.5, (500, 3)
                ) * np.array([1.0, 0.5, 0.3]) + np.array([0, 0, 0.75])
                hom = np.concatenate([world_pts, np.ones((500, 1))], 1)
                local = (hom @ np.linalg.inv(x_to_world(pose)).T)[:, :3]
                pts = np.concatenate(
                    [local, rng.uniform(0, 1, (500, 1))], 1
                ).astype(np.float32)
                pcd_utils.write_pcd(os.path.join(cav_dir, f"{ts}.pcd"), pts)


PARAMS = {
    "root_dir": None,  # filled by fixture
    "validate_dir": None,
    "train_params": {"max_cav": 3},
    "comm_range": 70,
    "preprocess": {"cav_lidar_range": LIDAR_RANGE},
    "postprocess": {
        "max_num": 10,
        "order": "hwl",
        "anchor_args": {
            "W": 80, "H": 40, "l": 3.9, "w": 1.6, "h": 1.56,
            "r": [0, 90], "vw": 0.4, "vh": 0.4,
            "cav_lidar_range": LIDAR_RANGE, "feature_stride": 4,
        },
        "target_args": {"pos_threshold": 0.6, "neg_threshold": 0.45},
    },
}


@pytest.fixture(scope="module")
def mock_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("opv2v"))
    _write_mock_opv2v(root)
    return root


def test_loader_roundtrip(mock_root):
    params = dict(PARAMS, root_dir=mock_root, validate_dir=mock_root)
    ds = OPV2VDataset(params, train=False, max_points=2048)
    assert len(ds) == 3
    sample = ds[0]
    assert sample["points_m1"].shape == (3, 2048, 4)
    assert sample["agent_mask"].tolist() == [True, True, False]
    # GT: the single vehicle, projected into ego lidar frame
    assert sample["gt_mask"].sum() == 1
    box = sample["gt_boxes"][0]
    # ego lidar at z=1.9; vehicle center z = 0 + 0.75
    assert np.allclose(box[:3], [6.0, 0.5, 0.75 - 1.9], atol=0.05)
    assert np.allclose(box[3:6], [1.5, 1.9, 4.4], atol=0.05)  # h, w, l
    assert np.isclose((box[6] % np.pi), np.radians(15.0), atol=0.02)
    # labels assigned
    assert sample["pos_equal_one"].sum() >= 1
    # pairwise transform consistency: agent1 -> ego
    t10 = sample["pairwise_t_matrix"][1, 0]
    p = t10 @ np.array([0.0, 0, 0, 1])
    assert np.allclose(p[:2], [8.0, 2.0], atol=1e-4)


def test_loader_comm_delay(mock_root):
    params = dict(PARAMS, root_dir=mock_root, validate_dir=mock_root)
    params["wild_setting"] = {"async": True, "async_overhead": 100}
    ds = OPV2VDataset(params, train=False, max_points=2048)
    # last timestamp: neighbor replays t-1 data, GT stays current
    sample = ds[2]
    assert sample["agent_mask"].sum() == 2
    assert sample["gt_mask"].sum() == 1


def test_loader_pose_noise(mock_root):
    params = dict(PARAMS, root_dir=mock_root, validate_dir=mock_root)
    params["noise_setting"] = {
        "add_noise": True, "args": {"pos_std": 0.5, "rot_std": 2.0},
    }
    ds = OPV2VDataset(params, train=False, max_points=2048)
    s = ds[0]
    t10 = s["pairwise_t_matrix"][1, 0]
    p = (t10 @ np.array([0.0, 0, 0, 1]))[:2]
    # noisy relative pose differs from the clean one but not wildly
    assert not np.allclose(p, [8.0, 2.0], atol=1e-3)
    assert np.linalg.norm(p - [8.0, 2.0]) < 5.0


def test_augmentor_wiring_late(mock_root):
    """data_augment in the hypes fires the world augmentor for late-fusion
    training (opv2v_basedataset.py:42-45, late_fusion_dataset.py:167):
    a deterministic 2x scaling doubles the ego cloud and the GT dims;
    eval stays untouched."""
    params = dict(PARAMS, root_dir=mock_root, validate_dir=mock_root)
    params["fusion"] = {"core_method": "latefusion"}
    params["data_augment"] = [
        {"NAME": "random_world_scaling", "WORLD_SCALE_RANGE": [2.0, 2.0]},
    ]
    base = dict(params)
    base.pop("data_augment")
    plain = OPV2VDataset(base, train=True, max_points=2048)[0]
    ds = OPV2VDataset(params, train=True, max_points=2048)
    s = ds[0]
    n = int(s["gt_mask"].sum())
    np.testing.assert_allclose(
        s["gt_boxes"][:n, 3:6], plain["gt_boxes"][:n, 3:6] * 2.0, rtol=1e-5)
    k = int(s["point_mask_m1"][0].sum())
    np.testing.assert_allclose(
        s["points_m1"][0, :k, :3], plain["points_m1"][0, :k, :3] * 2.0,
        rtol=1e-5)
    # labels regenerated from the augmented GT differ from the plain ones
    assert not np.array_equal(s["targets"], plain["targets"])
    # eval mode: augmentor inert
    s_eval = OPV2VDataset(params, train=False, max_points=2048)[0]
    p_eval = OPV2VDataset(base, train=False, max_points=2048)[0]
    np.testing.assert_allclose(s_eval["gt_boxes"], p_eval["gt_boxes"])


def test_augmentor_wiring_early(mock_root):
    """Early fusion folds the world transform into the agent->ego pairwise
    matrices instead of mutating local clouds
    (early_fusion_dataset.py:105 augments the merged ego-frame stack)."""
    params = dict(PARAMS, root_dir=mock_root, validate_dir=mock_root)
    params["fusion"] = {"core_method": "early"}
    params["data_augment"] = [
        {"NAME": "random_world_scaling", "WORLD_SCALE_RANGE": [2.0, 2.0]},
    ]
    base = dict(params)
    base.pop("data_augment")
    plain = OPV2VDataset(base, train=True, max_points=2048)[0]
    s = OPV2VDataset(params, train=True, max_points=2048)[0]
    n = int(s["gt_mask"].sum())
    np.testing.assert_allclose(
        s["gt_boxes"][:n, :6], plain["gt_boxes"][:n, :6] * 2.0, rtol=1e-5)
    # local clouds untouched; the ego column of pairwise carries the 2x
    k = int(s["point_mask_m1"][0].sum())
    np.testing.assert_allclose(s["points_m1"][0, :k], plain["points_m1"][0, :k])
    np.testing.assert_allclose(
        s["pairwise_t_matrix"][0, 0, :3, :3], np.eye(3) * 2.0, atol=1e-6)
    # merged ego cloud lands in augmented coords consistent with the GT
    from gencomm_tpu.data.early_fusion import merge_points_to_ego

    batch = {kk: np.asarray(vv)[None] for kk, vv in s.items()}
    merged = merge_points_to_ego(batch, lidar_range=None)
    mpts = merged["points_m1"][0, 0][merged["point_mask_m1"][0, 0] > 0]
    # cloud was built on the GT vehicle: its centroid tracks the scaled box
    np.testing.assert_allclose(
        mpts[:, :2].mean(axis=0), s["gt_boxes"][0, :2], atol=1.0)
