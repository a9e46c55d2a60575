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
        "add_noise": True, "add_pose_noise": True,
        "args": {"pos_std": 0.5, "rot_std": 2.0},
    }
    ds = OPV2VDataset(params, train=False, max_points=2048)
    s = ds[0]
    t10 = s["pairwise_t_matrix"][1, 0]
    p = (t10 @ np.array([0.0, 0, 0, 1]))[:2]
    # noisy relative pose differs from the clean one but not wildly
    assert not np.allclose(p, [8.0, 2.0], atol=1e-3)
    assert np.linalg.norm(p - [8.0, 2.0]) < 5.0

    # reference gate parity (pose_utils.py:14): add_noise alone, without
    # add_pose_noise present-and-true, must leave poses CLEAN
    params2 = dict(PARAMS, root_dir=mock_root, validate_dir=mock_root)
    params2["noise_setting"] = {
        "add_noise": True, "args": {"pos_std": 0.5, "rot_std": 2.0},
    }
    ds2 = OPV2VDataset(params2, train=False, max_points=2048)
    p2 = (ds2[0]["pairwise_t_matrix"][1, 0] @ np.array([0.0, 0, 0, 1]))[:2]
    assert np.allclose(p2, [8.0, 2.0], atol=1e-3)


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


def _stamp_params(root, assignment_path):
    """Heter config in the STAMP yaml_parsers style: m1 and m3 are pillar
    lidars with DIFFERENT ranges, each carrying its own postprocess block
    (per-modality anchors; reference opv2v4stamp_basedataset +
    intermediate_heter_adapter_fusion_dataset.py:90-115)."""
    m3_range = [-8.0, -4.0, -3.0, 8.0, 4.0, 1.0]
    params = dict(PARAMS, root_dir=root, validate_dir=root)
    params["heter"] = {
        "ego_modality": "m1",
        "assignment_path": assignment_path,
        "mapping_dict": {"m1": "m1", "m3": "m3"},
        "modality_setting": {
            "m1": {
                "sensor_type": "lidar",
                "preprocess": {"cav_lidar_range": list(LIDAR_RANGE)},
                "postprocess": {
                    "anchor_args": dict(
                        PARAMS["postprocess"]["anchor_args"]),
                    "target_args": {"pos_threshold": 0.6,
                                    "neg_threshold": 0.45},
                },
            },
            "m3": {
                "sensor_type": "lidar",
                "preprocess": {"cav_lidar_range": m3_range},
                "postprocess": {
                    "anchor_args": {
                        "W": 40, "H": 20, "l": 3.9, "w": 1.6, "h": 1.56,
                        "r": [0, 90], "vw": 0.4, "vh": 0.4,
                        "cav_lidar_range": m3_range, "feature_stride": 4,
                    },
                    "target_args": {"pos_threshold": 0.6,
                                    "neg_threshold": 0.45},
                },
            },
        },
    }
    return params


@pytest.fixture(scope="module")
def stamp_assign(mock_root):
    import json

    path = os.path.join(mock_root, "stamp_assign.json")
    with open(path, "w") as f:
        json.dump({"scenario_00": {"200": "m1", "201": "m3"}}, f)
    return path


def test_stamp_per_modality_range_labels(mock_root, stamp_assign):
    """Each modality's single labels come from ITS OWN range/anchor grid
    (VERDICT r1 #10): m1 at the full range (10x20 grid), m3 at a half
    range (5x10 grid), filled only on that modality's slots."""
    ds = OPV2VDataset(_stamp_params(mock_root, stamp_assign), train=False,
                      max_points=2048)
    s = ds[0]
    assert s["pos_equal_one_single_m1"].shape == (3, 10, 20, 2)
    assert s["pos_equal_one_single_m3"].shape == (3, 5, 10, 2)
    assert s["targets_single_m3"].shape == (3, 5, 10, 14)
    m1_slots = s["modality_mask_m1"]
    m3_slots = s["modality_mask_m3"]
    assert m1_slots.tolist() == [True, False, False]
    assert m3_slots.tolist() == [False, True, False]
    # the GT vehicle at ego (6, 0.5) is inside m1's range -> positives on
    # the m1 slot only
    assert (s["pos_equal_one_single_m1"][0] > 0).any()
    assert not (s["pos_equal_one_single_m1"][1] > 0).any()
    # m3's agent sits at (8, 2) yaw 30: the vehicle is ~2.5 m away in its
    # own frame -> inside m3's smaller range -> positives on slot 1
    assert (s["pos_equal_one_single_m3"][1] > 0).any()
    assert not (s["pos_equal_one_single_m3"][0] > 0).any()


@pytest.mark.slow
def test_stamp_two_range_training(mock_root, stamp_assign):
    """Hetero STAMP trains through the real loader with two different
    lidar ranges: per-modality encoders at their own ranges, adapters into
    the protocol grid, cycle-consistency adapter loss (VERDICT #10 done
    criterion)."""
    import jax
    import jax.numpy as jnp
    import optax

    import gencomm_tpu.loss  # noqa: F401 — populates the LOSSES registry
    from gencomm_tpu.models.heter_baseline import HeterModel
    from gencomm_tpu.registry import LOSSES
    from gencomm_tpu.train.trainer import TrainState, make_train_step

    ds = OPV2VDataset(_stamp_params(mock_root, stamp_assign), train=True,
                      max_points=2048)
    batch = {k: jnp.asarray(v) for k, v in ds.collate([ds[0]]).items()}

    m3_range = [-8.0, -4.0, -3.0, 8.0, 4.0, 1.0]

    def pillar(rng_):
        return {
            "core_method": "point_pillar",
            "encoder_args": {
                "voxel_size": [0.4, 0.4, 4.0], "lidar_range": list(rng_),
                "max_voxels": 2048,
                "pillar_vfe": {"num_filters": [32], "use_norm": True,
                               "with_distance": False,
                               "use_absolute_xyz": True},
            },
            "backbone_args": {"layer_nums": [2], "layer_strides": [2],
                              "num_filters": [48], "upsample_strides": [1],
                              "num_upsample_filter": [48]},
            "shrink_header": {"kernal_size": [3], "stride": [2],
                              "padding": [1], "dim": [64], "input_dim": 48},
        }

    stamp_cfg = {"core_method": "adapterconvnext",
                 "args": {"in_channels": 64, "out_channels": 64,
                          "dim": 32, "num_of_blocks": 1, "kernel_size": 3}}
    model = HeterModel(
        modality_args={"m1": pillar(LIDAR_RANGE), "m3": pillar(m3_range)},
        fusion_method="max", fusion_args={},
        lidar_range=tuple(map(float, LIDAR_RANGE)),
        anchor_number=2, in_head=64,
        use_stamp=True, ego_modality="m1",
        stamp_args={"m3": {"adapter": stamp_cfg, "reverter": stamp_cfg}},
    )
    variables = model.init({"params": jax.random.PRNGKey(0)}, batch,
                           train=True)
    crit = LOSSES.get("adapter_loss")({"p2m_weight": 1.0,
                                       "m2p2m_weight": 1.0,
                                       "m2p_weight": 1.0})
    tx = optax.adam(1e-3)
    state = TrainState(params=variables["params"],
                       batch_stats=variables.get("batch_stats", {}),
                       opt_state=tx.init(variables["params"]), step=0)
    step_fn = make_train_step(model, crit, tx)
    l0 = None
    for i in range(5):
        state, metrics = step_fn(state, batch, jax.random.PRNGKey(2))
        if l0 is None:
            l0 = float(metrics["total_loss"])
    assert np.isfinite(float(metrics["total_loss"]))
    assert float(metrics["total_loss"]) < l0  # cycle loss is shrinking
