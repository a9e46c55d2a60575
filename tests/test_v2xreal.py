"""V2X-Real loader + multi-class machinery on a disk fixture.

Covers VERDICT r1 item #2: the real V2X-Real format (.bin lidar, signed
CAV ids, dataset_mode topologies, class-name super-class mapping), the
gt_boxes/gt_classes alignment fix (classes indexed by the kept-ids list
from projection), per-class anchors + the multi-class label map, the
multi-class loss, and an e2e train -> per-class AP run.

Reference behavior targets:
  v2xreal_basedataset.py (:104-106 eval exclusion, :203-219 modes,
                          :753-770 class mapping)
  voxel_postprocessor.generate_anchor_box_v2xreal:123-186 /
  generate_label_v2xreal:312-463 / post_process_v2xreal:787-943
  point_pillar_v2xreal_loss.py:73-150
"""

import os

import numpy as np
import pytest
import yaml

from gencomm_tpu.data.v2xreal import V2XRealDataset, CLASS_NAMES
from gencomm_tpu.utils.transformation_utils import x_to_world

# heavy suite: excluded from the fast subset (`pytest -m "not slow"`, VERDICT r3 #9)
pytestmark = pytest.mark.slow

LIDAR_RANGE = [-16.0, -8.0, -3.0, 16.0, 8.0, 1.0]

ANCHOR_GEN = [
    {"class_name": "vehicle", "anchor_sizes": [[3.9, 1.6, 1.56]],
     "anchor_rotations": [0, 1.57], "anchor_bottom_heights": [-1.78],
     "align_center": True, "feature_map_stride": 4,
     "matched_threshold": 0.6, "unmatched_threshold": 0.45},
    {"class_name": "pedestrian", "anchor_sizes": [[0.8, 0.6, 1.73]],
     "anchor_rotations": [0, 1.57], "anchor_bottom_heights": [-0.6],
     "align_center": True, "feature_map_stride": 4,
     "matched_threshold": 0.5, "unmatched_threshold": 0.35},
    {"class_name": "truck", "anchor_sizes": [[8.0, 3.0, 3.0]],
     "anchor_rotations": [0, 1.57], "anchor_bottom_heights": [-1.78],
     "align_center": True, "feature_map_stride": 4,
     "matched_threshold": 0.6, "unmatched_threshold": 0.45},
]

# world-frame objects: Car in range, Pedestrian OUT of ego range (the
# alignment trap), Truck in range, Tree = unknown class (dropped)
OBJECTS = {
    100: {"obj_type": "Car", "location": [5.0, 2.0, 0.0],
          "angle": [0.0, 20.0, 0.0], "center": [0.0, 0.0, 0.78],
          "extent": [1.95, 0.8, 0.78]},
    101: {"obj_type": "Pedestrian", "location": [60.0, 30.0, 0.0],
          "angle": [0.0, 0.0, 0.0], "center": [0.0, 0.0, 0.85],
          "extent": [0.4, 0.3, 0.85]},
    102: {"obj_type": "Truck", "location": [-6.0, -3.0, 0.0],
          "angle": [0.0, 95.0, 0.0], "center": [0.0, 0.0, 1.5],
          "extent": [4.0, 1.5, 1.5]},
    103: {"obj_type": "Tree", "location": [2.0, -4.0, 0.0],
          "angle": [0.0, 0.0, 0.0], "center": [0.0, 0.0, 1.0],
          "extent": [0.5, 0.5, 1.0]},
}


def _write_scenario(sc_dir, cav_poses, n_ts=2, rng=None):
    rng = rng or np.random.RandomState(7)
    for cav_id, pose in cav_poses.items():
        cav_dir = os.path.join(sc_dir, cav_id)
        os.makedirs(cav_dir, exist_ok=True)
        for t in range(n_ts):
            ts = f"{t:06d}"
            params = {
                "lidar_pose": [float(x) for x in pose],
                "vehicles": {
                    oid: {k: (list(map(float, v)) if isinstance(v, list)
                              else v)
                          for k, v in obj.items()}
                    for oid, obj in OBJECTS.items()
                },
            }
            with open(os.path.join(cav_dir, f"{ts}.yaml"), "w") as f:
                yaml.dump(params, f)
            # points clustered on the in-range objects, in this cav's frame
            world = []
            for obj in (OBJECTS[100], OBJECTS[102]):
                c = np.asarray(obj["location"], np.float64) + [0, 0, 1.0]
                world.append(c + rng.uniform(-1.2, 1.2, (300, 3))
                             * [1, 0.6, 0.5])
            world = np.concatenate(world)
            hom = np.concatenate([world, np.ones((len(world), 1))], 1)
            local = (hom @ np.linalg.inv(x_to_world(list(pose))).T)[:, :3]
            pts = np.concatenate(
                [local, rng.uniform(0, 1, (len(local), 1))], 1
            ).astype(np.float32)
            pts.tofile(os.path.join(cav_dir, f"{ts}.bin"))


def _params(root, dataset_mode="vc"):
    return {
        "root_dir": root,
        "validate_dir": root,
        "dataset_mode": dataset_mode,
        "train_params": {"max_cav": 3},
        "comm_range": 120,
        "input_source": ["lidar"],
        "label_type": "lidar",
        "preprocess": {"cav_lidar_range": list(LIDAR_RANGE)},
        "postprocess": {
            "max_num": 10,
            "order": "hwl",
            "gt_range": list(LIDAR_RANGE),
            "nms_thresh": 0.15,
            "anchor_args": {
                "cav_lidar_range": list(LIDAR_RANGE),
                "l": 3.9, "w": 1.6, "h": 1.56, "r": [0, 90],
                "vw": 0.4, "vh": 0.4, "feature_stride": 4, "num": 2,
                "anchor_generator_config": [dict(c) for c in ANCHOR_GEN],
            },
            "target_args": {"pos_threshold": 0.6, "neg_threshold": 0.45,
                            "score_threshold": 0.2},
        },
    }


@pytest.fixture(scope="module")
def v2xreal_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("v2xreal"))
    _write_scenario(
        os.path.join(root, "2023-03-17_scene0"),
        {"1": [0.0, 0.0, 1.9, 0, 0, 0],      # vehicle (ego in vc)
         "-1": [10.0, 3.0, 4.5, 0, 15, 0],   # infrastructure
         "2": [-8.0, -2.0, 1.9, 0, 180, 0]},
    )
    _write_scenario(
        os.path.join(root, "2023-04-07_scene1"),  # excluded at eval (non-v2v)
        {"1": [0.0, 0.0, 1.9, 0, 0, 0], "-1": [10.0, 3.0, 4.5, 0, 15, 0]},
    )
    return root


def test_class_alignment_with_dropped_objects(v2xreal_root):
    """The pedestrian (101) is out of ego range and dropped by projection;
    gt_classes must stay aligned with the kept gt_boxes (vehicle, truck) —
    the round-1 first-appearance ordering got this wrong."""
    ds = V2XRealDataset(_params(v2xreal_root), train=False, max_points=1024)
    s = ds[0]
    n = int(s["gt_mask"].sum())
    assert n == 2
    classes = s["gt_classes"][:n]
    # object order follows yaml union order (100 before 102)
    assert classes.tolist() == [CLASS_NAMES.index("vehicle") + 1,
                                CLASS_NAMES.index("truck") + 1]
    # the truck box really is the large one
    truck_i = classes.tolist().index(CLASS_NAMES.index("truck") + 1)
    assert s["gt_boxes"][truck_i, 5] > 6.0  # hwl order: l last


def test_unknown_class_filtered(v2xreal_root):
    ds = V2XRealDataset(_params(v2xreal_root), train=False, max_points=1024)
    s = ds[0]
    # Tree (103) sits in range but is outside the class vocabulary
    assert int(s["gt_mask"].sum()) == 2


def test_dataset_modes(v2xreal_root):
    # vc: vehicles first (ego), infra appended
    ds = V2XRealDataset(_params(v2xreal_root, "vc"), train=False,
                        max_points=64)
    sc = list(ds.scenario_database.values())[0]
    ids = list(sc.keys())
    assert int(ids[0]) >= 0 and int(ids[-1]) < 0
    # i2i: only infrastructure
    ds = V2XRealDataset(_params(v2xreal_root, "i2i"), train=False,
                        max_points=64)
    ids = list(list(ds.scenario_database.values())[0].keys())
    assert all(int(i) < 0 for i in ids)
    # v2v: no infrastructure
    ds = V2XRealDataset(_params(v2xreal_root, "v2v"), train=False,
                        max_points=64)
    ids = list(list(ds.scenario_database.values())[0].keys())
    assert all(int(i) >= 0 for i in ids)


def test_eval_scenario_exclusion(v2xreal_root):
    ds_eval = V2XRealDataset(_params(v2xreal_root, "vc"), train=False,
                             max_points=64)
    assert all("2023-04-07" not in sc for sc in ds_eval.scenario_database)
    ds_train = V2XRealDataset(_params(v2xreal_root, "vc"), train=True,
                              max_points=64)
    assert any("2023-04-07" in sc for sc in ds_train.scenario_database)
    # v2v eval keeps them
    ds_v2v = V2XRealDataset(_params(v2xreal_root, "v2v"), train=False,
                            max_points=64)
    assert any("2023-04-07" in sc for sc in ds_v2v.scenario_database)


def test_bin_points_loaded(v2xreal_root):
    ds = V2XRealDataset(_params(v2xreal_root), train=False, max_points=1024)
    s = ds[0]
    assert s["point_mask_m1"][0].sum() == 600  # 2 clusters x 300 points
    pts = s["points_m1"][0][s["point_mask_m1"][0]]
    assert np.isfinite(pts).all()


def test_multiclass_label_map(v2xreal_root):
    ds = V2XRealDataset(_params(v2xreal_root), train=False, max_points=1024)
    s = ds[0]
    C, A = 3, 2
    gh, gw = 40 // 4, 80 // 4
    assert s["pos_equal_one"].shape == (gh, gw, C * A)
    assert s["targets"].shape == (gh, gw, C * A * 7)
    lab = s["pos_equal_one"]
    vals = set(np.unique(lab).tolist())
    assert vals <= {-1.0, 0.0, 1.0, 3.0}  # no pedestrian GT in range
    # positives for class c live only in class c's anchor block
    blocks = lab.reshape(gh, gw, C, A)
    assert (blocks[:, :, 0] == 1).any()      # vehicle positives exist
    assert (blocks[:, :, 2] == 3).any()      # truck positives exist
    assert not (blocks[:, :, 0] > 1).any()
    assert not (blocks[:, :, 1] > 0).any()
    assert not ((blocks[:, :, 2] > 0) & (blocks[:, :, 2] != 3)).any()


def test_multiclass_loss_runs_and_separates(v2xreal_root):
    import jax.numpy as jnp
    from gencomm_tpu.loss.v2xreal_loss import PointPillarV2XRealLoss

    ds = V2XRealDataset(_params(v2xreal_root), train=False, max_points=1024)
    s = ds[0]
    C, A = 3, 2
    gh, gw = s["pos_equal_one"].shape[:2]
    crit = PointPillarV2XRealLoss({"num_class": C, "cls_weight": 1.0,
                                   "reg": 2.0})
    target = {"pos_equal_one": jnp.asarray(s["pos_equal_one"][None]),
              "targets": jnp.asarray(s["targets"][None])}
    rng = np.random.default_rng(0)
    mk = lambda sc: {  # noqa: E731
        "cls_preds": jnp.asarray(
            rng.normal(0, sc, (1, gh, gw, A * C * C)).astype(np.float32)),
        "reg_preds": jnp.asarray(
            rng.normal(0, sc, (1, gh, gw, A * C * 7)).astype(np.float32)),
    }
    l_rand = crit(mk(1.0), target)
    assert np.isfinite(float(l_rand["total_loss"]))
    # perfect logits on the labeled map -> much smaller cls loss
    lab = s["pos_equal_one"].reshape(-1)
    onehot = np.zeros((lab.size, C), np.float32)
    for i, v in enumerate(lab):
        if v > 0:
            onehot[i, int(v) - 1] = 1.0
    perfect = {
        "cls_preds": jnp.asarray(
            ((onehot * 2 - 1) * 12).reshape(1, gh, gw, A * C * C)),
        "reg_preds": jnp.asarray(s["targets"][None]),
    }
    l_perf = crit(perfect, target)
    assert float(l_perf["cls_loss"]) < 0.05 * float(l_rand["cls_loss"])
    assert float(l_perf["reg_loss"]) < 1e-6


def test_anchor_and_label_golden_parity(v2xreal_root):
    """Run the reference's generate_anchor_box_v2xreal + generate_label_
    v2xreal as the oracle (float IoU injected for the Cython
    bbox_overlaps, same convention both sides — see golden2)."""
    import sys
    import types

    REF = "/root/reference"
    if not os.path.isdir(os.path.join(REF, "opencood")):
        pytest.skip("reference checkout not mounted")
    if "icecream" not in sys.modules:
        ice = types.ModuleType("icecream")
        ice.ic = lambda *a, **k: None
        sys.modules["icecream"] = ice
    if "shapely" not in sys.modules:
        shap = types.ModuleType("shapely")
        geom = types.ModuleType("shapely.geometry")
        geom.Polygon = geom.Point = geom.MultiPoint = object
        shap.geometry = geom
        sys.modules["shapely"] = shap
        sys.modules["shapely.geometry"] = geom
    if "pyquaternion" not in sys.modules:
        pq = types.ModuleType("pyquaternion")
        pq.Quaternion = object  # only used by DAIR calib paths
        sys.modules["pyquaternion"] = pq
    for name, attrs in (
        ("opencood.utils.box_overlaps", {"bbox_overlaps": None}),
        ("opencood.visualization.vis_utils", {}),
    ):
        if name not in sys.modules:
            mod = types.ModuleType(name)
            for k, v in attrs.items():
                setattr(mod, k, v)
            sys.modules[name] = mod
    sys.path.insert(0, REF)
    try:
        import opencood.data_utils.post_processor.voxel_postprocessor as rvp
        from gencomm_tpu.data.postprocessor import (
            generate_anchor_box_multiclass, generate_label_multiclass,
        )

        aa = _params(v2xreal_root)["postprocess"]["anchor_args"]
        aa = dict(aa, W=80, H=40)
        ref_pp = object.__new__(rvp.VoxelPostprocessor)
        ref_pp.params = {"anchor_args": aa, "order": "hwl",
                         "max_num": 10}
        ref_pp.order = "hwl"
        ref_pp.anchor_generator_config = ANCHOR_GEN
        ref_pp.anchor_sizes = [c["anchor_sizes"] for c in ANCHOR_GEN]
        ref_pp.anchor_rotations = [c["anchor_rotations"] for c in ANCHOR_GEN]
        ref_pp.anchor_heights = [c["anchor_bottom_heights"]
                                 for c in ANCHOR_GEN]
        ref_pp.align_center = [c["align_center"] for c in ANCHOR_GEN]
        ref_pp.anchor_class_names = [c["class_name"] for c in ANCHOR_GEN]
        ref_pp.matched_thresholds = {
            c["class_name"]: c["matched_threshold"] for c in ANCHOR_GEN}
        ref_pp.unmatched_thresholds = {
            c["class_name"]: c["unmatched_threshold"] for c in ANCHOR_GEN}
        ref_pp.grid_size = np.array([80, 40])
        ref_pp.cav_lidar_range = LIDAR_RANGE

        ref_anchors, ref_npl = ref_pp.generate_anchor_box_v2xreal()
        ours, matched, unmatched, names = generate_anchor_box_multiclass(
            aa, "hwl")
        assert names == [c["class_name"] for c in ANCHOR_GEN]
        for c in range(3):
            np.testing.assert_allclose(ours[c], ref_anchors[c], atol=1e-5)

        # label parity on the fixture GT
        ds = V2XRealDataset(_params(v2xreal_root), train=False,
                            max_points=64)
        s = ds[0]
        gt8 = np.concatenate(
            [s["gt_boxes"], s["gt_classes"][:, None].astype(np.float64)],
            axis=1,
        )

        def bbox_overlaps_float(boxes, query):
            x1 = np.maximum(boxes[:, None, 0], query[None, :, 0])
            y1 = np.maximum(boxes[:, None, 1], query[None, :, 1])
            x2 = np.minimum(boxes[:, None, 2], query[None, :, 2])
            y2 = np.minimum(boxes[:, None, 3], query[None, :, 3])
            inter = np.clip(x2 - x1, 0, None) * np.clip(y2 - y1, 0, None)
            area_a = ((boxes[:, 2] - boxes[:, 0])
                      * (boxes[:, 3] - boxes[:, 1]))[:, None]
            area_b = ((query[:, 2] - query[:, 0])
                      * (query[:, 3] - query[:, 1]))[None, :]
            return (inter / np.maximum(area_a + area_b - inter, 1e-12)
                    ).astype(np.float64)

        old = rvp.bbox_overlaps
        rvp.bbox_overlaps = bbox_overlaps_float
        try:
            ref_label = ref_pp.generate_label_v2xreal(
                gt_box_center=gt8, anchors=list(ref_anchors),
                num_anchors_per_location=ref_npl, mask=s["gt_mask"],
            )
        finally:
            rvp.bbox_overlaps = old

        got = generate_label_multiclass(
            s["gt_boxes"], s["gt_classes"], s["gt_mask"], ours,
            matched, unmatched, "hwl",
        )
        np.testing.assert_allclose(
            got["pos_equal_one"], ref_label["pos_equal_one"], atol=1e-6)
        np.testing.assert_allclose(
            got["targets"].reshape(ref_label["targets"].shape),
            ref_label["targets"], atol=1e-5, rtol=1e-5)
    finally:
        sys.path.remove(REF)


@pytest.mark.slow
def test_e2e_train_and_multiclass_ap(v2xreal_root):
    """Overfit the heter model (num_class=3) on one fixture frame, then
    decode with decode_and_nms_multiclass and score per-class AP — the
    vehicle and truck classes must be detected with their own labels."""
    import jax
    import jax.numpy as jnp
    import optax

    from gencomm_tpu.models.heter_baseline import HeterModel
    from gencomm_tpu.loss.v2xreal_loss import PointPillarV2XRealLoss
    from gencomm_tpu.data.postprocessor import decode_and_nms_multiclass
    from gencomm_tpu.utils import box_utils, eval_utils
    from gencomm_tpu.train.trainer import (
        TrainState, make_train_step, refresh_batch_stats,
    )

    ds = V2XRealDataset(_params(v2xreal_root), train=True, max_points=1024)
    s = ds[0]
    batch = {k: jnp.asarray(np.asarray(v)[None]) for k, v in s.items()}

    m1 = {
        "core_method": "point_pillar",
        "encoder_args": {
            "voxel_size": [0.4, 0.4, 4.0], "lidar_range": list(LIDAR_RANGE),
            "max_voxels": 2048,
            "pillar_vfe": {"num_filters": [32], "use_norm": True,
                           "with_distance": False, "use_absolute_xyz": True},
        },
        "backbone_args": {"layer_nums": [2], "layer_strides": [2],
                          "num_filters": [48], "upsample_strides": [1],
                          "num_upsample_filter": [48]},
        "shrink_header": {"kernal_size": [3], "stride": [2], "padding": [1],
                          "dim": [64], "input_dim": 48},
    }
    model = HeterModel(
        modality_args={"m1": m1}, fusion_method="max", fusion_args={},
        lidar_range=tuple(LIDAR_RANGE), anchor_number=2, num_class=3,
        in_head=64,
    )
    variables = model.init({"params": jax.random.PRNGKey(0)}, batch,
                           train=True)
    # head width sanity: A*C*C cls / A*C*7 reg channels
    out0 = model.apply(variables, batch, train=False)
    gh, gw = s["pos_equal_one"].shape[:2]
    assert out0["cls_preds"].shape == (1, gh, gw, 2 * 3 * 3)
    assert out0["reg_preds"].shape == (1, gh, gw, 2 * 3 * 7)

    crit = PointPillarV2XRealLoss({"num_class": 3, "cls_weight": 1.0,
                                   "reg": 2.0})
    tx = optax.adam(2e-3)
    state = TrainState(
        params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        opt_state=tx.init(variables["params"]),
        step=0,
    )
    step_fn = make_train_step(model, crit, tx)
    rng = jax.random.PRNGKey(1)
    for i in range(120):
        state, metrics = step_fn(state, batch, rng)
    assert float(metrics["total_loss"]) < 2.0

    # short smoke runs leave BN running averages unconverged (momentum
    # 0.99); recalibrate before eval-mode decode
    state = refresh_batch_stats(model, state, [batch], jax.random.PRNGKey(2))

    out = model.apply(
        {"params": state.params, "batch_stats": state.batch_stats},
        batch, train=False,
    )
    det = decode_and_nms_multiclass(
        out["cls_preds"][0], out["reg_preds"][0],
        jnp.asarray(ds.anchors_mc), jnp.eye(4),
        jnp.asarray(LIDAR_RANGE, jnp.float32),
        score_threshold=0.2, nms_thresh=0.15, topk=64,
    )
    valid = np.asarray(det.valid)
    corners = np.asarray(det.corners3d)[valid]
    scores = np.asarray(det.scores)[valid]
    labels = np.asarray(det.labels)[valid]
    assert valid.sum() >= 2

    stats = eval_utils.new_multiclass_stat(CLASS_NAMES)
    n = int(s["gt_mask"].sum())
    gt_corners = box_utils.boxes_to_corners_3d(
        np.asarray(s["gt_boxes"][:n]), "hwl")
    for ci, cname in enumerate(CLASS_NAMES):
        csel = labels == ci + 1
        gsel = s["gt_classes"][:n] == ci + 1
        for t in (0.3, 0.5, 0.7):
            eval_utils.calculate_tp_fp(
                corners[csel], scores[csel], gt_corners[gsel],
                stats[cname], t,
            )
    res = eval_utils.eval_multiclass_results(stats)
    assert res["vehicle"]["ap30"] > 0.6
    assert res["truck"]["ap30"] > 0.6
    assert res["map30"] >= 0  # pedestrian class empty -> 0 contribution


@pytest.mark.slow
def test_v2xreal_cli_train_and_multiclass_inference(v2xreal_root, tmp_path):
    """Reference tools/inference_v2xreal.py parity: the train CLI runs on
    the V2X-Real fixture and the inference CLI takes the multiclass branch
    (per anchor-class decode -> per-class VOC AP + mAP yaml)."""
    from gencomm_tpu.tools import train as train_cli
    from gencomm_tpu.tools import inference as infer_cli

    base = _params(v2xreal_root)
    hypes = {
        "name": "v2xreal_e2e",
        **{k: base[k] for k in ("root_dir", "validate_dir", "dataset_mode",
                                "comm_range", "input_source", "label_type")},
        "train_params": {"max_cav": 3, "batch_size": 1, "epoches": 1,
                         "save_freq": 1},
        "preprocess": {"core_method": "SpVoxelPreprocessor",
                       "args": {"voxel_size": [0.4, 0.4, 4.0]},
                       "cav_lidar_range": list(LIDAR_RANGE)},
        "postprocess": dict(base["postprocess"], **{
            "core_method": "VoxelPostprocessor",
            "num_class": 3,
            "dir_args": {"dir_offset": 0.7853, "num_bins": 2,
                         "anchor_yaw": [0, 90]},
        }),
        "model": {"core_method": "heter_model_baseline", "args": {
            "ego_modality": "m1",
            "lidar_range": list(map(float, LIDAR_RANGE)),
            "num_class": 3,
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
            "fusion_method": "max",
            "in_head": 64, "anchor_number": 2,
            "dir_args": {"dir_offset": 0.7853, "num_bins": 2,
                         "anchor_yaw": [0, 90]},
        }},
        "loss": {"core_method": "point_pillar_v2xreal_loss",
                 "args": {"num_class": 3, "cls_weight": 1.0, "reg": 2.0}},
        "optimizer": {"core_method": "Adam", "lr": 0.002,
                      "args": {"eps": 1e-10, "weight_decay": 1e-4}},
        "lr_scheduler": {"core_method": "constant"},
    }
    cfg = tmp_path / "v2xreal_e2e.yaml"
    cfg.write_text(yaml.safe_dump(hypes))
    model_dir = str(tmp_path / "v2xreal_run")
    from gencomm_tpu.train import checkpoint

    train_cli.main(["-y", str(cfg), "--model_dir", model_dir,
                    "--dataset", "v2xreal", "--epochs", "1",
                    "--steps_per_epoch", "2", "--val_steps", "1"])
    assert checkpoint.latest_checkpoint(model_dir) is not None
    res = infer_cli.main(["--model_dir", model_dir, "--dataset", "v2xreal",
                          "--frames", "1"])
    assert set(res) >= {"vehicle_ap30", "pedestrian_ap30", "truck_ap30",
                        "map30", "map50", "map70"}
    for v in res.values():
        assert 0.0 <= v <= 1.0
    assert os.path.exists(os.path.join(model_dir, "eval_multiclass.yaml"))
    # agents-in-order sweep drives the same multiclass branch with the
    # agent mask capped (inference_v2xreal_heter_in_order parity)
    res1 = infer_cli.main(["--model_dir", model_dir, "--dataset", "v2xreal",
                           "--frames", "1", "--use_cav", "1",
                           "--infer_info", "in_order_1cav"])
    assert "map30" in res1
    assert os.path.exists(
        os.path.join(model_dir, "eval_multiclass_in_order_1cav.yaml"))
