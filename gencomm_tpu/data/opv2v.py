"""OPV2V / OPV2V-H / V2XSet directory-format dataset.

Parity: opencood/data_utils/datasets/basedataset/opv2v_basedataset.py +
intermediate_heter_fusion_dataset.py. On-disk layout:

    root/scenario_xx/cav_id/timestamp.yaml   (poses + vehicles GT)
    root/scenario_xx/cav_id/timestamp.pcd    (lidar)

The loader emits the model's padded batch format directly (ARCHITECTURE.md):
points (B, L, P, 4) + masks + pairwise transforms + anchor labels + GT.
Host-side numpy only; voxelization happens on-device.

Supported robustness settings (SURVEY.md §5):
  pose noise    noise_setting -> utils/pose_utils (reference pose_utils.py:9)
  comm delay    time_delay frames: non-ego agents replay an earlier
                timestamp's points/pose while GT stays current
                (opv2v_basedataset.py:630-744, 'sim' AND 'real' modes,
                100 ms frames; real adds uniform overhead + data_size /
                transmission_speed + backbone terms)

Camera modalities (sensor_type: camera in heter.modality_setting) load the
real image ring per CAV — {ts}_imgs.hdf5 fast path or {ts}_camera{i}.png —
with intrinsics/extrinsics from the yaml, LSS image augmentation and
optional GT depth maps (see data/camera.py). label_type: camera filters GT
to camera-visible objects via {ts}_bev_visibility.png
(base_postprocessor.generate_visible_object_center:614).
"""

from __future__ import annotations

import os
from collections import OrderedDict

import numpy as np
import yaml

from gencomm_tpu.utils import box_utils, pcd_utils
from gencomm_tpu.utils.pose_utils import add_noise_to_poses
from gencomm_tpu.utils.transformation_utils import (
    get_pairwise_transformation,
    x_to_world,
    x1_to_x2,
)
from gencomm_tpu.data.postprocessor import generate_anchor_box, generate_label
from gencomm_tpu.registry import DATASETS


def load_cav_yaml(path: str) -> dict:
    with open(path, "r") as f:
        return yaml.safe_load(f)


def project_world_objects(vehicles: dict, lidar_pose, lidar_range,
                          max_num: int, order: str = "hwl"):
    """Vehicle dicts (world frame) -> padded (max_num, 7) boxes in the
    lidar frame + mask + kept object ids.

    Parity: box_utils.project_world_objects:491-553 (location+center offset,
    CARLA angles, extent = half dims, corner->center re-fit, range mask).
    """
    boxes = np.zeros((max_num, 7), np.float32)
    mask = np.zeros(max_num, np.float32)
    ids = []
    n = 0
    for oid, content in vehicles.items():
        if n >= max_num:
            break
        loc = content["location"]
        ang = content["angle"]  # roll, yaw, pitch
        center = content.get("center", [0, 0, 0])
        extent = content["extent"]  # half l, w, h
        obj_pose = [loc[0] + center[0], loc[1] + center[1], loc[2] + center[2],
                    ang[0], ang[1], ang[2]]
        obj2lidar = x1_to_x2(obj_pose, list(lidar_pose))
        corners = box_utils.create_bbx(extent)  # (8, 3)
        hom = np.concatenate([corners, np.ones((8, 1))], axis=1)
        corners_lidar = (hom @ obj2lidar.T)[:, :3][None]
        box7 = box_utils.corner_to_center(corners_lidar, order=order)[0]
        xy = corners_lidar[0, :4, :2]
        inside = (
            (xy[:, 0] >= lidar_range[0]) & (xy[:, 0] <= lidar_range[3])
            & (xy[:, 1] >= lidar_range[1]) & (xy[:, 1] <= lidar_range[4])
        )
        if not inside.any():
            continue
        boxes[n] = box7
        mask[n] = 1.0
        ids.append(oid)
        n += 1
    return boxes, mask, ids


def project_world_objects_multi(vehicles: dict, poses: np.ndarray,
                                lidar_range, max_num: int,
                                order: str = "hwl"):
    """Vectorized L-agent variant of :func:`project_world_objects`.

    One pass parses the object dicts and batch-transforms all K objects
    into all L agent frames ((L, K) einsum instead of L x K python-loop
    iterations) — this was the serialized host hot spot the round-1 trace
    blamed for the wall/device train-step gap (VERDICT r1 weak #5).

    Returns (boxes (L, max_num, 7), masks (L, max_num), ids: per-agent
    kept-object-id lists), matching the single-agent function's semantics
    (insertion order, any-of-first-4-corners-in-xy-range keep rule,
    max_num cap).
    """
    from gencomm_tpu.utils.transformation_utils import x_to_world_batch

    L = len(poses)
    boxes = np.zeros((L, max_num, 7), np.float32)
    masks = np.zeros((L, max_num), np.float32)
    ids: list[list] = [[] for _ in range(L)]
    if not vehicles or L == 0:
        return boxes, masks, ids
    oids = list(vehicles)
    obj_poses = np.array(
        [[v["location"][0] + v.get("center", (0, 0, 0))[0],
          v["location"][1] + v.get("center", (0, 0, 0))[1],
          v["location"][2] + v.get("center", (0, 0, 0))[2],
          v["angle"][0], v["angle"][1], v["angle"][2]]
         for v in vehicles.values()], np.float64)
    extents = np.array([v["extent"] for v in vehicles.values()], np.float64)
    corners = box_utils.create_bbx_batch(extents)  # (K, 8, 3)
    hom = np.concatenate([corners, np.ones_like(corners[..., :1])], -1)
    obj2world = x_to_world_batch(obj_poses)  # (K, 4, 4)
    world_c = np.einsum("kij,kpj->kpi", obj2world, hom)  # (K, 8, 4)
    agent2world = x_to_world_batch(np.asarray(poses))  # (L, 4, 4)
    # corners in each agent frame: solve(T_agent, world) batched over (L, K)
    agent_c = np.linalg.solve(
        agent2world[:, None], np.swapaxes(world_c, -1, -2)[None]
    )  # (L, K, 4, 8)
    agent_c = np.swapaxes(agent_c, -1, -2)[..., :3]  # (L, K, 8, 3)
    K = len(oids)
    box7 = box_utils.corner_to_center(
        agent_c.reshape(L * K, 8, 3), order=order
    ).reshape(L, K, 7)
    xy = agent_c[:, :, :4, :2]
    inside = (
        (xy[..., 0] >= lidar_range[0]) & (xy[..., 0] <= lidar_range[3])
        & (xy[..., 1] >= lidar_range[1]) & (xy[..., 1] <= lidar_range[4])
    ).any(axis=2)  # (L, K)
    for i in range(L):
        kept = np.nonzero(inside[i])[0][:max_num]
        n = len(kept)
        boxes[i, :n] = box7[i, kept]
        masks[i, :n] = 1.0
        ids[i] = [oids[k] for k in kept]
    return boxes, masks, ids


@DATASETS.register("opv2v")
class OPV2VDataset:
    """Directory-scan dataset producing padded model batches."""

    def __init__(self, params: dict, train: bool = True,
                 max_points: int = 40000):
        self.params = params
        self.train = train
        self.max_points = max_points
        split_dir = params["root_dir"] if train else params["validate_dir"]
        self.root = split_dir
        self.max_cav = params.get("train_params", {}).get("max_cav", 5)
        self.comm_range = params.get("comm_range", 70.0)
        self.max_num = params["postprocess"]["max_num"]
        self.lidar_range = params["preprocess"]["cav_lidar_range"]
        self.anchors = generate_anchor_box(
            params["postprocess"]["anchor_args"],
            params["postprocess"].get("order", "hwl"),
        )
        self.pos_threshold = params["postprocess"]["target_args"]["pos_threshold"]
        self.neg_threshold = params["postprocess"]["target_args"]["neg_threshold"]
        self.noise_setting = params.get("noise_setting")
        margs = params.get("model", {}).get("args", {})
        core = params.get("model", {}).get("core_method", "").lower()
        self.per_agent_labels = bool(margs.get("supervise_single")) or any(
            core.startswith(c) for c in
            ("ciassd", "second", "fpvrcnn", "point_pillar_uncertainty")
        )
        # comm delay (opv2v_basedataset.py:706-744). Two sources of config:
        # wild_setting (HEAL style) or noise_setting.async_args; two modes:
        # 'sim' (fixed / random frames) and 'real' (uniform overhead +
        # data-size/transmission-speed + backbone-compute terms, re-drawn
        # per sample in _delay_frames).
        wild = dict(params.get("wild_setting", {}))
        ns = params.get("noise_setting") or {}
        if ns.get("add_noise") and ns.get("add_async_noise"):
            aa = ns.get("async_args", {})
            wild = {
                "async": True,
                "async_mode": aa.get("async_mode", "sim"),
                "async_overhead": aa.get("async_overhead", 0),
                "async_method": aa.get("async_method", ""),
                "backbone_delay": aa.get("backbone_delay", 0),
                "data_size": aa.get("data_size", 0),
                "transmission_speed": aa.get("transmission_speed", 27),
            }
        self.async_flag = bool(wild.get("async", False))
        self.async_mode = wild.get("async_mode", "sim")
        self.async_method = wild.get("async_method", "")
        self.async_overhead = float(wild.get("async_overhead", 0))
        self.backbone_delay = float(wild.get("backbone_delay", 0))
        self.data_size = float(wild.get("data_size", 0))
        self.transmission_speed = float(wild.get("transmission_speed", 27))

        # heterogeneity controller (modality assignment / mapping / lidar
        # channel switch; heter_utils.Adaptor parity)
        from gencomm_tpu.utils.heter_utils import Adaptor

        self.adaptor = Adaptor.from_hypes(params, train)
        self.model_modalities = (
            self.adaptor.model_modality_list if self.adaptor else ["m1"]
        )
        hset = params.get("heter", {}).get("modality_setting", {})
        self.lidar_modalities = [
            m for m in self.model_modalities
            if hset.get(m, {"sensor_type": "lidar"}).get(
                "sensor_type", "lidar") == "lidar"
        ]
        # camera modalities: name -> data_aug_conf (drives image aug + the
        # per-cam tensor shapes; intermediate_heter_fusion_dataset.py:494+)
        self.camera_modalities = {
            m: hset[m]["data_aug_conf"]
            for m in self.model_modalities
            if hset.get(m, {}).get("sensor_type") == "camera"
        }
        if not self.lidar_modalities and not self.camera_modalities:
            self.lidar_modalities = ["m1"]
        self.label_type = params.get("label_type", "lidar")
        self.use_hdf5 = params.get("use_hdf5", True)
        # STAMP yaml_parsers variant: a modality_setting may carry its OWN
        # postprocess block (own lidar range + anchor grid) — per-agent
        # labels for such modalities are generated at that modality's range
        # (opv2v4stamp_basedataset.py + intermediate_heter_adapter_fusion_
        # dataset.py:90-115,678: post_processor_dict[modality].generate_label
        # with anchor_box_{modality})
        self.modality_post = {}
        for m in self.model_modalities:
            mpost = hset.get(m, {}).get("postprocess")
            if not mpost or "anchor_args" not in mpost:
                continue
            m_order = mpost.get("order",
                                params["postprocess"].get("order", "hwl"))
            tgt = mpost.get("target_args",
                            params["postprocess"]["target_args"])
            aa = mpost["anchor_args"]
            self.modality_post[m] = {
                "anchors": generate_anchor_box(aa, m_order),
                "range": list(
                    hset[m].get("preprocess", {}).get(
                        "cav_lidar_range", aa["cav_lidar_range"])),
                "pos": tgt["pos_threshold"],
                "neg": tgt["neg_threshold"],
            }
        # GT depth maps for LSS depth supervision, gated like the
        # reference's load_depth_file (opv2v_basedataset.py:63)
        self.load_depth = "depth" in params.get("input_source", [])

        self.rng = np.random.RandomState(params.get("seed", 303))
        # world-level augmentation — present only in early/late configs
        # (opv2v_basedataset.py:42-45; applied late_fusion_dataset.py:167 /
        # early_fusion_dataset.py:105)
        self.fusion_mode = params.get("fusion", {}).get(
            "core_method", "").lower()
        self.augmentor = None
        if "data_augment" in params:
            from gencomm_tpu.data.augmentor import DataAugmentor

            self.augmentor = DataAugmentor(
                params["data_augment"], train, params.get("seed", 303))
        self.reinitialize()

    # ------------------------------------------------------------------
    # subclass hooks (V2X-Real overrides these; see data/v2xreal.py)
    def _keep_scenario(self, scenario_name: str) -> bool:
        return True

    def _order_cavs(self, cavs: list) -> list:
        """CAV ordering inside one scenario; train shuffles
        (opv2v_basedataset.py:170-176)."""
        if self.train:
            return list(self.rng.permutation(cavs))
        return cavs

    def _filter_vehicles(self, vehicles: dict) -> dict:
        """Per-yaml GT object filter (identity for OPV2V; V2X-Real maps
        class names to super-class ids and drops unknown classes)."""
        return vehicles

    def _read_lidar(self, entry: dict, ts: str, modality: str) -> np.ndarray:
        """One CAV's point cloud (OPV2V: .pcd with ego-return masking and
        the Adaptor's 32/16-channel swap)."""
        pcd_path = os.path.join(entry["path"], f"{ts}.pcd")
        if self.adaptor is not None:
            switched = self.adaptor.switch_lidar_channels(modality, pcd_path)
            if os.path.exists(switched):
                pcd_path = switched
        pts = pcd_utils.read_pcd(pcd_path)
        pts = pcd_utils.mask_ego_points(pts)
        if self.train:
            pts = pcd_utils.shuffle_points(pts, self.rng)
        return pts

    def _labels_for(self, gt_boxes, gt_mask, gt_ids, vehicles_union) -> dict:
        """GT -> anchor training targets (+ any extra GT keys). V2X-Real
        overrides with per-class anchors/labels."""
        label = generate_label(
            gt_boxes, gt_mask, self.anchors, self.pos_threshold,
            self.neg_threshold,
        )
        return {
            "pos_equal_one": label["pos_equal_one"],
            "neg_equal_one": label["neg_equal_one"],
            "targets": label["targets"],
        }

    # ------------------------------------------------------------------
    def reinitialize(self):
        """Rebuild the scenario DB, shuffling CAV order at train time
        (opv2v_basedataset.py:160-278)."""
        self.scenario_database = OrderedDict()
        self.index_map = []  # flat idx -> (scenario, timestamp)
        scenarios = sorted(
            d for d in os.listdir(self.root)
            if os.path.isdir(os.path.join(self.root, d))
        )
        for sc in scenarios:
            if not self._keep_scenario(sc):
                continue
            sc_path = os.path.join(self.root, sc)
            cavs = sorted(
                d for d in os.listdir(sc_path)
                if os.path.isdir(os.path.join(sc_path, d))
            )
            cavs = self._order_cavs(cavs)
            if not cavs:
                continue
            cavs = cavs[: self.max_cav]
            db = OrderedDict()
            timestamps = None
            for cav in cavs:
                cav_path = os.path.join(sc_path, cav)
                ts = sorted(
                    f[:-5] for f in os.listdir(cav_path)
                    if f.endswith(".yaml") and "additional" not in f
                )
                db[cav] = {"path": cav_path, "timestamps": ts}
                if timestamps is None or len(ts) < len(timestamps):
                    timestamps = ts
            self.scenario_database[sc] = db
            for t in timestamps or []:
                self.index_map.append((sc, t))

    def __len__(self):
        return len(self.index_map)

    # ------------------------------------------------------------------
    def _delay_frames(self) -> int:
        """Per-CAV comm delay in 100 ms dataset frames.

        Parity: opv2v_basedataset.time_delay_calculation:706-744 — 'real'
        mode re-draws uniform(0, overhead) and adds transmission
        (data_size/speed in ms) + backbone-compute terms; 'sim' mode is a
        fixed overhead, or randint(0, overhead)+100 with async_method
        'random'. Quantized to the 10 Hz frame grid.
        """
        if not self.async_flag:
            return 0
        if self.async_mode == "real":
            overhead_noise = self.rng.uniform(0, self.async_overhead)
            tc = self.data_size / self.transmission_speed * 1000.0
            delay_ms = overhead_noise + tc + self.backbone_delay
        else:  # 'sim'
            if self.async_overhead > 0:
                if self.async_method == "random":
                    delay_ms = self.rng.randint(
                        0, int(self.async_overhead)) + 100
                else:
                    delay_ms = self.async_overhead
            else:
                delay_ms = 0
        return int(delay_ms) // 100

    # ------------------------------------------------------------------
    def __getitem__(self, idx: int) -> dict:
        sc, timestamp = self.index_map[idx]
        db = self.scenario_database[sc]
        L, P = self.max_cav, self.max_points

        # gather per-cav data; ego = first cav
        cav_list = list(db.keys())
        if self.adaptor is not None and not self.train:
            cav_list = self.adaptor.reorder_cav_list(cav_list, sc)
        ego_path = db[cav_list[0]]["path"]
        ego_yaml = load_cav_yaml(os.path.join(ego_path, f"{timestamp}.yaml"))
        ego_pose = np.array(ego_yaml["lidar_pose"], np.float64)

        agents, poses, vehicles_union = [], [], OrderedDict()
        agent_modalities = []
        cam_slots = {m: {} for m in self.camera_modalities}  # m -> slot -> dict
        for ci, cav in enumerate(cav_list):
            entry = db[cav]
            ts = timestamp
            delay_frames = self._delay_frames() if ci > 0 else 0
            if delay_frames > 0:
                tlist = entry["timestamps"]
                ti = max(tlist.index(timestamp) - delay_frames, 0) \
                    if timestamp in tlist else 0
                ts = tlist[ti]
            ypath = os.path.join(entry["path"], f"{ts}.yaml")
            if not os.path.exists(ypath):
                continue
            cyaml = load_cav_yaml(ypath)
            pose = np.array(cyaml["lidar_pose"], np.float64)
            dist = np.hypot(pose[0] - ego_pose[0], pose[1] - ego_pose[1])
            if ci > 0 and dist > self.comm_range:
                continue
            modality = "m1"
            if self.adaptor is not None:
                assigned = (self.adaptor.modality_assignment or {}).get(
                    sc, {}
                ).get(cav, "m1")
                modality = self.adaptor.reassign_cav_modality(
                    assigned, len(agents)
                )
                if self.adaptor.unmatched_modality(modality):
                    if ci == 0:
                        modality = self.adaptor.ego_modality.split("&")[0]
                    else:
                        continue
            agent_modalities.append(modality)
            if modality in self.camera_modalities:
                # real image ring: {ts}_imgs.hdf5 fast path or per-cam pngs
                # (opv2v_basedataset.py:360-378); aug + extrinsics in
                # data/camera.py
                from gencomm_tpu.data.camera import load_cav_cameras

                cam_slots[modality][len(agents)] = load_cav_cameras(
                    entry["path"], ts, cyaml,
                    self.camera_modalities[modality], self.train, self.rng,
                    load_depth=self.load_depth, use_hdf5=self.use_hdf5,
                )
                pts = np.zeros((0, 4), np.float32)
            else:
                pts = self._read_lidar(entry, ts, modality)
            agents.append(pts)
            poses.append(pose)
            # GT union by object id across agents — current-frame yaml for
            # delayed agents pairs stale features with live GT
            # (reform_param parity, opv2v_basedataset.py:630-704)
            cur_yaml = cyaml
            if ts != timestamp:
                cur = os.path.join(entry["path"], f"{timestamp}.yaml")
                if os.path.exists(cur):
                    cur_yaml = load_cav_yaml(cur)
            for oid, o in self._filter_vehicles(
                cur_yaml.get("vehicles", {})
            ).items():
                vehicles_union.setdefault(oid, o)
            if len(agents) == L:
                break

        na = len(agents)
        poses_arr = np.stack(poses) if na else np.zeros((0, 6))
        noisy_poses = add_noise_to_poses(poses_arr, self.noise_setting, self.rng)

        points = np.zeros((L, P, 4), np.float32)
        point_mask = np.zeros((L, P), bool)
        for i, pts in enumerate(agents):
            k = min(len(pts), P)
            points[i, :k] = pts[:k]
            point_mask[i, :k] = True

        pairwise = get_pairwise_transformation(noisy_poses, L, na).astype(
            np.float32
        )
        agent_mask = np.zeros(L, bool)
        agent_mask[:na] = True

        if self.label_type == "camera":
            # camera-visible GT: drop objects whose center raster cell in
            # the ego's bev_visibility.png is dark (base_postprocessor.
            # generate_visible_object_center:614-690 — 1st pass filters by
            # visibility in the ego-clean frame, 2nd by range; ego IS the
            # reference frame here so the passes collapse)
            vis_path = os.path.join(
                ego_path, f"{timestamp}_bev_visibility.png")
            if os.path.exists(vis_path):
                from PIL import Image

                from gencomm_tpu.utils.camera_utils import box_is_visible

                vis_map = np.asarray(
                    Image.open(vis_path).convert("L"))
                n_all = max(len(vehicles_union), 1)
                boxes_all, mask_all, ids_all = project_world_objects(
                    vehicles_union, ego_pose,
                    [-1e5, -1e5, -1e5, 1e5, 1e5, 1e5], n_all,
                )
                visible_ids = {
                    oid for i, oid in enumerate(ids_all)
                    if box_is_visible(boxes_all[i, 0], boxes_all[i, 1],
                                      vis_map)
                }
                vehicles_union = OrderedDict(
                    (k, v) for k, v in vehicles_union.items()
                    if k in visible_ids
                )
        gt_boxes, gt_mask, gt_ids = project_world_objects(
            vehicles_union, ego_pose, self.lidar_range, self.max_num
        )
        aug_on = self.augmentor is not None and self.train
        if aug_on:
            ngt = int(gt_mask.sum())
            if self.fusion_mode.startswith("early"):
                # one world transform in the EGO frame: augment the ego GT
                # and fold the 4x4 into every agent->ego pairwise matrix so
                # merge_points_to_ego lands the clouds in augmented coords
                # (early_fusion_dataset.py:105 augments the merged stack)
                _, boxes0, A = self.augmentor.transform(
                    np.zeros((0, 4), np.float32), gt_boxes[:ngt])
                gt_boxes[:ngt] = boxes0
                pairwise[:, 0] = (A[None] @ pairwise[:, 0]).astype(
                    np.float32)
            else:
                # late/no fusion: augment the ego slot's cloud + the ego
                # GT together (late_fusion_dataset.py:167 — each CAV's own
                # cloud and own-frame GT)
                k0 = int(point_mask[0].sum())
                pts0, boxes0, _ = self.augmentor.transform(
                    points[0, :k0], gt_boxes[:ngt])
                points[0, :k0] = pts0
                gt_boxes[:ngt] = boxes0
        sample = {
            "agent_mask": agent_mask,
            "pairwise_t_matrix": pairwise,
            "gt_boxes": gt_boxes,
            "gt_mask": gt_mask,
        }
        sample.update(
            self._labels_for(gt_boxes, gt_mask, gt_ids, vehicles_union)
        )
        if self.per_agent_labels:
            # per-agent anchor labels in each agent's own frame
            # (intermediate_heter_fusion_dataset.py label_dict_single /
            # late_fusion_dataset training distribution)
            ps = np.zeros((L,) + sample["pos_equal_one"].shape, np.float32)
            ns = np.zeros_like(ps)
            ts_ = np.zeros((L,) + sample["targets"].shape, np.float32)
            gtb_all, gtm_all, _ = project_world_objects_multi(
                vehicles_union, noisy_poses[:na], self.lidar_range,
                self.max_num,
            )
            for i in range(na):
                if i == 0 and aug_on and not self.fusion_mode.startswith(
                        "early"):
                    # ego slot: reuse the jointly-augmented cloud+GT above
                    gtb_i, gtm_i = gt_boxes.copy(), gt_mask.copy()
                else:
                    gtb_i, gtm_i = gtb_all[i], gtm_all[i]
                    if i > 0 and aug_on and not self.fusion_mode.startswith(
                            "early"):
                        # independent draw per CAV, like each CAV being its
                        # own late-fusion training sample
                        ki = int(point_mask[i].sum())
                        n_i = int(gtm_i.sum())
                        pts_i, boxes_i, _ = self.augmentor.transform(
                            points[i, :ki], gtb_i[:n_i])
                        points[i, :ki] = pts_i
                        gtb_i[:n_i] = boxes_i
                lab_i = generate_label(
                    gtb_i, gtm_i, self.anchors, self.pos_threshold,
                    self.neg_threshold,
                )
                ps[i] = lab_i["pos_equal_one"]
                ns[i] = lab_i["neg_equal_one"]
                ts_[i] = lab_i["targets"]
            sample["pos_equal_one_single"] = ps
            sample["neg_equal_one_single"] = ns
            sample["targets_single"] = ts_
        # per-modality-range single labels (STAMP): each agent of modality
        # m gets labels at m's OWN range/anchors; slots of other modalities
        # stay zero and are masked by modality_mask_{m}
        for m, mp in self.modality_post.items():
            shape = mp["anchors"].shape[:2] + (mp["anchors"].shape[2],)
            ps_m = np.zeros((L,) + shape, np.float32)
            ns_m = np.zeros_like(ps_m)
            ts_m = np.zeros((L,) + shape[:2] + (shape[2] * 7,), np.float32)
            slots = [i for i in range(na) if agent_modalities[i] == m]
            if slots:
                gtb_m, gtm_m, _ = project_world_objects_multi(
                    vehicles_union, noisy_poses[slots], mp["range"],
                    self.max_num,
                )
            for si, i in enumerate(slots):
                gtb_i, gtm_i = gtb_m[si], gtm_m[si]
                lab_i = generate_label(
                    gtb_i, gtm_i, mp["anchors"], mp["pos"], mp["neg"],
                )
                ps_m[i] = lab_i["pos_equal_one"]
                ns_m[i] = lab_i["neg_equal_one"]
                ts_m[i] = lab_i["targets"]
            sample[f"pos_equal_one_single_{m}"] = ps_m
            sample[f"neg_equal_one_single_{m}"] = ns_m
            sample[f"targets_single_{m}"] = ts_m
        # per-modality slot masks + shared point buffers (the model runs
        # each lidar branch over all slots and mask-combines)
        for m in self.lidar_modalities:
            mmask = np.zeros(L, bool)
            for i, am in enumerate(agent_modalities):
                mmask[i] = am == m
            sample[f"points_{m}"] = points
            sample[f"point_mask_{m}"] = point_mask
            sample[f"modality_mask_{m}"] = mmask
        # camera modalities: padded (L, ncam, ...) arrays in the model's
        # image_inputs contract (synthetic.py emits the same keys)
        for m, conf in self.camera_modalities.items():
            ncam = int(conf.get("Ncams", 4))
            fH, fW = conf["final_dim"]
            arrs = {
                "imgs": np.zeros((L, ncam, fH, fW, 3), np.float32),
                "rots": np.tile(np.eye(3, dtype=np.float32),
                                (L, ncam, 1, 1)),
                "trans": np.zeros((L, ncam, 3), np.float32),
                "intrins": np.tile(np.eye(3, dtype=np.float32),
                                   (L, ncam, 1, 1)),
                "post_rots": np.tile(np.eye(3, dtype=np.float32),
                                     (L, ncam, 1, 1)),
                "post_trans": np.zeros((L, ncam, 3), np.float32),
            }
            if self.load_depth:
                arrs["depths"] = np.zeros((L, ncam, fH, fW), np.float32)
            mmask = np.zeros(L, bool)
            for slot, cam in cam_slots[m].items():
                mmask[slot] = True
                for k in ("imgs", "rots", "trans", "intrins", "post_rots",
                          "post_trans"):
                    arrs[k][slot] = cam[k]
                if self.load_depth and "depths" in cam:
                    arrs["depths"][slot] = cam["depths"]
            for k, v in arrs.items():
                sample[f"{k}_{m}"] = v
            sample[f"modality_mask_{m}"] = mmask
        if not any(agent_modalities):
            sample["modality_mask_m1"] = agent_mask.copy()
        if self.adaptor is None and "modality_mask_m1" not in sample:
            sample["modality_mask_m1"] = agent_mask.copy()
        return sample

    def collate(self, samples) -> dict:
        return {
            k: np.stack([s[k] for s in samples]) for k in samples[0]
        }
