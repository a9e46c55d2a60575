"""DAIR-V2X-C dataset: real-world vehicle + infrastructure pairs.

Parity: opencood/data_utils/datasets/basedataset/dairv2x_basedataset.py —
split json lists vehicle frame ids; cooperative/data_info.json maps each to
the paired infrastructure frame, calib files and cooperative labels.
  veh pose  = lidar->novatel->world chain (transformation_utils.py:456-468)
  inf pose  = virtuallidar->world + system_error_offset (:470-480)
  GT        = cooperative label world_8_points projected into the ego
              (vehicle) lidar frame (box_utils.project_world_objects_dairv2x
              :1340-1388)

Emits the same padded batch format as OPV2VDataset (2 agents; slot 0 = ego).

Heterogeneous mode (dairv2x_basedataset.py:164-192):
  - veh = m1, inf = m2 by default, reassigned via the Adaptor mapping_dict;
  - train: the ego slot is randomly swapped to the RSU with p=0.5;
  - eval: the agent whose mapped modality is the ego modality sits first;
  - GT comes from each side's own single labels transformed into the ego
    frame and merged by polygon IoU (load_single_objects_dairv2x_hetero
    box_utils.py:1451+, intermediate_heter_fusion_dataset.py:294-323,
    iou_thresh 0.05) — cooperative labels have no per-side ids;
  - per-agent single labels feed supervise_single.

Camera modalities load each side's single jpg with the DAIR calib chain
(lidar_to_camera extrinsic inverted to camera->lidar, cam_K intrinsics —
dairv2x_basedataset.py:135-148) through the LSS augmentation pipeline.

Late fusion on DAIR merges veh+inf GT by IoU exactly like hetero mode
(base_postprocessor.generate_gt_bbx_by_iou:112-202).
"""

from __future__ import annotations

import json
import os
from collections import OrderedDict

import numpy as np

from gencomm_tpu.utils import box_utils, pcd_utils
from gencomm_tpu.utils.eval_utils import polygon_iou
from gencomm_tpu.utils.pose_utils import add_noise_to_poses
from gencomm_tpu.utils.transformation_utils import (
    get_pairwise_transformation, x_to_world, x1_to_x2,
)
from gencomm_tpu.data.postprocessor import generate_anchor_box, generate_label
from gencomm_tpu.registry import DATASETS

# single-side labels keep only these categories
# (box_utils.load_single_objects_dairv2x:1442-1445)
_KEEP_TYPES = ("Car", "Van", "Truck", "Bus")


def read_json(path):
    with open(path) as f:
        return json.load(f)


def veh_side_pose_tfm(lidar_to_novatel: dict, novatel_to_world: dict):
    """lidar->novatel->world 4x4 (transformation_utils.py:456-468)."""
    r_ab = np.array(lidar_to_novatel["transform"]["rotation"])
    t_ab = np.array(lidar_to_novatel["transform"]["translation"]).reshape(3, 1)
    r_bc = np.array(novatel_to_world["rotation"])
    t_bc = np.array(novatel_to_world["translation"]).reshape(3, 1)
    rot = r_bc @ r_ab
    trans = r_bc @ t_ab + t_bc
    m = np.eye(4)
    m[:3, :3] = rot
    m[:3, 3] = trans[:, 0]
    return m


def inf_side_pose_tfm(virtuallidar_to_world: dict, offset: dict):
    """virtuallidar->world with system error offset
    (transformation_utils.py:470-480)."""
    m = np.eye(4)
    m[:3, :3] = np.array(virtuallidar_to_world["rotation"])
    t = np.array(virtuallidar_to_world["translation"], np.float64).reshape(3)
    t[0] += offset.get("delta_x", 0.0)
    t[1] += offset.get("delta_y", 0.0)
    m[:3, 3] = t
    return m


def rot_trans_tfm(calib: dict) -> np.ndarray:
    """{rotation, translation} json -> 4x4
    (transformation_utils.rot_and_trans_to_trasnformation_matrix:482-489)."""
    m = np.eye(4)
    m[:3, :3] = np.array(calib["rotation"])
    m[:3, 3] = np.array(calib["translation"], np.float64).reshape(3)
    return m


def load_intrinsic(int_dict: dict) -> np.ndarray:
    """cam_K 9-vector -> 3x3 (camera_utils.load_intrinsic_DAIR_V2X:333)."""
    return np.array(int_dict["cam_K"], np.float32).reshape(3, 3)


def tfm_to_pose(tfm: np.ndarray):
    """4x4 -> [x, y, z, roll, yaw, pitch] degrees
    (transformation_utils.py:167-190)."""
    yaw = np.degrees(np.arctan2(tfm[1, 0], tfm[0, 0]))
    roll = np.degrees(np.arctan2(-tfm[2, 1], tfm[2, 2]))
    pitch = np.degrees(
        np.arctan2(tfm[2, 0], (tfm[2, 1] ** 2 + tfm[2, 2] ** 2) ** 0.5)
    )
    x, y, z = tfm[:3, 3]
    return np.array([x, y, z, roll, yaw, pitch], np.float64)


def project_cooperative_labels(object_list, lidar_pose, lidar_range,
                               max_num: int, order: str = "hwl"):
    """world_8_points -> padded (max_num, 7) boxes in the ego lidar frame."""
    boxes = np.zeros((max_num, 7), np.float32)
    mask = np.zeros(max_num, np.float32)
    world_to_lidar = np.linalg.inv(x_to_world(list(lidar_pose)))
    n = 0
    for obj in object_list:
        if n >= max_num:
            break
        corners_world = np.array(obj["world_8_points"], np.float64)
        hom = np.pad(corners_world, ((0, 0), (0, 1)), constant_values=1.0)
        corners = (world_to_lidar @ hom.T).T[:, :3][None]
        box7 = box_utils.corner_to_center(corners, order=order)[0]
        xy = corners[0, :4, :2]
        inside = (
            (xy[:, 0] >= lidar_range[0]) & (xy[:, 0] <= lidar_range[3])
            & (xy[:, 1] >= lidar_range[1]) & (xy[:, 1] <= lidar_range[4])
        )
        if not inside.any():
            continue
        boxes[n] = box7
        mask[n] = 1.0
        n += 1
    return boxes, mask


def parse_single_objects(object_list, lidar_range, order: str = "hwl",
                         trans_mat: np.ndarray | None = None) -> np.ndarray:
    """Single-side label json -> (N, 7) boxes, optionally transformed into
    the ego frame.

    Behavior parity: box_utils.load_single_objects_dairv2x:1390-1449 and
    the _hetero variant :1451+ — keep Car/Van/Truck/Bus with nonzero dims,
    tolerate string coordinates (camera labels), require all 8 corners
    inside the z-enlarged lidar range AFTER the optional transform.
    """
    kept = []
    rng_z = list(lidar_range)
    rng_z[2] -= 1.0
    rng_z[5] += 1.0
    lo = np.asarray(rng_z[:3])
    hi = np.asarray(rng_z[3:])
    for obj in object_list:
        if obj.get("type") not in _KEEP_TYPES:
            continue
        loc, dim = obj["3d_location"], obj["3d_dimensions"]
        x, y, z = (float(loc["x"]), float(loc["y"]), float(loc["z"]))
        l, h, w = float(dim["l"]), float(dim["h"]), float(dim["w"])
        if l == 0 or h == 0 or w == 0:
            continue
        rot = float(obj["rotation"])
        if order == "hwl":
            box7 = np.array([[x, y, z, h, w, l, rot]], np.float64)
        else:
            box7 = np.array([[x, y, z, l, w, h, rot]], np.float64)
        corners = box_utils.boxes_to_corners_3d(box7, order)
        if trans_mat is not None:
            corners = box_utils.project_box3d(corners, trans_mat)
            box7 = box_utils.corner_to_center(corners, order=order)
        inside = ((corners[0] >= lo) & (corners[0] <= hi)).all(axis=1).all()
        if inside:
            kept.append(box7[0])
    return (np.stack(kept) if kept
            else np.zeros((0, 7), np.float64)).astype(np.float32)


def merge_boxes_by_iou(ego_boxes: np.ndarray, cav_boxes: np.ndarray,
                       order: str = "hwl",
                       iou_thresh: float = 0.05) -> np.ndarray:
    """Union of ego boxes + cav boxes that overlap no ego box — the DAIR
    label merge (generate_gt_bbx_by_iou base_postprocessor.py:170-186,
    intermediate_heter_fusion_dataset.py:294-323)."""
    if len(ego_boxes) == 0:
        return cav_boxes
    if len(cav_boxes) == 0:
        return ego_boxes
    ego_quads = box_utils.boxes_to_corners_3d(
        ego_boxes.astype(np.float64), order)[:, :4, :2]
    cav_quads = box_utils.boxes_to_corners_3d(
        cav_boxes.astype(np.float64), order)[:, :4, :2]
    fresh = [
        cav_boxes[i] for i in range(len(cav_boxes))
        if not (polygon_iou(cav_quads[i], ego_quads) > iou_thresh).any()
    ]
    if not fresh:
        return ego_boxes
    return np.vstack([ego_boxes, np.stack(fresh)]).astype(np.float32)


@DATASETS.register("dairv2x")
class DAIRV2XDataset:
    """Vehicle+infrastructure cooperative detection dataset."""

    def __init__(self, params: dict, train: bool = True,
                 max_points: int = 80000):
        self.params = params
        self.train = train
        self.max_points = max_points
        self.root_dir = params["data_dir"]
        split = params["root_dir"] if train else params["validate_dir"]
        self.split_info = read_json(split)
        self.max_cav = 2
        self.max_num = params["postprocess"]["max_num"]
        self.order = params["postprocess"].get("order", "hwl")
        self.lidar_range = params["preprocess"]["cav_lidar_range"]
        self.anchors = generate_anchor_box(
            params["postprocess"]["anchor_args"], self.order,
        )
        self.pos_threshold = params["postprocess"]["target_args"]["pos_threshold"]
        self.neg_threshold = params["postprocess"]["target_args"]["neg_threshold"]
        self.noise_setting = params.get("noise_setting")
        self.heter = params.get("heter") is not None
        self.label_type = params.get("label_type", "lidar")
        self.late_fusion = (
            params.get("fusion", {}).get("core_method", "")
            .lower().startswith("late")
        )
        margs = params.get("model", {}).get("args", {})
        self.per_agent_labels = self.heter or bool(
            margs.get("supervise_single"))
        self.rng = np.random.RandomState(params.get("seed", 303))

        from gencomm_tpu.utils.heter_utils import Adaptor

        self.adaptor = Adaptor.from_hypes(params, train)
        hset = params.get("heter", {}).get("modality_setting", {})
        self.model_modalities = (
            self.adaptor.model_modality_list if self.adaptor else ["m1"]
        )
        self.camera_modalities = {
            m: hset[m]["data_aug_conf"]
            for m in self.model_modalities
            if hset.get(m, {}).get("sensor_type") == "camera"
            and "data_aug_conf" in hset[m]
        }
        self.lidar_modalities = [
            m for m in self.model_modalities if m not in self.camera_modalities
        ]

        co = read_json(os.path.join(self.root_dir, "cooperative/data_info.json"))
        self.co_data = OrderedDict()
        for fi in co:
            vid = os.path.basename(fi["vehicle_image_path"]).replace(".jpg", "")
            self.co_data[vid] = fi
        self.split_info = [v for v in self.split_info if v in self.co_data]

    def reinitialize(self):
        pass

    def __len__(self):
        return len(self.split_info)

    # ------------------------------------------------------------------
    def _single_labels(self, side: str, frame_id: str) -> list:
        """One side's single-label object list, [] when the file is absent.
        label_type camera uses the front-only backup labels
        (dairv2x_basedataset.py:155-162, generate_object_center_single)."""
        if side == "veh":
            sub = ("vehicle-side/label/lidar_backup"
                   if self.label_type == "camera"
                   else "vehicle-side/label/lidar")
        else:
            sub = "infrastructure-side/label/virtuallidar"
        path = os.path.join(self.root_dir, sub, f"{frame_id}.json")
        if not os.path.exists(path):
            return []
        return read_json(path)

    def _load_camera(self, side: str, frame_id: str, fi: dict,
                     data_aug_conf: dict):
        """One side's single camera -> the per-CAV camera dict (jpg +
        lidar_to_camera/camera_intrinsic calib, dairv2x_basedataset.py:
        135-148), through the LSS augmentation chain."""
        from PIL import Image

        from gencomm_tpu.data.camera import (
            img_transform, normalize_rgb, sample_augmentation,
        )

        if side == "veh":
            img_path = fi["vehicle_image_path"]
            ext_path = f"vehicle-side/calib/lidar_to_camera/{frame_id}.json"
            int_path = f"vehicle-side/calib/camera_intrinsic/{frame_id}.json"
        else:
            img_path = fi["infrastructure_image_path"]
            ext_path = ("infrastructure-side/calib/virtuallidar_to_camera/"
                        f"{frame_id}.json")
            int_path = ("infrastructure-side/calib/camera_intrinsic/"
                        f"{frame_id}.json")
        img = Image.open(os.path.join(self.root_dir, img_path)).convert("RGB")
        lidar_to_camera = rot_trans_tfm(
            read_json(os.path.join(self.root_dir, ext_path)))
        cam_to_lidar = np.linalg.inv(lidar_to_camera).astype(np.float32)
        intrin = load_intrinsic(
            read_json(os.path.join(self.root_dir, int_path)))
        aug = sample_augmentation(data_aug_conf, self.train, self.rng)
        img, _, post_rot2, post_tran2 = img_transform(img, None, *aug)
        fH, fW = data_aug_conf["final_dim"]
        out = {
            "imgs": normalize_rgb(img)[None],
            "rots": cam_to_lidar[None, :3, :3],
            "trans": cam_to_lidar[None, :3, 3],
            "intrins": intrin[None],
            "post_rots": np.tile(np.eye(3, dtype=np.float32), (1, 1, 1)),
            "post_trans": np.zeros((1, 3), np.float32),
        }
        out["post_rots"][0, :2, :2] = post_rot2
        out["post_trans"][0, :2] = post_tran2
        return out

    # ------------------------------------------------------------------
    def __getitem__(self, idx: int) -> dict:
        vid = self.split_info[idx]
        fi = self.co_data[vid]
        L, P = self.max_cav, self.max_points

        inf_id = os.path.basename(fi["infrastructure_image_path"]).replace(
            ".jpg", ""
        )
        veh_tfm = veh_side_pose_tfm(
            read_json(os.path.join(
                self.root_dir, f"vehicle-side/calib/lidar_to_novatel/{vid}.json"
            )),
            read_json(os.path.join(
                self.root_dir, f"vehicle-side/calib/novatel_to_world/{vid}.json"
            )),
        )
        inf_tfm = inf_side_pose_tfm(
            read_json(os.path.join(
                self.root_dir,
                f"infrastructure-side/calib/virtuallidar_to_world/{inf_id}.json",
            )),
            fi.get("system_error_offset", {}),
        )

        # agent records in [veh, inf] base order; modalities m1/m2 by
        # default then reassigned by the Adaptor mapping
        agents = [
            {"side": "veh", "frame_id": vid, "pose": tfm_to_pose(veh_tfm),
             "modality": "m1"},
            {"side": "inf", "frame_id": inf_id, "pose": tfm_to_pose(inf_tfm),
             "modality": "m2"},
        ]
        if self.heter:
            # train: random ego swap; eval: ego-modality agent first
            # (dairv2x_basedataset.py:176-192)
            if self.train:
                if self.rng.rand() > 0.5:
                    agents = agents[::-1]
            elif self.adaptor is not None:
                md = self.adaptor.mapping_dict
                ego_mod = self.adaptor.ego_modality
                if (md.get(agents[0]["modality"], agents[0]["modality"])
                        not in ego_mod
                        and md.get(agents[1]["modality"],
                                   agents[1]["modality"]) in ego_mod):
                    agents = agents[::-1]
            if self.adaptor is not None:
                for i, a in enumerate(agents):
                    a["modality"] = self.adaptor.reassign_cav_modality(
                        a["modality"], i)

        poses = np.stack([a["pose"] for a in agents])
        noisy = add_noise_to_poses(poses, self.noise_setting, self.rng)

        pcd_paths = {"veh": fi["vehicle_pointcloud_path"],
                     "inf": fi["infrastructure_pointcloud_path"]}
        points = np.zeros((L, P, 4), np.float32)
        point_mask = np.zeros((L, P), bool)
        cam_slots = {m: {} for m in self.camera_modalities}
        for i, a in enumerate(agents):
            if a["modality"] in self.camera_modalities:
                cam_slots[a["modality"]][i] = self._load_camera(
                    a["side"], a["frame_id"], fi,
                    self.camera_modalities[a["modality"]],
                )
                continue
            pts = pcd_utils.read_pcd(os.path.join(
                self.root_dir, pcd_paths[a["side"]]))
            if self.train:
                pts = pcd_utils.shuffle_points(pts, self.rng)
            k = min(len(pts), P)
            points[i, :k] = pts[:k]
            point_mask[i, :k] = True

        pairwise = get_pairwise_transformation(noisy, L, len(agents)).astype(
            np.float32
        )
        agent_mask = np.ones(L, bool)

        # ---- ground truth ------------------------------------------------
        ego_pose = poses[0]
        use_single = self.heter or self.late_fusion
        single_lists = None
        if use_single:
            single_lists = [
                self._single_labels(a["side"], a["frame_id"]) for a in agents
            ]
            if not any(single_lists):
                use_single = False  # fixture/dataset without single labels
        if use_single:
            # per-agent single labels -> ego frame -> IoU merge
            per_agent_boxes = []
            for i, a in enumerate(agents):
                trans = None if i == 0 else x1_to_x2(
                    list(poses[i]), list(ego_pose))
                per_agent_boxes.append(parse_single_objects(
                    single_lists[i], self.lidar_range, self.order, trans))
            merged = merge_boxes_by_iou(
                per_agent_boxes[0], per_agent_boxes[1], self.order)
            gt_boxes = np.zeros((self.max_num, 7), np.float32)
            gt_mask = np.zeros(self.max_num, np.float32)
            n = min(len(merged), self.max_num)
            gt_boxes[:n] = merged[:n]
            gt_mask[:n] = 1.0
        else:
            labels = read_json(os.path.join(
                self.root_dir, fi["cooperative_label_path"]
            ))
            gt_boxes, gt_mask = project_cooperative_labels(
                labels, ego_pose, self.lidar_range, self.max_num, self.order
            )

        label = generate_label(
            gt_boxes, gt_mask, self.anchors, self.pos_threshold,
            self.neg_threshold,
        )
        sample = {
            "agent_mask": agent_mask,
            "pairwise_t_matrix": pairwise,
            "pos_equal_one": label["pos_equal_one"],
            "neg_equal_one": label["neg_equal_one"],
            "targets": label["targets"],
            "gt_boxes": gt_boxes,
            "gt_mask": gt_mask,
        }

        if self.per_agent_labels and single_lists is not None:
            # per-agent anchor labels in each agent's own frame
            # (single_label_dict, intermediate_heter_fusion_dataset.py:273+)
            ps = np.zeros((L,) + label["pos_equal_one"].shape, np.float32)
            ns = np.zeros_like(ps)
            ts_ = np.zeros((L,) + label["targets"].shape, np.float32)
            for i, a in enumerate(agents):
                own = parse_single_objects(
                    single_lists[i], self.lidar_range, self.order)
                gtb_i = np.zeros((self.max_num, 7), np.float32)
                gtm_i = np.zeros(self.max_num, np.float32)
                n = min(len(own), self.max_num)
                gtb_i[:n] = own[:n]
                gtm_i[:n] = 1.0
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

        # per-modality masks + shared buffers (same contract as OPV2V)
        modalities = [a["modality"] for a in agents]
        for m in self.lidar_modalities:
            mmask = np.zeros(L, bool)
            for i, am in enumerate(modalities):
                mmask[i] = am == m and m not in self.camera_modalities
            sample[f"points_{m}"] = points
            sample[f"point_mask_{m}"] = point_mask
            sample[f"modality_mask_{m}"] = mmask
        for m, conf in self.camera_modalities.items():
            ncam = int(conf.get("Ncams", 1))
            fH, fW = conf["final_dim"]
            arrs = {
                "imgs": np.zeros((L, ncam, fH, fW, 3), np.float32),
                "rots": np.tile(np.eye(3, dtype=np.float32), (L, ncam, 1, 1)),
                "trans": np.zeros((L, ncam, 3), np.float32),
                "intrins": np.tile(np.eye(3, dtype=np.float32),
                                   (L, ncam, 1, 1)),
                "post_rots": np.tile(np.eye(3, dtype=np.float32),
                                     (L, ncam, 1, 1)),
                "post_trans": np.zeros((L, ncam, 3), np.float32),
            }
            mmask = np.zeros(L, bool)
            for slot, cam in cam_slots[m].items():
                mmask[slot] = True
                for k in arrs:
                    arrs[k][slot, :1] = cam[k]
            for k, v in arrs.items():
                sample[f"{k}_{m}"] = v
            sample[f"modality_mask_{m}"] = mmask
        if not self.heter:
            sample["modality_mask_m1"] = agent_mask.copy()
        return sample

    def collate(self, samples) -> dict:
        return {
            k: np.stack([s[k] for s in samples]) for k in samples[0]
        }
