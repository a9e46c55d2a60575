"""DAIR-V2X-C dataset: real-world vehicle + infrastructure pairs.

Parity: opencood/data_utils/datasets/basedataset/dairv2x_basedataset.py —
split json lists vehicle frame ids; cooperative/data_info.json maps each to
the paired infrastructure frame, calib files and cooperative labels.
  veh pose  = lidar->novatel->world chain (transformation_utils.py:456-468)
  inf pose  = virtuallidar->world + system_error_offset (:470-480)
  GT        = cooperative label world_8_points projected into the ego
              (vehicle) lidar frame (box_utils.project_world_objects_dairv2x
              :1340-1388)

Emits the same padded batch format as OPV2VDataset (2 agents: slot 0 =
vehicle = ego; slot 1 = infrastructure). In hetero mode the reference
assigns veh=m1 / inf=m2 with a random ego swap at train
(dairv2x_basedataset.py:164-192).
"""

from __future__ import annotations

import json
import os
from collections import OrderedDict

import numpy as np

from gencomm_tpu.utils import box_utils, pcd_utils
from gencomm_tpu.utils.pose_utils import add_noise_to_poses
from gencomm_tpu.utils.transformation_utils import (
    get_pairwise_transformation, x_to_world,
)
from gencomm_tpu.data.postprocessor import generate_anchor_box, generate_label
from gencomm_tpu.registry import DATASETS


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
        self.lidar_range = params["preprocess"]["cav_lidar_range"]
        self.anchors = generate_anchor_box(
            params["postprocess"]["anchor_args"],
            params["postprocess"].get("order", "hwl"),
        )
        self.pos_threshold = params["postprocess"]["target_args"]["pos_threshold"]
        self.neg_threshold = params["postprocess"]["target_args"]["neg_threshold"]
        self.noise_setting = params.get("noise_setting")
        self.heter = params.get("heter") is not None
        self.rng = np.random.RandomState(params.get("seed", 303))

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
        poses = np.stack([tfm_to_pose(veh_tfm), tfm_to_pose(inf_tfm)])
        noisy = add_noise_to_poses(poses, self.noise_setting, self.rng)

        veh_pts = pcd_utils.read_pcd(os.path.join(
            self.root_dir, fi["vehicle_pointcloud_path"]
        ))
        inf_pts = pcd_utils.read_pcd(os.path.join(
            self.root_dir, fi["infrastructure_pointcloud_path"]
        ))
        points = np.zeros((L, P, 4), np.float32)
        point_mask = np.zeros((L, P), bool)
        for i, pts in enumerate((veh_pts, inf_pts)):
            k = min(len(pts), P)
            points[i, :k] = pts[:k]
            point_mask[i, :k] = True

        pairwise = get_pairwise_transformation(noisy, L, 2).astype(np.float32)
        agent_mask = np.ones(L, bool)

        labels = read_json(os.path.join(
            self.root_dir, fi["cooperative_label_path"]
        ))
        gt_boxes, gt_mask = project_cooperative_labels(
            labels, poses[0], self.lidar_range, self.max_num
        )
        label = generate_label(
            gt_boxes, gt_mask, self.anchors, self.pos_threshold,
            self.neg_threshold,
        )
        sample = {
            "agent_mask": agent_mask,
            "pairwise_t_matrix": pairwise,
            "points_m1": points,
            "point_mask_m1": point_mask,
            "modality_mask_m1": agent_mask.copy(),
            "pos_equal_one": label["pos_equal_one"],
            "neg_equal_one": label["neg_equal_one"],
            "targets": label["targets"],
            "gt_boxes": gt_boxes,
            "gt_mask": gt_mask,
        }
        if self.heter:
            # veh = m1, inf = m2 (dairv2x_basedataset.py:164-192)
            m1 = np.zeros(L, bool)
            m1[0] = True
            m2 = np.zeros(L, bool)
            m2[1] = True
            sample["modality_mask_m1"] = m1
            sample["points_m2"] = points
            sample["point_mask_m2"] = point_mask
            sample["modality_mask_m2"] = m2
        return sample

    def collate(self, samples) -> dict:
        return {
            k: np.stack([s[k] for s in samples]) for k in samples[0]
        }
