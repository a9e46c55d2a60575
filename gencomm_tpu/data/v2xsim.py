"""V2X-Sim 2.0 dataset (pickled nuScenes-style infos).

Parity: opencood/data_utils/datasets/basedataset/v2xsim_basedataset.py —
one pickle file per split: a list of scene records with
  agent_num, lidar_path_<i>, lidar_pose_<i> (4x4), labels_<i>
  {gt_boxes_global (K, 7), gt_object_ids} for i in 1..agent_num.
Agent 1..N; train shuffles which agent is ego (:94-99). GT = union of all
agents' global boxes projected into the ego lidar frame.
"""

from __future__ import annotations

import os
import pickle
from collections import OrderedDict

import numpy as np

from gencomm_tpu.utils import box_utils
from gencomm_tpu.utils.pose_utils import add_noise_to_poses
from gencomm_tpu.utils.transformation_utils import (
    get_pairwise_transformation, x_to_world,
)
from gencomm_tpu.data.dairv2x import tfm_to_pose
from gencomm_tpu.data.postprocessor import generate_anchor_box, generate_label
from gencomm_tpu.registry import DATASETS


def read_lidar(path: str) -> np.ndarray:
    """nuScenes .bin (x, y, z, intensity, ring) or .npy -> (N, 4)."""
    if path.endswith(".npy"):
        arr = np.load(path)
    elif path.endswith(".bin"):
        arr = np.fromfile(path, np.float32).reshape(-1, 5)
    else:
        from gencomm_tpu.utils import pcd_utils

        return pcd_utils.read_pcd(path)
    return np.ascontiguousarray(arr[:, :4], np.float32)


@DATASETS.register("v2xsim")
class V2XSimDataset:
    def __init__(self, params: dict, train: bool = True,
                 max_points: int = 40000):
        self.params = params
        self.train = train
        self.max_points = max_points
        pkl = params["root_dir"] if train else params["validate_dir"]
        with open(pkl, "rb") as f:
            self.infos = pickle.load(f)
        self.data_root = params.get("data_dir", os.path.dirname(pkl))
        self.max_cav = params.get("train_params", {}).get("max_cav", 5)
        self.max_num = params["postprocess"]["max_num"]
        self.lidar_range = params["preprocess"]["cav_lidar_range"]
        self.anchors = generate_anchor_box(
            params["postprocess"]["anchor_args"],
            params["postprocess"].get("order", "hwl"),
        )
        ta = params["postprocess"]["target_args"]
        self.pos_threshold = ta["pos_threshold"]
        self.neg_threshold = ta["neg_threshold"]
        self.noise_setting = params.get("noise_setting")
        self.rng = np.random.RandomState(params.get("seed", 303))

    def reinitialize(self):
        pass

    def __len__(self):
        return len(self.infos)

    def __getitem__(self, idx: int) -> dict:
        info = self.infos[idx]
        n = int(info["agent_num"])
        cav_ids = list(range(1, n + 1))
        if self.train:
            cav_ids = list(self.rng.permutation(cav_ids))
        cav_ids = cav_ids[: self.max_cav]
        L, P = self.max_cav, self.max_points

        poses, clouds = [], []
        boxes_world = []
        for cid in cav_ids:
            poses.append(tfm_to_pose(np.asarray(info[f"lidar_pose_{cid}"])))
            path = info[f"lidar_path_{cid}"]
            if not os.path.isabs(path):
                path = os.path.join(self.data_root, path)
            clouds.append(read_lidar(path))
            lb = info.get(f"labels_{cid}", {})
            gb = np.asarray(lb.get("gt_boxes_global", np.zeros((0, 7))))
            ids = np.asarray(lb.get("gt_object_ids", np.arange(len(gb))))
            boxes_world.append((gb, ids))
        poses_arr = np.stack(poses)
        noisy = add_noise_to_poses(poses_arr, self.noise_setting, self.rng)

        points = np.zeros((L, P, 4), np.float32)
        point_mask = np.zeros((L, P), bool)
        for i, pts in enumerate(clouds):
            k = min(len(pts), P)
            points[i, :k] = pts[:k]
            point_mask[i, :k] = True
        agent_mask = np.zeros(L, bool)
        agent_mask[: len(cav_ids)] = True
        pairwise = get_pairwise_transformation(noisy, L, len(cav_ids)).astype(
            np.float32
        )

        # GT: union by object id across agents, global -> ego lidar frame
        world_to_ego = np.linalg.inv(x_to_world(list(poses_arr[0])))
        seen = OrderedDict()
        for gb, ids in boxes_world:
            for box, oid in zip(gb, ids):
                seen.setdefault(int(oid), box)
        gt_boxes = np.zeros((self.max_num, 7), np.float32)
        gt_mask = np.zeros(self.max_num, np.float32)
        k = 0
        for box in seen.values():
            if k >= self.max_num:
                break
            # global (x, y, z, l, w, h, yaw) -> ego frame
            ctr = world_to_ego @ np.array([box[0], box[1], box[2], 1.0])
            yaw = box[6] + np.arctan2(world_to_ego[1, 0], world_to_ego[0, 0])
            b = np.array([ctr[0], ctr[1], ctr[2], box[5], box[4], box[3],
                          yaw], np.float32)  # hwl order
            if not (self.lidar_range[0] <= b[0] <= self.lidar_range[3]
                    and self.lidar_range[1] <= b[1] <= self.lidar_range[4]):
                continue
            gt_boxes[k] = b
            gt_mask[k] = 1.0
            k += 1

        label = generate_label(
            gt_boxes, gt_mask, self.anchors, self.pos_threshold,
            self.neg_threshold,
        )
        return {
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

    def collate(self, samples) -> dict:
        return {k: np.stack([s[k] for s in samples]) for k in samples[0]}
