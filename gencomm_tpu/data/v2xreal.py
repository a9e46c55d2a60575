"""V2X-Real dataset: real-world multi-class collaborative detection.

Parity targets (behavior, not code):
  opencood/data_utils/datasets/basedataset/v2xreal_basedataset.py —
    OPV2V-style scenario/CAV directory layout, but lidar is KITTI .bin,
    CAV ids are signed ints (roadside units < 0), objects carry class
    names mapped onto 3 super classes, and a ``dataset_mode`` selects the
    eval collaboration topology (vc / ic / v2v / i2i, :203-219) with the
    unreleased "2023-04-07" scenarios dropped at eval (:104-106).
  intermediate_heter_v2xreal_fusion_dataset.py — 8-dim (7 + class) GT
    boxes, per-class anchors from ``anchor_generator_config`` and the
    multi-class label map (voxel_postprocessor.generate_label_v2xreal).

The round-1 version attached ``gt_classes`` by yaml first-appearance
order, which misaligns with ``gt_boxes`` whenever project_world_objects
drops an out-of-range object; classes are now indexed by the kept-ids
list that projection returns.
"""

from __future__ import annotations

import os

import numpy as np

from gencomm_tpu.data.opv2v import OPV2VDataset
from gencomm_tpu.data.postprocessor import (
    generate_anchor_box_multiclass,
    generate_label_multiclass,
)
from gencomm_tpu.utils import pcd_utils
from gencomm_tpu.registry import DATASETS

# opencood/data_utils/__init__.py:1-8 (cited constant table — the class
# vocabulary is the dataset's compatibility contract)
SUPER_CLASS_MAP = {
    "vehicle": ["LongVehicle", "Car", "PoliceCar"],
    "pedestrian": ["Child", "RoadWorker", "Pedestrian", "Scooter",
                   "ScooterRider", "Motorcycle", "MotorcyleRider",
                   "BicycleRider"],
    "truck": ["Truck", "Van", "TrashCan", "ConcreteTruck", "Bus"],
}
CLASS_NAMES = list(SUPER_CLASS_MAP)
INVERSE_SUPER_CLASS_MAP = {
    cls: sup for sup, classes in SUPER_CLASS_MAP.items() for cls in classes
}
# excluded from eval except in v2v mode (v2xreal_basedataset.py:104-106)
_UNRELEASED_TAG = "2023-04-07"


def class_id(obj: dict):
    """Raw class name -> 1-indexed super-class id, or None for classes
    outside the vocabulary (reference map_class_name_to_super_class_name
    + filter_boxes_by_class, v2xreal_basedataset.py:753-770)."""
    name = str(obj.get("obj_type", obj.get("class", "")))
    sup = INVERSE_SUPER_CLASS_MAP.get(name)
    if sup is None:
        # already-mapped super-class names pass through (json fast path)
        sup = name.lower() if name.lower() in SUPER_CLASS_MAP else None
    return None if sup is None else CLASS_NAMES.index(sup) + 1


@DATASETS.register("v2xreal")
class V2XRealDataset(OPV2VDataset):
    """Multi-class V2X-Real loader on the padded-batch contract.

    Extra sample keys vs OPV2V: ``gt_classes`` (max_num,) 1-indexed ids
    aligned with ``gt_boxes``; ``pos_equal_one`` holds -1/0/class-id per
    anchor-class slot (H', W', C*A) and ``targets`` is (H', W', C*A*7)
    when ``anchor_generator_config`` is present.
    """

    def __init__(self, params: dict, train: bool = True,
                 max_points: int = 40000):
        self.dataset_mode = params.get("dataset_mode", "vc")
        assert self.dataset_mode in ("vc", "ic", "v2v", "i2i")
        aa = params["postprocess"]["anchor_args"]
        rng_ = aa["cav_lidar_range"]
        vw = aa.get("vw", aa.get("voxel_size", [0.4])[0] if "voxel_size"
                    in aa else 0.4)
        aa.setdefault("vw", vw)
        aa.setdefault("vh", aa.get("vh", vw))
        aa.setdefault("W", int(round((rng_[3] - rng_[0]) / aa["vw"])))
        aa.setdefault("H", int(round((rng_[4] - rng_[1]) / aa["vh"])))
        self.anchor_cfgs = aa.get("anchor_generator_config")
        super().__init__(params, train, max_points)
        self.class_names = CLASS_NAMES
        if self.anchor_cfgs:
            (self.anchors_mc, self.matched_thr, self.unmatched_thr,
             self.anchor_class_names) = generate_anchor_box_multiclass(
                aa, params["postprocess"].get("order", "hwl"))
            self.num_class = self.anchors_mc.shape[0]
        else:
            self.num_class = 1

    # -- directory / ordering hooks ------------------------------------
    def _keep_scenario(self, scenario_name: str) -> bool:
        if not self.train and self.dataset_mode != "v2v":
            return _UNRELEASED_TAG not in scenario_name
        return True

    def _order_cavs(self, cavs: list) -> list:
        """Train: shuffle. Eval: order/filter by dataset_mode — vehicles
        carry non-negative ids, roadside units negative
        (v2xreal_basedataset.py:203-219)."""
        if self.train:
            return list(self.rng.permutation(cavs))

        def _i(c):
            try:
                return int(c)
            except ValueError:
                return 0

        veh = [c for c in cavs if _i(c) >= 0]
        infra = [c for c in cavs if _i(c) < 0]
        if self.dataset_mode == "vc":
            return veh + infra
        if self.dataset_mode == "v2v":
            return veh
        if self.dataset_mode == "ic":
            return infra + veh
        return infra  # i2i

    # -- data hooks -----------------------------------------------------
    def _read_lidar(self, entry: dict, ts: str, modality: str) -> np.ndarray:
        pts = pcd_utils.load_lidar_bin(
            os.path.join(entry["path"], f"{ts}.bin"))
        if self.train:
            pts = pcd_utils.shuffle_points(pts, self.rng)
        return pts

    def _filter_vehicles(self, vehicles: dict) -> dict:
        """Map class names to super-class ids and drop unknown classes;
        the id rides along in the object dict for _labels_for."""
        out = {}
        for oid, obj in vehicles.items():
            cid = class_id(obj)
            if cid is None:
                continue
            out[oid] = dict(obj, class_int=cid)
        return out

    def _labels_for(self, gt_boxes, gt_mask, gt_ids, vehicles_union) -> dict:
        # classes aligned with gt_boxes via the kept-ids list
        gt_classes = np.zeros(self.max_num, np.int32)
        for i, oid in enumerate(gt_ids):
            gt_classes[i] = vehicles_union[oid].get("class_int", 1)
        if not self.anchor_cfgs:
            out = super()._labels_for(gt_boxes, gt_mask, gt_ids,
                                      vehicles_union)
            out["gt_classes"] = gt_classes
            return out
        label = generate_label_multiclass(
            gt_boxes, gt_classes, gt_mask, self.anchors_mc,
            self.matched_thr, self.unmatched_thr,
            self.params["postprocess"].get("order", "hwl"),
        )
        return {
            "pos_equal_one": label["pos_equal_one"],
            "targets": label["targets"],
            "gt_classes": gt_classes,
        }
