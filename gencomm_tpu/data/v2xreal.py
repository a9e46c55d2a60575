"""V2X-Real dataset: real-world multi-class collaborative detection.

Parity: opencood/data_utils/datasets/basedataset/v2xreal_basedataset.py —
OPV2V-style directory layout, but objects carry class names that map onto
3 super classes (vehicle / pedestrian / truck, opencood/data_utils/
__init__.py SUPER_CLASS_MAP) and boxes are effectively 8-dim (7 + class).
Per-class AP is computed by gencomm_tpu.utils.eval_utils.eval_multiclass.
"""

from __future__ import annotations

import numpy as np

from gencomm_tpu.data.opv2v import OPV2VDataset, load_cav_yaml
from gencomm_tpu.registry import DATASETS

# opencood/data_utils/__init__.py:1-8
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


def class_id(obj: dict) -> int:
    """Map an object's raw class name to the super-class index
    (v2xreal_basedataset.py:741-780); unknown names count as vehicle."""
    name = obj.get("obj_type", obj.get("class", "Car"))
    sup = INVERSE_SUPER_CLASS_MAP.get(str(name), "vehicle")
    return CLASS_NAMES.index(sup)


@DATASETS.register("v2xreal")
class V2XRealDataset(OPV2VDataset):
    """OPV2V-format loader + super-class ids per GT box."""

    def __getitem__(self, idx: int) -> dict:
        sample = super().__getitem__(idx)
        # re-scan the union'd objects to attach class ids in GT order
        sc, timestamp = self.index_map[idx]
        db = self.scenario_database[sc]
        import os

        classes = {}
        for cav in db:
            ypath = os.path.join(db[cav]["path"], f"{timestamp}.yaml")
            if not os.path.exists(ypath):
                continue
            for oid, obj in load_cav_yaml(ypath).get("vehicles", {}).items():
                classes.setdefault(oid, class_id(obj))
        # gt_boxes order followed object-id union order; rebuild ids the
        # same way project_world_objects did (kept ids list not exposed —
        # conservative fallback: order of first appearance)
        gt_classes = np.zeros(self.max_num, np.int32)
        for i, oid in enumerate(list(classes)[: self.max_num]):
            gt_classes[i] = classes[oid]
        sample["gt_classes"] = gt_classes
        return sample
