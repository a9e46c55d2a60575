"""Adaptor heterogeneity controller parity tests."""

import json

import numpy as np

from gencomm_tpu.utils.heter_utils import Adaptor, assign_modality


def make_adaptor(train, assignment=None):
    return Adaptor(
        ego_modality="m1",
        model_modality_list=["m1", "m2"],
        modality_assignment=assignment,
        lidar_channels_dict={"m2": 32},
        mapping_dict={"m1": "m1", "m2": "m2", "m3": "m1", "m4": "m2"},
        cav_preference={"m1": 0.5, "m2": 0.5},
        train=train,
    )


def test_eval_mapping_is_deterministic():
    a = make_adaptor(train=False)
    assert a.reassign_cav_modality("m3", 1) == "m1"
    assert a.reassign_cav_modality("m4", 2) == "m2"
    assert a.unmatched_modality("m3")
    assert not a.unmatched_modality("m2")


def test_train_ego_slot_gets_ego_modality():
    a = make_adaptor(train=True)
    for _ in range(10):
        assert a.reassign_cav_modality("m4", 0) == "m1"
    draws = {a.reassign_cav_modality("m4", 1) for _ in range(50)}
    assert draws <= {"m1", "m2"} and len(draws) == 2


def test_reorder_puts_ego_modality_first():
    assignment = {"scene_a": {"cav1": "m4", "cav2": "m3", "cav3": "m2"}}
    a = make_adaptor(train=False, assignment=assignment)
    # cav1 maps to m2 (not ego); cav2 maps to m1 -> must lead
    order = a.reorder_cav_list(["cav1", "cav2", "cav3"], "scene_a")
    assert order[0] == "cav2"
    assert set(order) == {"cav1", "cav2", "cav3"}


def test_lidar_channel_switch():
    a = make_adaptor(train=False)
    p = "/data/OPV2V/train/s1/c1/000070.pcd"
    assert a.switch_lidar_channels("m2", p) == \
        "/data/OPV2V_Hetero/train/s1/c1/000070_32.pcd"
    assert a.switch_lidar_channels("m1", p) == p


def test_assign_modality_writes_fixed_json(tmp_path):
    root = tmp_path / "OPV2V"
    for split in ("train",):
        for sc in ("scene_a", "scene_b"):
            for cav in ("1", "2"):
                (root / split / sc / cav).mkdir(parents=True)
    out = tmp_path / "assign.json"
    result = assign_modality(str(root), str(out))
    saved = json.loads(out.read_text())
    assert saved == {k: dict(v) for k, v in result.items()}
    assert set(saved) == {"scene_a", "scene_b"}
    assert all(v in ("m1", "m2", "m3", "m4")
               for sc in saved.values() for v in sc.values())
