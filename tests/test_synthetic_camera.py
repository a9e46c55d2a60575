"""Synthetic camera rendering: geometric consistency + hetero modality
layout (the learnability harness for the LSS path)."""

import numpy as np

from gencomm_tpu.data.synthetic import SyntheticConfig, SyntheticScenes

CAM = {"sensor": "camera", "final_dim": (64, 96), "ncam": 4, "focal": 60.0}


def _scenes(modalities, **kw):
    cfg = SyntheticConfig(
        lidar_range=(-32.0, -16.0, -3.0, 32.0, 16.0, 1.0),
        max_cav=4, num_agents=3, points_per_agent=4000,
        num_vehicles=4, modalities=modalities, **kw,
    )
    return SyntheticScenes(cfg)


def test_camera_arrays_and_masks():
    scenes = _scenes({"m1": {"sensor": "lidar"}, "m2": CAM})
    b = scenes.sample(0, 2)
    assert b["imgs_m2"].shape == (2, 4, 4, 64, 96, 3)
    assert b["rots_m2"].shape == (2, 4, 4, 3, 3)
    # round-robin assignment: slots 0,2 -> m1, slot 1 -> m2 (3 agents)
    assert b["modality_mask_m1"][0].tolist() == [True, False, True, False]
    assert b["modality_mask_m2"][0].tolist() == [False, True, False, False]
    # masks partition the active agents
    both = b["modality_mask_m1"] & b["modality_mask_m2"]
    assert not both.any()
    assert ((b["modality_mask_m1"] | b["modality_mask_m2"])
            == b["agent_mask"]).all()
    # camera slot has a rendered image; lidar slots stay zero
    assert float(np.abs(b["imgs_m2"][0, 1]).sum()) > 0
    assert float(np.abs(b["imgs_m2"][0, 0]).sum()) == 0
    # lidar points only on lidar slots
    assert b["point_mask_m1"][0, 0].any()
    assert not b["point_mask_m1"][0, 1].any()


def test_camera_render_geometry():
    """A vehicle straight ahead of the (ego) camera agent must light up the
    forward camera near the centre column, and nowhere in the rear one."""
    scenes = _scenes({"m2": CAM})
    cfg = scenes.cfg
    rng = np.random.RandomState(0)
    # one vehicle 10m ahead on +x, at ground height
    veh = scenes._sample_vehicle_points(
        rng, np.array([10.0, 0.0, -1.0, 1.6, 1.9, 4.2, 0.0]))
    color = np.full(len(veh), 0.7)
    ground = np.stack([rng.uniform(-30, 30, 500),
                       rng.uniform(-15, 15, 500),
                       rng.uniform(-2.0, -1.9, 500)], axis=1)
    imgs, rots, trans, intrins, dmaps = scenes._render_cams(
        rng, veh, color, ground, np.eye(4), CAM)
    h, w = CAM["final_dim"]
    front = imgs[0]  # yaw 0 looks along +x
    veh_pix = front[..., 0] > 0.9  # occupancy channel
    assert veh_pix.any()
    us = np.nonzero(veh_pix)[1]
    assert abs(us.mean() - w / 2) < w / 6  # near centre column
    rear = imgs[2]
    assert not (rear[..., 0] > 0.9).any()
    # depth channel encodes distance: vehicle ~10m -> exp(-10/40) ~ 0.78
    dvals = front[..., 1][veh_pix]
    assert 0.6 < dvals.mean() < 0.95
    # rots/intrins consistent with the LSS unprojection convention:
    # unproject the mean vehicle pixel at depth 10 -> close to (10, 0, ...)
    uv = np.stack([np.nonzero(veh_pix)[1], np.nonzero(veh_pix)[0]], 1).mean(0)
    d = 10.0
    pt_cam = np.linalg.inv(intrins[0]) @ np.array([uv[0] * d, uv[1] * d, d])
    pt_agent = rots[0] @ pt_cam + trans[0]
    assert abs(pt_agent[0] - 10.0) < 1.5
    assert abs(pt_agent[1]) < 1.5


def test_single_lidar_layout_unchanged():
    scenes = _scenes({"m1": {"sensor": "lidar"}})
    b = scenes.sample(3, 1)
    assert (b["modality_mask_m1"] == b["agent_mask"]).all()
    assert b["points_m1"].shape[2] == 4000
