"""Synthetic-generator robustness knobs: pose noise + comm delay.

The r4 robustness sweep initially no-op'd on --dataset synthetic (all AP
levels identical) because the generator ignored noise_setting /
wild_setting. These tests pin the intended semantics (reference
pose_utils.add_noise_data_dict + opv2v_basedataset.time_delay_calculation
analogs):
  - noise perturbs ONLY the pairwise pose-estimate warp; scene, points
    and GT stay bit-identical (paired sweeps)
  - delay makes ONLY non-ego observations stale; ego points and GT stay
    bit-identical; pairwise unchanged
"""

import dataclasses

import numpy as np

from gencomm_tpu.data.synthetic import SyntheticConfig, SyntheticScenes


def _cfg(**kw):
    return dataclasses.replace(
        SyntheticConfig(num_agents=3, points_per_agent=3000,
                        num_vehicles=4, points_per_vehicle=120),
        **kw,
    )


def test_pose_noise_only_moves_warp():
    b0 = SyntheticScenes(_cfg()).sample(11)
    b1 = SyntheticScenes(_cfg(pos_std=0.4, rot_std=0.4)).sample(11)
    assert np.array_equal(b0["gt_boxes"], b1["gt_boxes"])
    assert np.array_equal(b0["points_m1"], b1["points_m1"])
    assert np.array_equal(b0["pos_equal_one"], b1["pos_equal_one"])
    assert not np.allclose(b0["pairwise_t_matrix"],
                           b1["pairwise_t_matrix"])
    # T[i, i] stays identity: noise shifts estimated frames, not an
    # agent's own-frame transform
    eye = np.eye(4, dtype=np.float32)
    for i in range(3):
        np.testing.assert_allclose(
            b1["pairwise_t_matrix"][0, i, i], eye, atol=1e-5)


def test_noise_magnitude_tracks_sigma():
    b0 = SyntheticScenes(_cfg()).sample(5)
    deltas = []
    for sigma in (0.1, 0.6):
        bn = SyntheticScenes(_cfg(pos_std=sigma)).sample(5)
        deltas.append(np.abs(
            bn["pairwise_t_matrix"][0, :, :, :2, 3]
            - b0["pairwise_t_matrix"][0, :, :, :2, 3]
        ).max())
    assert deltas[1] > deltas[0] > 0


def test_laplace_differs_from_gaussian():
    g = SyntheticScenes(_cfg(pos_std=0.4)).sample(3)
    lp = SyntheticScenes(_cfg(pos_std=0.4, laplace_noise=True)).sample(3)
    assert not np.allclose(g["pairwise_t_matrix"],
                           lp["pairwise_t_matrix"])


def test_delay_staleness_only_hits_neighbors():
    b0 = SyntheticScenes(_cfg()).sample(11)
    b2 = SyntheticScenes(_cfg(delay_ms=300)).sample(11)
    assert np.array_equal(b0["gt_boxes"], b2["gt_boxes"])
    assert np.array_equal(b0["points_m1"][0, 0], b2["points_m1"][0, 0])
    assert np.allclose(b0["pairwise_t_matrix"], b2["pairwise_t_matrix"])
    assert not np.allclose(b0["points_m1"][0, 1], b2["points_m1"][0, 1])


def test_build_dataset_threads_noise_and_delay():
    from gencomm_tpu.tools.train import build_dataset

    hypes = {
        "preprocess": {"cav_lidar_range": [-16, -8, -3, 16, 8, 1],
                       "args": {"voxel_size": [0.4, 0.4, 4.0]}},
        "postprocess": {"anchor_args": {"feature_stride": 4}},
        "train_params": {"max_cav": 3},
        "model": {"core_method": "point_pillar", "args": {}},
        "noise_setting": {"add_noise": True, "add_pose_noise": True,
                          "args": {"pos_std": 0.3, "rot_std": 0.2,
                                   "laplace": True}},
        "wild_setting": {"async": True, "async_overhead": 200},
    }
    ds = build_dataset(hypes, False, "synthetic")
    assert ds.cfg.pos_std == 0.3
    assert ds.cfg.rot_std == 0.2
    assert ds.cfg.laplace_noise is True
    assert ds.cfg.delay_ms == 200.0
