"""Early fusion merging + misc utility parity tests."""

import numpy as np
import jax.numpy as jnp

from tests.test_model_forward import TINY
from gencomm_tpu.data.synthetic import SyntheticScenes


def test_early_fusion_merges_points_into_ego_frame():
    from gencomm_tpu.data.early_fusion import merge_points_to_ego

    scenes = SyntheticScenes(TINY)
    batch = scenes.sample(3, batch_size=1)
    out = merge_points_to_ego(batch, lidar_range=TINY.lidar_range)
    b, l, p, _ = batch["points_m1"].shape
    assert out["points_m1"].shape == (b, 1, l * p, 4)
    assert out["agent_mask"].shape == (b, 1)
    # ego's own points are unchanged (identity transform)
    np.testing.assert_allclose(
        out["points_m1"][0, 0, :p, :3], batch["points_m1"][0, 0, :, :3],
        atol=1e-5,
    )
    # merged cloud has at least as many valid points as the ego alone
    assert out["point_mask_m1"].sum() >= batch["point_mask_m1"][0, 0].sum()
    # all valid merged points are inside the ego lidar range
    v = out["point_mask_m1"][0, 0] > 0
    pts = out["points_m1"][0, 0][v]
    r = TINY.lidar_range
    assert (pts[:, 0] >= r[0]).all() and (pts[:, 0] <= r[3]).all()


def test_position_embedding_sine_shape_and_values():
    from gencomm_tpu.utils.misc_utils import position_embedding_sine

    pe = position_embedding_sine(4, 6, 8)
    assert pe.shape == (4, 6, 16)
    assert np.isfinite(np.asarray(pe)).all()
    # distinct positions get distinct embeddings
    assert not np.allclose(np.asarray(pe[0, 0]), np.asarray(pe[3, 5]))


def test_mean_iu():
    from gencomm_tpu.utils.misc_utils import mean_iu

    gt = np.array([[0, 0], [1, 1]])
    pred = np.array([[0, 1], [1, 1]])
    # class 0: inter 1 / union 2; class 1: inter 2 / union 3
    assert abs(mean_iu(pred, gt) - (0.5 + 2 / 3) / 2) < 1e-9


def test_subsampling_utils():
    from gencomm_tpu.utils.misc_utils import (
        voxel_grid_filter, fps_numpy, subsample_fraction, keep_closest,
        remove_road,
    )

    rng = np.random.default_rng(0)
    pc = rng.normal(size=(500, 4)).astype(np.float32) * 5
    assert len(voxel_grid_filter(pc, 100)) <= 110
    assert len(fps_numpy(pc, 50)) == 50
    assert len(subsample_fraction(pc, 0.25)) == 125
    assert (np.linalg.norm(keep_closest(pc, 5.0)[:, :3], axis=1) < 5).all()
    # road removal: flat plane points at z=0 removed, elevated kept
    ground = np.c_[rng.uniform(-10, 10, (200, 2)), np.zeros(200)]
    objs = np.c_[rng.uniform(-10, 10, (20, 2)), np.full(20, 2.0)]
    kept = remove_road(np.r_[ground, objs].astype(np.float32))
    assert (kept[:, 2] > 1.0).mean() > 0.9


def test_max_consensus_align_recovers_shift():
    from gencomm_tpu.utils.misc_utils import max_consensus_align

    rng = np.random.default_rng(1)
    pl = rng.uniform(-5, 5, (40, 2))
    shift = np.array([0.5, -0.25])
    pr = pl - shift  # r needs +shift to match l
    T, cons = max_consensus_align(pl, pr, radius=0.2)
    assert cons >= 35
    np.testing.assert_allclose(T[:2, 2], shift, atol=0.3)


def test_cpm_size_bytes():
    from gencomm_tpu.utils.misc_utils import cpm_size_bytes

    msg = np.zeros((2, 64, 128), np.float32)
    s = cpm_size_bytes(msg)
    assert s["raw_bytes"] == 2 * 64 * 128 * 2  # fp16 quantized
    assert s["compressed_bytes"] < s["raw_bytes"]


def test_mmd_and_tsne_feature_gap(tmp_path):
    from gencomm_tpu.visualization.feature_analysis import (
        mmd_rbf, tsne_embed, plot_tsne,
    )

    rng = np.random.default_rng(0)
    a = rng.normal(0, 1, (80, 16))
    b = rng.normal(3, 1, (80, 16))  # clearly shifted domain
    same = mmd_rbf(a, rng.normal(0, 1, (80, 16)))
    diff = mmd_rbf(a, b)
    assert diff > same  # separated domains show larger MMD
    emb = tsne_embed({"m1": a, "m2": b}, max_per_domain=40)
    assert emb["m1"].shape == (40, 2) and emb["m2"].shape == (40, 2)
    p = plot_tsne({"m1": a[:40], "m2": b[:40]}, str(tmp_path / "tsne.png"))
    import os
    assert os.path.exists(p)


def test_save_bev_feature(tmp_path):
    from gencomm_tpu.visualization.feature_analysis import save_bev_feature
    import os

    f = np.random.default_rng(0).normal(size=(32, 64, 8)).astype(np.float32)
    p = save_bev_feature(f, str(tmp_path / "feat.png"))
    assert os.path.exists(p)


def test_heal_tools_rename_remove(tmp_path):
    import jax.numpy as jnp
    import orbax.checkpoint as ocp
    from gencomm_tpu.tools import heal_tools

    src = tmp_path / "src"
    ocp.PyTreeCheckpointer().save(
        str(src / "step_0"),
        {"params": {"branch_m1": {"w": jnp.ones(3)},
                    "branch_m4": {"w": jnp.zeros(3)},
                    "heads": {"w": jnp.ones(2)}},
         "batch_stats": {}, "step": 0},
    )
    out1 = tmp_path / "renamed"
    heal_tools.main(["rename", "--ckpt", str(src), "--out", str(out1),
                     "--map", "branch_m1=branch_m2"])
    out2 = tmp_path / "pruned"
    heal_tools.main(["remove", "--ckpt", str(out1), "--out", str(out2),
                     "--prefix", "branch_m4"])
    from gencomm_tpu.train import checkpoint
    ck = checkpoint.load_checkpoint(checkpoint.latest_checkpoint(str(out2)))
    assert "branch_m2" in ck["params"]
    assert "branch_m4" not in ck["params"]
    assert "heads" in ck["params"]


def test_stamp_yaml_parsers_per_modality(tmp_path):
    import yaml as pyyaml
    from gencomm_tpu.config.yaml_utils import load_yaml

    cfg = {
        "yaml_parsers": {"m1": "load_general_params",
                         "m2": ["load_general_params"]},
        "heter": {"modality_setting": {
            "m1": {"preprocess": {
                "cav_lidar_range": [-8, -4, -3, 8, 4, 1],
                "args": {"voxel_size": [0.4, 0.4, 4]}},
                "postprocess": {"anchor_args": {}}},
            "m2": {"preprocess": {
                "cav_lidar_range": [-16, -8, -3, 16, 8, 1],
                "args": {"voxel_size": [0.4, 0.4, 4]}},
                "postprocess": {"anchor_args": {}}},
        }},
    }
    p = tmp_path / "stamp.yaml"
    p.write_text(pyyaml.safe_dump(cfg))
    out = load_yaml(str(p))
    m1 = out["heter"]["modality_setting"]["m1"]["postprocess"]["anchor_args"]
    m2 = out["heter"]["modality_setting"]["m2"]["postprocess"]["anchor_args"]
    assert m1["W"] == 40 and m2["W"] == 80  # per-modality grids differ


def test_keypoint_utils_bev_sample():
    from gencomm_tpu.utils.keypoint_utils import (
        project_bev, bev_sample, mask_points_by_range,
    )

    rng = np.random.default_rng(0)
    # a "wall" of points along a line (structural) + sparse noise
    wall = np.c_[np.linspace(-5, 5, 300), np.full(300, 2.0),
                 rng.uniform(-1, 0, 300), np.ones(300)]
    noise = np.c_[rng.uniform(-8, 8, (50, 2)), rng.uniform(-1, 0, 50),
                  np.ones(50)]
    pts = np.r_[wall, noise].astype(np.float32)
    rng_lim = [-10, -10, -3, 10, 10, 1]
    img, rows, cols = project_bev(pts, rng_lim, 0.2)
    assert img.shape == (100, 100) and img.max() == 255
    kp = bev_sample(pts, rng_lim, 64)
    assert len(kp) == 64
    assert len(mask_points_by_range(pts, rng_lim)) == len(pts)


def test_trim_agent_slots_bucketing():
    from gencomm_tpu.data.bucketing import trim_agent_slots

    scenes = SyntheticScenes(TINY)  # max_cav=3, 2 real agents
    batch = scenes.sample(0, batch_size=2)
    out = trim_agent_slots(batch, buckets=(2, 3))
    assert out["agent_mask"].shape == (2, 2)
    assert out["points_m1"].shape[1] == 2
    assert out["pairwise_t_matrix"].shape[1:3] == (2, 2)
    # no valid agents dropped
    assert out["agent_mask"].sum() == batch["agent_mask"].sum()
    # bucket never exceeds original L; identity when nothing to trim
    same = trim_agent_slots(out, buckets=(2, 3))
    assert same["points_m1"].shape == out["points_m1"].shape


def test_bev_seg_head_in_heter_model():
    import jax
    from tests.test_model_forward import MODALITY_ARGS
    from gencomm_tpu.models.heter_baseline import HeterModel

    scenes = SyntheticScenes(TINY)
    batch = {k: jnp.asarray(v) for k, v in scenes.sample(0, 1).items()}
    m = HeterModel(
        modality_args=MODALITY_ARGS, fusion_method="att",
        fusion_args={"att": {"feat_dim": 64}},
        lidar_range=TINY.lidar_range, anchor_number=2,
        seg_head_target="both",
    )
    out = m.apply(
        m.init({"params": jax.random.PRNGKey(0)}, batch, False), batch, False
    )
    assert out["dynamic_seg"].shape[-1] == 2
    assert out["static_seg"].shape[-1] == 3

    from gencomm_tpu.models.seg_head import seg_loss
    h, w = out["dynamic_seg"].shape[1:3]
    gt_d = jnp.zeros((1, h, w), jnp.int32)
    gt_s = jnp.ones((1, h, w), jnp.int32)
    losses = seg_loss(out["dynamic_seg"], out["static_seg"], gt_d, gt_s)
    assert np.isfinite(float(losses["total_loss"]))


def test_von_mises_noise_and_remove_z_axis():
    """V2VNet-robust noise parity (reference pose_utils.py:107-160):
    Gaussian x/y, von-Mises yaw with concentration (180/(pi*std))^2, and
    the z-axis scrub of a 4x4 transform."""
    from gencomm_tpu.utils.pose_utils import (
        generate_noise_von_mises, remove_z_axis,
    )

    rng = np.random.RandomState(0)
    poses = np.zeros((2000, 6))
    noise = generate_noise_von_mises(poses, pos_std=0.3, rot_std=5.0,
                                     rng=rng)
    assert noise.shape == poses.shape
    # only x, y, yaw perturbed
    assert np.all(noise[:, 2] == 0) and np.all(noise[:, 3] == 0)
    assert np.all(noise[:, 5] == 0)
    assert abs(noise[:, :2].std() - 0.3) < 0.02
    # von-Mises with k=(180/(pi*5))^2 ~ N(0, 1/sqrt(k)) for large k:
    # std ~ 5 deg in radians
    assert abs(noise[:, 4].std() - np.deg2rad(5.0)) < 0.01

    T = np.arange(16, dtype=float).reshape(4, 4)
    out = remove_z_axis(T)
    assert out[2, 3] == 0 and out[2, 2] == 1
    assert out[0, 2] == 0 and out[1, 2] == 0
    assert out[2, 0] == 0 and out[2, 1] == 0
    assert out[0, 1] == 1 and out[1, 0] == 4  # untouched entries
