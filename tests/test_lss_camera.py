"""LSS camera encoder: geometry correctness + hetero lidar+camera model."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gencomm_tpu.models.encoders.lss import LSSEncoder, center_crop_or_pad
from gencomm_tpu.models.heter_baseline import HeterModel
from gencomm_tpu.data.synthetic import SyntheticScenes
from tests.test_model_forward import TINY, MODALITY_ARGS

# heavy suite: excluded from the fast subset (`pytest -m "not slow"`, VERDICT r3 #9)
pytestmark = pytest.mark.slow

GRID_CONF = {
    "xbound": [-16.0, 16.0, 0.4],
    "ybound": [-8.0, 8.0, 0.4],
    "zbound": [-10.0, 10.0, 20.0],
    "ddiscr": [2, 20, 16],
    "mode": "LID",
}
FINAL_DIM = (64, 96)
NCAM = 2

M2_CAMERA_ARGS = {
    "core_method": "lift_splat_shoot",
    "sensor_type": "camera",
    "encoder_args": {
        "grid_conf": GRID_CONF,
        "data_aug_conf": {"final_dim": list(FINAL_DIM)},
        "img_downsample": 8,
        "img_features": 32,
    },
    "backbone_args": {
        "layer_nums": [2, 2],
        "layer_strides": [2, 2],
        "num_filters": [32, 64],
        "upsample_strides": [1, 2],
        "num_upsample_filter": [32, 32],
    },
    "shrink_header": {
        "kernal_size": [3], "stride": [2], "padding": [1],
        "dim": [64], "input_dim": 64,
    },
}


def _camera_inputs(b, l, rng):
    f = 60.0
    intrins = np.zeros((b, l, NCAM, 3, 3), np.float32)
    intrins[..., 0, 0] = f
    intrins[..., 1, 1] = f
    intrins[..., 0, 2] = FINAL_DIM[1] / 2
    intrins[..., 1, 2] = FINAL_DIM[0] / 2
    intrins[..., 2, 2] = 1
    rots = np.tile(np.eye(3, dtype=np.float32), (b, l, NCAM, 1, 1))
    trans = np.zeros((b, l, NCAM, 3), np.float32)
    post_rots = np.tile(np.eye(3, dtype=np.float32), (b, l, NCAM, 1, 1))
    post_trans = np.zeros((b, l, NCAM, 3), np.float32)
    imgs = rng.rand(b, l, NCAM, *FINAL_DIM, 3).astype(np.float32)
    return {
        "imgs": imgs, "rots": rots, "trans": trans, "intrins": intrins,
        "post_rots": post_rots, "post_trans": post_trans,
    }


def test_lss_geometry_center_pixel():
    enc = LSSEncoder(grid_conf=GRID_CONF, final_dim=FINAL_DIM, downsample=8,
                     feat_ch=8)
    rng = np.random.RandomState(0)
    cams = _camera_inputs(1, 1, rng)
    flat = {k: jnp.asarray(v[0]) for k, v in cams.items()}  # (L=1, N, ...)
    # bind to access _geometry without params
    bound = enc.bind(
        enc.init(jax.random.PRNGKey(0),
                 {k: jnp.asarray(v) for k, v in cams.items()}, False)
    )
    geom = bound._geometry(
        flat["rots"], flat["trans"], flat["intrins"], flat["post_rots"],
        flat["post_trans"],
    )
    # with identity rotation and K^-1: the center pixel ray goes along +z
    # in camera coords -> geometry xy ~ 0 at every depth for the pixel at
    # the principal point. fW=12, principal at u=48 -> between samples;
    # check the ray direction: x/z = (u - cx)/f
    d, fh, fw = geom.shape[2:5]
    us = np.linspace(0, FINAL_DIM[1] - 1, fw)
    vs = np.linspace(0, FINAL_DIM[0] - 1, fh)
    g = np.asarray(geom[0, 0])  # (D, fH, fW, 3)
    depths = g[:, 0, 0, 2]
    for wi in (0, fw // 2, fw - 1):
        expect_ratio = (us[wi] - FINAL_DIM[1] / 2) / 60.0
        ratio = g[-1, fh // 2, wi, 0] / g[-1, fh // 2, wi, 2]
        assert np.isclose(ratio, expect_ratio, atol=1e-4)
    # depth bins increase (LID)
    assert np.all(np.diff(depths) > 0)
    assert depths[0] >= 2.0 and depths[-1] <= 20.0


def test_lss_encoder_output_and_pooling():
    enc = LSSEncoder(grid_conf=GRID_CONF, final_dim=FINAL_DIM, downsample=8,
                     feat_ch=8)
    rng = np.random.RandomState(1)
    cams = {k: jnp.asarray(v) for k, v in _camera_inputs(1, 2, rng).items()}
    v = jax.jit(lambda: enc.init(jax.random.PRNGKey(0), cams, False))()
    (bev, depth_logits) = jax.jit(lambda v: enc.apply(v, cams, False))(v)
    assert bev.shape == (1, 2, 40, 80, 8)  # (B, L, ny, nx, C), nz=1
    assert depth_logits.shape[:3] == (1, 2, NCAM)
    assert bool(jnp.isfinite(bev).all())
    assert float(jnp.abs(bev).sum()) > 0


def test_lss_topk_splat_matches_dense():
    """depth_topk=D renormalizes by a sum that is already 1 -> the sparse
    splat must reproduce the dense splat; small K stays close because the
    dropped bins carry the least mass."""
    rng = np.random.RandomState(3)
    cams = {k: jnp.asarray(v) for k, v in _camera_inputs(1, 2, rng).items()}
    d_bins = GRID_CONF["ddiscr"][2]
    dense = LSSEncoder(grid_conf=GRID_CONF, final_dim=FINAL_DIM,
                       downsample=8, feat_ch=8, depth_topk=0)
    v = jax.jit(lambda: dense.init(jax.random.PRNGKey(0), cams, False))()

    bev_dense, _ = jax.jit(lambda v: dense.apply(v, cams, False))(v)
    full_k = LSSEncoder(grid_conf=GRID_CONF, final_dim=FINAL_DIM,
                        downsample=8, feat_ch=8, depth_topk=d_bins)
    # depth_topk == d_bins runs the sparse path over every bin: identical
    # result up to scatter-order fp noise
    bev_full, _ = jax.jit(lambda v: full_k.apply(v, cams, False))(v)
    np.testing.assert_allclose(np.asarray(bev_full), np.asarray(bev_dense),
                               rtol=1e-5, atol=1e-5)

    sparse = LSSEncoder(grid_conf=GRID_CONF, final_dim=FINAL_DIM,
                        downsample=8, feat_ch=8, depth_topk=d_bins - 1)
    bev_sparse, _ = jax.jit(lambda v: sparse.apply(v, cams, False))(v)
    # untrained softmax is near-uniform, so K=D-1 keeps (D-1)/D of the mass
    # and renormalizes — totals must agree to a few percent
    dense_sum = float(jnp.abs(bev_dense).sum())
    sparse_sum = float(jnp.abs(bev_sparse).sum())
    assert abs(sparse_sum - dense_sum) / dense_sum < 0.1
    # gradients flow through the top-k gather
    g = jax.grad(
        lambda v: sparse.apply(v, cams, False)[0].sum()
    )(v)
    leaf = jax.tree_util.tree_leaves(g)
    assert any(float(jnp.abs(x).max()) > 0 for x in leaf)


def test_lss_trunk_bf16_close_to_fp32():
    """trunk_bf16=True runs the image trunk with bf16 activations; same
    params must give a BEV canvas close to the fp32 path (outputs are cast
    back to fp32 at the heads)."""
    rng = np.random.RandomState(5)
    cams = {k: jnp.asarray(v) for k, v in _camera_inputs(1, 2, rng).items()}
    f32 = LSSEncoder(grid_conf=GRID_CONF, final_dim=FINAL_DIM, downsample=8,
                     feat_ch=8)
    v = f32.init(jax.random.PRNGKey(0), cams, False)
    bev32, logits32 = f32.apply(v, cams, False)
    b16 = LSSEncoder(grid_conf=GRID_CONF, final_dim=FINAL_DIM, downsample=8,
                     feat_ch=8, trunk_bf16=True)
    bev16, logits16 = b16.apply(v, cams, False)
    assert bev16.dtype == jnp.float32 and logits16.dtype == jnp.float32
    # bf16 has ~3 decimal digits; the trunk is shallow so relative error
    # stays small
    denom = float(jnp.abs(bev32).mean()) + 1e-6
    err = float(jnp.abs(bev16 - bev32).mean()) / denom
    assert err < 0.1, err


def test_center_crop_or_pad():
    x = jnp.ones((2, 4, 6, 3))
    y = center_crop_or_pad(x, (8, 4))
    assert y.shape == (2, 8, 4, 3)
    assert float(y[0, 0, 0, 0]) == 0.0  # padded
    assert float(y[0, 4, 1, 0]) == 1.0
    z = center_crop_or_pad(x, (2, 2))
    assert z.shape == (2, 2, 2, 3)


def test_bin_depth_indices_parity():
    """GT depth binning matches the reference's bin_depths (target=True):
    opencood/utils/camera_utils.py:137-183 — UD and LID modes, including
    out-of-range clamping and non-finite handling."""
    import os
    import sys
    import types
    ref = "/root/reference"
    if not os.path.isdir(os.path.join(ref, "opencood")):
        pytest.skip("reference checkout not mounted")
    if ref not in sys.path:
        sys.path.insert(0, ref)
    # the reference module imports torchvision/PIL helpers at module scope;
    # bin_depths itself only needs torch
    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        tv.transforms = types.ModuleType("torchvision.transforms")
        class _Normalize:  # subclassed by the reference's NormalizeInverse
            def __init__(self, *a, **k):
                pass

            def __call__(self, x):
                return x

        tv.transforms.Normalize = _Normalize
        tv.transforms.Compose = lambda fs: (lambda x: x)
        tv.transforms.ToTensor = lambda *a, **k: (lambda x: x)
        tv.transforms.ToPILImage = lambda *a, **k: (lambda x: x)
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.transforms"] = tv.transforms
    if "shapely" not in sys.modules:
        shap = types.ModuleType("shapely")
        geom = types.ModuleType("shapely.geometry")
        geom.Point = geom.MultiPoint = geom.Polygon = object
        shap.geometry = geom
        sys.modules["shapely"] = shap
        sys.modules["shapely.geometry"] = geom
    import torch
    from opencood.utils.camera_utils import bin_depths

    from gencomm_tpu.models.encoders.lss import bin_depth_indices

    rng = np.random.RandomState(11)
    depth = rng.uniform(-5.0, 60.0, (3, 16, 24)).astype(np.float32)
    depth[0, 0, 0] = np.inf
    depth[0, 0, 1] = np.nan
    for mode in ("UD", "LID"):
        want, _ = bin_depths(torch.from_numpy(depth.copy()), mode,
                             2.0, 20.0, 16, target=True)
        got = bin_depth_indices(jnp.asarray(depth), mode, 2.0, 20.0, 16)
        np.testing.assert_array_equal(np.asarray(got), want.numpy())


def test_depth_supervision_end_to_end():
    """With GT depth maps in the batch, the encoder pairs logits with binned
    GT and the depth loss fires with the per-slot modality-mask weight."""
    from gencomm_tpu.loss.pyramid_loss import PointPillarDepthLoss

    scenes = SyntheticScenes(TINY)
    b = scenes.sample(seed=9, batch_size=1)
    rng = np.random.RandomState(4)
    m1_mask = b["agent_mask"].copy()
    m1_mask[:, 1:] = False
    m2_mask = b["agent_mask"].copy()
    m2_mask[:, 0] = False
    b["modality_mask_m1"] = m1_mask
    b["modality_mask_m2"] = m2_mask
    cams = _camera_inputs(1, TINY.max_cav, rng)
    b.update({f"{k}_m2": v for k, v in cams.items()})
    b["depths_m2"] = rng.uniform(1.0, 30.0, (1, TINY.max_cav, NCAM) +
                                 FINAL_DIM).astype(np.float32)
    batch = {k: jnp.asarray(v) for k, v in b.items()}

    model = HeterModel(
        modality_args={
            "m1": dict(MODALITY_ARGS["m1"], core_method="point_pillar"),
            "m2": M2_CAMERA_ARGS,
        },
        fusion_method="att",
        fusion_args={"att": {"feat_dim": 64}},
        lidar_range=TINY.lidar_range,
        anchor_number=2,
        in_head=64,
    )
    variables = model.init({"params": jax.random.PRNGKey(0)}, batch,
                           train=False)
    out = model.apply(variables, batch, train=False)
    item = out["depth_items_m2"]
    assert isinstance(item, tuple) and len(item) == 3
    logits, gt_idx, wt = item
    assert logits.shape[:3] == (1, TINY.max_cav, NCAM)
    assert gt_idx.shape == logits.shape[:-1]
    assert gt_idx.dtype == jnp.int32

    from tests.test_model_forward import LOSS_ARGS
    crit = PointPillarDepthLoss(dict(LOSS_ARGS, depth={"weight": 1.0}))
    target = {k: batch[k] for k in
              ("pos_equal_one", "neg_equal_one", "targets")}
    losses = crit(out, target)
    assert "depth_loss" in losses
    d = float(losses["depth_loss"])
    assert np.isfinite(d) and d > 0


def test_hetero_lidar_plus_camera_model():
    scenes = SyntheticScenes(TINY)
    b = scenes.sample(seed=7, batch_size=1)
    rng = np.random.RandomState(2)
    m1_mask = b["agent_mask"].copy()
    m1_mask[:, 1:] = False
    m2_mask = b["agent_mask"].copy()
    m2_mask[:, 0] = False
    b["modality_mask_m1"] = m1_mask
    b["modality_mask_m2"] = m2_mask
    b.update({f"{k}_m2": v for k, v in _camera_inputs(1, TINY.max_cav, rng).items()})
    batch = {k: jnp.asarray(v) for k, v in b.items()}

    model = HeterModel(
        modality_args={
            "m1": dict(MODALITY_ARGS["m1"], core_method="point_pillar"),
            "m2": M2_CAMERA_ARGS,
        },
        fusion_method="att",
        fusion_args={"att": {"feat_dim": 64}},
        lidar_range=TINY.lidar_range,
        anchor_number=2,
        in_head=64,
        use_gencomm=True,
    )
    rngs = {"params": jax.random.PRNGKey(0),
            "diffusion": jax.random.PRNGKey(1)}
    variables = jax.jit(lambda: model.init(rngs, batch, train=False))()
    out = jax.jit(
        lambda v, bb: model.apply(
            v, bb, train=False, rngs={"diffusion": jax.random.PRNGKey(3)}
        )
    )(variables, batch)
    hp, wp = scenes.anchors.shape[:2]
    assert out["cls_preds"].shape == (1, hp, wp, 2)
    assert "depth_items_m2" in out
    assert bool(jnp.isfinite(out["cls_preds"]).all())
