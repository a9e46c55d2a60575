"""Golden parity tests, round 2: anchors, box decode, diffusion schedule,
VOC AP — our implementations vs the reference's own code run as an oracle
(torch/numpy on CPU, read-only import from /root/reference).

Complements tests/test_reference_golden.py (geometry + warp)."""

import os
import sys
import types

import numpy as np
import pytest

REF = "/root/reference"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REF, "opencood")),
    reason="reference checkout not mounted",
)


@pytest.fixture(scope="module", autouse=True)
def ref_path():
    # inert stand-ins for reference deps not installed here (icecream,
    # shapely, the cython box_overlaps build, open3d-based vis_utils);
    # nothing under test touches them
    if "icecream" not in sys.modules:
        ice = types.ModuleType("icecream")
        ice.ic = lambda *a, **k: None
        sys.modules["icecream"] = ice
    if "shapely" not in sys.modules:
        shap = types.ModuleType("shapely")
        geom = types.ModuleType("shapely.geometry")
        geom.Polygon = object
        geom.Point = object
        geom.MultiPoint = object
        shap.geometry = geom
        sys.modules["shapely"] = shap
        sys.modules["shapely.geometry"] = geom
    else:
        geom = sys.modules.get("shapely.geometry")
        if geom is not None:
            for k in ("Polygon", "Point", "MultiPoint"):
                if not hasattr(geom, k):
                    setattr(geom, k, object)
    if "pyquaternion" not in sys.modules:
        pq = types.ModuleType("pyquaternion")
        pq.Quaternion = object  # only used by DAIR calib paths, not tested
        sys.modules["pyquaternion"] = pq
    for name, attrs in (
        ("opencood.utils.box_overlaps", {"bbox_overlaps": None}),
        ("opencood.visualization.vis_utils", {}),
    ):
        if name not in sys.modules:
            mod = types.ModuleType(name)
            for k, v in attrs.items():
                setattr(mod, k, v)
            sys.modules[name] = mod
    sys.path.insert(0, REF)
    yield
    sys.path.remove(REF)


def test_anchor_box_parity():
    from opencood.data_utils.post_processor.voxel_postprocessor import (
        VoxelPostprocessor,
    )
    from gencomm_tpu.data.postprocessor import generate_anchor_box

    anchor_args = {
        "W": 512, "H": 256, "l": 3.9, "w": 1.6, "h": 1.56,
        "r": [0, 90], "vw": 0.4, "vh": 0.4, "feature_stride": 4,
        "cav_lidar_range": [-102.4, -51.2, -3, 102.4, 51.2, 1],
    }
    ref_pp = object.__new__(VoxelPostprocessor)
    ref_pp.params = {"anchor_args": anchor_args, "order": "hwl"}
    ref_pp.anchor_num = 2
    ref_anchors = ref_pp.generate_anchor_box()
    ours = generate_anchor_box(anchor_args, order="hwl")
    np.testing.assert_allclose(ours, ref_anchors, atol=1e-5)


def test_delta_decode_parity():
    import torch
    from opencood.data_utils.post_processor.voxel_postprocessor import (
        VoxelPostprocessor,
    )
    import jax.numpy as jnp
    from gencomm_tpu.data.postprocessor import delta_to_boxes3d

    rng = np.random.default_rng(0)
    Hp, Wp, A = 16, 32, 2
    anchors = np.zeros((Hp, Wp, A, 7), np.float32)
    anchors[..., 0] = rng.uniform(-50, 50, (Hp, Wp, A))
    anchors[..., 1] = rng.uniform(-25, 25, (Hp, Wp, A))
    anchors[..., 2] = -1.0
    anchors[..., 3:6] = [1.56, 1.6, 3.9]
    anchors[..., 6] = rng.uniform(0, np.pi, (Hp, Wp, A))
    deltas = rng.normal(0, 0.3, (Hp, Wp, A * 7)).astype(np.float32)

    # reference signature: deltas (N, 14, H, W), anchors torch (W, L, 2, 7)
    ref = VoxelPostprocessor.delta_to_boxes3d(
        torch.from_numpy(deltas).permute(2, 0, 1)[None],
        torch.from_numpy(anchors),
    ).numpy()[0]
    ours = np.asarray(delta_to_boxes3d(jnp.asarray(deltas),
                                       jnp.asarray(anchors)))
    np.testing.assert_allclose(ours, ref, atol=2e-4, rtol=1e-4)


def test_beta_schedule_parity():
    from opencood.utils.MDD_utils import make_beta_schedule
    from gencomm_tpu.models.gencomm.diffusion import make_schedule

    # the GenComm config: linear schedule, 3 steps, start/end as in
    # cond_diff.py:196-198
    ref = make_beta_schedule("linear", 3, linear_start=5e-3, linear_end=5e-2)
    ours = make_schedule(3, linear_start=5e-3, linear_end=5e-2)
    betas = ours[0] if isinstance(ours, tuple) else ours["betas"] \
        if isinstance(ours, dict) else ours
    np.testing.assert_allclose(np.asarray(betas, np.float64).reshape(-1)[:3],
                               np.asarray(ref).reshape(-1), atol=1e-8)


def test_label_assignment_parity():
    """Run the reference's full generate_label (argmax forcing, unique
    merge, pos/neg threshold logic, target encoding) as the oracle.

    The only knob changed: its cython bbox_overlaps uses a "+1 pixel"
    convention that is wrong for meter-scale boxes (utils/box_utils.py:
    aligned_iou_2d docstring); we inject the standard +1-free float IoU so
    both sides use the same documented convention and everything else is
    compared exactly."""
    import opencood.data_utils.post_processor.voxel_postprocessor as ref_vp
    from gencomm_tpu.data.postprocessor import (generate_anchor_box,
                                                generate_label)

    def bbox_overlaps_float(boxes, query):
        x1 = np.maximum(boxes[:, None, 0], query[None, :, 0])
        y1 = np.maximum(boxes[:, None, 1], query[None, :, 1])
        x2 = np.minimum(boxes[:, None, 2], query[None, :, 2])
        y2 = np.minimum(boxes[:, None, 3], query[None, :, 3])
        iw = np.clip(x2 - x1, 0, None)
        ih = np.clip(y2 - y1, 0, None)
        inter = iw * ih
        area_a = ((boxes[:, 2] - boxes[:, 0])
                  * (boxes[:, 3] - boxes[:, 1]))[:, None]
        area_b = ((query[:, 2] - query[:, 0])
                  * (query[:, 3] - query[:, 1]))[None, :]
        union = area_a + area_b - inter
        return (inter / np.maximum(union, 1e-12)).astype(np.float64)

    anchor_args = {
        "W": 64, "H": 32, "l": 3.9, "w": 1.6, "h": 1.56,
        "r": [0, 90], "vw": 0.4, "vh": 0.4, "feature_stride": 2,
        "cav_lidar_range": [-12.8, -6.4, -3, 12.8, 6.4, 1],
    }
    anchors = generate_anchor_box(anchor_args, order="hwl")

    rng = np.random.default_rng(3)
    max_num = 10
    gt = np.zeros((max_num, 7), np.float32)
    n_valid = 6
    gt[:n_valid, 0] = rng.uniform(-10, 10, n_valid)
    gt[:n_valid, 1] = rng.uniform(-5, 5, n_valid)
    gt[:n_valid, 2] = rng.uniform(-1.5, -0.5, n_valid)
    gt[:n_valid, 3] = rng.uniform(1.3, 1.8, n_valid)   # h
    gt[:n_valid, 4] = rng.uniform(1.4, 2.0, n_valid)   # w
    gt[:n_valid, 5] = rng.uniform(3.5, 4.5, n_valid)   # l
    gt[:n_valid, 6] = rng.uniform(-np.pi, np.pi, n_valid)
    mask = np.zeros(max_num, np.float32)
    mask[:n_valid] = 1

    old = ref_vp.bbox_overlaps
    ref_vp.bbox_overlaps = bbox_overlaps_float
    try:
        ref_pp = object.__new__(ref_vp.VoxelPostprocessor)
        ref_pp.params = {
            "anchor_args": anchor_args, "order": "hwl",
            "target_args": {"pos_threshold": 0.6, "neg_threshold": 0.45,
                            "score_threshold": 0.2},
        }
        ref_pp.anchor_num = 2
        ref = ref_pp.generate_label(gt_box_center=gt, anchors=anchors,
                                    mask=mask)
    finally:
        ref_vp.bbox_overlaps = old

    ours = generate_label(gt, mask, anchors, pos_threshold=0.6,
                          neg_threshold=0.45, order="hwl")
    np.testing.assert_array_equal(ours["pos_equal_one"],
                                  ref["pos_equal_one"])
    np.testing.assert_array_equal(ours["neg_equal_one"],
                                  ref["neg_equal_one"])
    np.testing.assert_allclose(ours["targets"], ref["targets"], atol=1e-5)


def test_lss_frustum_and_geometry_parity():
    """Frustum construction + camera->agent unprojection vs the reference
    LiftSplatShoot (heter_encoders.py:110-147): undo image aug (inverse
    post_rots/post_trans), lift (u,v,d)->(du,dv,d), intrinsics inverse,
    rotate/translate into the agent frame."""
    import torch

    for name, attrs in (
        ("efficientnet_pytorch", {"EfficientNet": object}),
        ("torchvision", {}),
        ("torchvision.transforms",
         {"__getattr__": staticmethod(lambda name: type(name, (), {
             "__init__": lambda self, *a, **k: None,
             "__call__": lambda self, x: x}))}),
        ("torchvision.models", {}),
        ("torchvision.models.resnet", {"resnet101": object}),
        ("torchvision.ops", {"DeformConv2d": object}),
        ("spconv", {"__getattr__": staticmethod(lambda name: object)}),
        ("spconv.pytorch",
         {"__getattr__": staticmethod(lambda name: object)}),
        ("matplotlib", {}),
        ("matplotlib.pyplot", {}),
        ("seaborn", {}),
    ):
        if name not in sys.modules:
            mod = types.ModuleType(name)
            for k, v in attrs.items():
                setattr(mod, k, v)
            sys.modules[name] = mod
    # expose dotted submodules as attributes on their parents
    for name in ("torchvision.transforms", "torchvision.models",
                 "torchvision.models.resnet", "torchvision.ops",
                 "spconv.pytorch"):
        parent, _, child = name.rpartition(".")
        if parent in sys.modules and name in sys.modules:
            setattr(sys.modules[parent], child, sys.modules[name])
    from opencood.models.heter_encoders import LiftSplatShoot
    import jax.numpy as jnp
    from gencomm_tpu.models.encoders.lss import LSSEncoder

    grid_conf = {"xbound": [-51.2, 51.2, 0.4], "ybound": [-51.2, 51.2, 0.4],
                 "zbound": [-10, 10, 20.0], "ddiscr": [2, 50, 48],
                 "mode": "LID"}
    final_dim = (128, 192)
    downsample = 8

    # reference: bare object (its __init__ moves buffers to cuda)
    ref = object.__new__(LiftSplatShoot)
    ref.grid_conf = grid_conf
    ref.data_aug_conf = {"final_dim": list(final_dim)}
    ref.downsample = downsample
    ref.frustum = ref.create_frustum()

    ours = LSSEncoder(
        grid_conf=grid_conf, final_dim=final_dim, downsample=downsample,
        feat_ch=8,
    ).bind({})
    np.testing.assert_allclose(np.asarray(ours._frustum()),
                               ref.frustum.numpy(), atol=1e-5)

    rng = np.random.default_rng(4)
    A, N = 2, 3
    ang = rng.uniform(-np.pi, np.pi, (A, N, 3))

    def rot(a, b, c):
        ca, sa, cb, sb, cc, sc = np.cos(a), np.sin(a), np.cos(b), \
            np.sin(b), np.cos(c), np.sin(c)
        rz = np.array([[cc, -sc, 0], [sc, cc, 0], [0, 0, 1]])
        ry = np.array([[cb, 0, sb], [0, 1, 0], [-sb, 0, cb]])
        rx = np.array([[1, 0, 0], [0, ca, -sa], [0, sa, ca]])
        return rz @ ry @ rx

    rots = np.stack([[rot(*ang[a, n]) for n in range(N)]
                     for a in range(A)]).astype(np.float32)
    trans = rng.uniform(-3, 3, (A, N, 3)).astype(np.float32)
    intrins = np.tile(np.array([[400.0, 0, 96], [0, 400.0, 64],
                                [0, 0, 1]], np.float32), (A, N, 1, 1))
    post_rots = np.tile(np.diag([0.7, 0.7, 1.0]).astype(np.float32),
                        (A, N, 1, 1))
    post_trans = np.zeros((A, N, 3), np.float32)
    post_trans[..., 0] = rng.uniform(-5, 5, (A, N))
    post_trans[..., 1] = rng.uniform(-5, 5, (A, N))

    ref_geom = ref.get_geometry(
        torch.from_numpy(rots), torch.from_numpy(trans),
        torch.from_numpy(intrins), torch.from_numpy(post_rots),
        torch.from_numpy(post_trans),
    ).numpy()
    our_geom = np.asarray(ours._geometry(
        jnp.asarray(rots), jnp.asarray(trans), jnp.asarray(intrins),
        jnp.asarray(post_rots), jnp.asarray(post_trans),
    ))
    np.testing.assert_allclose(our_geom, ref_geom, atol=2e-3, rtol=1e-4)


def test_voc_ap_parity():
    from opencood.utils import eval_utils as ref_eval
    from gencomm_tpu.utils import eval_utils as our_eval

    rng = np.random.default_rng(1)
    for global_sort in (False, True):
        n = 200
        tp = (rng.uniform(0, 1, n) > 0.4).astype(int).tolist()
        fp = [1 - t for t in tp]
        score = rng.uniform(0, 1, n).tolist()
        gt = int(sum(tp) + rng.integers(1, 30))

        ref_stat = {0.5: {"tp": list(tp), "fp": list(fp),
                          "score": list(score), "gt": gt}}
        ap_ref, _, _ = ref_eval.calculate_ap(ref_stat, 0.5, global_sort)

        our_stat = {0.5: {"tp": list(tp), "fp": list(fp),
                          "score": list(score), "gt": gt}}
        ap_ours = our_eval.calculate_ap(our_stat, 0.5, global_sort)
        assert ap_ours == pytest.approx(ap_ref, abs=1e-9), \
            f"global_sort={global_sort}"
