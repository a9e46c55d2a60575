"""Golden parity tests: our ops vs the reference's own implementations.

Imports the reference's torch/numpy functions (read-only, runtime oracle —
no code is copied) and checks numerical agreement with our JAX versions:
  - pose -> 4x4 transforms (transformation_utils.x_to_world / x1_to_x2)
  - pairwise transform stack + affine normalization
  - box corners / projection (box_utils.boxes_to_corners_3d, project_box3d)
  - inter-agent BEV warp (torch_transformation_utils.warp_affine_simple)

Skipped when /root/reference is not mounted.
"""

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
    # the reference imports icecream/shapely at module scope; provide inert
    # stand-ins (none of the functions under test touch them)
    if "icecream" not in sys.modules:
        ice = types.ModuleType("icecream")
        ice.ic = lambda *a, **k: None
        sys.modules["icecream"] = ice
    if "shapely" not in sys.modules:
        shap = types.ModuleType("shapely")
        geom = types.ModuleType("shapely.geometry")
        geom.Polygon = object
        shap.geometry = geom
        sys.modules["shapely"] = shap
        sys.modules["shapely.geometry"] = geom
    if "pyquaternion" not in sys.modules:
        pq = types.ModuleType("pyquaternion")
        pq.Quaternion = object  # only used by DAIR calib paths, not tested
        sys.modules["pyquaternion"] = pq
    sys.path.insert(0, REF)
    yield
    sys.path.remove(REF)


def rand_pose(rng):
    return [rng.uniform(-50, 50), rng.uniform(-50, 50), rng.uniform(-2, 2),
            rng.uniform(-30, 30), rng.uniform(-180, 180), rng.uniform(-10, 10)]


def test_pose_to_transform_parity():
    from opencood.utils.transformation_utils import x_to_world, x1_to_x2
    from gencomm_tpu.utils import transformation_utils as ours

    rng = np.random.default_rng(0)
    for _ in range(10):
        p1, p2 = rand_pose(rng), rand_pose(rng)
        np.testing.assert_allclose(
            ours.x_to_world(p1), x_to_world(p1), atol=1e-9)
        np.testing.assert_allclose(
            ours.x1_to_x2(p1, p2), x1_to_x2(p1, p2), atol=1e-6)


def test_pairwise_and_affine_normalization_parity():
    import torch
    from opencood.utils.transformation_utils import normalize_pairwise_tfm
    from gencomm_tpu.utils import transformation_utils as ours

    rng = np.random.default_rng(1)
    l = 4
    poses = [rand_pose(rng) for _ in range(l)]
    pair = ours.get_pairwise_transformation(poses, l, l)
    h_m, w_m, ds = 102.4, 204.8, 0.4
    ref = normalize_pairwise_tfm(
        torch.from_numpy(pair[None]).float(), int(h_m / ds), int(w_m / ds),
        ds,
    ).numpy()[0]
    # our callers pass metric H/W with discrete_ratio=1 (only the product
    # and the H/W ratio matter) — heter_baseline.py:206-210
    got = np.asarray(ours.normalize_pairwise_tfm(pair[None], h_m, w_m, 1.0))[0]
    np.testing.assert_allclose(got, ref, atol=1e-4)


def test_box_corners_and_projection_parity():
    import torch
    from opencood.utils import box_utils as ref_box
    from gencomm_tpu.utils import box_utils as ours

    rng = np.random.default_rng(2)
    boxes = np.c_[rng.uniform(-50, 50, (16, 2)), rng.uniform(-2, 1, 16),
                  rng.uniform(1, 3, 16), rng.uniform(1, 3, 16),
                  rng.uniform(2, 6, 16),
                  rng.uniform(-np.pi, np.pi, 16)].astype(np.float32)
    for order in ("hwl", "lwh"):
        ref = ref_box.boxes_to_corners_3d(
            torch.from_numpy(boxes), order=order).numpy()
        got = ours.boxes_to_corners_3d(boxes, order)
        np.testing.assert_allclose(got, ref, atol=2e-4)

    from gencomm_tpu.utils import transformation_utils as tu
    tfm = tu.x1_to_x2(rand_pose(rng), rand_pose(rng)).astype(np.float32)
    corners = ours.boxes_to_corners_3d(boxes, "hwl").astype(np.float32)
    ref_proj = ref_box.project_box3d(
        torch.from_numpy(corners), torch.from_numpy(tfm)).numpy()
    got_proj = ours.project_box3d(corners, tfm)
    np.testing.assert_allclose(got_proj, ref_proj, atol=2e-3)


def test_corner_to_center_roundtrip_parity():
    import torch
    from opencood.utils import box_utils as ref_box
    from gencomm_tpu.utils import box_utils as ours

    rng = np.random.default_rng(3)
    boxes = np.c_[rng.uniform(-30, 30, (8, 2)), rng.uniform(-2, 1, 8),
                  rng.uniform(1, 3, 8), rng.uniform(1, 3, 8),
                  rng.uniform(2, 6, 8),
                  rng.uniform(-np.pi / 2, np.pi / 2, 8)].astype(np.float32)
    corners = ours.boxes_to_corners_3d(boxes, "hwl")
    ref = ref_box.corner_to_center(np.asarray(corners), order="hwl")
    got = ours.corner_to_center(np.asarray(corners), order="hwl")
    np.testing.assert_allclose(got[:, :6], ref[:, :6], atol=1e-3)
    # yaw equal modulo pi-symmetry handling
    dyaw = np.abs(((got[:, 6] - ref[:, 6]) + np.pi / 2) % np.pi - np.pi / 2)
    assert dyaw.max() < 1e-3


def test_warp_affine_simple_parity():
    import torch
    from opencood.models.sub_modules.torch_transformation_utils import (
        warp_affine_simple,
    )
    from gencomm_tpu.ops.warp import warp_affine

    rng = np.random.default_rng(4)
    n, c, h, w = 3, 8, 32, 48
    feat = rng.normal(size=(n, c, h, w)).astype(np.float32)
    theta = np.stack([
        np.array([[np.cos(a), -np.sin(a) * h / w, tx],
                  [np.sin(a) * w / h, np.cos(a), ty]], np.float32)
        for a, tx, ty in rng.uniform(-0.3, 0.3, (n, 3))
    ])
    ref = warp_affine_simple(
        torch.from_numpy(feat), torch.from_numpy(theta), (h, w)
    ).numpy()
    got = np.asarray(warp_affine(feat, theta))  # ours is (..., C, H, W) too
    np.testing.assert_allclose(got, ref, atol=2e-4)
