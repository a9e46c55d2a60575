"""Golden parity tests, round 7: remaining LOSS-function parity against the
reference's own torch classes (read-only import from /root/reference):

  VoxelNetLoss               (loss/voxel_net_loss.py:12-62)
  AdapterLoss                (loss/adapter_loss.py:14-50, STAMP)
  PointPillarDiscoNetLoss KD (loss/point_pillar_disconet_loss.py:16-53)
  ContrastiveLearningLoss    (loss/contrastive_learning_loss.py:9-100)

Known intentional divergences (documented, NOT tested for parity):
  - PixorLoss / CenterPointLoss build their targets in-loss from gt boxes
    (the reference consumes pre-rasterized label maps / CPU-side numpy
    target assignment) — semantics redesigned, covered by their own tests.
  - ContrastiveLearningLoss parity holds at batch=1 with all regions
    non-empty and max_voxel >= region size; the reference pools negatives
    across the whole flattened batch and randomly subsamples above
    max_voxel, ours stays within-sample and always averages all pixels.
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
    stubs = {
        "icecream": {"ic": lambda *a, **k: None},
        "wandb": {"log": lambda *a, **k: None},
        "swanlab": {"log": lambda *a, **k: None},
        "shapely": {},
        "shapely.geometry": {"Polygon": object, "Point": object,
                             "MultiPoint": object},
        "pyquaternion": {"Quaternion": object},
        "opencood.utils.box_overlaps": {"bbox_overlaps": None},
        "opencood.visualization.vis_utils": {},
        "opencood.visualization.vis_bevfeat": {
            "vis_bev": lambda *a, **k: None},
    }
    for name, attrs in stubs.items():
        if name not in sys.modules:
            mod = types.ModuleType(name)
            for k, v in attrs.items():
                setattr(mod, k, v)
            sys.modules[name] = mod
    sys.path.insert(0, REF)
    yield
    sys.path.remove(REF)


def _nhwc(x):
    return np.transpose(x, (0, 2, 3, 1))


def test_voxel_net_loss_parity():
    """voxel_net_loss.py:20-62: pos/neg log-BCE terms normalized by their
    own counts, alpha/beta weighted, + smooth-L1(sum)/pos_count reg scaled
    by reg coefficient."""
    import torch
    import jax.numpy as jnp
    from opencood.loss.voxel_net_loss import VoxelNetLoss as RefLoss
    from gencomm_tpu.loss.legacy_losses import VoxelNetLoss as OurLoss

    rng = np.random.default_rng(71)
    b, h, w, a = 2, 10, 16, 2
    pos = (rng.uniform(size=(b, h, w, a)) < 0.05).astype(np.float32)
    neg = ((rng.uniform(size=(b, h, w, a)) < 0.9) * (1 - pos)).astype(
        np.float32
    )
    targets = rng.normal(size=(b, h, w, a * 7)).astype(np.float32)
    psm = rng.normal(size=(b, a, h, w)).astype(np.float32)
    rm = rng.normal(size=(b, a * 7, h, w)).astype(np.float32)

    args = {"alpha": 1.5, "beta": 1.0, "reg": 2.0}
    ref = RefLoss(args)
    with torch.no_grad():
        ref_total = ref(
            {"psm": torch.from_numpy(psm), "rm": torch.from_numpy(rm)},
            {"pos_equal_one": torch.from_numpy(pos),
             "neg_equal_one": torch.from_numpy(neg),
             "targets": torch.from_numpy(targets)},
        )
    ours = OurLoss(args)
    losses = ours(
        {"psm": jnp.asarray(_nhwc(psm)), "rm": jnp.asarray(_nhwc(rm))},
        {"pos_equal_one": jnp.asarray(pos), "neg_equal_one": jnp.asarray(neg),
         "targets": jnp.asarray(targets)},
    )
    np.testing.assert_allclose(
        float(losses["total_loss"]), float(ref_total), rtol=1e-4
    )
    np.testing.assert_allclose(
        float(losses["cls_loss"]), float(ref.loss_dict["conf_loss"]),
        rtol=1e-4,
    )
    # ours folds the reg coefficient into reg_loss; the reference reports
    # it unscaled and scales inside total
    np.testing.assert_allclose(
        float(losses["reg_loss"]),
        float(ref.loss_dict["reg_loss"]) * args["reg"], rtol=1e-4,
    )


def test_adapter_loss_parity():
    """adapter_loss.py:14-50: three alpha-weighted MSE cycle terms."""
    import torch
    import jax.numpy as jnp
    from opencood.loss.adapter_loss import AdapterLoss as RefLoss
    from gencomm_tpu.loss.point_pillar_loss import AdapterLoss as OurLoss

    rng = np.random.default_rng(72)
    shape = (2, 8, 12, 16)
    fm, fp2m, fm2p2m, fp, fm2p = (
        rng.normal(size=shape).astype(np.float32) for _ in range(5)
    )
    args = {"alpha_P2M": 0.5, "alpha_M2P2M": 2.0, "alpha_M2P": 1.5}
    ref = RefLoss(args)
    with torch.no_grad():
        ref_total = ref(*(torch.from_numpy(t)
                          for t in (fm, fp2m, fm2p2m, fp, fm2p)))
    ours = OurLoss(args)
    losses = ours(
        {"stamp_FP": jnp.asarray(fp),
         "stamp_FM_m2": jnp.asarray(fm),
         "stamp_P2M_m2": jnp.asarray(fp2m),
         "stamp_M2P2M_m2": jnp.asarray(fm2p2m),
         "stamp_M2P_m2": jnp.asarray(fm2p)},
        {},
    )
    np.testing.assert_allclose(
        float(losses["total_loss"]), float(ref_total), rtol=1e-5
    )
    np.testing.assert_allclose(
        float(losses["P2M_m2"]), float(ref.loss_dict["P2M"]), rtol=1e-5
    )
    np.testing.assert_allclose(
        float(losses["M2P_m2"]), float(ref.loss_dict["M2P"]), rtol=1e-5
    )


def test_disconet_kd_loss_parity():
    """point_pillar_disconet_loss.py:16-53: detection loss + channel-softmax
    KL, where KLDivLoss(size_average=True) is torch's ELEMENTWISE mean
    (divides by N*H*W*C) — the exact normalization our loss mirrors."""
    import torch
    import jax.numpy as jnp
    from opencood.loss.point_pillar_disconet_loss import (
        PointPillarDiscoNetLoss as RefLoss,
    )
    from gencomm_tpu.loss.point_pillar_loss import (
        PointPillarDiscoNetLoss as OurLoss,
    )

    rng = np.random.default_rng(73)
    b, h, w, a = 2, 12, 20, 2
    pos = (rng.uniform(size=(b, h, w, a)) < 0.03).astype(np.float32)
    neg = ((rng.uniform(size=(b, h, w, a)) < 0.9) * (1 - pos)).astype(
        np.float32
    )
    targets = rng.normal(size=(b, h, w, a * 7)).astype(np.float32) * 0.5
    cls_p = rng.normal(size=(b, a, h, w)).astype(np.float32)
    reg_p = rng.normal(size=(b, a * 7, h, w)).astype(np.float32) * 0.5
    dir_p = rng.normal(size=(b, a * 2, h, w)).astype(np.float32)
    feat_s = rng.normal(size=(b, 16, h, w)).astype(np.float32)
    feat_t = rng.normal(size=(b, 16, h, w)).astype(np.float32)

    args = {
        "pos_cls_weight": 2.0,
        "cls": {"alpha": 0.25, "gamma": 2.0, "weight": 1.0,
                "type": "SigmoidFocalLoss"},
        "reg": {"sigma": 3.0, "codewise": True, "weight": 2.0,
                "type": "WeightedSmoothL1Loss"},
        "dir": {"weight": 0.2, "args": {"dir_offset": 0.7853, "num_bins": 2,
                                        "anchor_yaw": [0, 90]}},
        "kd": {"weight": 0.7},
    }
    ref = RefLoss(args)
    with torch.no_grad():
        ref_total = ref(
            {"cls_preds": torch.from_numpy(cls_p),
             "reg_preds": torch.from_numpy(reg_p),
             "dir_preds": torch.from_numpy(dir_p),
             "feature": torch.from_numpy(feat_s),
             "teacher_feature": torch.from_numpy(feat_t),
             "teacher_reg_preds": torch.from_numpy(reg_p),
             "teacher_cls_preds": torch.from_numpy(cls_p)},
            {"pos_equal_one": torch.from_numpy(pos),
             "neg_equal_one": torch.from_numpy(neg),
             "targets": torch.from_numpy(targets)},
        )
    ours = OurLoss(args)
    losses = ours(
        {"cls_preds": jnp.asarray(_nhwc(cls_p)),
         "reg_preds": jnp.asarray(_nhwc(reg_p)),
         "dir_preds": jnp.asarray(_nhwc(dir_p)),
         "student_feature": jnp.asarray(_nhwc(feat_s)),
         "teacher_feature": jnp.asarray(_nhwc(feat_t))},
        {"pos_equal_one": jnp.asarray(pos), "neg_equal_one": jnp.asarray(neg),
         "targets": jnp.asarray(targets)},
    )
    np.testing.assert_allclose(
        float(losses["kd_loss"]), float(ref.loss_dict["kd_loss"]), rtol=1e-4
    )
    np.testing.assert_allclose(
        float(losses["total_loss"]), float(ref_total), rtol=1e-4
    )


def test_contrastive_loss_parity():
    """contrastive_learning_loss.py:9-100 at batch=1, all regions
    non-empty, max_voxel >= region pixels (no random subsampling): global
    InfoNCE over region-pooled L2-normalized embeddings."""
    import torch
    import jax.numpy as jnp
    from opencood.loss.contrastive_learning_loss import (
        ContrastiveLearningLoss as RefLoss,
    )
    from gencomm_tpu.loss.legacy_losses import (
        ContrastiveLearningLoss as OurLoss,
    )

    rng = np.random.default_rng(74)
    b, c, h, w, r = 1, 8, 10, 14, 4
    q = rng.normal(size=(b, c, h, w)).astype(np.float32)
    k = rng.normal(size=(b, c, h, w)).astype(np.float32)
    # non-overlapping non-empty rectangular regions
    masks = np.zeros((b, r, h, w), bool)
    for i in range(r):
        masks[0, i, 2 * i: 2 * i + 2, 3 * i: 3 * i + 3] = True

    ref = RefLoss({"tau": 0.1, "max_voxel": 10_000})
    with torch.no_grad():
        ref_total = ref(
            {"features_q": torch.from_numpy(q),
             "features_k": torch.from_numpy(k)},
            {"pos_region_ranges": torch.from_numpy(masks)},
        )
    ours = OurLoss({"tau": 0.1})
    losses = ours(
        {"features_q": jnp.asarray(_nhwc(q)),
         "features_k": jnp.asarray(_nhwc(k))},
        {"pos_region_ranges": jnp.asarray(masks)},
    )
    np.testing.assert_allclose(
        float(losses["total_loss"]), float(ref_total), rtol=1e-4
    )
