"""Golden parity tests, round 8: heter_model_baseline_ms fusion stage.

Weight-transplant parity of the multiscale Max/Att fusion stack
(opencood/models/heter_model_baseline_ms.py:196-210): the reference's
ResNetBEVBackbone (BasicBlock layers, base_bev_backbone_resnet.py) runs
``get_layer_i_feature`` for levels 1.. on the per-agent features, each
level is fused by fusion_in_one.AttFusion / MaxFusion, and the fused maps
go through ``decode_multiscale_feature``. Level 0 is the raw input (the
fusion backbone's layer 0 is constructed but never run). Ours:
models/fuse/pyramid.MsFusion in one masked dense pass.
"""

import os
import sys

import numpy as np
import pytest

REF = "/root/reference"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REF, "opencood")),
    reason="reference checkout not mounted",
)


@pytest.fixture(scope="module", autouse=True)
def ref_path():
    import types

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
    sys.path.insert(0, REF)
    yield
    sys.path.remove(REF)


@pytest.mark.parametrize("fusion_method", ["att", "max"])
def test_ms_fusion_stage_parity(fusion_method):
    import torch
    import jax
    import jax.numpy as jnp
    from opencood.models.sub_modules.base_bev_backbone_resnet import (
        ResNetBEVBackbone as RefRN,
    )
    from opencood.models.fuse_modules.fusion_in_one import (
        AttFusion as RefAtt, MaxFusion as RefMax,
    )

    from tests.test_reference_golden3 import (
        _conv, _deconv, _t2n, _randomize_bn_stats,
    )
    from gencomm_tpu.models.fuse.pyramid import MsFusion

    cfg = {
        "layer_nums": [1, 2, 1],
        "layer_strides": [1, 2, 2],
        "num_filters": [16, 24, 32],
        "upsample_strides": [1, 2, 4],
        "num_upsample_filter": [16, 16, 16],
    }
    rng = np.random.default_rng(81)
    b, l, c0, h, w = 2, 3, 16, 16, 24
    record_len = np.array([3, 2])
    feats = rng.normal(size=(b, l, c0, h, w)).astype(np.float32)
    feats[1, 2] = 0.0
    ident = np.array([[1, 0, 0], [0, 1, 0]], np.float32)
    affine = np.tile(ident, (b, l, l, 1, 1))

    torch.manual_seed(1)
    ref = RefRN(cfg, input_channels=c0).eval()
    with torch.no_grad():
        for m in ref.modules():
            if isinstance(m, (torch.nn.Conv2d, torch.nn.ConvTranspose2d)):
                m.weight.normal_(0, 0.1)
                if m.bias is not None:
                    m.bias.normal_(0, 0.1)
    _randomize_bn_stats(ref, rng)

    concat = np.concatenate(
        [feats[bb, : record_len[bb]] for bb in range(b)], axis=0
    )
    rl = torch.from_numpy(record_len)
    aff = torch.from_numpy(affine)
    with torch.no_grad():
        # reference ms forward: level 0 = input; levels 1.. via layer_i on
        # the per-agent features; per-level fusion; decode
        level_feats = [torch.from_numpy(concat)]
        x = level_feats[0]
        for i in range(1, 3):
            x = ref.get_layer_i_feature(x, layer_i=i)
            level_feats.append(x)
        fused = []
        for i, f in enumerate(level_feats):
            fm = (RefAtt(f.shape[1]) if fusion_method == "att"
                  else RefMax())
            fused.append(fm(f, rl, aff))
        ref_out = ref.decode_multiscale_feature(fused).numpy()

    ours = MsFusion(
        layer_nums=(1, 2, 1), layer_strides=(1, 2, 2),
        num_filters=(16, 24, 32), upsample_strides=(1, 2, 4),
        num_upsample_filters=(16, 16, 16), fusion_method=fusion_method,
        att_feat_dims=(16, 24, 32),
    )
    xn = jnp.asarray(np.transpose(feats, (0, 1, 3, 4, 2)))
    mask = jnp.asarray(np.arange(l)[None] < record_len[:, None])
    variables = ours.init(jax.random.PRNGKey(0), xn, jnp.asarray(affine),
                          mask)
    p = variables["params"]
    s = variables["batch_stats"]

    def put_bn(dst_p, dst_s, bn):
        dst_p["scale"] = jnp.asarray(_t2n(bn.weight))
        dst_p["bias"] = jnp.asarray(_t2n(bn.bias))
        dst_s["mean"] = jnp.asarray(_t2n(bn.running_mean))
        dst_s["var"] = jnp.asarray(_t2n(bn.running_var))

    for i in (1, 2):
        for k, blk in enumerate(getattr(ref.resnet, f"layer{i}")):
            name = f"layer{i}_{k}"
            p[name]["Conv_0"]["kernel"] = jnp.asarray(
                _conv(_t2n(blk.conv1.weight))
            )
            put_bn(p[name]["BatchNorm_0"], s[name]["BatchNorm_0"], blk.bn1)
            p[name]["Conv_1"]["kernel"] = jnp.asarray(
                _conv(_t2n(blk.conv2.weight))
            )
            put_bn(p[name]["BatchNorm_1"], s[name]["BatchNorm_1"], blk.bn2)
            if blk.downsample is not None:
                p[name]["downsample"]["kernel"] = jnp.asarray(
                    _conv(_t2n(blk.downsample[0].weight))
                )
                put_bn(p[name]["BatchNorm_2"], s[name]["BatchNorm_2"],
                       blk.downsample[1])
    for i in range(3):
        de = ref.deblocks[i]
        p[f"deblock{i}"]["ConvTranspose_0"]["kernel"] = jnp.asarray(
            _deconv(_t2n(de[0].weight))
        )
        put_bn(p[f"deblock{i}"]["BatchNorm_0"],
               s[f"deblock{i}"]["BatchNorm_0"], de[1])

    got = ours.apply(
        {"params": p, "batch_stats": s}, xn, jnp.asarray(affine), mask
    )
    got = np.transpose(np.asarray(got), (0, 3, 1, 2))
    np.testing.assert_allclose(got, ref_out, rtol=2e-3, atol=2e-3)
