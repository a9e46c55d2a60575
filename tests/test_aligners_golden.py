"""Golden parity: the sdta / cbam / fanet aligner variants vs the
reference's own torch modules (weight transplant, eval mode).

Reference: opencood/models/sub_modules/feature_alignnet_modules.py
(SDTAAgliner :435-448, FANet :244-275) and sub_modules/cbam.py
(BasicBlock :62-99), dispatched by feature_alignnet.AlignNet :14-36.
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
    if "icecream" not in sys.modules:
        ice = types.ModuleType("icecream")
        ice.ic = lambda *a, **k: None
        sys.modules["icecream"] = ice
    if "timm" not in sys.modules:
        import torch.nn as _tnn

        timm = types.ModuleType("timm")
        tm = types.ModuleType("timm.models")
        tl = types.ModuleType("timm.models.layers")
        tl.DropPath = _tnn.Identity  # drop_path=0 -> Identity in reference
        tl.to_2tuple = lambda v: v if isinstance(v, (tuple, list)) else (v, v)
        tl.trunc_normal_ = lambda t, *a, **k: t
        timm.models = tm
        tm.layers = tl
        sys.modules["timm"] = timm
        sys.modules["timm.models"] = tm
        sys.modules["timm.models.layers"] = tl
    sys.path.insert(0, REF)
    yield
    sys.path.remove(REF)


def _conv(w):
    return np.transpose(w, (2, 3, 1, 0))


def _t2n(p):
    return p.detach().numpy()


def _lin(m):
    return {"kernel": _t2n(m.weight).T, "bias": _t2n(m.bias)}


def _conv_p(m, bias=True):
    p = {"kernel": _conv(_t2n(m.weight))}
    if bias:
        p["bias"] = _t2n(m.bias)
    return p


def _ln(m):
    return {"scale": _t2n(m.weight), "bias": _t2n(m.bias)}


def _bn(m):
    return ({"scale": _t2n(m.weight), "bias": _t2n(m.bias)},
            {"mean": _t2n(m.running_mean), "var": _t2n(m.running_var)})


def _conv_encoder_params(t):
    return {
        "dwconv": _conv_p(t.dwconv),
        "norm": _ln(t.norm),
        "pwconv1": _lin(t.pwconv1),
        "pwconv2": _lin(t.pwconv2),
        "gamma": _t2n(t.gamma),
    }


def _sdta_encoder_params(t):
    return {
        "conv0": _conv_p(t.convs[0]),
        "conv1": _conv_p(t.convs[2]),
        "norm_xca": _ln(t.norm_xca),
        "gamma_xca": _t2n(t.gamma_xca),
        "xca": {
            "qkv": _lin(t.xca.qkv),
            "proj": _lin(t.xca.proj),
            "temperature": _t2n(t.xca.temperature),
        },
        "norm": _ln(t.norm),
        "pwconv1": _lin(t.pwconv1),
        "pwconv2": _lin(t.pwconv2),
        "gamma": _t2n(t.gamma),
    }


def test_sdta_aligner_parity():
    import torch
    from opencood.models.sub_modules.feature_alignnet import AlignNet as TNet

    from gencomm_tpu.models.aligners import AlignNet

    torch.manual_seed(0)
    dim, n = 32, 2
    tnet = TNet({"core_method": "sdta",
                 "args": {"dim": dim, "num_of_blocks": n}}).eval()
    params = {}
    for i in range(n):
        params[f"conv_enc{i}"] = _conv_encoder_params(
            tnet.channel_align.model[2 * i])
        params[f"sdta_enc{i}"] = _sdta_encoder_params(
            tnet.channel_align.model[2 * i + 1])

    rng = np.random.default_rng(1)
    x = rng.normal(size=(2, 16, 24, dim)).astype(np.float32)
    with torch.no_grad():
        ref = tnet(torch.from_numpy(np.transpose(x, (0, 3, 1, 2))))
    ref = np.transpose(ref.numpy(), (0, 2, 3, 1))

    net = AlignNet(core_method="sdta", args={"dim": dim, "num_of_blocks": n})
    out = net.apply({"params": params}, x)
    np.testing.assert_allclose(out, ref, atol=2e-5)


def test_cbam_aligner_parity():
    import torch
    from opencood.models.sub_modules.feature_alignnet import AlignNet as TNet

    from gencomm_tpu.models.aligners import AlignNet

    torch.manual_seed(1)
    dim, n = 64, 2
    tnet = TNet({"core_method": "cbam",
                 "args": {"dim": dim, "num_of_blocks": n}}).eval()
    params, stats = {}, {}
    for i in range(n):
        blk = tnet.channel_align.model[i]
        bn1_p, bn1_s = _bn(blk.bn1)
        bn2_p, bn2_s = _bn(blk.bn2)
        params[f"block{i}"] = {
            "conv1": _conv_p(blk.conv1, bias=False),
            "conv2": _conv_p(blk.conv2, bias=False),
            "bn1": bn1_p, "bn2": bn2_p,
            "ca_fc1": _conv_p(blk.ca.fc[0], bias=False),
            "ca_fc2": _conv_p(blk.ca.fc[2], bias=False),
            "sa_conv": _conv_p(blk.sa.conv1, bias=False),
        }
        stats[f"block{i}"] = {"bn1": bn1_s, "bn2": bn2_s}

    rng = np.random.default_rng(2)
    x = rng.normal(size=(2, 16, 16, dim)).astype(np.float32)
    with torch.no_grad():
        ref = tnet(torch.from_numpy(np.transpose(x, (0, 3, 1, 2))))
    ref = np.transpose(ref.numpy(), (0, 2, 3, 1))

    net = AlignNet(core_method="cbam", args={"dim": dim, "num_of_blocks": n})
    out = net.apply({"params": params, "batch_stats": stats}, x)
    np.testing.assert_allclose(out, ref, atol=2e-5)


def test_fanet_aligner_parity():
    import torch
    from opencood.models.sub_modules.feature_alignnet import AlignNet as TNet

    from gencomm_tpu.models.aligners import AlignNet

    torch.manual_seed(2)
    dim = 16
    tnet = TNet({"core_method": "fanet", "args": {"dim": dim}}).eval()

    def falayer(t):
        return {
            "arblock": {
                "c1": _conv_p(t.arblock.model[0]),
                "c2": _conv_p(t.arblock.model[2]),
                "c3": _conv_p(t.arblock.model[4]),
            },
            "conv1": _conv_p(t.conv1),
            "conv2": _conv_p(t.conv2),
            "conv3": _conv_p(t.conv3),
        }

    fa = tnet.channel_align
    params = {"fanet": {
        "falayer1": falayer(fa.falayer1),
        "falayer2": falayer(fa.falayer2),
        "falayer3": falayer(fa.falayer3),
        "falayer4": falayer(fa.falayer4),
        "falayer5": falayer(fa.falayer5),
        "skip_conv1": _conv_p(fa.skip_conv1),
        "skip_conv2": _conv_p(fa.skip_conv2),
    }}

    rng = np.random.default_rng(3)
    x = rng.normal(size=(2, 16, 24, dim)).astype(np.float32)
    with torch.no_grad():
        ref = tnet(torch.from_numpy(np.transpose(x, (0, 3, 1, 2))))
    ref = np.transpose(ref.numpy(), (0, 2, 3, 1))

    net = AlignNet(core_method="fanet", args={"dim": dim})
    out = net.apply({"params": params}, x)
    np.testing.assert_allclose(out, ref, atol=2e-4)
