"""Weight-transplant parity for the reference-exact camera trunks.

The reference's pretrained trunks come from efficientnet_pytorch and
torchvision (lss_submodule.py:53/:158) — neither library is installed here,
so the oracles are hand-built torch replicas that reproduce those libraries'
exact module structure AND state-dict key names (verified against
efficientnet_pytorch model.py MBConvBlock / torchvision resnet Bottleneck).
Random weights + random BN running stats are transplanted through
``tools/trunk_convert.py`` into our flax ``CamEncoder`` and the outputs
compared — proving a user can carry the reference's pretrained camera
checkpoints over unchanged.
"""

import math

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn
import torch.nn.functional as F

import jax
import jax.numpy as jnp

# heavy suite: excluded from the fast subset (`pytest -m "not slow"`, VERDICT r3 #9)
pytestmark = pytest.mark.slow


def tf_same_pad(x, k, s):
    """TF-style SAME padding (what efficientnet_pytorch's
    Conv2dStaticSamePadding and flax's padding="SAME" both compute)."""
    ih, iw = x.shape[-2:]
    ph = max((math.ceil(ih / s) - 1) * s + k - ih, 0)
    pw = max((math.ceil(iw / s) - 1) * s + k - iw, 0)
    return F.pad(x, [pw // 2, pw - pw // 2, ph // 2, ph - ph // 2])


class SameConv(tnn.Conv2d):
    def forward(self, x):
        return F.conv2d(tf_same_pad(x, self.kernel_size[0], self.stride[0]),
                        self.weight, self.bias, self.stride, 0, self.dilation,
                        self.groups)


def swish(x):
    return x * torch.sigmoid(x)


class TMBConv(tnn.Module):
    """efficientnet_pytorch MBConvBlock replica (same key names)."""

    def __init__(self, in_ch, out_ch, k, s, expand):
        super().__init__()
        mid = in_ch * expand
        self.has_expand = expand != 1
        if self.has_expand:
            self._expand_conv = SameConv(in_ch, mid, 1, bias=False)
            self._bn0 = tnn.BatchNorm2d(mid, eps=1e-3, momentum=0.01)
        self._depthwise_conv = SameConv(mid, mid, k, stride=s, groups=mid,
                                        bias=False)
        self._bn1 = tnn.BatchNorm2d(mid, eps=1e-3, momentum=0.01)
        sq = max(1, in_ch // 4)
        self._se_reduce = SameConv(mid, sq, 1)
        self._se_expand = SameConv(sq, mid, 1)
        self._project_conv = SameConv(mid, out_ch, 1, bias=False)
        self._bn2 = tnn.BatchNorm2d(out_ch, eps=1e-3, momentum=0.01)
        self.skip = s == 1 and in_ch == out_ch

    def forward(self, x):
        inp = x
        if self.has_expand:
            x = swish(self._bn0(self._expand_conv(x)))
        x = swish(self._bn1(self._depthwise_conv(x)))
        s = F.adaptive_avg_pool2d(x, 1)
        s = self._se_expand(swish(self._se_reduce(s)))
        x = torch.sigmoid(s) * x
        x = self._bn2(self._project_conv(x))
        if self.skip:
            x = x + inp
        return x


B0 = [(16, 3, 1, 1), (24, 3, 2, 6), (24, 3, 1, 6), (40, 5, 2, 6),
      (40, 5, 1, 6), (80, 3, 2, 6), (80, 3, 1, 6), (80, 3, 1, 6),
      (112, 5, 1, 6), (112, 5, 1, 6), (112, 5, 1, 6), (192, 5, 2, 6),
      (192, 5, 1, 6), (192, 5, 1, 6), (192, 5, 1, 6), (320, 3, 1, 6)]


class TEffTrunk(tnn.Module):
    def __init__(self):
        super().__init__()
        self._conv_stem = SameConv(3, 32, 3, stride=2, bias=False)
        self._bn0 = tnn.BatchNorm2d(32, eps=1e-3, momentum=0.01)
        blocks = []
        in_ch = 32
        for out_ch, k, s, e in B0:
            blocks.append(TMBConv(in_ch, out_ch, k, s, e))
            in_ch = out_ch
        self._blocks = tnn.ModuleList(blocks)


class TUp(tnn.Module):
    """lss_submodule.Up replica."""

    def __init__(self, in_ch, out_ch):
        super().__init__()
        self.conv = tnn.Sequential(
            tnn.Conv2d(in_ch, out_ch, 3, padding=1, bias=False),
            tnn.BatchNorm2d(out_ch), tnn.ReLU(),
            tnn.Conv2d(out_ch, out_ch, 3, padding=1, bias=False),
            tnn.BatchNorm2d(out_ch), tnn.ReLU(),
        )

    def forward(self, x1, x2):
        x1 = F.interpolate(x1, scale_factor=2, mode="bilinear",
                           align_corners=True)
        return self.conv(torch.cat([x2, x1], dim=1))


class TCamEncode(tnn.Module):
    """lss_submodule.CamEncode replica (get_eff_features + heads)."""

    def __init__(self, D, C):
        super().__init__()
        self.trunk = TEffTrunk()
        self.up1 = TUp(320 + 112, 512)
        self.up2 = TUp(512 + 40, 512)
        self.depth_head = tnn.Conv2d(512, D, 1)
        self.image_head = tnn.Conv2d(512, C, 1)

    def forward(self, x):
        x = swish(self.trunk._bn0(self.trunk._conv_stem(x)))
        ends = {}
        prev = x
        for blk in self.trunk._blocks:
            x = blk(x)
            if prev.size(2) > x.size(2):
                ends[f"reduction_{len(ends)+1}"] = prev
            prev = x
        ends[f"reduction_{len(ends)+1}"] = x
        x = self.up1(ends["reduction_5"], ends["reduction_4"])
        x = self.up2(x, ends["reduction_3"])
        return self.depth_head(x), self.image_head(x)


def _randomize_bn_stats(model, gen):
    for m in model.modules():
        if isinstance(m, tnn.BatchNorm2d):
            m.running_mean.copy_(torch.randn(
                m.running_mean.shape, generator=gen) * 0.2)
            m.running_var.copy_(torch.rand(
                m.running_var.shape, generator=gen) * 0.5 + 0.75)
            m.weight.data.copy_(torch.randn(
                m.weight.shape, generator=gen) * 0.2 + 1.0)
            m.bias.data.copy_(torch.randn(m.bias.shape, generator=gen) * 0.1)


def test_efficientnet_b0_camencode_transplant_parity():
    from gencomm_tpu.models.encoders.lss import CamEncoder
    from gencomm_tpu.tools.trunk_convert import convert_effb0_camencode

    gen = torch.Generator().manual_seed(0)
    tmod = TCamEncode(D=12, C=16).eval()
    with torch.no_grad():
        _randomize_bn_stats(tmod, gen)
        imgs = torch.randn(2, 3, 64, 96, generator=gen)
        t_depth, t_img = tmod(imgs)

    params, stats = convert_effb0_camencode(tmod.state_dict(), downsample=8)
    enc = CamEncoder(depth_bins=12, feat_ch=16, trunk="efficientnet-b0")
    x = jnp.asarray(imgs.permute(0, 2, 3, 1).numpy())
    ref_vars = enc.init(jax.random.PRNGKey(0), x)
    assert (jax.tree_util.tree_structure(ref_vars["params"])
            == jax.tree_util.tree_structure(params)), "param tree mismatch"
    depth, feats, depth_logits = enc.apply(
        {"params": params, "batch_stats": stats}, x)
    np.testing.assert_allclose(
        np.asarray(depth_logits), t_depth.permute(0, 2, 3, 1).numpy(),
        atol=2e-3, rtol=1e-3)
    np.testing.assert_allclose(
        np.asarray(feats), t_img.permute(0, 2, 3, 1).numpy(),
        atol=2e-3, rtol=1e-3)


class TBottleneck(tnn.Module):
    """torchvision resnet Bottleneck replica (same key names)."""

    def __init__(self, inplanes, width, stride=1):
        super().__init__()
        out = width * 4
        self.conv1 = tnn.Conv2d(inplanes, width, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(width)
        self.conv2 = tnn.Conv2d(width, width, 3, stride=stride, padding=1,
                                bias=False)
        self.bn2 = tnn.BatchNorm2d(width)
        self.conv3 = tnn.Conv2d(width, out, 1, bias=False)
        self.bn3 = tnn.BatchNorm2d(out)
        self.downsample = None
        if stride != 1 or inplanes != out:
            self.downsample = tnn.Sequential(
                tnn.Conv2d(inplanes, out, 1, stride=stride, bias=False),
                tnn.BatchNorm2d(out))

    def forward(self, x):
        idt = x if self.downsample is None else self.downsample(x)
        h = F.relu(self.bn1(self.conv1(x)))
        h = F.relu(self.bn2(self.conv2(h)))
        h = self.bn3(self.conv3(h))
        return F.relu(h + idt)


class TResCamEncode(tnn.Module):
    """CamEncode_Resnet101 replica: conv1..layer2 + heads
    (lss_submodule.py:155-221)."""

    def __init__(self, D, C):
        super().__init__()
        self.conv1 = tnn.Conv2d(3, 64, 7, stride=2, padding=3, bias=False)
        self.bn1 = tnn.BatchNorm2d(64)
        self.maxpool = tnn.MaxPool2d(3, stride=2, padding=1)
        self.layer1 = tnn.Sequential(
            TBottleneck(64, 64), TBottleneck(256, 64), TBottleneck(256, 64))
        self.layer2 = tnn.Sequential(
            TBottleneck(256, 128, 2), TBottleneck(512, 128),
            TBottleneck(512, 128), TBottleneck(512, 128))
        self.depth_head = tnn.Conv2d(512, D, 1)
        self.image_head = tnn.Conv2d(512, C, 1)

    def forward(self, x):
        x = self.maxpool(F.relu(self.bn1(self.conv1(x))))
        x = self.layer2(self.layer1(x))
        return self.depth_head(x), self.image_head(x)


def test_resnet101_camencode_transplant_parity():
    from gencomm_tpu.models.encoders.lss import CamEncoder
    from gencomm_tpu.tools.trunk_convert import convert_resnet101_camencode

    gen = torch.Generator().manual_seed(1)
    tmod = TResCamEncode(D=12, C=16).eval()
    with torch.no_grad():
        _randomize_bn_stats(tmod, gen)
        imgs = torch.randn(2, 3, 64, 96, generator=gen)
        t_depth, t_img = tmod(imgs)

    params, stats = convert_resnet101_camencode(tmod.state_dict())
    enc = CamEncoder(depth_bins=12, feat_ch=16, trunk="resnet101")
    x = jnp.asarray(imgs.permute(0, 2, 3, 1).numpy())
    ref_vars = enc.init(jax.random.PRNGKey(0), x)
    assert (jax.tree_util.tree_structure(ref_vars["params"])
            == jax.tree_util.tree_structure(params)), "param tree mismatch"
    depth, feats, depth_logits = enc.apply(
        {"params": params, "batch_stats": stats}, x)
    np.testing.assert_allclose(
        np.asarray(depth_logits), t_depth.permute(0, 2, 3, 1).numpy(),
        atol=2e-3, rtol=1e-3)
    np.testing.assert_allclose(
        np.asarray(feats), t_img.permute(0, 2, 3, 1).numpy(),
        atol=2e-3, rtol=1e-3)


def test_lss_encoder_runs_with_exact_trunks():
    """Full LSSEncoder forward with each exact trunk (shape/jit sanity)."""
    from gencomm_tpu.models.encoders.lss import LSSEncoder

    grid_conf = {
        "xbound": [-8.0, 8.0, 0.8], "ybound": [-8.0, 8.0, 0.8],
        "zbound": [-3.0, 1.0, 4.0], "ddiscr": [2.0, 10.0, 8],
        "mode": "LID",
    }
    rng = np.random.RandomState(0)
    b, l, n, h, w = 1, 2, 1, 64, 96
    eye = np.broadcast_to(np.eye(3, dtype=np.float32), (b, l, n, 3, 3)).copy()
    intrins = eye * np.float32(50.0)
    intrins[..., 2, 2] = 1.0
    intrins[..., 0, 2] = w / 2.0
    intrins[..., 1, 2] = h / 2.0
    inputs = {
        "imgs": jnp.asarray(rng.rand(b, l, n, h, w, 3), jnp.float32),
        "rots": jnp.asarray(eye), "trans": jnp.zeros((b, l, n, 3)),
        "intrins": jnp.asarray(intrins), "post_rots": jnp.asarray(eye),
        "post_trans": jnp.zeros((b, l, n, 3)),
    }
    for trunk in ("efficientnet-b0", "resnet101"):
        enc = LSSEncoder(grid_conf=grid_conf, final_dim=(h, w),
                         downsample=8, feat_ch=16, trunk=trunk)
        variables = enc.init(jax.random.PRNGKey(0), inputs)
        out, _ = enc.apply(variables, inputs)
        assert out.shape == (b, l, 20, 20, 16)
