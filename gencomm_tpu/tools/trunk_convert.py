"""Torch -> flax weight conversion for the reference-exact camera trunks.

The reference's camera encoders carry torch-pretrained trunks
(lss_submodule.py:53 ``EfficientNet.from_pretrained("efficientnet-b0")``,
:158 torchvision ``resnet101``). Users migrating reference checkpoints (or
raw pretrained trunks) convert their state dicts here into params for
``camera_trunks.EfficientNetB0Features`` / ``ResNet101L2Features`` plus the
depth/image heads.

Conventions (established + verified in tests/test_reference_golden3.py):
  torch Conv2d  (out,in,kh,kw) -> flax kernel (kh,kw,in,out)
  torch depthwise Conv2d (ch,1,k,k) -> flax kernel (k,k,1,ch)
  torch BN weight/bias/running_mean/running_var ->
      params {scale,bias} + batch_stats {mean,var}

Usage (CLI): python -m gencomm_tpu.tools.trunk_convert \
    --torch_ckpt net_epoch_bestval_at23.pth --key_prefix encoder_m2.camencode. \
    --trunk efficientnet-b0 --out trunk_m2.msgpack
The output msgpack holds {"params": ..., "batch_stats": ...} pytrees keyed
exactly as the flax CamEncoder expects; graft them into a model checkpoint
with train/checkpoint.py merge utilities.
"""

from __future__ import annotations

import argparse
from typing import Dict, Mapping, Tuple

import numpy as np

from gencomm_tpu.models.encoders.camera_trunks import _B0_BLOCKS


def _conv(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (2, 3, 1, 0))


def _np(t):
    if hasattr(t, "detach"):
        t = t.detach().cpu().numpy()
    return np.asarray(t, np.float32)


def _bn(sd: Mapping[str, np.ndarray], tname: str,
        params: Dict, stats: Dict, fname: str) -> None:
    params[fname] = {
        "scale": _np(sd[tname + ".weight"]),
        "bias": _np(sd[tname + ".bias"]),
    }
    stats[fname] = {
        "mean": _np(sd[tname + ".running_mean"]),
        "var": _np(sd[tname + ".running_var"]),
    }


def _conv_entry(sd: Mapping[str, np.ndarray], tname: str) -> Dict:
    w = _np(sd[tname + ".weight"])
    out = {"kernel": _conv(w)}
    if tname + ".bias" in sd:
        out["bias"] = _np(sd[tname + ".bias"])
    return out


def convert_effb0_camencode(
    sd: Mapping[str, np.ndarray], prefix: str = "", downsample: int = 8,
) -> Tuple[Dict, Dict]:
    """Reference CamEncode state dict -> (params, batch_stats) for
    ``CamEncoder(trunk="efficientnet-b0")``. ``prefix`` strips a model-path
    prefix (e.g. "encoder_m2.camencode."). Handles the trunk (efficientnet
    ``trunk._*`` keys), up1/up2, and the depth/image heads."""
    sd = {k[len(prefix):]: v for k, v in sd.items() if k.startswith(prefix)}
    tp: Dict = {}
    ts: Dict = {}
    tp["conv_stem"] = _conv_entry(sd, "trunk._conv_stem")
    _bn(sd, "trunk._bn0", tp, ts, "bn0")
    for i in range(len(_B0_BLOCKS)):
        b = f"trunk._blocks.{i}"
        bp: Dict = {}
        bs: Dict = {}
        if f"{b}._expand_conv.weight" in sd:
            bp["expand_conv"] = _conv_entry(sd, f"{b}._expand_conv")
            _bn(sd, f"{b}._bn0", bp, bs, "bn0")
        bp["depthwise_conv"] = _conv_entry(sd, f"{b}._depthwise_conv")
        _bn(sd, f"{b}._bn1", bp, bs, "bn1")
        bp["se_reduce"] = _conv_entry(sd, f"{b}._se_reduce")
        bp["se_expand"] = _conv_entry(sd, f"{b}._se_expand")
        bp["project_conv"] = _conv_entry(sd, f"{b}._project_conv")
        _bn(sd, f"{b}._bn2", bp, bs, "bn2")
        tp[f"block{i}"] = bp
        ts[f"block{i}"] = bs
    ups = ["up1"] + (["up2"] if downsample == 8 else [])
    for u in ups:
        up_p: Dict = {}
        up_s: Dict = {}
        # reference Up.conv = Sequential(conv, bn, relu, conv, bn, relu)
        up_p["conv0"] = _conv_entry(sd, f"{u}.conv.0")
        _bn(sd, f"{u}.conv.1", up_p, up_s, "bn0")
        up_p["conv1"] = _conv_entry(sd, f"{u}.conv.3")
        _bn(sd, f"{u}.conv.4", up_p, up_s, "bn1")
        tp[u] = up_p
        ts[u] = up_s
    params: Dict = {"trunk": tp}
    stats: Dict = {"trunk": ts}
    for head in ("depth_head", "image_head"):
        if f"{head}.weight" in sd:
            params[head] = _conv_entry(sd, head)
    return params, stats


def convert_resnet101_camencode(
    sd: Mapping[str, np.ndarray], prefix: str = "",
) -> Tuple[Dict, Dict]:
    """Reference CamEncode_Resnet101 state dict -> (params, batch_stats) for
    ``CamEncoder(trunk="resnet101")``. Also accepts a raw torchvision
    resnet101 state dict (same key names minus the heads)."""
    sd = {k[len(prefix):]: v for k, v in sd.items() if k.startswith(prefix)}
    tp: Dict = {}
    ts: Dict = {}
    tp["conv1"] = _conv_entry(sd, "conv1")
    _bn(sd, "bn1", tp, ts, "bn1")
    for layer, blocks in (("layer1", 3), ("layer2", 4)):
        for i in range(blocks):
            b = f"{layer}.{i}"
            bp: Dict = {}
            bs: Dict = {}
            for j in (1, 2, 3):
                bp[f"conv{j}"] = _conv_entry(sd, f"{b}.conv{j}")
                _bn(sd, f"{b}.bn{j}", bp, bs, f"bn{j}")
            if f"{b}.downsample.0.weight" in sd:
                bp["down_conv"] = _conv_entry(sd, f"{b}.downsample.0")
                _bn(sd, f"{b}.downsample.1", bp, bs, "down_bn")
            tp[f"{layer}_{i}"] = bp
            ts[f"{layer}_{i}"] = bs
    params: Dict = {"trunk": tp}
    stats: Dict = {"trunk": ts}
    for head in ("depth_head", "image_head"):
        if f"{head}.weight" in sd:
            params[head] = _conv_entry(sd, head)
    return params, stats


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--torch_ckpt", required=True)
    ap.add_argument("--key_prefix", default="")
    ap.add_argument("--trunk", choices=["efficientnet-b0", "resnet101"],
                    required=True)
    ap.add_argument("--img_downsample", type=int, default=8)
    ap.add_argument("--out", required=True)
    args = ap.parse_args(argv)

    import torch
    from flax.serialization import msgpack_serialize

    sd = torch.load(args.torch_ckpt, map_location="cpu")
    if isinstance(sd, dict) and "model" in sd:
        sd = sd["model"]
    if args.trunk == "efficientnet-b0":
        params, stats = convert_effb0_camencode(
            sd, args.key_prefix, args.img_downsample)
    else:
        params, stats = convert_resnet101_camencode(sd, args.key_prefix)
    with open(args.out, "wb") as f:
        f.write(msgpack_serialize({"params": params, "batch_stats": stats}))
    n = sum(np.asarray(x).size for x in
            __import__("jax").tree_util.tree_leaves(params))
    print(f"wrote {args.out}: {n/1e6:.2f}M params ({args.trunk})")


if __name__ == "__main__":
    main()
