"""STAMP AdapterDSA: deformable spatial attention parity + e2e.

The golden oracle is the reference's own sampling kernel
(opencood/models/sub_modules/deformable_attention.py:154-205,
deformable_attn_pytorch) driven by torch Linears carrying OUR weights —
the same transplant strategy as test_camera_trunks. The reference's
AdapterDSA module itself cannot be imported here (its module imports the
``positional_encodings`` package, absent from this environment), so the
layer math is verified against the reference kernel and the adapter
wiring (PEs, query conv, layer loop: adapter.py:581-677) structurally.
"""

import os
import sys

import numpy as np
import pytest
import jax
import jax.numpy as jnp

REF = "/root/reference"


@pytest.fixture(scope="module")
def ref_deform_attn():
    sys.path.insert(0, REF)
    try:
        from opencood.models.sub_modules.deformable_attention import (
            deformable_attn_pytorch,
        )
    finally:
        sys.path.remove(REF)
    return deformable_attn_pytorch


def test_sinusoidal_pe_2d_structure():
    from gencomm_tpu.models.stamp import sinusoidal_pe_2d

    pe = np.asarray(sinusoidal_pe_2d(6, 10, 32))
    assert pe.shape == (6, 10, 32)
    chq = 16  # ceil(32/4)*2
    # first half encodes H only (constant along W), second half W only
    assert np.allclose(pe[:, 0, :chq], pe[:, 5, :chq])
    assert np.allclose(pe[0, :, chq:], pe[3, :, chq:])
    assert not np.allclose(pe[0, 0, :chq], pe[3, 0, :chq])
    # interleaved sin/cos: position 0 gives sin=0, cos=1
    assert pe[0, 0, 0] == 0.0 and pe[0, 0, 1] == 1.0
    assert np.abs(pe).max() <= 1.0 + 1e-6


def test_dsa_offset_bias_matches_reference_formula():
    from gencomm_tpu.models.stamp import _dsa_offset_bias_init

    import torch

    heads, pts = 8, 4
    init = _dsa_offset_bias_init(heads, pts)
    ours = np.asarray(init(None, (heads * pts * 2,)))
    # reference formula (adapter.py:349-362)
    thetas = torch.arange(heads, dtype=torch.float32) * (
        2.0 * np.pi / heads
    )
    grid = torch.stack([thetas.cos(), thetas.sin()], -1)
    grid = (grid / grid.abs().max(-1, keepdim=True)[0]).view(
        heads, 1, 1, 2
    ).repeat(1, 1, pts, 1)
    for i in range(pts):
        grid[:, :, i, :] *= i + 1
    np.testing.assert_allclose(ours, grid.view(-1).numpy(), atol=1e-6)


def test_dsa_layer_matches_reference_kernel(ref_deform_attn):
    """Our DeformableSpatialAttentionLayer output == torch Linears + the
    reference's deformable_attn_pytorch on the same weights/inputs."""
    import torch

    from gencomm_tpu.models.stamp import DeformableSpatialAttentionLayer

    rng = np.random.default_rng(0)
    b, h, w, cin, cout, heads, pts = 2, 8, 12, 16, 16, 4, 4
    nq = h * w
    query = rng.normal(size=(b, nq, cout)).astype(np.float32)
    value_map = rng.normal(size=(b, h, w, cin)).astype(np.float32)

    layer = DeformableSpatialAttentionLayer(
        out_ch=cout, num_heads=heads, num_points=pts, dropout=0.0,
    )
    vars_ = layer.init(
        {"params": jax.random.PRNGKey(1)},
        jnp.asarray(query), jnp.asarray(value_map), (h, w), False,
    )
    # randomize the zero-init offset/weight projections so the test
    # exercises real deformation (keep biases = reference init)
    p = jax.tree.map(lambda x: x, vars_["params"])
    key = jax.random.PRNGKey(2)
    p["sampling_offsets"]["kernel"] = 0.1 * jax.random.normal(
        key, p["sampling_offsets"]["kernel"].shape
    )
    p["attention_weights"]["kernel"] = 0.5 * jax.random.normal(
        jax.random.fold_in(key, 1), p["attention_weights"]["kernel"].shape
    )
    ours = np.asarray(
        layer.apply({"params": p}, jnp.asarray(query),
                    jnp.asarray(value_map), (h, w), False)
    )

    # torch replica of the layer forward (adapter.py:367-429) with OUR
    # weights, sampling through the REFERENCE kernel
    def t_linear(name):
        lin = torch.nn.Linear(*np.asarray(p[name]["kernel"]).shape)
        lin.weight.data = torch.tensor(np.asarray(p[name]["kernel"]).T)
        lin.bias.data = torch.tensor(np.asarray(p[name]["bias"]))
        return lin

    tq = torch.tensor(query)
    tv = torch.tensor(value_map.reshape(b, h * w, cin))
    value = t_linear("value_proj")(tv).reshape(b, h * w, heads,
                                               cout // heads)
    offsets = t_linear("sampling_offsets")(tq).view(b, nq, heads, pts, 2)
    attw = t_linear("attention_weights")(tq).view(
        b, nq, heads, pts
    ).softmax(-1)
    # reference points (adapter.py get_reference_points:431-445)
    ref_y, ref_x = torch.meshgrid(
        torch.linspace(0.5, h - 0.5, h), torch.linspace(0.5, w - 0.5, w),
        indexing="ij",
    )
    ref = torch.stack(
        [ref_x.reshape(-1) / w, ref_y.reshape(-1) / h], -1
    )[None].repeat(b, 1, 1)
    norm = torch.tensor([w, h], dtype=torch.float32)
    locs = ref[:, :, None, None, :] + offsets / norm
    sampled = ref_deform_attn(value, (h, w), locs, attw)
    theirs = (t_linear("output_proj")(sampled) + tq).detach().numpy()

    np.testing.assert_allclose(ours, theirs, atol=2e-4, rtol=1e-3)


def test_adapterdsa_end_to_end():
    """core_method: adapterdsa builds, rescales across ranges, and is
    differentiable (it trains as part of the STAMP adapter loss)."""
    from gencomm_tpu.models.stamp import StampAdapter

    in_range = (-16.0, -8.0, -3.0, 16.0, 8.0, 1.0)
    out_range = (-16.0, -8.0, -3.0, 16.0, 8.0, 1.0)
    adapter = StampAdapter.from_config(
        {"core_method": "adapterdsa",
         "args": {"in_channels": 12, "out_channels": 16, "n_layers": 2,
                  "num_heads": 4, "num_points": 2, "dropout": 0.0}},
        in_range, out_range, (10, 20),
    )
    x = jnp.asarray(
        np.random.default_rng(3).normal(size=(2, 10, 20, 12)),
        jnp.float32,
    )
    v = adapter.init({"params": jax.random.PRNGKey(0)}, x, False)
    out = adapter.apply(v, x, False)
    assert out.shape == (2, 10, 20, 16)
    assert np.isfinite(np.asarray(out)).all()
    # learned PE scales exist at the reference's 1/30 init (adapter.py:626)
    assert float(v["params"]["in_pos_scale_factor"][0]) == pytest.approx(
        1.0 / 30.0
    )

    def loss(params):
        return jnp.sum(adapter.apply({"params": params}, x, False) ** 2)

    g = jax.grad(loss)(v["params"])
    gnorm = sum(
        float(jnp.abs(leaf).sum()) for leaf in jax.tree.leaves(g)
    )
    assert np.isfinite(gnorm) and gnorm > 0
