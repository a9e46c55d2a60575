"""Golden parity, round 6: the FULL GenComm generative-communication chain
— the paper's core contribution — run end to end against the reference's
own cond_diff.GenComm with transplanted DiffusionUNet weights.

Noise is zeroed on both sides (torch randn/noise_like patched; our
jax.random.normal patched) so the 3-step reverse diffusion is
deterministic: x_{T-1} = sqrt(alpha_bar_{T-1}) * ego_broadcast, then two
posterior-mean steps, then the final x0 "upsam" step. This validates the
beta schedule, the q_sample/posterior coefficients, the denoiser
conditioning layout (concat(message, x_t)), and the step arithmetic in one
shot, on top of the module-level UNet transplant (golden3).
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
    # cond_diff.py imports timm symbols used only by its dormant Denosier
    import torch.nn as _tnn

    tl = sys.modules.get("timm.models.layers")
    if tl is None:
        timm = types.ModuleType("timm")
        tm = types.ModuleType("timm.models")
        tl = types.ModuleType("timm.models.layers")
        timm.models = tm
        tm.layers = tl
        sys.modules["timm"] = timm
        sys.modules["timm.models"] = tm
        sys.modules["timm.models.layers"] = tl
    for name, val in (
        ("DropPath", _tnn.Identity),
        ("to_2tuple", lambda v: v if isinstance(v, (tuple, list)) else (v, v)),
        ("trunc_normal_", lambda t, *a, **k: t),
        ("lecun_normal_", lambda t, *a, **k: t),
        ("PatchEmbed", object),
        ("Mlp", object),
    ):
        if not hasattr(tl, name):
            setattr(tl, name, val)
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


def test_gencomm_full_chain_parity():
    """cond_diff.GenComm.forward (eval branch, :361-383): ego-broadcast
    x_start -> q_sample at t=T-1 -> p_sample_loop (2 posterior steps + the
    x0 'upsam' step), denoiser = transplanted DiffusionUNet, noise zeroed
    on both sides."""
    import torch
    import jax
    import jax.numpy as jnp
    import opencood.models.gencomm_modules.cond_diff as refmod
    from test_reference_golden3 import transplant_unet, _t2n  # noqa: F401
    from gencomm_tpu.models.gencomm.diffusion import GenCommDiffusion

    rng = np.random.default_rng(113)
    n, c, msg_c, h, w = 3, 8, 2, 16, 16
    model_cfg = {
        "diffusion": {"num_diffusion_timesteps": 3},
        "model": {"ch": 8, "out_ch": c, "ch_mult": [1, 1],
                  "num_res_blocks": 2, "attn_resolutions": [],
                  "dropout": 0.0, "in_channels": c + msg_c - 2,
                  "resamp_with_conv": True, "embed_dim": c},
    }
    ref = refmod.GenComm(model_cfg).eval()
    with torch.no_grad():
        for p in ref.denoiser.parameters():
            p.copy_(torch.from_numpy(
                rng.normal(0, 0.2, tuple(p.shape)).astype(np.float32)
            ))

    feats = rng.normal(size=(n, c, h, w)).astype(np.float32)
    msgs = rng.normal(size=(n, msg_c, h, w)).astype(np.float32)

    orig_randn_like = torch.randn_like
    orig_noise_like = refmod.noise_like
    torch.randn_like = lambda t, **k: torch.zeros_like(t)
    refmod.noise_like = lambda shape, device, repeat=False: torch.zeros(
        shape, device=device
    )
    try:
        with torch.no_grad():
            out = ref(
                torch.from_numpy(feats), torch.from_numpy(msgs),
                torch.from_numpy(np.array([n])),
            )
        ref_pred = out["pred_feature"].numpy()
    finally:
        torch.randn_like = orig_randn_like
        refmod.noise_like = orig_noise_like

    ours = GenCommDiffusion(
        feat_ch=c, msg_ch=msg_c, num_timesteps=3, unet_ch=8,
        unet_ch_mult=(1, 1), unet_num_res_blocks=2, unet_attn_resolutions=(),
    )
    ego_b = np.broadcast_to(feats[0:1], feats.shape)  # ego broadcast
    egon = jnp.asarray(np.transpose(ego_b, (0, 2, 3, 1)))
    msgn = jnp.asarray(np.transpose(msgs, (0, 2, 3, 1)))

    orig_normal = jax.random.normal

    def zero_normal(key, shape, dtype=None):
        return jnp.zeros(shape, dtype or jnp.float32)

    jax.random.normal = zero_normal
    try:
        variables = ours.init(
            {"params": jax.random.PRNGKey(0),
             "diffusion": jax.random.PRNGKey(1)},
            egon, msgn,
        )
        transplant_unet(
            variables["params"]["denoiser"], ref.denoiser, 2, 2
        )
        got = ours.apply(
            variables, egon, msgn,
            rngs={"diffusion": jax.random.PRNGKey(2)},
        )
    finally:
        jax.random.normal = orig_normal

    got = np.transpose(np.asarray(got), (0, 3, 1, 2))
    np.testing.assert_allclose(got, ref_pred, rtol=2e-3, atol=2e-3)
