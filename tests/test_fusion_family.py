import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gencomm_tpu.models.fuse.fusion import build_fusion, warp_to_ego
from gencomm_tpu.models.fuse.where2comm import Communication

B, L, H, W, C = 2, 3, 8, 16, 32

ARGS = {
    "att": {"feat_dim": C},
    "who2com": {"feat_dim": C},
    "where2comm": {"feat_dim": C},
    "disconet": {"feat_dim": C},
    "v2vnet": {"in_channels": C, "num_iteration": 2, "gru_flag": True,
               "agg_operator": "avg"},
    "cobevt": {"input_dim": C, "mlp_dim": 64, "dim_head": 16,
               "window_size": 4, "agent_size": L, "depth": 1},
    "v2xvit": {"dim": C, "depth": 1, "num_blocks": 1,
               "window_sizes": (2, 4), "pwindow_heads": (4, 2),
               "pwindow_dim_heads": (8, 16), "mlp_dim": 64},
}


def _identity_affine():
    eye = np.zeros((B, L, L, 2, 3), np.float32)
    eye[..., 0, 0] = 1
    eye[..., 1, 1] = 1
    return jnp.asarray(eye)


@pytest.mark.parametrize(
    "method",
    ["max", "att", "disconet", "who2com", "where2comm", "v2vnet",
     "cobevt", "v2xvit"],
)
def test_fusion_shapes_and_mask_invariance(method):
    rng = np.random.RandomState(0)
    x = rng.randn(B, L, H, W, C).astype(np.float32)
    # padded slots carry garbage; result must not depend on it
    x2 = x.copy()
    x2[:, 2] = 77.0
    mask = jnp.asarray([[True, True, False]] * B)
    affine = _identity_affine()

    fusion = build_fusion(method, ARGS)
    variables = jax.jit(
        lambda a: fusion.init(jax.random.PRNGKey(0), a, affine, mask)
    )(jnp.asarray(x))
    run = jax.jit(lambda v, a: fusion.apply(v, a, affine, mask))
    out1 = run(variables, jnp.asarray(x))
    out2 = run(variables, jnp.asarray(x2))
    assert out1.shape == (B, H, W, C)
    assert bool(jnp.isfinite(out1).all())
    np.testing.assert_allclose(
        np.asarray(out1), np.asarray(out2), atol=1e-4,
        err_msg=f"{method} fusion leaks padded-agent data",
    )


def test_max_fusion_matches_numpy():
    rng = np.random.RandomState(1)
    x = rng.randn(B, L, H, W, C).astype(np.float32)
    mask = jnp.asarray([[True, True, True]] * B)
    affine = _identity_affine()
    fusion = build_fusion("max", ARGS)
    v = fusion.init(jax.random.PRNGKey(0), jnp.asarray(x), affine, mask)
    out = fusion.apply(v, jnp.asarray(x), affine, mask)
    np.testing.assert_allclose(np.asarray(out), x.max(axis=1), atol=1e-5)


def test_warp_to_ego_identity():
    rng = np.random.RandomState(2)
    x = rng.randn(B, L, H, W, C).astype(np.float32)
    w = warp_to_ego(jnp.asarray(x), _identity_affine())
    np.testing.assert_allclose(np.asarray(w), x, atol=1e-5)


def test_communication_masking_and_rate():
    conf = np.full((B, L, H, W, 2), -10.0, np.float32)  # all low confidence
    conf[:, 1, 2:4, 3:5, 0] = 10.0  # one hot region on agent 1
    mask = jnp.asarray([[True, True, False]] * B)
    comm = Communication(thre=0.5, smooth=False)
    v = comm.init(jax.random.PRNGKey(0), jnp.asarray(conf), mask)
    masks, rate = comm.apply(v, jnp.asarray(conf), mask)
    assert masks.shape == (B, L, H, W, 1)
    # ego fully transmitted
    assert float(masks[:, 0].min()) == 1.0
    # agent 1 transmits only the hot region
    assert float(masks[0, 1, 2, 3, 0]) == 1.0
    assert float(masks[0, 1, 0, 0, 0]) == 0.0
    assert 0.0 < float(rate) < 0.1
