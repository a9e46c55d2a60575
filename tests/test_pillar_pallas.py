"""Striped Pallas pillar-canvas kernel (ops/pillar_pallas.py).

The kernel replaces the serialized XLA scatter-max (the flagship's single
hottest device op, r5 trace) with a stripe-binned MXU one-hot head matmul
over host-emitted stripe-padded rows. These tests pin:
  * the stripe-padded host layout invariants (native.stripe_pad_sorted)
  * BIT-exactness of the kernel (interpret mode) vs the production bf16
    scatter path on the same rows AND on the original unpadded rows
  * the encoder consuming a striped batch end-to-end (scatter fallback on
    CPU) matches the plain decorated path
"""

import numpy as np
import jax
import jax.numpy as jnp

from gencomm_tpu.native import stripe_pad_sorted, striped_rows
from gencomm_tpu.ops.pillar_pallas import (
    STRIPE_CELLS, CHUNK_ROWS,
    striped_pillar_canvas, striped_pillar_canvas_reference,
)


def _make_rows(rng, a, p, ncell, n_cells=120):
    feats, gids, valids = [], [], []
    for _ in range(a):
        n_real = int(rng.integers(p // 4, p))
        cells = np.sort(rng.choice(ncell, size=n_cells, replace=False))
        g = np.sort(rng.choice(cells, size=n_real))
        f = np.abs(rng.normal(size=(p, 10))).astype(np.float32)
        gg = np.full(p, ncell, np.int32)
        gg[:n_real] = g
        v = np.zeros(p, bool)
        v[:n_real] = True
        f[~v] = 0
        feats.append(f), gids.append(gg), valids.append(v)
    return np.stack(feats), np.stack(gids), np.stack(valids)


def test_stripe_pad_layout_invariants():
    rng = np.random.default_rng(3)
    a, p, ncell, t, r = 3, 1500, 4096, 256, 128
    feats, gids, valids = _make_rows(rng, a, p, ncell)
    fs, gs, vs = stripe_pad_sorted(feats, gids, valids, ncell, t, r)
    assert fs.shape[1] == striped_rows(p, ncell, t, r)
    assert fs.shape[1] % r == 0
    for i in range(a):
        stripes = gs[i] // t
        # every chunk maps to exactly one stripe
        per_chunk = stripes.reshape(-1, r)
        assert (per_chunk == per_chunk[:, :1]).all()
        # chunk stripe ids non-decreasing
        cseq = per_chunk[:, 0]
        assert (np.diff(cseq) >= 0).all()
        # pad rows are zero-featured and invalid
        assert np.all(fs[i][~vs[i]] == 0)
        # real rows preserved (multiset of (gid, feature) rows)
        real_in = feats[i][valids[i]]
        real_out = fs[i][vs[i]]
        assert real_in.shape == real_out.shape
        assert np.allclose(np.sort(real_in.ravel()),
                           np.sort(real_out.ravel()))


def test_kernel_bit_exact_vs_scatter():
    rng = np.random.default_rng(0)
    a, p, c = 3, 2000, 64
    ncell = 64 * 64
    t, r = 256, 128
    feats, gids, valids = _make_rows(rng, a, p, ncell, n_cells=300)
    fs, gs, vs = stripe_pad_sorted(feats, gids, valids, ncell, t, r)

    x = np.tile(fs, (1, 1, c // 10 + 1))[:, :, :c]
    x = np.maximum(x, 0)  # post-ReLU semantics
    x = np.where(vs[..., None], x, 0).reshape(-1, c)
    x16 = jnp.asarray(x).astype(jnp.bfloat16)
    g = jnp.asarray(gs.reshape(-1).astype(np.int32))

    got = striped_pillar_canvas(x16, g, a, ncell, t, r, interpret=True)
    want = striped_pillar_canvas_reference(x16, g, a, ncell)
    assert np.array_equal(np.asarray(got, np.float32),
                          np.asarray(want, np.float32))

    # and vs the ORIGINAL (unpadded, invalid-row) scatter — pads/drops
    # must not change the canvas
    x0 = np.tile(feats, (1, 1, c // 10 + 1))[:, :, :c]
    x0 = np.where(valids[..., None], np.maximum(x0, 0), 0).reshape(-1, c)
    want0 = striped_pillar_canvas_reference(
        jnp.asarray(x0).astype(jnp.bfloat16),
        jnp.asarray(np.minimum(gids.reshape(-1), ncell - 1)), a, ncell)
    assert np.array_equal(np.asarray(got, np.float32),
                          np.asarray(want0, np.float32))


def test_encoder_striped_batch_matches_plain():
    """HeterModel consuming a striped decorated batch (CPU scatter
    fallback) == the plain decorated batch, config-coupled via
    `striped_scatter` (decorate.py <-> point_pillar.py)."""
    from gencomm_tpu.data.synthetic import SyntheticConfig, SyntheticScenes
    from gencomm_tpu.data.decorate import host_decorate_pillars
    from gencomm_tpu.models.heter_baseline import HeterModel

    cfg = SyntheticConfig(
        lidar_range=(-16.0, -8.0, -3.0, 16.0, 8.0, 1.0),
        max_cav=2, num_agents=2, points_per_agent=1024,
        num_vehicles=3, points_per_vehicle=150, comm_range=10.0,
    )
    scenes = SyntheticScenes(cfg)
    host = scenes.sample(0, 1)

    def margs(striped):
        return {
            "m1": {
                "encoder_args": {
                    "voxel_size": [0.4, 0.4, 4.0],
                    "lidar_range": list(cfg.lidar_range),
                    "pillar_vfe": {"use_norm": True, "num_filters": [32]},
                    "striped_scatter": striped,
                },
                "backbone_args": {
                    "layer_nums": [1, 1], "layer_strides": [2, 2],
                    "num_filters": [32, 64], "upsample_strides": [1, 2],
                    "num_upsample_filter": [32, 32],
                },
                "shrink_header": {
                    "kernal_size": [3], "stride": [2], "padding": [1],
                    "dim": [64], "input_dim": 64,
                },
            }
        }

    outs = {}
    for striped in (False, True):
        hypes = {"model": {"args": margs(striped)}}
        batch = {k: jnp.asarray(v) for k, v in
                 host_decorate_pillars(dict(host), hypes).items()}
        model = HeterModel(
            modality_args=margs(striped), fusion_method="att",
            fusion_args={"att": {"feat_dim": 64}},
            lidar_range=cfg.lidar_range, anchor_number=2, in_head=64,
        )
        rngs = {"diffusion": jax.random.PRNGKey(3),
                "dropout": jax.random.PRNGKey(7)}
        var = model.init({"params": jax.random.PRNGKey(0), **rngs},
                         batch, train=False)
        outs[striped] = (var, model.apply(var, batch, train=False,
                                          rngs=rngs)["cls_preds"])

    p0 = np.asarray(outs[False][1])
    p1 = np.asarray(outs[True][1])
    assert np.array_equal(p0, p1)
