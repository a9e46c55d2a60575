"""Per-module latency microbench of the hetero collaboration methods.

Parity: opencood/tools/inference_time.py — times the *added* modules of each
heterogeneous method (GenComm diffusion vs MPDA resizer/CDT vs CodeFilling
quantizer vs STAMP adapter+reverter) on a like-for-like BEV feature, plus
parameter counts (the poster's #P(M) column).

TPU notes (see memory: axon quirks): inputs are a pre-transferred pool of
varying tensors so the backend's result cache can't short-circuit timing;
everything is jitted once and block_until_ready()'d.
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np
import jax
import jax.numpy as jnp


def _pool(rng, shape, n=8):
    """One distinct device tensor per timing iteration — the axon backend
    dedupes executions with identical input buffers, so the pool must be at
    least as large as the iteration count."""
    ks = jax.random.split(rng, n)
    return [jax.device_put(jax.random.normal(k, shape, jnp.float32))
            for k in ks]


def _time(fn, pool, iters: int = 20) -> float:
    jax.tree_util.tree_leaves(fn(pool[0]))[0].block_until_ready()  # compile
    t0 = time.perf_counter()
    for i in range(iters):
        out = fn(pool[i % len(pool)])
    jax.tree_util.tree_leaves(out)[0].block_until_ready()
    return (time.perf_counter() - t0) / iters * 1000.0


def _pcount(variables) -> float:
    return sum(np.prod(x.shape) for x in
               jax.tree_util.tree_leaves(variables["params"])) / 1e6


def main(argv=None):
    import gencomm_tpu

    gencomm_tpu.enable_persistent_cache()
    ap = argparse.ArgumentParser()
    ap.add_argument("--hw", type=int, nargs=2, default=(64, 128),
                    help="BEV feature H W")
    ap.add_argument("--ch", type=int, default=128)
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args(argv)
    h, w, c = args.hw[0], args.hw[1], args.ch
    rng = jax.random.PRNGKey(0)
    n_pool = max(args.iters, 8)
    feat_pool = _pool(rng, (2, h, w, c), n=n_pool)
    results = {}

    # --- GenComm: message extractor + diffusion generator -----------------
    from gencomm_tpu.models.gencomm.message_extractor import MessageExtractor
    from gencomm_tpu.models.gencomm.diffusion import GenCommDiffusion

    me = MessageExtractor(in_ch=c, out_ch=2)
    me_vars = me.init(rng, feat_pool[0])
    me_fn = jax.jit(lambda x: me.apply(me_vars, x))
    results["gencomm_message_extractor"] = {
        "ms": _time(me_fn, feat_pool, args.iters), "params_M": _pcount(me_vars)}

    gc = GenCommDiffusion(feat_ch=c, msg_ch=2, num_timesteps=3)
    msg_pool = _pool(jax.random.fold_in(rng, 1), (2, h, w, 2), n=n_pool)
    gc_vars = gc.init({"params": rng, "diffusion": rng},
                      feat_pool[0], msg_pool[0], False)
    gc_fn = jax.jit(lambda x, m: gc.apply(
        gc_vars, x, m, False, rngs={"diffusion": jax.random.PRNGKey(1)}))
    gc_wrapped = lambda x: gc_fn(x, msg_pool[0])  # noqa: E731
    results["gencomm_diffusion"] = {
        "ms": _time(gc_wrapped, feat_pool, args.iters),
        "params_M": _pcount(gc_vars)}

    # --- MPDA: resizer + cross-domain fusion encoder ----------------------
    from gencomm_tpu.models.mpda import (
        LearnableResizer, CrossDomainFusionEncoder,
    )

    rs = LearnableResizer(out_channel=c, window_size=8, wg_depth=1)
    rs_vars = rs.init(rng, feat_pool[0], feat_pool[0], False)
    rs_fn = jax.jit(lambda x: rs.apply(rs_vars, x, x, False))
    results["mpda_resizer"] = {
        "ms": _time(rs_fn, feat_pool, args.iters), "params_M": _pcount(rs_vars)}

    cdt = CrossDomainFusionEncoder(dim=c, depth=1, window_size=8)
    cdt_vars = cdt.init(rng, feat_pool[0], feat_pool[0])
    cdt_fn = jax.jit(lambda x: cdt.apply(cdt_vars, x, x))
    results["mpda_cdt"] = {
        "ms": _time(cdt_fn, feat_pool, args.iters),
        "params_M": _pcount(cdt_vars)}

    # --- CodeFilling: UMGM quantizer --------------------------------------
    from gencomm_tpu.models.codebook import UMGMQuantizer

    q = UMGMQuantizer(channel=c, seg_num=2, dict_sizes=(64, 64, 64))
    flat_pool = [p.reshape(-1, c) for p in feat_pool]
    q_vars = q.init(rng, flat_pool[0], False)
    q_fn = jax.jit(lambda x: q.apply(q_vars, x, False))
    results["codefilling_quantizer"] = {
        "ms": _time(q_fn, flat_pool, args.iters), "params_M": _pcount(q_vars)}

    # --- STAMP: adapter + reverter -----------------------------------------
    from gencomm_tpu.models.stamp import StampAdapter

    rng2 = jax.random.fold_in(rng, 2)
    ad = StampAdapter.from_config(
        {"core_method": "adapterconvnext", "args": {"depth": 1}},
        (-51.2, -25.6, -3, 51.2, 25.6, 1), (-51.2, -25.6, -3, 51.2, 25.6, 1),
        (h, w))
    ad_vars = ad.init(rng2, feat_pool[0], False)
    ad_fn = jax.jit(lambda x: ad.apply(ad_vars, x, False))
    results["stamp_adapter"] = {
        "ms": _time(ad_fn, feat_pool, args.iters), "params_M": _pcount(ad_vars)}

    print(json.dumps(results, indent=2))
    return results


if __name__ == "__main__":
    main()
