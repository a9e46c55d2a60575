"""GenComm UNet ch=32 probe (VERDICT r4 item 4's channel-pad suggestion).

The r5 added-cost analysis claims the 3-step DDPM chain is per-kernel-
overhead-bound (~36 tiny ch=8 kernels at ~57 us against a ~4 us compute
bound), which predicts that widening the UNet to ch=32 (16x the FLOPs,
~0.26 M extra params) should leave the added latency roughly UNCHANGED —
while a compute-bound chain would get ~slower and a lane-occupancy-bound
one could even speed up. This probe measures the same added-cost gencomm
row at ch=8 (shipped) and ch=32 and prints both.

Usage: python scripts/unet_ch32_probe.py [--iters 20]
"""

from __future__ import annotations

import argparse
import copy
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()

    import gencomm_tpu

    gencomm_tpu.enable_persistent_cache()
    gencomm_tpu.enable_fast_prng()
    import time

    import numpy as np
    import jax
    import jax.numpy as jnp

    from gencomm_tpu.config.yaml_utils import load_yaml
    from gencomm_tpu.models import create_model
    from gencomm_tpu.data.postprocessor import generate_anchor_box
    from gencomm_tpu.train.trainer import cpu_init
    from gencomm_tpu.pipeline import InferencePipeline
    from gencomm_tpu.tools.bench_matrix import synthetic_batch_for_hypes

    base = load_yaml("configs/opv2v/gencomm_stage2_m1m2.yaml")
    rows = []
    for ch in (8, 32):
        hypes = copy.deepcopy(base)
        hypes["model"]["args"].setdefault("gencomm", {}).setdefault(
            "model", {})["ch"] = ch
        model = create_model(hypes)
        scenes, host = synthetic_batch_for_hypes(hypes)
        batch = {k: jnp.asarray(v) for k, v in host.items()}
        variables = jax.device_put(
            cpu_init(model, host, jax.random.PRNGKey(0), train=False),
            jax.devices()[0])
        anchors = generate_anchor_box(
            hypes["postprocess"]["anchor_args"],
            hypes["postprocess"].get("order", "hwl"))
        pipe = InferencePipeline(model, jax.device_get(variables), anchors,
                                 hypes["postprocess"])
        keys = jax.jit(lambda k: jax.random.split(k, args.iters))(
            jax.device_put(jax.random.PRNGKey(1)))
        keys = [keys[i] for i in range(args.iters)]
        jax.block_until_ready(keys)
        dets = pipe._run(pipe.variables, batch, keys[0])
        jax.block_until_ready(dets.scores)
        t0 = time.perf_counter()
        for i in range(args.iters):
            dets = pipe._run(pipe.variables, batch, keys[i])
        jax.block_until_ready(dets.scores)
        dt = (time.perf_counter() - t0) / args.iters
        n_params = sum(x.size for x in jax.tree_util.tree_leaves(
            variables["params"]))
        row = {"unet_ch": ch, "ms_per_frame": round(dt * 1e3, 2),
               "fps": round(1 / dt, 2),
               "params_M": round(n_params / 1e6, 3)}
        print(json.dumps(row), flush=True)
        rows.append(row)
    d = rows[1]["ms_per_frame"] - rows[0]["ms_per_frame"]
    print(json.dumps({
        "ch32_minus_ch8_ms": round(d, 2),
        "verdict": ("kernel-floor-bound (widening ~free)" if abs(d) < 0.5
                    else "compute-sensitive"),
    }))
    os.makedirs("measurements", exist_ok=True)
    with open("measurements/unet_ch32_probe.json", "w") as f:
        json.dump(rows, f, indent=1)


if __name__ == "__main__":
    main()
