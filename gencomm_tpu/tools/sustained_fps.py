"""Sustained end-to-end throughput: host loader vs device vs overlapped.

The model-fps numbers in bench.py / bench_matrix.py time the device step
with device-resident inputs (the reference profiler's convention,
opencood/tools/profiler/params_calc.py:28-60). This tool answers the
follow-up question: can the HOST side — sample/collate plus the C++
pillar decorator, the DataLoader-workers analog
(opencood/tools/train.py:53-85) — actually sustain that rate?

It measures, for one config:
  host_items_per_s    loader-only rate (sample + collate + C++ decorate)
  device_fps          device-only rate (device-resident inputs)
  sustained_fps       the real pipeline: loader on a prefetch thread
                      (data/prefetch.py double buffering, depth 2),
                      device consuming as fast as batches arrive
and prints one JSON line. On a multi-core TPU VM ``--workers N`` shards
the host side over N forked processes (DataLoader num_workers analog);
on this 1-core environment workers only add IPC, so the honest sustained
number is the single-producer one.

Usage:
  python -m gencomm_tpu.tools.sustained_fps \
      --hypes_yaml configs/opv2v/gencomm/stage1/m1_att.yaml [--frames 60]
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np
import jax
import jax.numpy as jnp


def main(argv=None):
    import gencomm_tpu

    gencomm_tpu.enable_persistent_cache()
    gencomm_tpu.enable_fast_prng()
    parser = argparse.ArgumentParser()
    parser.add_argument("--hypes_yaml", "-y", required=True)
    parser.add_argument("--dataset", default="synthetic")
    parser.add_argument("--frames", type=int, default=60)
    parser.add_argument("--batch_size", type=int, default=1)
    parser.add_argument("--workers", type=int, default=0,
                        help="shard the host pipeline over N forked "
                             "processes (multi-core VMs)")
    parser.add_argument("--half", action="store_true",
                        help="bf16 activation path (tools/inference.py "
                             "--half)")
    args = parser.parse_args(argv)

    from gencomm_tpu.config.yaml_utils import load_yaml
    from gencomm_tpu.data.decorate import host_decorate_pillars
    from gencomm_tpu.data.prefetch import prefetch_iter, multi_worker_iter
    from gencomm_tpu.models import create_model
    from gencomm_tpu.train import trainer
    from gencomm_tpu.tools.train import build_dataset, batches

    hypes = load_yaml(args.hypes_yaml, None)
    if args.half:
        hypes["model"]["args"]["half"] = True
    model = create_model(hypes)
    dataset = build_dataset(hypes, True, args.dataset)

    def host_batches(seed):
        for host in batches(dataset, args.batch_size, seed, args.dataset):
            yield host_decorate_pillars(host, hypes)

    # --- host-only rate --------------------------------------------------
    it = host_batches(0)
    next(it)  # first batch may pay one-time setup
    t0 = time.perf_counter()
    for _ in range(args.frames):
        host = next(it)
    host_dt = time.perf_counter() - t0
    host_items = args.frames * args.batch_size
    host_rate = host_items / host_dt

    # --- device-only rate ------------------------------------------------
    rng = jax.random.PRNGKey(0)
    variables = trainer.cpu_init(model, host, rng, train=False)
    dv = jax.device_put(variables, jax.devices()[0])

    def fwd(v, b, key):
        return model.apply(
            v, b, train=False,
            rngs={"diffusion": key, "dropout": jax.random.fold_in(key, 3)},
        )["cls_preds"]

    jfwd = jax.jit(fwd)
    dbatch = {k: jnp.asarray(v) for k, v in host.items()}
    out = jfwd(dv, dbatch, rng)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for i in range(args.frames):
        out = jfwd(dv, dbatch, rng)
    jax.block_until_ready(out)
    device_fps = args.frames * args.batch_size / (time.perf_counter() - t0)

    # --- overlapped pipeline (the real serving loop) ---------------------
    if args.workers > 0:
        src = multi_worker_iter(
            lambda w: host_batches(100 + w), args.workers
        )
    else:
        src = prefetch_iter(host_batches(100), depth=2)
    first = next(src)  # producer warm
    out = jfwd(dv, {k: jnp.asarray(v) for k, v in first.items()}, rng)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for i in range(args.frames):
        host = next(src)
        out = jfwd(dv, {k: jnp.asarray(v) for k, v in host.items()}, rng)
    jax.block_until_ready(out)
    sustained = args.frames * args.batch_size / (time.perf_counter() - t0)
    src.close()

    print(json.dumps({
        "config": args.hypes_yaml,
        "host_items_per_s": round(host_rate, 2),
        "device_fps": round(device_fps, 2),
        "sustained_fps": round(sustained, 2),
        "workers": args.workers,
        "batch_size": args.batch_size,
    }))


if __name__ == "__main__":
    main()
