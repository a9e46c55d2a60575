"""Profiler: parameter counts, FLOPs (XLA cost analysis) and latency.

Parity: opencood/tools/profiler/params_calc.py (fvcore FLOPs +
torch.profiler + CUDA-event throughput :28-60), traintp_calc.py (training
throughput + peak memory :24-60), model_cal.py (param counts),
inference_time.py (per-module latency comparison).

Usage:
  python -m gencomm_tpu.tools.profiler --model_dir <dir> [--dataset ...]
  python -m gencomm_tpu.tools.profiler --hypes_yaml configs/....yaml
"""

from __future__ import annotations

import argparse
import time

import numpy as np
import jax
import jax.numpy as jnp


def param_count(params) -> int:
    return sum(
        int(np.prod(x.shape)) for x in jax.tree_util.tree_leaves(params)
    )


def flops_estimate(fn, *args) -> float | None:
    """XLA cost-analysis FLOPs for a jitted callable (fvcore analog)."""
    try:
        lowered = jax.jit(fn).lower(*args)
        cost = lowered.compile().cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        return float(cost.get("flops", float("nan")))
    except Exception:
        return None


def peak_flops_per_s(device=None) -> float:
    """Peak bf16 FLOPs/s of the attached chip, for MFU accounting.

    Known TPUs (jax-ml.github.io/scaling-book numbers); defaults to v5e
    when the device kind is unrecognized. Override with --peak_tflops.
    """
    kind = (device or jax.devices()[0]).device_kind.lower()
    table = {
        "v5 lite": 197e12, "v5e": 197e12,
        "v4": 275e12, "v5p": 459e12, "v6 lite": 918e12, "v6e": 918e12,
    }
    for key, val in table.items():
        if key in kind:
            return val
    return 197e12


def mfu(flops: float | None, latency_s: float,
        peak: float | None = None) -> float | None:
    """Model FLOPs utilization = achieved FLOPs/s over the chip peak."""
    if not flops or not latency_s:
        return None
    return flops / latency_s / (peak or peak_flops_per_s())


def trace_op_breakdown(fn, *args, iters: int = 5, trace_dir: str | None = None,
                       top: int = 20) -> list:
    """Capture a device trace (jax.profiler, the torch.profiler analog —
    reference params_calc.py:28-60) and return the top ops by total device
    time: [(us_per_iter, count_per_iter, op_name), ...].

    The raw xplane/trace files stay in ``trace_dir`` for tensorboard.
    """
    import collections
    import glob
    import gzip
    import json
    import tempfile

    trace_dir = trace_dir or tempfile.mkdtemp(prefix="gencomm_trace_")
    jitted = jax.jit(fn)
    out = jitted(*args)
    jax.block_until_ready(out)  # compile outside the trace
    jax.profiler.start_trace(trace_dir)
    for _ in range(iters):
        out = jitted(*args)
    jax.block_until_ready(out)
    jax.profiler.stop_trace()

    paths = sorted(glob.glob(
        f"{trace_dir}/plugins/profile/*/*.trace.json.gz"))
    if not paths:
        return []
    with gzip.open(paths[-1]) as f:
        data = json.load(f)
    ev = data.get("traceEvents", [])
    pids = {e["pid"]: e["args"].get("name", "") for e in ev
            if e.get("ph") == "M" and e.get("name") == "process_name"}
    dur = collections.Counter()
    cnt = collections.Counter()
    for e in ev:
        if e.get("ph") == "X" and "dur" in e and \
                "TPU" in pids.get(e.get("pid"), ""):
            dur[e["name"]] += e["dur"]
            cnt[e["name"]] += 1
    rows = [(d / iters, cnt[name] // iters, name)
            for name, d in dur.most_common(top)]
    print(f"device trace written to {trace_dir}")
    for us, n, name in rows:
        print(f"  {us:>9.0f} us/iter x{n:<4} {name[:72]}")
    return rows


def trace_by_module(fn, *args, iters: int = 5, depth: int = 3,
                    top: int = 25, iter_args: list | None = None) -> list:
    """Aggregate device-trace op time by MODEL MODULE: join the trace's op
    names against the compiled HLO's op_name metadata (which carries the
    flax module path) and sum device time per path prefix.

    This answers "which module owns the time" — the raw trace only shows
    fused op names (fusion.N / copy.N).

    ``iter_args``: optional list of per-iteration argument tuples. The axon
    backend dedupes executions whose input buffers are bit-identical, so a
    non-donating step replayed on the same (state, batch, key) may execute
    fewer times than ``iters`` and underreport per-iter module times — pass
    distinct args (e.g. a fresh PRNG key per iter) to keep every traced
    execution real. The printed envelope count is the cross-check."""
    import collections
    import glob
    import gzip
    import json
    import re
    import tempfile

    if iter_args is None:
        iter_args = [args] * iters
    iters = len(iter_args)
    jitted = jax.jit(fn)
    comp = jitted.lower(*args).compile()
    txt = comp.as_text()
    op2path = {}
    for m in re.finditer(
            r'%([\w.\-]+) = [^\n]*?op_name="([^"]+)"', txt):
        name, op_name = m.groups()
        # op_name like jit(fwd)/HeterModel/branch_m1/encoder/...; keep the
        # module path segments after the jit entry
        parts = [p for p in op_name.split("/")
                 if not p.startswith("jit(") and p != "checkpoint"]
        op2path[name] = "/".join(parts[:depth]) if parts else op_name

    out = jitted(*args)
    jax.block_until_ready(out)
    trace_dir = tempfile.mkdtemp(prefix="gencomm_mod_trace_")
    jax.profiler.start_trace(trace_dir)
    for a in iter_args:
        out = jitted(*a)
    jax.block_until_ready(out)
    jax.profiler.stop_trace()
    paths = sorted(glob.glob(
        f"{trace_dir}/plugins/profile/*/*.trace.json.gz"))
    if not paths:
        return []
    with gzip.open(paths[-1]) as f:
        data = json.load(f)
    ev = data.get("traceEvents", [])
    pids = {e["pid"]: e["args"].get("name", "") for e in ev
            if e.get("ph") == "M" and e.get("name") == "process_name"}
    agg = collections.Counter()
    unattributed = 0.0
    total = 0.0
    envelope = 0.0
    n_env = 0
    for e in ev:
        if e.get("ph") == "X" and "dur" in e and \
                "TPU" in pids.get(e.get("pid"), ""):
            name = e["name"]
            if name.startswith("jit_"):
                continue
            if name.isdigit():
                # axon backend per-execution envelope events (one per
                # program run, named by execution index): they span the
                # whole step and would double-count every op below
                envelope += e["dur"]
                n_env += 1
                continue
            total += e["dur"]
            path = op2path.get(name)
            if path is None:
                unattributed += e["dur"]
                path = f"<{name.split('.')[0]}>"
            agg[path] += e["dur"]
    if not total:
        print("no device events in trace (CPU backend or empty trace); "
              "no per-module breakdown")
        return []
    rows = [(d / iters, path) for path, d in agg.most_common(top)]
    if n_env:
        print(f"step envelope {envelope / n_env:.0f} us/execution "
              f"({n_env} executions)")
        if n_env < iters:
            print(f"WARNING: only {n_env}/{iters} executions in trace — "
                  "backend deduped identical input buffers; per-iter times "
                  "above are underreported. Pass distinct iter_args.")
    print(f"device total {total / iters:.0f} us/iter, by module "
          f"(unattributed {unattributed / total * 100:.0f}%):")
    for us, path in rows:
        print(f"  {us:>8.0f} us  {100 * us * iters / total:5.1f}%  {path}")
    return rows


def latency(fn, *args, iters: int = 20) -> dict:
    """Compile + steady-state latency of a jitted callable."""
    jitted = jax.jit(fn)
    t0 = time.perf_counter()
    out = jitted(*args)
    jax.block_until_ready(out)
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(iters):
        out = jitted(*args)
    jax.block_until_ready(out)
    per_iter = (time.perf_counter() - t0) / iters
    return {"compile_s": compile_s, "latency_ms": per_iter * 1e3,
            "throughput_fps": 1.0 / per_iter}


def main(argv=None):
    import gencomm_tpu

    gencomm_tpu.enable_persistent_cache()
    gencomm_tpu.enable_fast_prng()
    parser = argparse.ArgumentParser()
    parser.add_argument("--model_dir", default=None)
    parser.add_argument("--hypes_yaml", default=None)
    parser.add_argument("--dataset", default="synthetic",
                        choices=["opv2v", "v2xset", "dairv2x", "v2xsim", "v2xreal", "synthetic"])
    parser.add_argument("--iters", type=int, default=20)
    parser.add_argument("--batch", type=int, default=1,
                        help="batch size for the profiled step (the "
                             "MFU-vs-batch sweep)")
    parser.add_argument("--half", action="store_true",
                        help="bf16 activation path (tools/train.py --half "
                             "analog) for the profiled model")
    parser.add_argument("--train", action="store_true",
                        help="also profile the TRAINING step: throughput + "
                             "peak device memory "
                             "(tools/profiler/traintp_calc.py:24-60 parity)")
    parser.add_argument("--by_module", action="store_true",
                        help="aggregate the device trace by flax module "
                             "path (joins trace op names with HLO "
                             "op_name metadata)")
    parser.add_argument("--trace", default=None, nargs="?", const="",
                        help="capture a device trace (jax.profiler; the "
                             "torch.profiler analog) and print the top ops "
                             "by device time; optional value = trace dir")
    parser.add_argument("--peak_tflops", type=float, default=None,
                        help="chip peak bf16 TFLOPs/s for MFU accounting "
                             "(default: auto by device kind; v5e = 197)")
    parser.add_argument("--no_host_decorate", action="store_true",
                        help="profile the raw on-device voxelization path "
                             "instead of the loader's host C++ decoration")
    args = parser.parse_args(argv)

    from gencomm_tpu.config.yaml_utils import load_yaml
    from gencomm_tpu.models import create_model
    from gencomm_tpu.train import trainer
    from gencomm_tpu.tools.train import build_dataset

    hypes = load_yaml(args.hypes_yaml, args.model_dir)
    if args.half:
        hypes["model"]["args"]["half"] = True
    model = create_model(hypes)
    dataset = build_dataset(hypes, False, args.dataset)
    if args.dataset == "synthetic":
        margs = hypes["model"].get("args", {})
        has_camera = any(isinstance(m, dict)
                         and m.get("sensor_type") == "camera"
                         for m in margs.values())
        if has_camera:
            # config-shaped batch (camera stacks + per-modality points)
            from gencomm_tpu.tools.bench_matrix import (
                synthetic_batch_for_hypes,
            )

            _, host = synthetic_batch_for_hypes(
                hypes, host_decorate=not args.no_host_decorate)
        else:
            host = dataset.sample(0, args.batch)
    else:
        host = dataset.collate([dataset[i] for i in range(args.batch)])
    if not args.no_host_decorate:
        from gencomm_tpu.data.decorate import host_decorate_pillars

        host = host_decorate_pillars(host, hypes)
    batch = {k: jnp.asarray(v) for k, v in host.items()}

    variables = trainer.cpu_init(model, host, jax.random.PRNGKey(0),
                                 train=False)
    n_params = param_count(variables["params"])
    print(f"total params: {n_params / 1e6:.3f} M")
    for mod, sub in sorted(variables["params"].items()):
        print(f"  {mod:32s} {param_count(sub) / 1e6:8.3f} M")

    rng = jax.random.PRNGKey(0)

    def fwd(v, b):
        return model.apply(
            v, b, train=False,
            rngs={"diffusion": rng, "dropout": rng},
        )["cls_preds"]

    dv = jax.device_put(variables, jax.devices()[0])
    fl = flops_estimate(fwd, dv, batch)
    if fl is not None:
        print(f"forward FLOPs (XLA cost analysis): {fl / 1e9:.2f} G")
    lat = latency(fwd, dv, batch, iters=args.iters)
    fwd_mfu = mfu(fl, lat["latency_ms"] / 1e3, args.peak_tflops and
                  args.peak_tflops * 1e12)
    print(f"forward: compile {lat['compile_s']:.1f}s, "
          f"{lat['latency_ms']:.2f} ms/frame, "
          f"{lat['throughput_fps']:.1f} fps"
          + (f", MFU {fwd_mfu * 100:.2f}%" if fwd_mfu is not None else ""))
    result = {"params": n_params, "flops": fl, "mfu": fwd_mfu, **lat}

    if args.trace is not None:
        trace_op_breakdown(fwd, dv, batch,
                           trace_dir=args.trace or None)
    if args.by_module:
        trace_by_module(fwd, dv, batch)

    if args.train:
        from gencomm_tpu.loss import create_loss

        criterion = create_loss(hypes)
        tx = trainer.make_optimizer(hypes)
        state = trainer.create_train_state(
            model, host, jax.random.PRNGKey(0), tx
        )
        step = trainer.make_train_step(model, criterion, tx, donate=True)
        # thread the state through the loop: the axon backend dedupes
        # executions with identical input buffers, which would otherwise
        # report near-zero step time
        base_key = jax.random.PRNGKey(1)
        t0 = time.perf_counter()
        state, _ = step(state, batch, base_key)
        jax.block_until_ready(state.params)
        compile_s = time.perf_counter() - t0
        iters = max(args.iters // 2, 3)
        t0 = time.perf_counter()
        for i in range(iters):
            # same key buffer every step: the step folds state.step in
            # on-device, and the threaded state keeps inputs distinct
            state, _ = step(state, batch, base_key)
        jax.block_until_ready(state.params)
        per = (time.perf_counter() - t0) / iters
        tlat = {"compile_s": compile_s, "latency_ms": per * 1e3,
                "throughput_fps": 1.0 / per}
        tfl = flops_estimate(
            lambda s, b_, k: step(s, b_, k)[0].params, state, batch,
            base_key)
        train_mfu = mfu(tfl, per, args.peak_tflops and
                        args.peak_tflops * 1e12)
        print(f"train step: compile {tlat['compile_s']:.1f}s, "
              f"{tlat['latency_ms']:.2f} ms/step, "
              f"{tlat['throughput_fps']:.1f} steps/s"
              + (f", {tfl / 1e9:.1f} GFLOPs, MFU {train_mfu * 100:.2f}%"
                 if train_mfu is not None else ""))
        result.update(train_flops=tfl, train_mfu=train_mfu)
        if args.by_module:
            # per-module attribution of the TRAIN step (fwd+bwd+adam):
            # a non-donating step so the tracer can replay buffers across
            # its warmup + traced iterations. Keys must DIFFER per iter —
            # the axon backend dedupes executions with identical input
            # buffers (the envelope count printed below is the check).
            trace_step = trainer.make_train_step(
                model, criterion, tx, donate=False)
            n_trace = 5
            trace_keys = [
                jax.device_put(k) for k in
                jax.device_get(jax.random.split(base_key, n_trace))
            ]
            jax.block_until_ready(trace_keys)
            trace_by_module(
                lambda s, b_, k: trace_step(s, b_, k)[0].params,
                state, batch, base_key,
                iter_args=[(state, batch, k) for k in trace_keys])
        stats = jax.devices()[0].memory_stats() or {}
        peak = stats.get("peak_bytes_in_use")
        if peak:
            print(f"peak device memory: {peak / 2**20:.0f} MiB")
        result.update(train_ms=tlat["latency_ms"], peak_bytes=peak)

        if args.trace is not None:
            # trace the TRAIN step, threading the state through the loop
            # (same dedupe caveat as the timing loop above)
            import glob as _glob
            import gzip as _gzip
            import json as _json
            import tempfile

            tdir = tempfile.mkdtemp(prefix="gencomm_train_trace_")
            jax.profiler.start_trace(tdir)
            for i in range(3):
                state, _ = step(state, batch, base_key)
            jax.block_until_ready(state.params)
            jax.profiler.stop_trace()
            files = sorted(_glob.glob(
                f"{tdir}/plugins/profile/*/*.trace.json.gz"))
            if files:
                with _gzip.open(files[-1], "rt") as f:
                    ev = _json.load(f).get("traceEvents", [])
                tot = {}
                for e in ev:
                    if e.get("ph") == "X" and "dur" in e:
                        name = e.get("name", "?")
                        tot[name] = tot.get(name, 0.0) + e["dur"]
                print(f"train device trace written to {tdir}")
                for name, us in sorted(tot.items(), key=lambda kv: -kv[1])[:20]:
                    print(f"  {us / 3:10.0f} us/step  {name}")

    return result


if __name__ == "__main__":
    main()
