"""Benchmark the five BASELINE.json configs end-to-end on the device.

Parity anchor: BASELINE.json's config list —
  1. PointPillars single-agent late fusion (OPV2V)
  2. PointPillars + attentive fusion intermediate (OPV2V)
  3. Lift-Splat-Shoot camera BEV + V2X-ViT fusion (OPV2V camera)
  4. Heterogeneous lidar+camera agents with BackAlign (OPV2V-H)
     (pillar base; the SECOND-base variant is
      configs/opv2v/baselines/stage2/backalign/m1m3_att.yaml)
  5. GenComm hetero collaboration (DAIR-V2X-C ranges)

Each row: build the SHIPPED config, synthesize a config-shaped batch
(scene points for lidar modalities, random camera stacks for LSS), run the
full InferencePipeline (model + decode + rotated NMS on device), report
steady-state frames/sec with device-resident RNG keys.

Usage: python -m gencomm_tpu.tools.bench_matrix [--iters 20] [--configs ...]
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np
import jax
import jax.numpy as jnp


DEFAULT_CONFIGS = [
    ("pp_late_opv2v", "configs/opv2v/point_pillar_late_fusion.yaml", "late"),
    ("pp_att_opv2v", "configs/opv2v/point_pillar_att.yaml", "intermediate"),
    ("lss_v2xvit_opv2v", "configs/opv2v/camera_only/camera_v2xvit.yaml",
     "intermediate"),
    ("backalign_m1m2_opv2v", "configs/opv2v/backalign_m1m2.yaml",
     "intermediate"),
    ("gencomm_s2_dairv2x", "configs/dairv2x/gencomm_stage2_m1m2.yaml",
     "intermediate"),
]

# Added-cost comparison across ALL FIVE hetero methods on the SAME m1+m2
# (PointPillars lidar + LSS camera) OPV2V agents, mirroring the poster's
# #P/#F columns (BASELINE.md): each method row minus the plain multi-
# modality att baseline gives the params/latency the method ADDS for
# heterogeneous collaboration.
HETERO_BASE = ("base_m1m2",
               "configs/opv2v/more_modality/2_modality_end2end/m1m2_att.yaml")
HETERO_METHODS = [
    ("gencomm_m1m2", "configs/opv2v/gencomm_stage2_m1m2.yaml"),
    ("backalign_m1m2", "configs/opv2v/backalign_m1m2.yaml"),
    ("codefilling_m1m2", "configs/opv2v/codefilling_m1m2.yaml"),
    ("mpda_m1m2", "configs/opv2v/mpda_m1m2.yaml"),
    ("stamp_m1m2", "configs/opv2v/stamp_m1m2.yaml"),
]


def synthetic_batch_for_hypes(hypes: dict, num_agents: int = 2,
                              seed: int = 0, points_per_agent: int = 20000,
                              host_decorate: bool = True):
    """Build a (B=1, L) batch matching the hypes' modality layout: scene
    point clouds for lidar modalities (via SyntheticScenes at the config's
    range), random camera stacks at the config's final_dim for LSS."""
    from gencomm_tpu.data.synthetic import SyntheticConfig, SyntheticScenes

    lidar_range = tuple(hypes["preprocess"]["cav_lidar_range"])
    max_cav = hypes["train_params"]["max_cav"]
    cfg = SyntheticConfig(lidar_range=lidar_range, max_cav=max_cav,
                          num_agents=num_agents,
                          points_per_agent=points_per_agent)
    scenes = SyntheticScenes(cfg)
    base = scenes.sample(seed, 1)
    rng = np.random.default_rng(seed)

    margs = hypes["model"]["args"]
    modalities = [k for k in margs
                  if isinstance(margs[k], dict) and "encoder_args" in margs[k]]
    batch = {k: v for k, v in base.items()
             if not (k.endswith("_m1") and k.startswith(
                 ("points", "point_mask", "modality_mask")))}
    for m in modalities:
        mcfg = margs[m]
        batch[f"modality_mask_{m}"] = base["modality_mask_m1"].copy()
        if mcfg.get("sensor_type", "lidar") == "camera":
            enc = mcfg["encoder_args"]
            h, w = enc["data_aug_conf"]["final_dim"]
            ncam = enc["data_aug_conf"].get("Ncams", 4)
            L = max_cav
            batch[f"imgs_{m}"] = rng.uniform(
                0, 1, (1, L, ncam, h, w, 3)).astype(np.float32)
            batch[f"rots_{m}"] = np.tile(
                np.eye(3, dtype=np.float32), (1, L, ncam, 1, 1))
            batch[f"trans_{m}"] = np.zeros((1, L, ncam, 3), np.float32)
            intr = np.array([[400.0, 0, w / 2], [0, 400.0, h / 2],
                             [0, 0, 1]], np.float32)
            batch[f"intrins_{m}"] = np.tile(intr, (1, L, ncam, 1, 1))
            batch[f"post_rots_{m}"] = np.tile(
                np.eye(3, dtype=np.float32), (1, L, ncam, 1, 1))
            batch[f"post_trans_{m}"] = np.zeros((1, L, ncam, 3), np.float32)
        else:
            batch[f"points_{m}"] = base["points_m1"].copy()
            batch[f"point_mask_{m}"] = base["point_mask_m1"].copy()
    # agent-slot bucketing, same as bench.py: the reference's record_len
    # layout pays only for real agents; the static-shape equivalent is a
    # per-bucket compilation trimmed to the smallest bucket holding the
    # frame's agents
    from gencomm_tpu.data.bucketing import trim_agent_slots

    batch = trim_agent_slots(batch, buckets=(2, 3, 5))
    if host_decorate:
        # host decoration for pillar modalities (the loader's production
        # path)
        from gencomm_tpu.data.decorate import host_decorate_pillars

        batch = host_decorate_pillars(batch, hypes)
    return scenes, batch


def bench_config(name: str, path: str, mode: str, iters: int = 20,
                 quiet: bool = False, half: bool = False):
    from gencomm_tpu.config.yaml_utils import load_yaml
    from gencomm_tpu.models import create_model
    from gencomm_tpu.data.postprocessor import generate_anchor_box
    from gencomm_tpu.train.trainer import cpu_init
    from gencomm_tpu.pipeline import InferencePipeline

    hypes = load_yaml(path)
    if half:
        hypes["model"]["args"]["half"] = True
    model = create_model(hypes)
    scenes, host = synthetic_batch_for_hypes(hypes)
    if mode in ("late", "no"):
        hypes["model"]["args"]["supervise_single"] = True
        model = create_model(hypes)
    batch = {k: jnp.asarray(v) for k, v in host.items()}
    variables = jax.device_put(
        cpu_init(model, host, jax.random.PRNGKey(0), train=False),
        jax.devices()[0],
    )
    anchors = generate_anchor_box(hypes["postprocess"]["anchor_args"],
                                  hypes["postprocess"].get("order", "hwl"))
    pipe = InferencePipeline(model, variables, anchors,
                             hypes["postprocess"], mode=mode)
    keys = jax.jit(lambda k: jax.random.split(k, iters))(
        jax.device_put(jax.random.PRNGKey(1)))
    keys = [keys[i] for i in range(iters)]
    jax.block_until_ready(keys)
    t0 = time.perf_counter()
    dets = pipe._run(pipe.variables, batch, keys[0])
    jax.block_until_ready(dets.scores)
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    for i in range(iters):
        dets = pipe._run(pipe.variables, batch, keys[i])
    jax.block_until_ready(dets.scores)
    dt = (time.perf_counter() - t0) / iters
    n_params = sum(x.size for x in jax.tree_util.tree_leaves(
        variables["params"]))
    row = {"config": name, "yaml": path, "mode": mode,
           "dtype": "bf16" if half else "fp32",
           "fps": round(1.0 / dt, 2), "ms_per_frame": round(dt * 1e3, 2),
           "compile_s": round(compile_s, 1),
           "params_M": round(n_params / 1e6, 3)}
    if not quiet:
        print(json.dumps(row), flush=True)
    return row


def added_cost_matrix(iters: int = 20, only=None, half: bool = False):
    """Measured analog of the poster's #P/#F table: fps + total params per
    hetero method on the shared m1+m2 agents, and deltas vs the plain
    multi-modality att baseline. Returns the list of row dicts."""
    rows = []
    base_row = None
    for name, path in [HETERO_BASE] + HETERO_METHODS:
        if only and name != HETERO_BASE[0] and name not in only:
            continue
        try:
            row = bench_config(name, path, "intermediate", iters,
                               quiet=True, half=half)
        except Exception as e:
            print(json.dumps({"config": name, "error": repr(e)[:300]}),
                  flush=True)
            continue
        if base_row is None:
            base_row = row
        else:
            row["added_ms"] = round(
                row["ms_per_frame"] - base_row["ms_per_frame"], 2)
            row["added_params_M"] = round(
                row["params_M"] - base_row["params_M"], 3)
        print(json.dumps(row), flush=True)
        rows.append(row)
    return rows


def main(argv=None):
    import gencomm_tpu

    gencomm_tpu.enable_persistent_cache()
    gencomm_tpu.enable_fast_prng()
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--only", default=None,
                    help="comma-separated subset of config names")
    ap.add_argument("--added_cost", action="store_true",
                    help="run the five-hetero-method added-cost matrix "
                         "(poster #P/#F analog) instead of the default "
                         "config list")
    ap.add_argument("--half", action="store_true",
                    help="bf16 activation path (tools/inference.py --half)")
    args = ap.parse_args(argv)
    if args.added_cost:
        return added_cost_matrix(args.iters,
                                 args.only.split(",") if args.only else None,
                                 half=args.half)
    rows = []
    for name, path, mode in DEFAULT_CONFIGS:
        if args.only and name not in args.only.split(","):
            continue
        try:
            rows.append(bench_config(name, path, mode, args.iters,
                                     half=args.half))
        except Exception as e:  # keep the matrix running
            print(json.dumps({"config": name, "error": repr(e)[:300]}),
                  flush=True)
    return rows


if __name__ == "__main__":
    main()
