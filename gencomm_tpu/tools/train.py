"""Training entry point.

Parity: opencood/tools/train.py (single-host) + train_ddp.py (the mesh is
the DDP analog: batch axis sharded over all local devices, gradient
all-reduce inserted by XLA).

Usage:
  python -m gencomm_tpu.tools.train --hypes_yaml configs/opv2v/xxx.yaml \
      [--model_dir logs/run1] [--dataset synthetic|opv2v] [--epochs N]
"""

from __future__ import annotations

import argparse
import os
import time

import numpy as np
import jax
import jax.numpy as jnp

from gencomm_tpu.config.yaml_utils import load_yaml, save_yaml
from gencomm_tpu.models import create_model
from gencomm_tpu.train import trainer, checkpoint
from gencomm_tpu.data.postprocessor import generate_anchor_box
import gencomm_tpu.loss  # noqa: F401  (register losses)


def build_dataset(hypes: dict, train: bool, dataset: str):
    if dataset == "synthetic":
        from gencomm_tpu.data.synthetic import SyntheticConfig, SyntheticScenes

        margs = hypes.get("model", {}).get("args", {})
        core = hypes.get("model", {}).get("core_method", "").lower()
        needs_single = bool(margs.get("supervise_single")) or any(
            core.startswith(c) for c in
            ("ciassd", "second", "fpvrcnn", "point_pillar_uncertainty",
             "heter_pyramid_single")
        )
        # derive the modality layout from the hypes so camera / hetero
        # configs get geometrically consistent synthetic inputs
        modalities = {}
        spawn_radius = 0.0
        for name, m in margs.items():
            if isinstance(m, dict) and "encoder_args" in m:
                if m.get("sensor_type", "lidar") == "camera":
                    dac = m["encoder_args"]["data_aug_conf"]
                    modalities[name] = {
                        "sensor": "camera",
                        "final_dim": tuple(dac["final_dim"]),
                        "ncam": int(dac.get("Ncams", 4)),
                    }
                    if hypes.get("label_type") == "camera":
                        # camera-labelled configs: keep GT inside the depth
                        # discretization so every box is physically visible
                        # (the reference filters GT to camera-visible objects,
                        # base_postprocessor.generate_visible_object_center)
                        dmax = m["encoder_args"]["grid_conf"]["ddiscr"][1]
                        spawn_radius = float(dmax) - 2.0
                else:
                    modalities[name] = {"sensor": "lidar"}
        if not modalities:
            modalities = {"m1": {"sensor": "lidar"}}
        aa = hypes.get("postprocess", {}).get("anchor_args", {})
        vs = hypes.get("preprocess", {}).get("args", {}).get(
            "voxel_size", (0.4, 0.4, 4.0)
        )
        # robustness knobs (inference --pos_std/--rot_std/--delay write
        # these blocks; the real loaders consume them natively, the
        # synthetic generator through its config)
        from gencomm_tpu.utils.pose_utils import pose_noise_enabled

        ns = hypes.get("noise_setting", {})
        nargs = ns.get("args", {}) if pose_noise_enabled(ns) else {}
        ws = hypes.get("wild_setting", {})
        cfg = SyntheticConfig(
            lidar_range=tuple(hypes["preprocess"]["cav_lidar_range"]),
            pos_std=float(nargs.get("pos_std", 0.0)),
            rot_std=float(nargs.get("rot_std", 0.0)),
            laplace_noise=bool(nargs.get("laplace", False)),
            delay_ms=float(ws.get("async_overhead", 0.0))
            if ws.get("async") else 0.0,
            max_cav=hypes["train_params"]["max_cav"],
            per_agent_labels=needs_single,
            modalities=modalities,
            max_spawn_radius=spawn_radius,
            # labels must live on the model's true output grid: base grid =
            # range / voxel_size (e.g. CIASSD at 0.2 m voxels), then the
            # anchor stride (HEAL pyramid heads at 2, gencomm shrink at 4,
            # spconv-8x SECOND heads at 8)
            voxel_size=tuple(vs),
            feature_stride=int(aa.get("feature_stride", 4)),
            anchor_l=float(aa.get("l", 3.9)),
            anchor_w=float(aa.get("w", 1.6)),
            anchor_h=float(aa.get("h", 1.56)),
            anchor_yaw_deg=tuple(aa.get("r", (0.0, 90.0))),
        )
        return SyntheticScenes(cfg)
    if dataset == "dairv2x":
        from gencomm_tpu.data.dairv2x import DAIRV2XDataset

        return DAIRV2XDataset(hypes, train=train)
    if dataset == "v2xsim":
        from gencomm_tpu.data.v2xsim import V2XSimDataset

        return V2XSimDataset(hypes, train=train)
    if dataset == "v2xreal":
        from gencomm_tpu.data.v2xreal import V2XRealDataset

        return V2XRealDataset(hypes, train=train)
    # opv2v covers OPV2V / OPV2V-H / V2XSet (identical directory format,
    # v2xset_basedataset.py:1-28 is a trivial subclass in the reference)
    from gencomm_tpu.data.opv2v import OPV2VDataset

    return OPV2VDataset(hypes, train=train)


def batches(dataset, batch_size: int, seed: int, dataset_kind: str):
    if dataset_kind == "synthetic":
        step = 0
        while True:
            yield dataset.sample(seed * 10000 + step, batch_size)
            step += 1
    else:
        idx = np.random.RandomState(seed % (2 ** 32)).permutation(len(dataset))
        for start in range(0, len(idx) - batch_size + 1, batch_size):
            samples = [dataset[i] for i in idx[start : start + batch_size]]
            yield dataset.collate(samples)


def main(argv=None):
    import gencomm_tpu

    gencomm_tpu.enable_persistent_cache()
    parser = argparse.ArgumentParser()
    parser.add_argument("--hypes_yaml", "-y", required=True)
    parser.add_argument("--model_dir", default=None)
    parser.add_argument("--dataset", default="opv2v",
                        choices=["opv2v", "v2xset", "dairv2x", "v2xsim", "v2xreal", "synthetic"])
    parser.add_argument("--epochs", type=int, default=None)
    parser.add_argument("--steps_per_epoch", type=int, default=50)
    parser.add_argument("--freeze_prefixes", default="",
                        help="comma-separated param-path prefixes to freeze "
                             "(stage-2 protocol)")
    parser.add_argument("--init_from", default=None,
                        help="checkpoint path for non-strict restore")
    parser.add_argument("--trainer", default="plain",
                        choices=["plain", "kd", "gmatch"],
                        help="kd = DiscoNet teacher-student distillation "
                             "(train_w_kd.py); gmatch = gradient-matching "
                             "second-order objective (train_gmatch.py)")
    parser.add_argument("--teacher_ckpt", default=None,
                        help="frozen teacher checkpoint for --trainer kd")
    parser.add_argument("--val_steps", type=int, default=5,
                        help="validation batches per eval (0 disables the "
                             "val loop / bestval tracking)")
    parser.add_argument("--run_test", action="store_true",
                        help="run inference on the final checkpoint after "
                             "training (reference train.py:218-230 spawns "
                             "inference.py)")
    parser.add_argument("--batch_pool", type=int, default=0,
                        help="pre-generate N batches per epoch and cycle "
                             "through them - makes data-generation-bound "
                             "smoke runs (synthetic camera rendering on a "
                             "1-core host) device-bound; eval still draws "
                             "fresh scenes")
    parser.add_argument("--workers", type=int, default=0,
                        help="host-pipeline worker PROCESSES (torch "
                             "DataLoader num_workers analog); 0 = one "
                             "producer thread (double buffering)")
    parser.add_argument("--half", action="store_true",
                        help="bf16 activations in the BEV necks (the "
                             "reference's train_ddp.py --half AMP mode)")
    parser.add_argument("--no_host_decorate", action="store_true",
                        help="disable host-side C++ pillar decoration (the "
                             "loader-voxelization analog of the reference's "
                             "spconv DataLoader path); raw points are then "
                             "voxelized on device")
    args = parser.parse_args(argv)

    hypes = load_yaml(args.hypes_yaml, args.model_dir)
    if args.half:
        hypes["model"]["args"]["half"] = True
    model_dir = args.model_dir or os.path.join(
        "logs", hypes.get("name", "run") + time.strftime("_%m%d_%H%M%S")
    )
    os.makedirs(model_dir, exist_ok=True)
    save_yaml(hypes, os.path.join(model_dir, "config.yaml"))

    dataset = build_dataset(hypes, True, args.dataset)
    model = create_model(hypes)
    # create_loss injects the anchor grid (IoU-rescore losses), lidar range
    # and pyramid mode — never build criteria from the bare registry here
    from gencomm_tpu.loss import create_loss

    criterion = create_loss(hypes)

    # batch adaptation per fusion mode / model family:
    # - early fusion (Cooper): merge raw clouds into the ego frame
    #   (early_fusion_dataset.py parity)
    # - late/no fusion and the per-slot legacy detectors (CIASSD, SECOND,
    #   FPV-RCNN, uncertainty): each sample is ONE agent; restrict to the
    #   ego slot so per-slot predictions align with the (B, ...) labels
    from gencomm_tpu.data.bucketing import (
        ego_only_batch, per_agent_label_batch, trim_agent_slots,
    )
    from gencomm_tpu.data.early_fusion import merge_points_to_ego

    fusion_mode = hypes.get("fusion", {}).get("core_method", "").lower()
    core = hypes["model"]["core_method"].lower()
    per_slot_cores = ("ciassd", "second", "second_ssfa", "fpvrcnn",
                      "second_ssfa_uncertainty", "point_pillar_uncertainty")
    if fusion_mode == "early":
        lidar_range = hypes["preprocess"]["cav_lidar_range"]
        adapt = lambda b: merge_points_to_ego(b, lidar_range)  # noqa: E731
    elif core in per_slot_cores:
        # every agent trains as a sample against its own-frame labels when
        # the loader provides them (late-fusion / 2-stage distribution),
        # else restrict to the ego slot
        adapt = per_agent_label_batch
    elif fusion_mode in ("late", "no"):
        adapt = ego_only_batch
    else:
        # intermediate fusion: agent-slot bucketing, same as the eval
        # paths — skip dead padded slots (most frames have 2-3 real CAVs
        # of max_cav=5; one train_step compilation per bucket size)
        adapt = trim_agent_slots
    # param shapes don't depend on the agent axis, so initialize from the
    # UNTRIMMED batch — its init graph is shared across bucket sizes (and
    # already in the init cache), sparing a multi-minute compile per bucket
    init_adapt = adapt if adapt is not trim_agent_slots else (lambda b: b)

    if not args.no_host_decorate:
        # loader-side C++ pillar decoration: the device then runs ONE
        # matmul + ONE sorted max-scatter per pillar modality instead of
        # three random segment scatters (data/decorate.py)
        from gencomm_tpu.data.decorate import host_decorate_pillars

        base_adapt = adapt
        adapt = lambda b: host_decorate_pillars(  # noqa: E731
            base_adapt(b), hypes)
        base_init_adapt = init_adapt
        init_adapt = lambda b: host_decorate_pillars(  # noqa: E731
            base_init_adapt(b), hypes)

    frozen_pred = None
    if args.freeze_prefixes:
        frozen_pred = trainer.freeze_by_prefixes(
            args.freeze_prefixes.split(",")
        )
    elif "stage2" in hypes["model"]["core_method"].lower():
        # stage-2 protocol: auto-derive the freeze schedule — only new
        # agents' message extractors train (gencomm_stage2.py:180-185)
        trainable = trainer.stage2_trainable_prefixes(hypes)
        print("stage-2 freeze: training only", trainable)
        frozen_pred = trainer.freeze_all_except(trainable)
    elif "backalign" in hypes["model"]["core_method"].lower():
        frozen = trainer.backalign_frozen_modules(hypes)
        print("backalign freeze:", frozen)
        frozen_pred = trainer.freeze_exact(frozen)
    elif hypes["model"]["core_method"].lower() == "heter_pyramid_single":
        # HEAL stage 2: the single model ALWAYS trains with the shared
        # pyramid + detection heads frozen (heter_pyramid_single.py:27
        # fix_modules = ['pyramid_backbone', cls/reg/dir heads]) — only the
        # new agent's encoder/backbone/aligner learns, back-aligning it to
        # the stage-1 base restored via --init_from
        print("pyramid-single freeze: ['pyramid_backbone', 'heads']")
        frozen_pred = trainer.freeze_by_prefixes(
            ["pyramid_backbone", "heads"]
        )
    elif "codebook" in hypes["model"]["core_method"].lower():
        # CodeFilling: only the quantizer trains
        # (heter_model_baseline_w_codebook.py fix_modules)
        print("codebook freeze: training only ['codebook']")
        frozen_pred = trainer.freeze_all_except(["codebook"])
    elif "stamp" in hypes["model"]["core_method"].lower():
        # STAMP: only adapters/reverters train (train_stamp.py stagewise
        # freezing)
        print("stamp freeze: training only adapters/reverters")
        frozen_pred = trainer.freeze_all_except(["adapter_", "reverter_"])
    elif "mpda" in hypes["model"]["core_method"].lower():
        # MPDA: all modality branches fixed; resizer/cdt/classifier +
        # fusion/heads train (heter_model_baseline_w_mpda.py fix_modules)
        print("mpda freeze: branches frozen")
        frozen_pred = trainer.freeze_by_prefixes(["branch_"])
    tx = trainer.make_optimizer(hypes, args.steps_per_epoch, frozen_pred)

    batch_size = hypes["train_params"]["batch_size"]
    first = init_adapt(next(batches(dataset, batch_size, 0, args.dataset)))
    state = trainer.create_train_state(model, first, jax.random.PRNGKey(0), tx)

    start_epoch = 0
    if args.init_from:
        # accept either a concrete step dir or a model dir holding step_N
        # dirs (e.g. the output of `heal_tools merge`)
        restored = checkpoint.load_checkpoint(
            checkpoint.latest_checkpoint(args.init_from) or args.init_from
        )
        state = state.replace(
            params=checkpoint.load_into(
                jax.device_get(state.params), restored["params"]
            ),
            # carry BN statistics from the merged stage-1 checkpoints too —
            # stage-2 freezing relies on them (reference fix_bn semantics)
            batch_stats=checkpoint.load_into(
                jax.device_get(state.batch_stats),
                restored.get("batch_stats", {}), verbose=False,
            ),
        )
    else:
        # auto-resume: pick up the latest checkpoint already in model_dir
        # (reference train_utils.load_saved_model:168-216 finds the newest
        # net_epoch*.pth and continues from its epoch)
        latest = checkpoint.latest_checkpoint(model_dir)
        if latest:
            restored = checkpoint.load_checkpoint(latest)
            state = state.replace(
                params=checkpoint.load_into(
                    jax.device_get(state.params), restored["params"]
                ),
                batch_stats=checkpoint.load_into(
                    jax.device_get(state.batch_stats),
                    restored.get("batch_stats", {}), verbose=False,
                ),
                step=jnp.asarray(restored.get("step", 0), jnp.int32),
            )
            # checkpoints carry params/batch_stats/step only — like the
            # reference's .pth resume, optimizer moments restart fresh
            start_epoch = int(restored.get("step", 0)) // max(
                args.steps_per_epoch, 1
            )
            print(f"resumed from {latest} (epoch {start_epoch})")

    if args.trainer == "kd":
        # DiscoNet KD (train_w_kd.py): the teacher is the same architecture
        # with frozen weights from --teacher_ckpt
        if not args.teacher_ckpt:
            raise SystemExit("--trainer kd requires --teacher_ckpt")
        from gencomm_tpu.loss.point_pillar_loss import (
            PointPillarDiscoNetLoss,
        )

        if not isinstance(criterion, PointPillarDiscoNetLoss):
            # the reference's train_w_kd.py expects the yaml to name
            # point_pillar_disconet_loss; upgrade plain detection configs
            # so the KD term is actually applied
            criterion = PointPillarDiscoNetLoss(hypes["loss"]["args"])
            print("trainer kd: upgraded criterion to "
                  "PointPillarDiscoNetLoss (kd weight "
                  f"{criterion.kd_weight})")
        t_restored = checkpoint.load_checkpoint(
            checkpoint.latest_checkpoint(args.teacher_ckpt)
            or args.teacher_ckpt
        )
        teacher_vars = {"params": t_restored["params"],
                        "batch_stats": t_restored.get("batch_stats", {})}
        step_fn = trainer.make_kd_train_step(
            model, model, teacher_vars, criterion, tx, donate=True
        )
    elif args.trainer == "gmatch":
        step_fn = trainer.make_gmatch_train_step(
            model, criterion, tx,
            gen_weight=hypes["loss"]["args"].get("generate_weight", 1.0),
            donate=True,
        )
    else:
        step_fn = trainer.make_train_step(
            model, criterion, tx, frozen_pred, donate=True,
            supervise_single=bool(
                hypes["model"]["args"].get("supervise_single")
            ),
        )
    eval_fn = trainer.make_eval_step(model, criterion)
    epochs = args.epochs or hypes["train_params"]["epoches"]
    eval_freq = hypes["train_params"].get("eval_freq", 1)
    # bestval must be selected on the HELD-OUT split (reference
    # train.py:169-214 validates on validate_dir), and must survive
    # auto-resume: the running best val loss is persisted next to the
    # checkpoint so a resumed run cannot overwrite a better bestval
    val_dataset = build_dataset(hypes, False, args.dataset)
    best_val = float("inf")
    best_path = os.path.join(model_dir, "bestval.json")
    if os.path.exists(best_path):
        import json as _json

        with open(best_path) as f:
            best_val = float(_json.load(f).get("val_loss", float("inf")))
    from gencomm_tpu.train.metrics import MetricsLogger

    metrics = MetricsLogger(model_dir)
    from gencomm_tpu.data.prefetch import multi_worker_iter, prefetch_iter

    for epoch in range(start_epoch, epochs):
        # host pipeline (sample/collate + C++ pillar decoration) runs off
        # the training thread — the DataLoader num_workers analog
        # (reference train.py:53-85): one producer thread by default
        # (double buffering), or --workers N forked processes sharding the
        # host work across cores (each worker draws its own seed stream,
        # exactly like torch's per-worker RNG).
        # NB device_put must stay on the main thread: concurrent transfers
        # from the producer thread deadlock the remote TPU backend.
        if args.batch_pool > 0:
            import itertools

            src_it = map(adapt,
                         batches(dataset, batch_size, epoch, args.dataset))
            pool = [next(src_it) for _ in range(args.batch_pool)]
            gen = prefetch_iter(itertools.cycle(pool))
        elif args.workers > 0:
            ep = epoch

            def _make_iter(w, _ep=ep):
                return map(adapt, batches(
                    dataset, batch_size, _ep * 100 + w, args.dataset))

            gen = multi_worker_iter(_make_iter, args.workers)
        else:
            gen = prefetch_iter(
                map(adapt, batches(dataset, batch_size, epoch, args.dataset))
            )
        # one host key per epoch; the step folds state.step in on-device
        epoch_key = jax.random.PRNGKey(epoch * 100003)
        tick, tick_it = None, 0
        for it in range(args.steps_per_epoch):
            try:
                batch = next(gen)
            except StopIteration:
                break
            state, losses = step_fn(state, batch, epoch_key)
            if it % 10 == 0:
                msg = " ".join(
                    f"{k}={float(v):.4f}" for k, v in losses.items()
                )
                # float() above synced on the step, so this wall clock
                # measures true end-to-end (data + device) throughput
                now = time.perf_counter()
                rate = ""
                if tick is not None and it > tick_it:
                    rate = f" [{(now - tick) / (it - tick_it) * 1e3:.1f} ms/step]"
                tick, tick_it = now, it
                print(f"[epoch {epoch}][{it}] {msg}{rate}", flush=True)
                metrics.log(epoch * args.steps_per_epoch + it, losses,
                            prefix="train/")
        # stop the producer before reinitialize() mutates the dataset
        gen.close()
        if hasattr(dataset, "reinitialize"):
            dataset.reinitialize()
        if (epoch + 1) % hypes["train_params"].get("save_freq", 1) == 0:
            path = checkpoint.save_checkpoint(model_dir, state, step=epoch + 1)
            print(f"saved {path}", flush=True)
        # validation + rolling bestval (reference train.py:169-214: val
        # loss each eval_freq epochs, single bestval checkpoint)
        if args.val_steps > 0 and (epoch + 1) % eval_freq == 0:
            vgen = batches(val_dataset, batch_size, 99000 + epoch % 1000,
                           args.dataset)
            vtotal, vn = 0.0, 0
            for vit in range(args.val_steps):
                try:
                    vbatch = adapt(next(vgen))
                except StopIteration:
                    break
                vlosses = eval_fn(state, vbatch,
                                  jax.random.PRNGKey(777 + vit))
                vtotal += float(vlosses["total_loss"])
                vn += 1
            if vn:
                vavg = vtotal / vn
                print(f"[epoch {epoch}] val loss {vavg:.4f}"
                      f" (best {best_val:.4f})", flush=True)
                metrics.log((epoch + 1) * args.steps_per_epoch,
                            {"total_loss": vavg}, prefix="val/")
                if vavg < best_val:
                    best_val = vavg
                    bpath = checkpoint.save_bestval(model_dir, state,
                                                    epoch + 1)
                    import json as _json

                    with open(best_path, "w") as f:
                        _json.dump({"val_loss": best_val,
                                    "epoch": epoch + 1}, f)
                    print(f"new bestval -> {bpath}", flush=True)
    checkpoint.save_checkpoint(model_dir, state, step=epochs)
    metrics.close()
    print("training done:", model_dir)
    if args.run_test:
        # reference train.py:218-230 shells out to inference.py on the
        # fresh checkpoint; we call it in-process
        from gencomm_tpu.tools import inference

        inference.main(["--model_dir", model_dir,
                        "--dataset", args.dataset, "--frames", "5"])
    return model_dir


if __name__ == "__main__":
    main()
