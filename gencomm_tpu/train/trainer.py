"""Training loop machinery: optax optimizer/schedule from hypes, the jitted
train step, parameter freezing for the multi-stage hetero protocol, and data
parallelism over a device mesh.

Reference parity:
  setup_optimizer / setup_lr_schedular   tools/train_utils.py:327-388
  stage-2 freezing                       heter_model_baseline_w_gencomm_stage2
                                         .py:45-101 (frozen modules listed by
                                         name-prefix; only the new agent's
                                         message extractor trains)
  DDP data parallel                      tools/train_ddp.py:120-125 -> here a
                                         jax.sharding Mesh with the batch axis
                                         sharded over 'data'; gradient
                                         all-reduce is inserted by XLA.
"""

from __future__ import annotations

import os
import re

from functools import partial
from typing import Any, Callable, Dict, Iterable, Sequence

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct
from flax.traverse_util import flatten_dict, unflatten_dict


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any


def make_lr_schedule(hypes: dict, steps_per_epoch: int = 1):
    cfg = hypes.get("lr_scheduler", {"core_method": "constant"})
    base_lr = hypes.get("optimizer", {}).get("lr", 1e-3)
    method = cfg.get("core_method", "constant")
    if method == "multistep":
        bounds = {
            int(e * steps_per_epoch): cfg["gamma"] for e in cfg["step_size"]
        }
        return optax.piecewise_constant_schedule(base_lr, bounds)
    if method == "step":
        return optax.exponential_decay(
            base_lr,
            transition_steps=int(cfg["step_size"] * steps_per_epoch),
            decay_rate=cfg["gamma"],
            staircase=True,
        )
    if method == "exponential":
        return optax.exponential_decay(
            base_lr, transition_steps=steps_per_epoch, decay_rate=cfg["gamma"]
        )
    return optax.constant_schedule(base_lr)


def make_optimizer(hypes: dict, steps_per_epoch: int = 1,
                   frozen_predicate: Callable[[tuple], bool] | None = None):
    """Adam(W) from the hypes optimizer block; optionally zero out updates
    for params whose flattened path satisfies ``frozen_predicate``."""
    opt_cfg = hypes.get("optimizer", {"core_method": "Adam", "lr": 1e-3})
    schedule = make_lr_schedule(hypes, steps_per_epoch)
    args = opt_cfg.get("args", {})
    wd = args.get("weight_decay", 0.0)
    eps = float(args.get("eps", 1e-8))
    if wd:
        tx = optax.adamw(schedule, eps=eps, weight_decay=wd)
    else:
        tx = optax.adam(schedule, eps=eps)

    if frozen_predicate is not None:
        def label_fn(params):
            flat = flatten_dict(params)
            labels = {
                k: ("frozen" if frozen_predicate(k) else "trainable")
                for k in flat
            }
            return unflatten_dict(labels)

        tx = optax.multi_transform(
            {"trainable": tx, "frozen": optax.set_to_zero()}, label_fn
        )
    return tx


def freeze_by_prefixes(prefixes: Sequence[str]) -> Callable[[tuple], bool]:
    """Predicate matching flax param paths whose first component starts with
    any prefix — mirrors the reference's module-name freezing
    (e.g. ['gencomm', 'heads', 'fusion_net', 'branch_m1'])."""

    def pred(path: tuple) -> bool:
        return any(str(path[0]).startswith(p) for p in prefixes)

    return pred


def freeze_all_except(trainable_prefixes: Sequence[str]) -> Callable[[tuple], bool]:
    """Inverse of freeze_by_prefixes: everything is frozen unless the param
    path's first component starts with a trainable prefix."""

    def pred(path: tuple) -> bool:
        return not any(
            str(path[0]).startswith(p) for p in trainable_prefixes
        )

    return pred


def stage2_trainable_prefixes(hypes: dict) -> list[str]:
    """GenComm stage-2 freeze schedule: only the NEW (non-ego) agents'
    message extractors train (reference
    heter_model_baseline_w_gencomm_stage2.py:45-101,
    model_train_init_stage2:180-185)."""
    args = hypes["model"]["args"]
    ego = str(args.get("ego_modality", "m1"))
    mods = [k for k in args if k.startswith("m") and k[1:].isdigit()]
    return [f"message_extractor_{m}" for m in mods if m not in ego]


def freeze_exact(names: Sequence[str]) -> Callable[[tuple], bool]:
    """Predicate freezing params whose top-level module name equals one of
    ``names`` exactly (so 'heads' does not catch 'heads_single')."""
    nameset = set(names)

    def pred(path: tuple) -> bool:
        return str(path[0]) in nameset

    return pred


def backalign_frozen_modules(hypes: dict) -> list[str]:
    """HEAL BackAlign freeze schedule: fusion, shared heads and the EGO
    modality's whole branch are fixed; the new agents' branches train to
    align backwards (heter_model_baseline_w_backalign.py:35,80-83,160-165).
    """
    args = hypes["model"]["args"]
    ego = str(args.get("ego_modality", "m1"))
    return ["fusion_net", "heads", f"branch_{ego}"]


def restore_frozen_batch_stats(new_stats, old_stats,
                               frozen_predicate: Callable[[tuple], bool]):
    """Keep frozen modules' BN statistics fixed (reference ``fix_bn``
    semantics, utils/model_utils.py)."""
    new_flat = flatten_dict(new_stats)
    old_flat = flatten_dict(old_stats)
    out = {
        k: (old_flat[k] if frozen_predicate(k) and k in old_flat else v)
        for k, v in new_flat.items()
    }
    return unflatten_dict(out)


_INIT_CACHE_DIR = os.environ.get(
    "GENCOMM_INIT_CACHE", os.path.join(os.path.dirname(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
        ".init_cache")
)


def _init_cache_key(model, batch, rng, train: bool) -> str:
    """Deterministic key for cached init variables: model hyperparams
    (flax dataclass repr, object addresses stripped), batch structure
    (names/shapes/dtypes — param shapes depend only on these), the seed,
    and a content hash of the model source tree (guards against stale
    caches after code edits)."""
    import hashlib

    h = hashlib.sha256()
    h.update(re.sub(r"0x[0-9a-f]+", "", repr(model)).encode())
    for k in sorted(batch):
        v = np.asarray(batch[k])
        h.update(f"{k}:{v.shape}:{v.dtype};".encode())
    try:
        key_bits = np.asarray(rng)  # raw uint32 key array
    except TypeError:
        key_bits = np.asarray(jax.random.key_data(rng))
    h.update(key_bits.tobytes())
    h.update(str(train).encode())
    src_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "models")
    for root, _, files in sorted(os.walk(src_dir)):
        for f in sorted(files):
            if f.endswith(".py"):
                with open(os.path.join(root, f), "rb") as fh:
                    h.update(fh.read())
    return h.hexdigest()


def cpu_init(model, batch, rng, train: bool = True, use_cache: bool = True):
    """Initialize model variables on the CPU backend and return host trees.

    Compiling the init graph on the TPU backend is pathologically slow for
    scatter-heavy graphs (observed 300+ s vs 55 s on CPU for the flagship
    pillar encoder); parameters are shape-only, so init on CPU + transfer.
    The result is also cached on disk (keyed on config + batch shapes +
    seed + model source hash): init values are deterministic, and even the
    CPU-side XLA compile of the full init graph costs minutes per process.
    """
    from flax.traverse_util import flatten_dict as _flat
    from flax.traverse_util import unflatten_dict as _unflat

    if use_cache:
        key = _init_cache_key(model, batch, rng, train)
        path = os.path.join(_INIT_CACHE_DIR, f"init_{key}.npz")
        if os.path.exists(path):
            with np.load(path, allow_pickle=False) as z:
                flat = {tuple(k.split("//")): z[k] for k in z.files}
            cols = sorted({k[0] for k in flat})
            return {c: _unflat({k[1:]: v for k, v in flat.items()
                                if k[0] == c}) for c in cols}

    rngs = {
        "params": rng,
        "diffusion": jax.random.fold_in(rng, 1),
        "dropout": jax.random.fold_in(rng, 2),
    }
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        host_batch = jax.tree_util.tree_map(
            lambda x: jax.device_put(np.asarray(x), cpu), batch
        )
        variables = jax.jit(
            lambda b: model.init(rngs, b, train=train)
        )(host_batch)
    variables = jax.device_get(variables)

    if use_cache:
        os.makedirs(_INIT_CACHE_DIR, exist_ok=True)
        flat = {}
        for col, tree in variables.items():
            for k, v in _flat(tree).items():
                flat["//".join((col,) + k)] = np.asarray(v)
        tmp = path + f".tmp{os.getpid()}.npz"  # np.savez appends .npz
        np.savez(tmp, **flat)
        os.replace(tmp, path)
    return variables


def create_train_state(model, batch, rng, tx) -> TrainState:
    variables = cpu_init(model, batch, rng, train=True)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=batch_stats,
        opt_state=tx.init(params),
    )


def make_train_step(model, criterion, tx,
                    frozen_predicate: Callable[[tuple], bool] | None = None,
                    donate: bool = False,
                    supervise_single: bool = False):
    """Returns jitted (state, batch, rng) -> (state, metrics).

    ``donate=True`` donates the input TrainState buffers to the update
    (in-place params/opt-state on TPU — avoids a full copy of params +
    Adam moments every step). Callers must not touch the old state after
    stepping; the test suite reuses fixture states, so donation is opt-in
    and enabled on the performance paths (tools/train.py, tools/profiler.py).
    """

    def train_step(state: TrainState, batch: Dict[str, jnp.ndarray], rng):
        # fold the step counter in on-device so callers can pass one base
        # key for the whole run instead of building a fresh host PRNGKey
        # per step (each host key is a round trip on remote backends)
        rng = jax.random.fold_in(rng, state.step)
        rngs = {
            "diffusion": jax.random.fold_in(rng, 0),
            "dropout": jax.random.fold_in(rng, 1),
        }

        def loss_fn(params):
            out, mutated = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                batch,
                train=True,
                mutable=["batch_stats"],
                rngs=rngs,
            )
            losses = criterion(out, batch)
            if supervise_single:
                # second criterion pass over per-agent head maps
                # (reference train.py:152-158 with label_dict_single)
                single = criterion(out, batch, suffix="_single")
                losses = dict(
                    losses,
                    **{(k if k not in losses else f"{k}_single"): v
                       for k, v in single.items() if k != "total_loss"},
                )
                losses["total_loss"] = (
                    losses["total_loss"] + single["total_loss"]
                )
            return losses["total_loss"], (losses, mutated["batch_stats"])

        grads, (losses, new_stats) = jax.grad(loss_fn, has_aux=True)(state.params)
        updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        if frozen_predicate is not None:
            new_stats = restore_frozen_batch_stats(
                new_stats, state.batch_stats, frozen_predicate
            )
        new_state = state.replace(
            step=state.step + 1,
            params=new_params,
            batch_stats=new_stats,
            opt_state=new_opt_state,
        )
        return new_state, losses

    return jax.jit(train_step, donate_argnums=(0,) if donate else ())


def refresh_batch_stats(model, state: TrainState, batches: Iterable,
                        rng, momentum: float = 0.99) -> TrainState:
    """Replace BatchNorm running averages with the data's true statistics
    — the JAX analog of precise-BN / the reference's ``fix_bn``
    recalibration (utils/model_utils.py). With flax momentum 0.99, short
    smoke runs leave running stats far from the batch statistics (0.99^300
    still carries a 5% residual of init — enough to wreck box decoding),
    so eval-mode predictions diverge from train-mode even on a fully
    overfit batch. One mutable forward yields ra' = m*ra + (1-m)*b per
    layer, so the exact per-batch statistics are recovered by
    extrapolation b = (ra' - m*ra)/(1-m) and averaged over ``batches``.
    All BN layers in this repo use momentum 0.99."""
    fwd = jax.jit(partial(
        model.apply, train=True, mutable=["batch_stats"]))
    stats = state.batch_stats
    batches = list(batches)
    acc = None
    for i, batch in enumerate(batches):
        r = jax.random.fold_in(rng, i)
        _, mut = fwd(
            {"params": state.params, "batch_stats": stats}, batch,
            rngs={"dropout": jax.random.fold_in(r, 1),
                  "diffusion": jax.random.fold_in(r, 0)},
        )
        exact = jax.tree_util.tree_map(
            lambda new, old: (new - momentum * old) / (1.0 - momentum),
            mut["batch_stats"], stats,
        )
        acc = exact if acc is None else jax.tree_util.tree_map(
            jnp.add, acc, exact)
    acc = jax.tree_util.tree_map(lambda x: x / len(batches), acc)
    return state.replace(batch_stats=acc)


def make_eval_step(model, criterion):
    """Jitted (state, batch, rng) -> losses dict, no grad/update — the val
    half of the reference's epoch loop (train.py:169-214 bestval
    tracking)."""

    def eval_step(state: TrainState, batch: Dict[str, jnp.ndarray], rng):
        rngs = {
            "diffusion": jax.random.fold_in(rng, 0),
            "dropout": jax.random.fold_in(rng, 1),
        }
        out = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            batch, train=False, rngs=rngs,
        )
        return criterion(out, batch)

    return jax.jit(eval_step)


def make_kd_train_step(student, teacher, teacher_vars, criterion, tx,
                       feature_key: str = "feature",
                       donate: bool = False):
    """DiscoNet knowledge distillation (tools/train_w_kd.py): the frozen
    teacher's features are injected into the student's outputs for the
    KD criterion (point_pillar_disconet_loss). ``feature_key`` names the
    distilled tensor in the model outputs — "feature" is the fused BEV
    map every HeterModel emits (reference point_pillar_disconet.py)."""

    def train_step(state: TrainState, batch, rng):
        rng = jax.random.fold_in(rng, state.step)
        rngs = {"diffusion": jax.random.fold_in(rng, 0),
                "dropout": jax.random.fold_in(rng, 1)}
        t_out = teacher.apply(teacher_vars, batch, train=False, rngs=rngs)
        teacher_feature = jax.lax.stop_gradient(t_out[feature_key])

        def loss_fn(params):
            out, mutated = student.apply(
                {"params": params, "batch_stats": state.batch_stats},
                batch, train=True, mutable=["batch_stats"], rngs=rngs,
            )
            out = dict(out)
            out["teacher_feature"] = teacher_feature
            out["student_feature"] = out[feature_key]
            losses = criterion(out, batch)
            return losses["total_loss"], (losses, mutated["batch_stats"])

        grads, (losses, new_stats) = jax.grad(
            loss_fn, has_aux=True
        )(state.params)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        return state.replace(
            step=state.step + 1,
            params=optax.apply_updates(state.params, updates),
            batch_stats=new_stats, opt_state=new_opt,
        ), losses

    return jax.jit(train_step, donate_argnums=(0,) if donate else ())


def make_gmatch_train_step(model, criterion, tx, gen_weight: float = 1.0,
                           donate: bool = False):
    """GenComm gradient-matching ablation (tools/train_gmatch.py:150-160):
    final = loss_S + sum MSE(grad loss_S, grad loss_T) + w * gen_loss,
    differentiated end-to-end (second-order via jax.grad-of-grad)."""

    def train_step(state: TrainState, batch, rng):
        rng = jax.random.fold_in(rng, state.step)
        rngs = {"diffusion": jax.random.fold_in(rng, 0),
                "dropout": jax.random.fold_in(rng, 1)}

        def losses_of(params):
            out, mutated = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                batch, train=True, mutable=["batch_stats"], rngs=rngs,
            )
            return criterion(out, batch), mutated["batch_stats"]

        def final_loss(params):
            losses, stats = losses_of(params)
            g_s = jax.grad(lambda p: losses_of(p)[0]["loss_S"])(params)
            g_t = jax.grad(lambda p: losses_of(p)[0]["loss_T"])(params)
            gm = sum(
                jnp.mean((a - b) ** 2)
                for a, b in zip(jax.tree_util.tree_leaves(g_s),
                                jax.tree_util.tree_leaves(g_t))
            )
            total = (losses["loss_S"] + gm
                     + gen_weight * losses["gen_loss"])
            losses = dict(losses, grad_match_loss=gm, total_loss=total)
            return total, (losses, stats)

        grads, (losses, new_stats) = jax.grad(
            final_loss, has_aux=True
        )(state.params)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        return state.replace(
            step=state.step + 1,
            params=optax.apply_updates(state.params, updates),
            batch_stats=new_stats, opt_state=new_opt,
        ), losses

    return jax.jit(train_step, donate_argnums=(0,) if donate else ())


def shard_batch(batch: Dict[str, np.ndarray], mesh) -> Dict[str, jax.Array]:
    """Place a host batch onto the mesh, sharded along the leading (batch)
    axis of every array."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    sharding = NamedSharding(mesh, P("data"))
    return {
        k: jax.device_put(v, sharding) for k, v in batch.items()
    }


def replicate_state(state: TrainState, mesh) -> TrainState:
    from jax.sharding import NamedSharding, PartitionSpec as P

    rep = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, rep), state)
