"""Checkpointing and multi-stage state merging.

Reference parity:
  epoch ckpts / bestval tracking    tools/train.py:169-210
  non-strict load + key diff report tools/train_utils.py:142-216
  stage1 -> stage2 state-dict merge tools/heal_tools.py:79-105 merge_dict
                                    (union of two checkpoints, conflict
                                    report, new-agent weights preferred)

Uses orbax for on-disk format; merging operates on flattened param dicts.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Tuple

import jax
import numpy as np
import orbax.checkpoint as ocp
from flax.traverse_util import flatten_dict, unflatten_dict


def save_checkpoint(path: str, state: Any, step: int | None = None) -> str:
    path = os.path.abspath(path)
    ckpt = {
        "params": jax.device_get(state.params),
        "batch_stats": jax.device_get(state.batch_stats),
        "step": int(state.step),
    }
    ckptr = ocp.PyTreeCheckpointer()
    target = os.path.join(path, f"step_{step if step is not None else int(state.step)}")
    ckptr.save(target, ckpt, force=True)
    return target


def load_checkpoint(path: str) -> Dict[str, Any]:
    ckptr = ocp.PyTreeCheckpointer()
    return ckptr.restore(os.path.abspath(path))


def latest_checkpoint(model_dir: str) -> str | None:
    if not os.path.isdir(model_dir):
        return None
    steps = [
        (int(d.split("_")[1]), d)
        for d in os.listdir(model_dir)
        if d.startswith("step_") and d.split("_")[1].isdigit()
    ]
    if not steps:
        return None
    return os.path.join(model_dir, max(steps)[1])


def save_bestval(path: str, state: Any, epoch: int) -> str:
    """Single ROLLING bestval checkpoint (reference: one
    net_epoch_bestval_at%d.pth, stale copies deduplicated —
    train.py:190-205, train_ddp.py:258-268). The new checkpoint is written
    FIRST and stale ones removed after, so a crash mid-save never leaves
    the run without any bestval."""
    import shutil

    path = os.path.abspath(path)
    ckpt = {
        "params": jax.device_get(state.params),
        "batch_stats": jax.device_get(state.batch_stats),
        "step": int(state.step),
    }
    target = os.path.join(path, f"bestval_at_{epoch}")
    ocp.PyTreeCheckpointer().save(target, ckpt, force=True)
    for d in os.listdir(path):
        if d.startswith("bestval_at_") and \
                os.path.join(path, d) != target:
            shutil.rmtree(os.path.join(path, d), ignore_errors=True)
    return target


def bestval_checkpoint(model_dir: str) -> str | None:
    """Path of the rolling bestval checkpoint, if any (the reference's
    eval/merge tools prefer bestval over latest, heal_tools.py:12-36)."""
    if not os.path.isdir(model_dir):
        return None
    cands = [
        (int(d.rsplit("_", 1)[1]), d)
        for d in os.listdir(model_dir)
        if d.startswith("bestval_at_") and d.rsplit("_", 1)[1].isdigit()
    ]
    if not cands:
        return None
    return os.path.join(model_dir, max(cands)[1])


def diff_keys(reference: Dict, incoming: Dict) -> Tuple[set, set]:
    """(missing_in_incoming, unexpected_in_incoming) — mirrors
    train_utils.check_missing_key:142-165."""
    ref = set(flatten_dict(reference).keys())
    inc = set(flatten_dict(incoming).keys())
    return ref - inc, inc - ref


def merge_params(base: Dict, new: Dict, prefer: str = "new",
                 verbose: bool = True) -> Dict:
    """Union of two param trees (heal_tools.merge_dict parity).

    Overlapping leaves are reported; ``prefer`` selects which side wins
    ('new' matches the reference's stage-2 merge where the collab-base
    checkpoint is loaded on top of the new agent's).
    """
    bflat = flatten_dict(base)
    nflat = flatten_dict(new)
    overlap = sorted(set(bflat) & set(nflat))
    if verbose and overlap:
        n_diff = 0
        for k in overlap:
            a, b = np.asarray(bflat[k]), np.asarray(nflat[k])
            if a.shape != b.shape or not np.allclose(a, b):
                n_diff += 1
        print(
            f"[merge_params] {len(overlap)} overlapping leaves, "
            f"{n_diff} with differing values (prefer={prefer})"
        )
    out = dict(bflat)
    for k, v in nflat.items():
        if k not in out or prefer == "new":
            out[k] = v
    return unflatten_dict(out)


def load_into(params_template: Dict, restored: Dict,
              verbose: bool = True) -> Dict:
    """Non-strict restore: copy matching leaves from ``restored`` into the
    template, reporting mismatches (train_utils.load_saved_model parity)."""
    tflat = flatten_dict(params_template)
    rflat = flatten_dict(restored)
    missing, unexpected = [], []
    out = {}
    for k, v in tflat.items():
        if k in rflat and np.asarray(rflat[k]).shape == np.asarray(v).shape:
            out[k] = rflat[k]
        else:
            out[k] = v
            missing.append(k)
    unexpected = [k for k in rflat if k not in tflat]
    if verbose and (missing or unexpected):
        print(
            f"[load_into] missing {len(missing)} leaves, "
            f"unexpected {len(unexpected)} leaves"
        )
    return unflatten_dict(out)
