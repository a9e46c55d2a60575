"""Checkpoint surgery for the multi-stage hetero protocol.

Parity: opencood/tools/heal_tools.py — merge a new agent type's stage-1
checkpoint with the collaboration base's checkpoint into a stage-2 starting
point (merge_and_save / merge_dict:79-105), with conflict reporting.

Usage:
  python -m gencomm_tpu.tools.heal_tools merge \
      --new_ckpt <stage1-new-agent dir> --base_ckpt <collab base dir> \
      --out <stage2 model dir>
  python -m gencomm_tpu.tools.heal_tools best --model_dir <dir>
"""

from __future__ import annotations

import argparse
import os

from gencomm_tpu.train import checkpoint


def merge(args):
    new = checkpoint.load_checkpoint(
        checkpoint.latest_checkpoint(args.new_ckpt) or args.new_ckpt
    )
    base = checkpoint.load_checkpoint(
        checkpoint.latest_checkpoint(args.base_ckpt) or args.base_ckpt
    )
    # union of both; on conflicts the collaboration base's weights win by
    # default (its fusion / heads / gencomm stay authoritative,
    # heal_tools.py:79-105). merge_params(a, b, prefer="new") lets b win.
    if args.prefer_new_agent:
        first, second = base, new
    else:
        first, second = new, base
    merged_params = checkpoint.merge_params(
        first["params"], second["params"], prefer="new"
    )
    merged_stats = checkpoint.merge_params(
        first.get("batch_stats", {}), second.get("batch_stats", {}),
        prefer="new", verbose=False,
    )

    os.makedirs(args.out, exist_ok=True)
    import orbax.checkpoint as ocp

    ckptr = ocp.PyTreeCheckpointer()
    target = os.path.join(os.path.abspath(args.out), "step_0")
    ckptr.save(target, {"params": merged_params,
                        "batch_stats": merged_stats, "step": 0}, force=True)
    print("merged checkpoint written to", target)


def best(args):
    # prefer the rolling bestval checkpoint, fall back to latest
    # (reference heal_tools.find_best_checkpoint:12-36)
    path = (checkpoint.bestval_checkpoint(args.model_dir)
            or checkpoint.latest_checkpoint(args.model_dir))
    print(path or "no checkpoints found")
    return path


def clean(args):
    """Remove intermediate epoch checkpoints, keeping the first, the
    latest, and bestval (reference utils/cleanup_utils.py:
    clean_all_numeric_checkpoint, applied to a dir or its subdirs)."""
    import shutil

    def clean_one(d):
        steps = sorted(
            (int(name.split("_")[1]), name)
            for name in os.listdir(d)
            if name.startswith("step_") and name.split("_")[1].isdigit()
        )
        for _, name in steps[1:-1]:
            shutil.rmtree(os.path.join(d, name), ignore_errors=True)
            print("removed", os.path.join(d, name))

    root = args.path
    clean_one(root)
    for sub in os.listdir(root):
        p = os.path.join(root, sub)
        if os.path.isdir(p) and not sub.startswith(("step_", "bestval_")):
            clean_one(p)


def _save(out_dir, params, stats, step=0):
    import orbax.checkpoint as ocp

    os.makedirs(out_dir, exist_ok=True)
    target = os.path.join(os.path.abspath(out_dir), f"step_{step}")
    ocp.PyTreeCheckpointer().save(
        target, {"params": params, "batch_stats": stats, "step": step},
        force=True,
    )
    return target


def _map_keys(tree: dict, fn, prefix=()):
    """Apply fn(path_tuple) -> new_top_key|None over a nested param dict's
    TOP-level module names (the unit the reference's stamp_tools renames)."""
    out = {}
    for k, v in tree.items():
        nk = fn(k)
        if nk is None:
            continue
        out[nk] = v
    return out


def rename(args):
    """Rename top-level modules via old=new pairs
    (stamp_tools.rename_to_new_version:39-57 analog)."""
    ck = checkpoint.load_checkpoint(
        checkpoint.latest_checkpoint(args.ckpt) or args.ckpt
    )
    mapping = dict(pair.split("=", 1) for pair in args.map)

    def fn(k):
        return mapping.get(k, k)

    params = _map_keys(ck["params"], fn)
    stats = _map_keys(ck.get("batch_stats", {}), fn)
    print("renamed:", mapping)
    print("written to", _save(args.out, params, stats))


def remove(args):
    """Drop modules by prefix (stamp_tools.remove_m4_trunk:59-77 analog)."""
    ck = checkpoint.load_checkpoint(
        checkpoint.latest_checkpoint(args.ckpt) or args.ckpt
    )

    def fn(k):
        return None if any(k.startswith(p) for p in args.prefix) else k

    params = _map_keys(ck["params"], fn)
    stats = _map_keys(ck.get("batch_stats", {}), fn)
    dropped = sorted(set(ck["params"]) - set(params))
    print("dropped modules:", dropped)
    print("written to", _save(args.out, params, stats))


def merge_final(args):
    """Union-merge several aligned model dirs, later dirs win on conflicts
    (stamp_tools.merge_and_save_final:269+ analog)."""
    merged_p, merged_s = {}, {}
    for d in args.ckpts:
        ck = checkpoint.load_checkpoint(
            checkpoint.latest_checkpoint(d) or d
        )
        merged_p = checkpoint.merge_params(merged_p, ck["params"],
                                           prefer="new")
        merged_s = checkpoint.merge_params(
            merged_s, ck.get("batch_stats", {}), prefer="new", verbose=False
        )
    print("written to", _save(args.out, merged_p, merged_s))


def main(argv=None):
    parser = argparse.ArgumentParser()
    sub = parser.add_subparsers(dest="cmd", required=True)
    m = sub.add_parser("merge")
    m.add_argument("--new_ckpt", required=True,
                   help="stage-1 checkpoint of the NEW agent type")
    m.add_argument("--base_ckpt", required=True,
                   help="checkpoint of the collaboration base")
    m.add_argument("--out", required=True)
    m.add_argument("--prefer_new_agent", action="store_true",
                   help="on conflicts keep the new agent's weights instead "
                        "of the collab base's")
    b = sub.add_parser("best")
    b.add_argument("--model_dir", required=True)
    r = sub.add_parser("rename")
    r.add_argument("--ckpt", required=True)
    r.add_argument("--out", required=True)
    r.add_argument("--map", nargs="+", required=True,
                   help="old=new module-name pairs")
    rm = sub.add_parser("remove")
    rm.add_argument("--ckpt", required=True)
    rm.add_argument("--out", required=True)
    rm.add_argument("--prefix", nargs="+", required=True)
    mf = sub.add_parser("merge-final")
    mf.add_argument("--ckpts", nargs="+", required=True)
    mf.add_argument("--out", required=True)
    cl = sub.add_parser(
        "clean", help="remove all intermediate epoch checkpoints except the "
                      "first, the latest, and bestval (reference "
                      "utils/cleanup_utils.py)")
    cl.add_argument("--path", required=True,
                    help="log dir (or a dir of log dirs) to clean")
    args = parser.parse_args(argv)
    {"merge": merge, "best": best, "rename": rename, "remove": remove,
     "merge-final": merge_final, "clean": clean}[args.cmd](args)


if __name__ == "__main__":
    main()
