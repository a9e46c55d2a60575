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
    path = checkpoint.latest_checkpoint(args.model_dir)
    print(path or "no checkpoints found")


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
    args = parser.parse_args(argv)
    if args.cmd == "merge":
        merge(args)
    else:
        best(args)


if __name__ == "__main__":
    main()
