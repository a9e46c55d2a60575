"""Agent-slot bucketing: trim padded (B, L, ...) arrays to a bucket size.

The reference concatenates exactly the real agents of each sample
(record_len layout); our static-shape layout pads every batch to
``max_cav`` slots, which makes the encoder/backbone pay for empty slots —
over half the compute on typical 2-3-agent OPV2V frames. Bucketing keeps
shapes static per bucket (one XLA compilation per bucket, standard
practice) while skipping the dead slots.
"""

from __future__ import annotations

from typing import Dict, Sequence

import numpy as np


def trim_agent_slots(batch: Dict[str, np.ndarray],
                     buckets: Sequence[int] = (2, 3, 5),
                     max_cav: int | None = None) -> Dict[str, np.ndarray]:
    """Slice every agent-axis array down to the smallest bucket that holds
    all valid agents in the batch.

    Arrays with shape[1] == L (the padded agent axis) are sliced; the
    pairwise transform (B, L, L, 4, 4) is sliced on both agent axes.
    """
    amask = np.asarray(batch["agent_mask"])
    b, l = amask.shape
    if max_cav is None:
        max_cav = l
    # number of used slots = highest valid index + 1 (ego is slot 0)
    used = 0
    for i in range(b):
        idx = np.nonzero(amask[i])[0]
        if len(idx):
            used = max(used, int(idx[-1]) + 1)
    used = max(used, 1)
    target = next((k for k in sorted(buckets) if k >= used), max_cav)
    target = min(target, l)
    if target == l:
        return batch

    out = {}
    for k, v in batch.items():
        a = np.asarray(v)
        if a.ndim >= 2 and a.shape[0] == b and a.shape[1] == l:
            a = a[:, :target]
            if a.ndim >= 3 and a.shape[2] == l and k == "pairwise_t_matrix":
                a = a[:, :, :target]
            out[k] = a
        else:
            out[k] = v
    return out


def ego_only_batch(batch: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """Restrict a padded (B, L, ...) batch to the ego slot (L=1).

    Late/no-fusion training treats each sample as ONE agent with labels in
    its own frame (reference late_fusion_dataset.py: every CAV is its own
    sample); ego-slot training is the static-shape equivalent — per-slot
    models then see leading dim B*1 == B, matching the (B, ...) labels.
    """
    amask = np.asarray(batch["agent_mask"])
    b, l = amask.shape
    out = {}
    for k, v in batch.items():
        a = np.asarray(v)
        if a.ndim >= 2 and a.shape[0] == b and a.shape[1] == l:
            a = a[:, :1]
            if a.ndim >= 3 and a.shape[2] == l and k == "pairwise_t_matrix":
                a = a[:, :, :1]
            out[k] = a
        else:
            out[k] = v
    return out


def per_agent_label_batch(batch: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """Use per-agent labels for per-slot models: every agent becomes a
    training sample (the reference's late-fusion / 2-stage training
    distribution). Replaces the ego-frame label arrays with the flattened
    (B*L, ...) per-agent ones; falls back to the ego slot when the loader
    didn't produce per-agent labels.
    """
    if "pos_equal_one_single" not in batch:
        return ego_only_batch(batch)
    out = dict(batch)
    for k in ("pos_equal_one", "neg_equal_one", "targets"):
        s = np.asarray(batch[f"{k}_single"])
        out[k] = s.reshape((-1,) + s.shape[2:])
    return out
