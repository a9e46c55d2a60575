"""Training metrics: JSONL + tensorboard scalars.

Parity: the reference logs per-loss scalars through tensorboardX
SummaryWriter and a wandb-compatible shim (train.py:19-20 `swanlab as
wandb`; every criterion has a ``logging()`` that prints + writes scalars,
e.g. point_pillar_gencomm_loss.py:104-151). Here one logger owns both
sinks; the JSONL file is the always-on machine-readable record.
"""

from __future__ import annotations

import json
import os
from typing import Mapping


class MetricsLogger:
    def __init__(self, model_dir: str, use_tensorboard: bool = True):
        os.makedirs(model_dir, exist_ok=True)
        self.path = os.path.join(model_dir, "metrics.jsonl")
        self._f = open(self.path, "a")
        self.tb = None
        if use_tensorboard:
            try:
                from tensorboardX import SummaryWriter

                self.tb = SummaryWriter(os.path.join(model_dir, "tb"))
            except Exception:
                self.tb = None

    def log(self, step: int, scalars: Mapping[str, float],
            prefix: str = "") -> None:
        rec = {"step": int(step)}
        rec.update({prefix + k: float(v) for k, v in scalars.items()})
        self._f.write(json.dumps(rec) + "\n")
        self._f.flush()
        if self.tb is not None:
            for k, v in scalars.items():
                self.tb.add_scalar(prefix + k, float(v), int(step))

    def close(self) -> None:
        self._f.close()
        if self.tb is not None:
            self.tb.close()
