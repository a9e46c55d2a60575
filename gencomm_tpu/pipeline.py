"""End-to-end inference pipeline: model forward -> decode -> NMS -> AP eval.

Mirrors opencood/tools/inference.py + inference_utils.py:123-174
(inference_intermediate_fusion) with the whole device path under one jit:
features, generation, fusion, heads, box decode and rotated NMS all stay
on-chip; only the final fixed-size detection buffers come back to host for
AP accounting.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Dict

import numpy as np
import jax
import jax.numpy as jnp

from gencomm_tpu.data.postprocessor import decode_and_nms, Detections
from gencomm_tpu.utils import eval_utils


class InferencePipeline:
    def __init__(self, model, variables, anchors: np.ndarray,
                 postprocess_cfg: Dict[str, Any]):
        self.model = model
        self.variables = variables
        self.anchors = jnp.asarray(anchors)
        pp = postprocess_cfg
        self.gt_range = tuple(pp["gt_range"])
        self.score_threshold = pp["target_args"]["score_threshold"]
        self.nms_thresh = pp["nms_thresh"]
        self.dir_offset = pp["dir_args"]["dir_offset"]
        self.num_bins = pp["dir_args"]["num_bins"]
        self.topk = pp.get("nms_topk", 512)

        @jax.jit
        def _run(variables, batch, rng):
            out = self.model.apply(
                variables, batch, train=False,
                rngs={"diffusion": rng, "dropout": jax.random.fold_in(rng, 7)},
            )
            dets = jax.vmap(
                lambda c, r, d: decode_and_nms(
                    c, r, d, self.anchors, jnp.eye(4), self.gt_range,
                    score_threshold=self.score_threshold,
                    nms_thresh=self.nms_thresh,
                    topk=self.topk,
                    dir_offset=self.dir_offset,
                    num_bins=self.num_bins,
                )
            )(out["cls_preds"], out["reg_preds"], out["dir_preds"])
            return dets

        self._run = _run

    def run(self, batch: Dict[str, jnp.ndarray], seed: int = 0) -> Detections:
        return self._run(self.variables, batch, jax.random.PRNGKey(seed))

    def evaluate(self, scenes, n_frames: int = 10, batch_size: int = 1,
                 seed0: int = 100) -> Dict[str, float]:
        """AP over synthetic frames (both per-frame and global-sort variants
        are available from the same stats, eval_utils parity)."""
        stat = eval_utils.new_result_stat()
        for f in range(n_frames):
            host = scenes.sample(seed0 + f, batch_size)
            batch = {k: jnp.asarray(v) for k, v in host.items()}
            dets = self.run(batch, seed=f)
            for b in range(batch_size):
                valid = np.asarray(dets.valid[b])
                corners = np.asarray(dets.corners3d[b])[valid]
                scores = np.asarray(dets.scores[b])[valid]
                gt = scenes.gt_corners(host, b)
                for t in (0.3, 0.5, 0.7):
                    eval_utils.calculate_tp_fp(corners, scores, gt, stat, t)
        return eval_utils.eval_final_results(stat)
