"""Pose-noise robustness sweep.

Parity: opencood/tools/inference_w_noise.py:66-110 — evaluate the model at
sigma_pos/sigma_rot in {0, 0.2, 0.4, 0.6} (Gaussian, optionally Laplace),
rebuilding the dataset per setting with a fixed seed; AP-vs-noise curves are
dumped per setting as eval_noise_<p>_<r>[_laplace].yaml.
"""

from __future__ import annotations

import argparse

from gencomm_tpu.tools import inference


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--model_dir", required=True)
    parser.add_argument("--dataset", default="opv2v",
                        choices=["opv2v", "v2xset", "dairv2x", "v2xsim", "v2xreal", "synthetic"])
    parser.add_argument("--frames", type=int, default=50)
    parser.add_argument("--laplace", action="store_true")
    parser.add_argument("--levels", default="0,0.2,0.4,0.6")
    args = parser.parse_args(argv)

    results = {}
    for level in [float(x) for x in args.levels.split(",")]:
        sub = [
            "--model_dir", args.model_dir,
            "--dataset", args.dataset,
            "--frames", str(args.frames),
            "--pos_std", str(level),
            "--rot_std", str(level),
            "--infer_info", f"noise_{level}"
            + ("_laplace" if args.laplace else ""),
        ]
        if args.laplace:
            sub.append("--laplace")
        results[level] = inference.main(sub)
    print("noise sweep:", {k: round(v.get("ap50", v.get("ap_50", 0.0)), 4)
                           if isinstance(v, dict) else v
                           for k, v in results.items()})
    return results


if __name__ == "__main__":
    main()
