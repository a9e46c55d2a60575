"""Dynamic heterogeneous evaluation: agents join in order.

Parity: opencood/tools/inference_heter_in_order.py — evaluate the same
model with an increasing number of collaborators (ego-only -> +1 -> ...),
producing the AP-vs-agent-count curve. The reference's lidar-degrade flag
maps to the heter lidar_channels_dict (OPV2V-H 32/16-beam swap in the
loader).
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
    parser.add_argument("--max_cav", type=int, default=5)
    args = parser.parse_args(argv)

    results = {}
    for k in range(1, args.max_cav + 1):
        results[k] = inference.main([
            "--model_dir", args.model_dir,
            "--dataset", args.dataset,
            "--frames", str(args.frames),
            "--use_cav", str(k),
            "--infer_info", f"in_order_{k}cav",
        ])
    print("agents -> result keys:", sorted(results))
    return results


if __name__ == "__main__":
    main()
