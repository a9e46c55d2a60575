"""Communication-delay robustness sweep.

Parity: opencood/tools/inference_w_delay.py:66-78 — evaluate at async
overhead in {0, 100, ..., 500} ms; non-ego agents replay stale frames
(quantized to 100 ms) while GT stays current.
"""

from __future__ import annotations

import argparse

from gencomm_tpu.tools import inference


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--model_dir", required=True)
    parser.add_argument("--dataset", default="opv2v",
                        choices=["opv2v", "v2xset", "dairv2x", "synthetic"])
    parser.add_argument("--frames", type=int, default=50)
    parser.add_argument("--delays", default="0,100,200,300,400,500")
    args = parser.parse_args(argv)

    results = {}
    for delay in [int(x) for x in args.delays.split(",")]:
        results[delay] = inference.main([
            "--model_dir", args.model_dir,
            "--dataset", args.dataset,
            "--frames", str(args.frames),
            "--delay", str(delay),
            "--infer_info", f"delay_{delay}ms",
        ])
    print("delay sweep keys:", sorted(results))
    return results


if __name__ == "__main__":
    main()
