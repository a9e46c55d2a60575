"""Pack OPV2V camera PNGs into per-frame ``imgs.hdf5`` files.

Parity: opencood/utils/img2hdf5.py — the reference's dataset-preparation
step that bundles camera0..3 png files per timestamp into one hdf5 so the
loader can read them in a single call (opv2v_basedataset.py:280-404 prefers
hdf5 when present).

Usage: python -m gencomm_tpu.tools.img2hdf5 --root dataset/OPV2V/train
"""

from __future__ import annotations

import argparse
import glob
import os

import numpy as np


def pack_scenario(cav_dir: str, cameras=(0, 1, 2, 3),
                  overwrite: bool = False) -> int:
    """Bundle every timestamp's camera pngs in one CAV directory."""
    import h5py
    from PIL import Image

    stamps = sorted({
        os.path.basename(p).split("_")[0]
        for p in glob.glob(os.path.join(cav_dir, "*_camera0.png"))
    })
    n = 0
    for ts in stamps:
        out = os.path.join(cav_dir, f"{ts}_imgs.hdf5")
        if os.path.exists(out) and not overwrite:
            continue
        with h5py.File(out, "w") as f:
            for cam in cameras:
                png = os.path.join(cav_dir, f"{ts}_camera{cam}.png")
                if not os.path.exists(png):
                    continue
                arr = np.asarray(Image.open(png))
                f.create_dataset(f"camera{cam}", data=arr,
                                 compression="gzip", compression_opts=4)
        n += 1
    return n


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", required=True,
                    help="OPV2V split dir (scenario/cav/timestamps)")
    ap.add_argument("--overwrite", action="store_true")
    args = ap.parse_args(argv)
    total = 0
    for scenario in sorted(os.listdir(args.root)):
        sdir = os.path.join(args.root, scenario)
        if not os.path.isdir(sdir):
            continue
        for cav in sorted(os.listdir(sdir)):
            cdir = os.path.join(sdir, cav)
            if os.path.isdir(cdir):
                total += pack_scenario(cdir, overwrite=args.overwrite)
    print(f"packed {total} frames")


if __name__ == "__main__":
    main()
