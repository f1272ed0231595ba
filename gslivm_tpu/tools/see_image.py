"""Depth-map viewer: colormap a saved .npy / .png depth image.

Port of `python/see_image.py` (reference): loads a depth array from .npy
(saveDepthMapAsNPY, lioOptimization.cpp:2138-2148) or an image file and
renders it through a colormap. Headless-friendly: --out saves a PNG
instead of opening a window.

Usage: python -m gslivm_tpu.tools.see_image DEPTH.npy [--out OUT.png]
       [--cmap viridis]
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def load_depth(path: str) -> np.ndarray:
    if path.endswith(".npy"):
        return np.load(path)
    if path.endswith((".png", ".jpg")):
        import cv2

        img = cv2.imread(path, cv2.IMREAD_UNCHANGED)
        if img is None:
            raise ValueError(f"could not read image {path!r}")
        return img
    raise ValueError("Invalid file format. Only .npy and .png are supported.")


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("path")
    ap.add_argument("--out", default=None,
                    help="save the colormapped PNG here instead of showing")
    ap.add_argument("--cmap", default="viridis")
    args = ap.parse_args(argv)

    depth = load_depth(args.path)
    if depth.ndim == 3:
        depth = depth[..., 0]

    import matplotlib

    if args.out or not os.environ.get("DISPLAY"):
        matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    plt.imshow(depth, cmap=args.cmap)
    plt.colorbar()
    plt.title("Depth Map")
    plt.axis("off")
    if args.out or not os.environ.get("DISPLAY"):
        out = args.out or os.path.splitext(args.path)[0] + "_viz.png"
        plt.savefig(out, bbox_inches="tight", dpi=120)
        print(f"wrote {out}")
    else:
        plt.show()


if __name__ == "__main__":
    main()
