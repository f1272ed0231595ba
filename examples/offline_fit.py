"""Offline map optimization benchmark (BASELINE.json config[1] shape):
N keyframes, GPR-initialized map, offline 3DGS optimization at a fixed
resolution; reports PSNR/SSIM and training throughput.

On a TPU this measures the practical mapping rate (train iterations/s and
frames/s equivalent) with the Pallas rasterizer — the number behind the
">= 30 FPS incremental optimization" north star.

Usage: python examples/offline_fit.py [--keyframes 20] [--iters 200]
           [--width 640] [--height 512] [--grid 0.1] [--cpu]
"""

from __future__ import annotations

import argparse
import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--keyframes", type=int, default=20)
    ap.add_argument("--iters", type=int, default=200)
    ap.add_argument("--width", type=int, default=640)
    ap.add_argument("--height", type=int, default=512)
    ap.add_argument("--grid", type=float, default=0.1)
    ap.add_argument("--points-per-frame", type=int, default=20000)
    ap.add_argument("--backend", default="auto")
    ap.add_argument("--max-instances", type=int, default=1 << 19)
    ap.add_argument("--capacity", type=int, default=1 << 17)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    cache = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "..", ".jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    import numpy as np

    from gslivm_tpu.config import Config, GpParams
    from gslivm_tpu.frontend import synthetic
    from gslivm_tpu.ops.rasterize import RasterizeSettings
    from gslivm_tpu.pipeline import IncrementalMapper

    cfg = Config(gp=GpParams(grid=args.grid))
    frames = synthetic.make_sequence(
        n_frames=args.keyframes, width=args.width, height=args.height,
        points_per_frame=args.points_per_frame)

    mapper = IncrementalMapper(
        config=cfg,
        settings=RasterizeSettings(backend=args.backend,
                                   max_instances=args.max_instances),
        bootstrap_points=500,
        initial_capacity=args.capacity,
    )

    t0 = time.time()
    for fr in frames:
        stats = mapper.add_frame(fr)
    t_ingest = time.time() - t0
    print(f"ingest: {stats['active']} gaussians, "
          f"{stats['voxels']['converged']} voxels, "
          f"{len(mapper.cameras)} keyframes in {t_ingest:.1f}s "
          f"({t_ingest / max(len(frames), 1) * 1e3:.0f} ms/frame)")

    # warmup/compile one step
    m = mapper.train_iteration()
    jax.block_until_ready(mapper.params.xyz)

    t0 = time.time()
    for _ in range(args.iters):
        m = mapper.train_iteration()
    jax.block_until_ready(mapper.params.xyz)
    dt = time.time() - t0
    it_per_s = args.iters / dt
    print(f"training: {args.iters} iters in {dt:.2f}s = {it_per_s:.2f} it/s "
          f"({dt / args.iters * 1e3:.1f} ms/iter) at "
          f"{args.width}x{args.height}, loss {float(m.loss):.4f} "
          f"psnr {float(m.psnr):.2f}")

    e = mapper.evaluate()
    print(f"eval over keyframes: psnr {e['mean_psnr']:.2f} "
          f"ssim {e['mean_ssim']:.3f}")

    import json

    print(json.dumps({
        "metric": "offline_mapping_iters_per_s",
        "value": round(it_per_s, 2),
        "unit": "it/s",
        "resolution": f"{args.width}x{args.height}",
        "gaussians": stats["active"],
        "mean_psnr": round(e["mean_psnr"], 2),
    }))


if __name__ == "__main__":
    main()
