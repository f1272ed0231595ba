"""Phase profile of IncrementalMapper.add_frame (gsPointCloudUpdate analog).

QUALITY_r05 measures ~19 s/frame of ingest at 960x600/30k points — far
from the reference's real-time front-end. This cuts one frame into:

  divide   GpMap.divide_points (host voxel bookkeeping + PCA)
  gp       gp3d.gp_forward dispatch + result reads (device)
  color    deferred-pool colorize + host insertion assembly
  append   ensure_capacity/append_points/registry
  stage    keyframe staging (GT device_put + SSIM stats)

Run ALONE on the TPU: python tools/profile_ingest.py [--frames 10]
"""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=10)
    ap.add_argument("--width", type=int, default=960)
    ap.add_argument("--height", type=int, default=600)
    ap.add_argument("--points-per-frame", type=int, default=30000)
    ap.add_argument("--grid", type=float, default=0.12)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    cache = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "..", ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import numpy as np

    from gslivm_tpu.config import Config, GpParams
    from gslivm_tpu.frontend import synthetic
    from gslivm_tpu.ops import gp3d
    from gslivm_tpu.ops.rasterize import RasterizeSettings
    from gslivm_tpu.pipeline import IncrementalMapper

    t0 = time.time()
    frames = synthetic.make_sequence(
        n_frames=args.frames, width=args.width, height=args.height,
        points_per_frame=args.points_per_frame)
    print(f"scene gen: {time.time()-t0:.1f}s", flush=True)

    cfg = Config(gp=GpParams(grid=args.grid))
    mapper = IncrementalMapper(
        config=cfg, settings=RasterizeSettings(backend="auto"),
        bootstrap_points=500, initial_capacity=1 << 17)

    # monkey-patch timers around the phases by instrumenting the module fns
    import gslivm_tpu.pipeline as P

    acc = {"divide": 0.0, "gp": 0.0, "other": 0.0, "total": 0.0}
    orig_divide = mapper.gpmap.divide_points
    orig_gp = gp3d.gp_forward

    def timed(name, fn):
        def wrap(*a, **k):
            t = time.perf_counter()
            out = fn(*a, **k)
            acc[name] += time.perf_counter() - t
            return out
        return wrap

    mapper.gpmap.divide_points = timed("divide", orig_divide)
    P.gp3d.gp_forward = timed("gp", orig_gp)

    per_frame = []
    for i, fr in enumerate(frames):
        t = time.perf_counter()
        stats = mapper.add_frame(fr)
        dt = time.perf_counter() - t
        per_frame.append(dt)
        print(f"frame {i}: {dt*1e3:.0f} ms  inserted {stats['inserted']} "
              f"pending {stats['pending_color']} "
              f"active {stats['active']}", flush=True)
    acc["total"] = sum(per_frame)
    acc["other"] = acc["total"] - acc["divide"] - acc["gp"]
    print({k: round(v, 2) for k, v in acc.items()}, flush=True)
    P.gp3d.gp_forward = orig_gp


if __name__ == "__main__":
    main()
