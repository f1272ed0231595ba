"""Where does the incremental train_iteration's wall time go?

QUALITY_r0{4,5} measure ~170 ms/iter at 960x600 while the pre-staged
1080p train step runs in ~71 ms — the loop is NOT device-bound. This tool
separates the candidates ON the real chip:

  A. bare dispatch+sync round trip (tiny op)          -> tunnel latency
  B. pre-staged train_step back-to-back (bench style) -> device time
  C. mapper.train_iteration loop (the real thing)     -> total
  D. the per-iteration input assembly alone           -> host+dispatch cost

Run ALONE on the TPU: python tools/profile_iteration.py [--iters 50]
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
    ap.add_argument("--iters", type=int, default=50)
    ap.add_argument("--width", type=int, default=960)
    ap.add_argument("--height", type=int, default=600)
    ap.add_argument("--keyframes", type=int, default=30)
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

    import jax.numpy as jnp
    import numpy as np  # noqa: F401

    from gslivm_tpu.config import Config, GpParams, GsOptimParams
    from gslivm_tpu.frontend import synthetic
    from gslivm_tpu.ops.rasterize import RasterizeSettings
    from gslivm_tpu.pipeline import IncrementalMapper

    cfg = Config(gp=GpParams(grid=args.grid),
                 gs=GsOptimParams(prune_interval=0))
    frames = synthetic.make_sequence(
        n_frames=args.keyframes, width=args.width, height=args.height,
        points_per_frame=args.points_per_frame)
    mapper = IncrementalMapper(
        config=cfg,
        settings=RasterizeSettings(backend="auto", max_instances=1 << 21),
        bootstrap_points=500, initial_capacity=1 << 17)
    t0 = time.time()
    for fr in frames:
        mapper.add_frame(fr)
    print(f"ingest {time.time()-t0:.0f}s  "
          f"n={int(mapper.params.n_active)}", flush=True)

    # warm up the train path + let the budget fit settle
    for _ in range(60):
        mapper.train_iteration()
    jax.block_until_ready(mapper.params.xyz)
    print(f"settings after fit: max_instances={mapper.settings.max_instances}"
          f" chunks={mapper.settings.max_chunks_per_tile}"
          f" grad={mapper.settings.grad_capacity}"
          f" refits={mapper.budget_refits}", flush=True)

    # A: dispatch+sync round trip
    x = jnp.zeros((8,), jnp.float32)
    f = jax.jit(lambda v: v + 1.0)
    f(x).block_until_ready()
    t0 = time.perf_counter()
    for _ in range(20):
        f(x).block_until_ready()
    print(f"A bare jit dispatch+sync: "
          f"{(time.perf_counter()-t0)/20*1e3:.2f} ms", flush=True)
    t0 = time.perf_counter()
    y = x
    for _ in range(100):
        y = f(y)
    jax.block_until_ready(y)
    print(f"A2 async dispatch (100 chained, 1 sync): "
          f"{(time.perf_counter()-t0)/100*1e3:.2f} ms/op", flush=True)

    # B: pre-staged train step back-to-back (bench methodology)
    from gslivm_tpu.models import training

    cam_idx = [0, 1, 2]
    cams = [mapper.cameras[i] for i in cam_idx][:1]
    gts = jnp.stack([mapper._gt_device[i] for i in cam_idx[:1]])
    stats = (jnp.stack([mapper._gt_stats[i][0] for i in cam_idx[:1]]),
             jnp.stack([mapper._gt_stats[i][1] for i in cam_idx[:1]]))
    simi = mapper._simi_inputs()
    p, o = mapper.params, mapper.opt_state
    p, o, m = training.train_step(p, o, cams, gts, simi,
                                  opt_params=mapper.cfg.gs,
                                  settings=mapper.settings,
                                  bg_color=mapper._bg, gt_stats=stats)
    jax.block_until_ready(p.xyz)
    t0 = time.perf_counter()
    for _ in range(args.iters):
        p, o, m = training.train_step(p, o, cams, gts, simi,
                                      opt_params=mapper.cfg.gs,
                                      settings=mapper.settings,
                                      bg_color=mapper._bg, gt_stats=stats)
    jax.block_until_ready(p.xyz)
    dt_b = (time.perf_counter() - t0) / args.iters
    print(f"B pre-staged train_step: {dt_b*1e3:.1f} ms", flush=True)

    # D: input assembly alone (what train_iteration does around the step)
    t0 = time.perf_counter()
    for _ in range(args.iters):
        curr, hist = mapper._sample_cameras()
        ci = curr + [i for pair in hist for i in pair]
        _ = [mapper.cameras[i] for i in ci]
        g = jnp.stack([mapper._gt_device[i] for i in ci])
        s = (jnp.stack([mapper._gt_stats[i][0] for i in ci]),
             jnp.stack([mapper._gt_stats[i][1] for i in ci]))
        _ = mapper._simi_inputs()
    jax.block_until_ready(g)
    print(f"D input assembly: "
          f"{(time.perf_counter()-t0)/args.iters*1e3:.1f} ms", flush=True)

    # C: the real loop
    t0 = time.perf_counter()
    for _ in range(args.iters):
        m = mapper.train_iteration()
    jax.block_until_ready(mapper.params.xyz)
    dt_c = (time.perf_counter() - t0) / args.iters
    print(f"C train_iteration: {dt_c*1e3:.1f} ms "
          f"({1.0/dt_c:.1f} iters/s)", flush=True)


if __name__ == "__main__":
    main()
