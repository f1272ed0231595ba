"""Multi-chip scaling-efficiency harness (BASELINE configs[4]).

Measures the sharded train step (parallel/sharding.sharded_train_step) at
increasing mesh sizes and reports rays/s plus scaling efficiency vs the
1-device run, for both gauss-axis strategies. On a real pod slice this is
the scaling benchmark; on a single host it runs over the virtual CPU
device mesh (xla_force_host_platform_device_count) — correctness-shaped
timings only, but the same harness code path the pod run uses.

Usage:
  XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python tools/scaling_bench.py [--devices 1 2 4 8] [--width 256]
      [--height 192] [--gauss 20000] [--renderer primitive] [--iters 3]

Prints one JSON line per mesh size:
  {"devices": N, "mesh": {...}, "ms_per_step": ..., "rays_per_s": ...,
   "efficiency_vs_1": ...}
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--devices", type=int, nargs="+", default=None,
                    help="mesh sizes to test (default: 1,2,4,.. up to all)")
    ap.add_argument("--width", type=int, default=256)
    ap.add_argument("--height", type=int, default=192)
    ap.add_argument("--gauss", type=int, default=20000)
    ap.add_argument("--renderer", default="primitive",
                    choices=["primitive", "pallas", "oracle"])
    ap.add_argument("--max-instances", type=int, default=1 << 17)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--cpu", action="store_true", help="force CPU backend")
    args = ap.parse_args(argv)

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from gslivm_tpu.config import GsOptimParams
    from gslivm_tpu.models import gaussian_model as gm
    from gslivm_tpu.models import training
    from gslivm_tpu.models.cameras import make_camera
    from gslivm_tpu.parallel import sharding

    n_avail = len(jax.devices())
    sizes = args.devices or [d for d in (1, 2, 4, 8, 16, 32) if d <= n_avail]

    rng = np.random.default_rng(0)
    m = args.gauss
    cap = 1 << int(np.ceil(np.log2(max(m, 2))))
    batch = gm.PointBatch(
        xyz=jnp.asarray(rng.normal(0, 1.2, (m, 3)) + [0, 0, 5.0], jnp.float32),
        rgb=jnp.asarray(rng.uniform(0, 255, (m, 3)), jnp.float32),
        cov=jnp.tile(jnp.eye(3)[None] * 0.002, (m, 1, 1)).astype(jnp.float32),
        mask=jnp.ones((m,), bool))
    params = gm.create_from_points(batch, 3.0, capacity=cap)
    cam = make_camera(np.eye(3), np.zeros(3), args.width, args.height,
                      fovx=1.0, fovy=1.0 * args.height / args.width)
    gt = jnp.asarray(rng.uniform(size=(1, 3, args.height, args.width)),
                     jnp.float32)
    op = GsOptimParams()
    optimizer = training.make_optimizer(op)
    rays = args.width * args.height

    base_ms = None
    for n_dev in sizes:
        gauss_axis = 2 if (n_dev % 2 == 0 and n_dev >= 4) else 1
        mesh = sharding.make_mesh(n_dev, gauss_axis=gauss_axis)
        sp = sharding.shard_params(params, mesh)
        opt_state = optimizer.init(sp)

        def step(p, o):
            return sharding.sharded_train_step(
                mesh, p, o, [cam], gt, training.empty_simi(max_gauss=cap),
                opt_params=op, renderer=args.renderer,
                max_instances=args.max_instances)

        p, o, metrics = step(sp, opt_state)  # compile + warmup
        jax.block_until_ready(p.xyz)
        t0 = time.perf_counter()
        for _ in range(args.iters):
            p, o, metrics = step(p, o)
        jax.block_until_ready(p.xyz)
        ms = (time.perf_counter() - t0) / args.iters * 1e3
        if base_ms is None:
            base_ms = ms
        print(json.dumps({
            "devices": n_dev,
            "mesh": dict(zip(mesh.axis_names, mesh.devices.shape)),
            "renderer": args.renderer,
            "ms_per_step": round(ms, 2),
            "rays_per_s": round(rays / ms * 1e3),
            "efficiency_vs_1": round(base_ms / ms / n_dev * sizes[0], 3),
            "overflow": int(metrics.overflow),
        }), flush=True)


if __name__ == "__main__":
    main()
