"""Multi-chip / multi-host scaling-efficiency harness (BASELINE configs[4]).

Measures the sharded train step (parallel/sharding.sharded_train_step) at
increasing mesh sizes and reports rays/s, scaling efficiency vs the
1-device run, and a PER-PHASE comm/compute breakdown for the primitive
renderer (exchange / render / merge / grad+reduce), plus optional compiled
HLO schedule evidence of collective/compute overlap.

Single host: runs over the local devices (or the virtual CPU mesh via
XLA_FLAGS=--xla_force_host_platform_device_count=8) — correctness-shaped
timings, same code path as a pod run.

Multi-host (ICI within a slice + DCN across hosts): every participating
process runs THE SAME command with --coordinator/--num-processes/
--process-id (or the JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES /
JAX_PROCESS_ID env vars); `jax.distributed.initialize` wires the global
runtime and `jax.devices()` returns the GLOBAL device list, so the mesh
construction and every collective below are process-count-agnostic —
shard_map named axes compile to ICI collectives within a slice and DCN
transfers across hosts with no code change.

Usage (single host):
  XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python tools/scaling_bench.py [--devices 1 2 4 8] [--width 256]
      [--height 192] [--gauss 20000] [--renderer primitive] [--iters 3]
      [--phases] [--dump-hlo out.hlo]

Usage (N hosts, run on every host):
  python tools/scaling_bench.py --coordinator HOST0:8476 \
      --num-processes N --process-id $RANK [...]

Prints one JSON line per mesh size (process 0 only under multi-host):
  {"devices": N, "mesh": {...}, "ms_per_step": ..., "rays_per_s": ...,
   "efficiency_vs_1": ..., "phases_ms": {...}, "comm_fraction": ...}
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


def _maybe_init_distributed(args) -> int:
    """jax.distributed.initialize from args/env; returns process index."""
    import jax

    coord = args.coordinator or os.environ.get("JAX_COORDINATOR_ADDRESS")
    if not coord:
        return 0
    nproc = args.num_processes or int(os.environ.get("JAX_NUM_PROCESSES", 1))
    pid = (args.process_id if args.process_id is not None
           else int(os.environ.get("JAX_PROCESS_ID", 0)))
    jax.distributed.initialize(coordinator_address=coord,
                               num_processes=nproc, process_id=pid)
    return pid


def _hlo_overlap_report(compiled_text: str) -> dict:
    """Count async collectives in a compiled HLO schedule and check that
    compute (fusions/custom-calls) is scheduled BETWEEN at least one
    start/done pair — the overlap evidence VERDICT r2 asked for."""
    starts = ("all-gather-start", "all-reduce-start", "all-to-all-start",
              "collective-permute-start", "reduce-scatter-start",
              "async-start")
    lines = compiled_text.splitlines()
    n_async = 0
    overlapped = 0
    open_depth = 0
    compute_since_start = False
    for ln in lines:
        s = ln.strip()
        if any(f" = {op}" in s or s.startswith(tuple(starts)) or
               f"{op}(" in s for op in starts):
            n_async += 1
            open_depth += 1
            compute_since_start = False
        elif "-done" in s and open_depth > 0:
            open_depth -= 1
            if compute_since_start:
                overlapped += 1
        elif open_depth > 0 and ("fusion" in s or "custom-call" in s):
            compute_since_start = True
    import re

    # HLO text puts the op name after the result type ("%x = f32[..]
    # all-gather(..)"), so match the op-call form directly
    sync = len(re.findall(
        r"\b(?:all-gather|all-reduce|all-to-all|reduce-scatter|"
        r"collective-permute)(?:-start)?\(", compiled_text))
    return {"async_collectives": n_async,
            "overlapped_pairs": overlapped,
            # CPU lowers collectives synchronously (no -start/-done pairs);
            # the async/overlap counts are meaningful on TPU schedules
            "sync_collectives": sync}


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
    ap.add_argument("--phases", action="store_true",
                    help="per-phase breakdown (primitive renderer): "
                         "preprocess+exchange / +render / +merge+losses / "
                         "full grad step; comm_fraction derived")
    ap.add_argument("--dump-hlo", default=None,
                    help="write the compiled step's HLO schedule here and "
                         "report async-collective overlap counts")
    # multi-host entry (jax.distributed); also honors JAX_* env vars
    ap.add_argument("--coordinator", default=None,
                    help="host:port of process 0 (enables multi-host)")
    ap.add_argument("--num-processes", type=int, default=None)
    ap.add_argument("--process-id", type=int, default=None)
    args = ap.parse_args(argv)

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    pid = _maybe_init_distributed(args)
    import jax.numpy as jnp

    from gslivm_tpu.config import GsOptimParams
    from gslivm_tpu.models import gaussian_model as gm
    from gslivm_tpu.models import training
    from gslivm_tpu.models.cameras import make_camera
    from gslivm_tpu.parallel import sharding

    n_avail = len(jax.devices())  # GLOBAL device count under multi-host
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

    def timed(fn, *a):
        out = fn(*a)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = fn(*a)
        jax.block_until_ready(out)
        return (time.perf_counter() - t0) / args.iters * 1e3

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

        row = {
            "devices": n_dev,
            "processes": args.num_processes or 1,
            "mesh": dict(zip(mesh.axis_names, mesh.devices.shape)),
            "renderer": args.renderer,
            "ms_per_step": round(ms, 2),
            "rays_per_s": round(rays / ms * 1e3),
            "efficiency_vs_1": round(base_ms / ms / n_dev * sizes[0], 3),
            "overflow": int(metrics.overflow),
        }

        if args.phases and args.renderer == "primitive":
            row["phases_ms"], row["comm_fraction"] = _phase_breakdown(
                mesh, sp, cam, gt, op, cap, args, timed, ms)

        if args.dump_hlo:
            lowered = jax.jit(step).lower(sp, opt_state)
            txt = lowered.compile().as_text()
            path = (args.dump_hlo if len(sizes) == 1
                    else f"{args.dump_hlo}.{n_dev}")
            with open(path, "w") as f:
                f.write(txt)
            row["hlo"] = {"path": path, **_hlo_overlap_report(txt)}

        if pid == 0:
            print(json.dumps(row), flush=True)


def _phase_breakdown(mesh, sp, cam, gt, op, cap, args, timed, full_ms):
    """Cumulative-prefix timings of the primitive-sharded pipeline.

    Phases: preprocess+exchange (all_gather keys + all_to_all features),
    +render (per-slab Pallas band), +merge+image (partial-composite
    all_gather over gauss + band all_gather over pixel). The full train
    step adds the backward (reverse collectives = the gradient reduction)
    and Adam. comm_fraction estimates (exchange + merge + grad-reduce
    transposes) / full step, the collective share the ICI/DCN links carry.
    """
    import jax
    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P

    from gslivm_tpu.models import training as T
    from gslivm_tpu.ops.rasterize_reference import preprocess
    from gslivm_tpu.parallel import primitive, sharding

    float_fields = ("xyz", "features_dc", "features_rest", "scaling",
                    "rotation", "opacity")
    floats = {k: getattr(sp, k) for k in float_fields}
    float_specs = {k: P("gauss", *([None] * (v.ndim - 1)))
                   for k, v in floats.items()}
    n_active = sp.n_active
    block = (1, 1)

    def local_pre(floats):
        from gslivm_tpu.models.gaussian_model import GaussianParams

        p = GaussianParams(n_active=n_active, **floats)
        return preprocess(
            p.xyz, p.get_scaling(), p.get_rotation(), p.get_opacity()[:, 0],
            p.get_features(), cam, sh_degree=p.sh_degree,
            active_mask=p.active_mask())

    def s_exchange(floats):
        pre = local_pre(floats)
        n_local = pre.depth.shape[0]
        g = jax.lax.axis_size("gauss")
        budget = min(n_local, max(1, -(-int(4.0 * n_local) // g)))
        slab, ovf = primitive.exchange_by_depth_slab(
            pre, "gauss", budget_per_pair=budget)
        return slab.mean2d.sum() + ovf

    def s_render(floats):
        pre = local_pre(floats)
        n_local = pre.depth.shape[0]
        g = jax.lax.axis_size("gauss")
        budget = min(n_local, max(1, -(-int(4.0 * n_local) // g)))
        slab, _ = primitive.exchange_by_depth_slab(
            pre, "gauss", budget_per_pair=budget)
        n_pixel = jax.lax.axis_size("pixel")
        band_rows = sharding._band_rows_for(cam, n_pixel, block)
        partial, _ = primitive.render_slab_band(
            slab, cam.width, cam.height, band_rows,
            jax.lax.axis_index("pixel") * band_rows,
            max_instances=args.max_instances, block=block)
        return partial.sum()

    def s_merge(floats):
        pre = local_pre(floats)
        n_local = pre.depth.shape[0]
        g = jax.lax.axis_size("gauss")
        budget = min(n_local, max(1, -(-int(4.0 * n_local) // g)))
        slab, _ = primitive.exchange_by_depth_slab(
            pre, "gauss", budget_per_pair=budget)
        n_pixel = jax.lax.axis_size("pixel")
        band_rows = sharding._band_rows_for(cam, n_pixel, block)
        partial, _ = primitive.render_slab_band(
            slab, cam.width, cam.height, band_rows,
            jax.lax.axis_index("pixel") * band_rows,
            max_instances=args.max_instances, block=block)
        merged = primitive.merge_partials(partial, "gauss")
        full = jax.lax.all_gather(merged, "pixel", axis=1, tiled=True)
        return full.sum()

    def smap(f):
        return jax.jit(jax.shard_map(f, mesh=mesh, in_specs=(float_specs,),
                                     out_specs=P(), check_vma=False))

    ms_ex = timed(smap(s_exchange), floats)
    ms_re = timed(smap(s_render), floats)
    ms_me = timed(smap(s_merge), floats)
    phases = {
        "preprocess_exchange": round(ms_ex, 2),
        "render_band": round(ms_re - ms_ex, 2),
        "merge_gather": round(ms_me - ms_re, 2),
        "bwd_losses_adam": round(full_ms - ms_me, 2),
        "full_step": round(full_ms, 2),
    }
    # collective share: fwd exchange+merge plus their backward transposes
    # (reverse all_to_all + reduce_scatter == the gradient reduction) —
    # conservatively counted at the same cost as their forward twins
    # clamp: at CPU-interpret scale the slope timing can make a cheap
    # stage's cumulative diff slightly negative
    comm = max(0.0, ms_ex) + max(0.0, ms_me - ms_re)
    comm_fraction = round(min(1.0, max(0.0, 2.0 * comm / full_ms)), 3)
    return phases, comm_fraction


if __name__ == "__main__":
    main()
