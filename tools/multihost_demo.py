"""Two-process multi-host smoke run of the sharded step (DCN-path shape).

Exercises the jax.distributed entry the real N-host deployment uses
(BASELINE configs[4]): every process calls jax.distributed.initialize,
sees the GLOBAL device list, builds the same ("gauss", "pixel") mesh, and
runs one primitive-sharded train step — collectives cross the process
boundary exactly where DCN transfers would on a pod.

On a CPU box each process contributes `--local-devices` virtual CPU
devices. Run (two shells or a spawner):

  python tools/multihost_demo.py --coordinator localhost:8478 \
      --num-processes 2 --process-id 0 &
  python tools/multihost_demo.py --coordinator localhost:8478 \
      --num-processes 2 --process-id 1

Process 0 prints ONE JSON line: {"global_devices": .., "processes": ..,
"loss": .., "renderer": "primitive"}.
"""

from __future__ import annotations

import argparse
import os
import sys


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--coordinator", required=True)
    ap.add_argument("--num-processes", type=int, required=True)
    ap.add_argument("--process-id", type=int, required=True)
    ap.add_argument("--local-devices", type=int, default=2)
    ap.add_argument("--gauss", type=int, default=2048)
    ap.add_argument("--width", type=int, default=64)
    ap.add_argument("--height", type=int, default=48)
    args = ap.parse_args(argv)

    # must precede backend init; JAX_PLATFORMS is pre-set by sitecustomize,
    # so go through jax.config (the env var is too late on this image)
    flags = os.environ.get("XLA_FLAGS", "")
    if "host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags +
            f" --xla_force_host_platform_device_count={args.local_devices}"
        ).strip()
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(coordinator_address=args.coordinator,
                               num_processes=args.num_processes,
                               process_id=args.process_id)

    import json

    import jax.numpy as jnp
    import numpy as np

    sys.path.insert(0, os.path.join(
        os.path.dirname(os.path.abspath(__file__)), ".."))
    from gslivm_tpu.config import GsOptimParams
    from gslivm_tpu.models import gaussian_model as gm
    from gslivm_tpu.models import training
    from gslivm_tpu.models.cameras import make_camera
    from gslivm_tpu.parallel import sharding

    n_global = len(jax.devices())
    assert n_global == args.num_processes * args.local_devices, (
        n_global, jax.devices())

    rng = np.random.default_rng(0)
    m = args.gauss
    batch = gm.PointBatch(
        xyz=jnp.asarray(rng.normal(0, 1.2, (m, 3)) + [0, 0, 5.0],
                        jnp.float32),
        rgb=jnp.asarray(rng.uniform(0, 255, (m, 3)), jnp.float32),
        cov=jnp.tile(jnp.eye(3)[None] * 0.002, (m, 1, 1)).astype(jnp.float32),
        mask=jnp.ones((m,), bool))
    params = gm.create_from_points(batch, 3.0, capacity=m)
    cam = make_camera(np.eye(3), np.zeros(3), args.width, args.height,
                      fovx=1.0, fovy=1.0 * args.height / args.width)
    gt = jnp.asarray(rng.uniform(size=(1, 3, args.height, args.width)),
                     jnp.float32)

    gauss_axis = 2 if n_global >= 4 else 1
    mesh = sharding.make_mesh(n_global, gauss_axis=gauss_axis)
    sp = sharding.shard_params(params, mesh)
    op = GsOptimParams()
    optimizer = training.make_optimizer(op)
    opt_state = optimizer.init(sp)

    p, o, metrics = sharding.sharded_train_step(
        mesh, sp, opt_state, [cam], gt, training.empty_simi(max_gauss=m),
        opt_params=op, renderer="primitive", max_instances=1 << 14)
    jax.block_until_ready(p.xyz)
    loss = float(metrics.loss)

    if args.process_id == 0:
        print(json.dumps({
            "global_devices": n_global,
            "processes": args.num_processes,
            "mesh": dict(zip(mesh.axis_names, mesh.devices.shape)),
            "renderer": "primitive",
            "loss": round(loss, 5),
        }), flush=True)


if __name__ == "__main__":
    main()
