"""Experiment: supertile block-shape sweep for the 1080p bench scene.

For each (block_x, block_y) candidate, measures instance expansion and the
full fwd+bwd step time (generous budgets; overflow printed). Run on TPU —
ALONE: concurrent users of the chip silently corrupt the slope timings
(docs/kernels.md "Block-shape sweep, revalidated"); validate any
surprising result with a standalone BENCH_BLOCK=... bench.py run.
"""
from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

WIDTH, HEIGHT = 1920, 1080
N = 200_000


def main():
    import jax
    import jax.numpy as jnp
    from tputime import report

    from gslivm_tpu.models.cameras import make_camera
    from gslivm_tpu.ops import binning as B
    from gslivm_tpu.ops import rasterize_pallas as RP
    from gslivm_tpu.ops.rasterize_reference import preprocess

    rng = np.random.default_rng(0)
    means = jnp.asarray(rng.normal(0, 2.0, (N, 3)) + [0, 0, 6.0], jnp.float32)
    scales = jnp.asarray(rng.uniform(0.01, 0.05, (N, 3)), jnp.float32)
    q = rng.normal(size=(N, 4))
    quats = jnp.asarray(q / np.linalg.norm(q, axis=1, keepdims=True),
                        jnp.float32)
    opac = jnp.asarray(rng.uniform(0.3, 0.9, (N,)), jnp.float32)
    shs = jnp.asarray(rng.uniform(-0.3, 0.8, (N, 1, 3)), jnp.float32)
    cam = make_camera(np.eye(3), np.zeros(3), WIDTH, HEIGHT, fovx=1.2,
                      fovy=0.8)
    gt = jnp.zeros((3, HEIGHT, WIDTH), jnp.float32)
    args = (means, scales, quats, opac, shs)

    import functools

    for bx, by in [(2, 2), (3, 2), (2, 3), (4, 2), (2, 4)]:
        @functools.partial(jax.jit, static_argnames=("bx", "by"))
        def stats(ms, sc, qu, op, sh, bx=bx, by=by):
            pre = preprocess(ms, sc, qu, op, sh, cam)
            b = B.bin_instances(pre, WIDTH, HEIGHT, 1 << 21, 64,
                                capacity_slack=0.6, block_x=bx, block_y=by)
            return (jnp.sum(b.gauss_rank >= 0), b.num_instances,
                    jnp.max(b.tile_nchunks))

        kept, total, maxch = (int(v) for v in stats(*args, bx=bx, by=by))
        # scene-fitted budgets like bench.py: expansion + 8%, chunks 2x max
        maxi = int(np.ceil(total * 1.08 / 128)) * 128
        mc = min(64, 2 * maxch)
        print(f"block=({bx},{by}) expansion={total} kept={kept} "
              f"maxch={maxch} -> maxi={maxi} mc={mc}", flush=True)

        def loss(ms, sc, qu, op, sh, bx=bx, by=by, maxi=maxi, mc=mc):
            out = RP.rasterize_pallas(
                ms, sc, qu, op, sh, cam, max_instances=maxi,
                interpret=False, block_x=bx, block_y=by,
                max_chunks_per_tile=mc)
            return jnp.sum((out.color - gt) ** 2) + 0.1 * jnp.sum(out.acc)

        grad = jax.grad(loss, argnums=(0, 1, 2, 3, 4))
        try:
            report(f"fwd+bwd ({bx},{by})", grad, *args)
        except Exception as e:
            print(f"  FAILED: {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    import jax
    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                     ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    main()
