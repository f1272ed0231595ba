"""Cumulative-prefix profile INSIDE bin_instances at the bench scale
(mirrors tools/profile_stages.py but cuts the binning pipeline itself).
Per-stage cost = difference between consecutive rows.

Run on the real TPU chip: python tools/profile_binning.py
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
MAXI = 7168 * 128
BLOCK = (2, 2)
SLACK = 0.6
MAXCH = 16


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                     ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from tputime import report

    from gslivm_tpu.models.cameras import make_camera
    from gslivm_tpu.ops import binning as B
    from gslivm_tpu.ops.rasterize_reference import preprocess, tile_grid

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
    pre0 = preprocess(means, scales, quats, opac, shs, cam)
    pre0 = jax.tree.map(jax.lax.stop_gradient, pre0)

    bx, by = BLOCK
    grid_x, grid_y = tile_grid(WIDTH, HEIGHT)
    sgx, sgy = -(-grid_x // bx), -(-grid_y // by)
    num_tiles = sgx * sgy

    # NOTE: the inline prefix stages from round 2's first pass drifted from
    # ops/binning.py (consolidated dorder permute, log-domain cull, single
    # searchsorted, sorted layout) and were removed; per-primitive costs are
    # measured in tools/microbench_instops.py and recorded in
    # docs/kernels.md. This tool now times the full binning under both
    # layouts.
    def full_sorted(pre):
        return B.bin_instances(pre, WIDTH, HEIGHT, MAXI, MAXCH,
                               capacity_slack=SLACK, block_x=bx, block_y=by,
                               aligned_layout=False)

    def full_aligned(pre):
        return B.bin_instances(pre, WIDTH, HEIGHT, MAXI, MAXCH,
                               capacity_slack=SLACK, block_x=bx, block_y=by,
                               aligned_layout=True)

    report("bin_instances sorted layout", full_sorted, pre0)
    report("bin_instances aligned layout", full_aligned, pre0)


if __name__ == "__main__":
    main()
