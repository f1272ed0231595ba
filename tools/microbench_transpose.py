"""Cost of the band assembly (tile layout -> image layout) and its VJP at
bench scale: tiles [2040, 8, 1024] -> [8, 1088, 1920] (supertile 2x2,
1080p), plus the bench loss tail.  Explains the FULL-minus-kernel-only gap
in tools/profile_stages.py.

Run on the real TPU chip: python tools/microbench_transpose.py
"""
from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax  # noqa: E402

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                 ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp  # noqa: E402
from tputime import report  # noqa: E402

N_ROWS, SGX = 34, 60
PH, PW = 32, 32
H, W = 1080, 1920
T = N_ROWS * SGX


def band(tiles):
    return (tiles.reshape(N_ROWS, SGX, 8, PH, PW)
            .transpose(2, 0, 3, 1, 4)
            .reshape(8, N_ROWS * PH, SGX * PW))


def main():
    rng = np.random.default_rng(0)
    tiles = jnp.asarray(rng.standard_normal((T, 8, PH * PW)), jnp.float32)
    gt = jnp.asarray(rng.standard_normal((3, H, W)), jnp.float32)

    def fwd(t):
        return band(t)

    def fwd_bwd(t):
        def f(t):
            return jnp.sum(band(t)[:3, :H, :W] ** 2)
        return jax.grad(f)(t)

    def full_loss(t, gt):
        def f(t):
            b = band(t)
            return jnp.sum((b[:3, :H, :W] - gt) ** 2) + 0.1 * jnp.sum(
                b[4, :H, :W])
        return jax.grad(f)(t)

    report("band assembly fwd [2040,8,1024]->[8,1088,1920]", fwd, tiles)
    report("band fwd+bwd (sum-sq loss)", fwd_bwd, tiles)
    report("band fwd+bwd (bench loss w/ gt)", full_loss, tiles, gt)


if __name__ == "__main__":
    main()
