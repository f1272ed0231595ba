"""Isolated costs of the binning/instance-space primitives at bench scale
(1080p, 200k gaussians, supertile 2x2: MAXI ~0.92M pre-sort slots,
PAD ~1.2M padded capacity).  Sizes mirror ops/binning.py; this tells us
which op owns each millisecond of the `+ binning` lump in
tools/profile_stages.py.

Run on the real TPU chip: python tools/microbench_binning.py
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

P = 200_000
MAXI = 7168 * 128   # 917504
PAD = 1_204_096
T = 2040


def main():
    rng = np.random.default_rng(0)
    depth = jnp.asarray(rng.uniform(0.1, 50.0, P), jnp.float32)
    key_np = rng.integers(0, 2**29, MAXI, dtype=np.int32)
    key = jnp.asarray(key_np)
    key_pre = jnp.asarray(np.sort(key_np))
    idx_maxi = jnp.asarray(rng.integers(0, P, MAXI, dtype=np.int32))
    idx_pad = jnp.asarray(rng.integers(0, P, PAD, dtype=np.int32))
    mono_src = jnp.asarray(
        np.minimum(np.arange(PAD) * MAXI // PAD, MAXI - 1).astype(np.int32))
    tab10 = jnp.asarray(rng.standard_normal((10, P)), jnp.float32)
    tab14 = jnp.asarray(rng.standard_normal((14, P)), jnp.float32)
    g10 = jnp.asarray(rng.standard_normal((10, MAXI)), jnp.float32)
    marks = jnp.asarray(rng.integers(-2**30, 2**30, (2, MAXI), np.int32))
    toff = jnp.asarray(
        np.sort(rng.integers(0, MAXI, T)).astype(np.int32))
    tvals = jnp.asarray(rng.integers(0, MAXI, (2, T), np.int32))

    report("argsort 200k f32 stable",
           lambda d: jnp.argsort(d, stable=True), depth)
    report("lax.sort 0.92M int32 1-key",
           lambda k: jax.lax.sort((k,), num_keys=1, is_stable=False)[0], key)
    report("gather [10,200k] @ 0.92M rand",
           lambda t, i: t[:, i], tab10, idx_maxi)
    report("gather [14,200k] @ 1.2M rand",
           lambda t, i: t[:, i], tab14, idx_pad)
    report("gather [10,0.92M] @ 1.2M MONOTONE",
           lambda g, s: g[:, s], g10, mono_src)
    report("cummax [2, 0.92M]",
           lambda m: jax.lax.cummax(m, axis=1), marks)
    report("scatter-add [10,200k] @ 0.92M",
           lambda g, i: jnp.zeros((10, P), jnp.float32).at[:, i].add(g),
           g10, idx_maxi)
    report("2-row scatter@2040 + cummax (expansion)",
           lambda off, v: jax.lax.cummax(
               jnp.full((2, MAXI), jnp.int32(-(1 << 30))).at[:, off].max(
                   v, mode="drop"), axis=1), toff, tvals)
    report("searchsorted 2040 over 0.92M",
           lambda k, t: jnp.searchsorted(k, t), key_pre, toff)
    report("lax.sort PRESORTED 0.92M int32",
           lambda k: jax.lax.sort((k,), num_keys=1, is_stable=False)[0],
           key_pre)


if __name__ == "__main__":
    main()
