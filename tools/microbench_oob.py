"""Does mode='promise_in_bounds' (skip OOB clamping) speed up the hot
gather/scatter ops?  Bench sizes as microbench_instops.

Run on the real TPU chip: python tools/microbench_oob.py
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
MAXI = 857_600
PAD = 909_440


def main():
    rng = np.random.default_rng(0)
    idx = jnp.asarray(rng.integers(0, P, PAD, dtype=np.int32))
    tab = jnp.asarray(rng.standard_normal((16, P)), jnp.float32)
    g10 = jnp.asarray(rng.standard_normal((10, PAD)), jnp.float32)

    report("gather [16,P] @ PAD (default clip)",
           lambda t, i: t[:, i], tab, idx)
    report("gather [16,P] @ PAD promise_in_bounds",
           lambda t, i: t.at[:, i].get(mode="promise_in_bounds"), tab, idx)
    report("scatter-add [10,P] @ PAD (default)",
           lambda g, i: jnp.zeros((10, P), jnp.float32).at[:, i].add(g),
           g10, idx)
    report("scatter-add [10,P] @ PAD promise_in_bounds",
           lambda g, i: jnp.zeros((10, P), jnp.float32).at[:, i].add(
               g, mode="promise_in_bounds"), g10, idx)
    report("scatter-add + unique&sorted-false hints",
           lambda g, i: jnp.zeros((10, P), jnp.float32).at[:, i].add(
               g, mode="promise_in_bounds", unique_indices=False,
               indices_are_sorted=False), g10, idx)


if __name__ == "__main__":
    main()
