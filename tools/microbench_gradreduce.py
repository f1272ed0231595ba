"""Head-to-head of per-instance -> per-gaussian gradient reduction
candidates at the CURRENT bench scale (supertile 2x2: PAD ~1.2M kept
instances, P=200k gaussians, 10 grad rows).

  A1  current: XLA scatter-add  zeros(10, P).at[:, rank].add(g)
  A9  presort-contiguity: gather grads into presort (gaussian-contiguous)
      order, cumsum along instances, per-gaussian boundary diff.
  A11 sort-by-rank: lax.sort key + 10 payload rows, then cumsum+boundary.

Run on the real TPU chip: python tools/microbench_gradreduce.py
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
PAD = 1_204_096   # current padded capacity (profile_stages output)
MAXI = 1 << 20
NF = 10


def main():
    rng = np.random.default_rng(0)
    # realistic rank ids: concatenation of per-tile sorted runs, ~25% padding
    raw = rng.integers(0, P, size=PAD).reshape(-1, 128)
    raw.sort(axis=1)
    rank = np.where(rng.random(PAD) < 0.25, -1, raw.ravel()).astype(np.int32)
    rank_j = jnp.asarray(rank)
    g = jnp.asarray(rng.standard_normal((NF, PAD)), jnp.float32)

    # --- A1: current scatter-add ------------------------------------------
    def a1(g, idx):
        safe = jnp.maximum(idx, 0)
        gz = jnp.where((idx >= 0)[None, :], g, 0.0)
        return jnp.zeros((NF, P), jnp.float32).at[:, safe].add(gz)

    # --- A9: presort gather + cumsum + boundary ----------------------------
    # src: for presort slot j, the PAD slot holding its grad (or PAD = zero)
    perm = rng.permutation(PAD)[:MAXI].astype(np.int32)
    src_j = jnp.asarray(perm)
    off = np.sort(rng.integers(0, MAXI, size=P)).astype(np.int32)
    end = np.concatenate([off[1:], [MAXI]]).astype(np.int32)
    off_j, end_j = jnp.asarray(off), jnp.asarray(end)

    def a9(g, src, off, end):
        g_ext = jnp.concatenate([g, jnp.zeros((NF, 1), g.dtype)], axis=1)
        gp = g_ext[:, src]                       # [NF, MAXI]
        cs = jnp.cumsum(gp, axis=1)
        hi = cs[:, jnp.maximum(end - 1, 0)]
        lo = jnp.where((off > 0)[None, :], cs[:, jnp.maximum(off - 1, 0)], 0.0)
        return jnp.where((end > off)[None, :], hi - lo, 0.0)

    # --- A11: full sort by rank + cumsum + boundary -------------------------
    def a11(g, rnk):
        key = jnp.where(rnk < 0, P, rnk)
        srt = jax.lax.sort((key, *[g[r] for r in range(NF)]), num_keys=1,
                           is_stable=False)
        key_s = srt[0]
        gs = jnp.stack(srt[1:], axis=0)
        cs = jnp.cumsum(gs, axis=1)
        ids = jnp.arange(P, dtype=jnp.int32)
        starts = jnp.searchsorted(key_s, ids, side="left").astype(jnp.int32)
        ends = jnp.searchsorted(key_s, ids, side="right").astype(jnp.int32)
        hi = cs[:, jnp.maximum(ends - 1, 0)]
        lo = jnp.where((starts > 0)[None, :],
                       cs[:, jnp.maximum(starts - 1, 0)], 0.0)
        return jnp.where((ends > starts)[None, :], hi - lo, 0.0)

    report("A1  scatter-add (current)", a1, g, rank_j)
    report("A9  presort gather+cumsum+boundary", a9, g, src_j, off_j, end_j)
    report("A11 sort+cumsum+boundary", a11, g, rank_j)

    # supporting numbers for A9 plumbing cost
    slots = jnp.asarray(rng.permutation(PAD).astype(np.int32))
    dstv = jnp.asarray(rng.permutation(PAD).astype(np.int32))
    report("  [plumb] 1-col int scatter @1M",
           lambda s, d: jnp.zeros((MAXI,), jnp.int32).at[
               jnp.minimum(s, MAXI - 1)].set(d), slots, dstv)


if __name__ == "__main__":
    main()
