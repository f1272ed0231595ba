"""Round-2 gradient-reduction candidates (see microbench_gradreduce.py for
round 1's A1/A9/A11).  New angle: XLA TPU scatter cost is per-INDEX, so a
transposed [slots, feat] layout makes each index touch one contiguous
40-byte row instead of 10 column-strided words.

  A1   round-1 baseline: [NF, P].at[:, rank].add(g)
  A1T  transposed scatter-add: [P, NF].at[rank].add(gT)
  A1TU A1T with unique_indices hint (WRONG result w/ dupes - timing probe)
  A12  expansion-space route (needs es_pad from binning, unique indices):
       [MAXI, NF].at[es].set(gT, unique) -> cumsum -> boundary diff
  A12g gather flavor: src = 1-col scatter of arange (bin-time cost), then
       gT[src] -> cumsum -> boundary diff (round-1 A9 in transposed layout)

Run on the real TPU chip: python tools/microbench_gradreduce2.py
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
PAD = 1_204_096   # padded instance capacity (profile_stages output)
MAXI = 1 << 20    # pre-sort expansion budget (expansion slots)
NF = 10


def main():
    rng = np.random.default_rng(0)
    # realistic rank ids: concatenation of per-tile sorted runs, ~25% padding
    raw = rng.integers(0, P, size=PAD).reshape(-1, 128)
    raw.sort(axis=1)
    rank = np.where(rng.random(PAD) < 0.25, -1, raw.ravel()).astype(np.int32)
    rank_j = jnp.asarray(rank)
    g = jnp.asarray(rng.standard_normal((NF, PAD)), jnp.float32)
    gT = jnp.asarray(np.ascontiguousarray(np.asarray(g).T))

    # --- A1: round-1 baseline ---------------------------------------------
    def a1(g, idx):
        safe = jnp.maximum(idx, 0)
        gz = jnp.where((idx >= 0)[None, :], g, 0.0)
        return jnp.zeros((NF, P), jnp.float32).at[:, safe].add(gz)

    # --- A1T: transposed scatter-add --------------------------------------
    def a1t(gT, idx):
        safe = jnp.maximum(idx, 0)
        gz = jnp.where((idx >= 0)[:, None], gT, 0.0)
        return jnp.zeros((P, NF), jnp.float32).at[safe].add(gz)

    def a1tu(gT, idx):
        safe = jnp.maximum(idx, 0)
        gz = jnp.where((idx >= 0)[:, None], gT, 0.0)
        return jnp.zeros((P, NF), jnp.float32).at[safe].add(
            gz, unique_indices=True)

    # --- A12: expansion-space scatter-set + cumsum + boundary --------------
    # es_pad: unique expansion slot per kept instance (padding -> MAXI).
    kept = rank >= 0
    es = np.full(PAD, MAXI, np.int64)
    es[kept] = rng.permutation(MAXI)[: kept.sum()]
    es_j = jnp.asarray(es.astype(np.int32))
    off = np.sort(rng.integers(0, MAXI, size=P)).astype(np.int32)
    end = np.concatenate([off[1:], [MAXI]]).astype(np.int32)
    off_j, end_j = jnp.asarray(off), jnp.asarray(end)

    def a12(gT, es, off, end):
        pre = jnp.zeros((MAXI + 1, NF), jnp.float32).at[es].set(
            gT, mode="drop", unique_indices=True)[:MAXI]
        cs = jnp.cumsum(pre, axis=0)
        hi = cs[jnp.maximum(end - 1, 0)]
        lo = jnp.where((off > 0)[:, None], cs[jnp.maximum(off - 1, 0)], 0.0)
        return jnp.where((end > off)[:, None], hi - lo, 0.0)

    # --- A12g: bin-time 1-col scatter to build src, then gather route ------
    def build_src(es):
        return jnp.full((MAXI + 1,), PAD, jnp.int32).at[es].set(
            jnp.arange(PAD, dtype=jnp.int32), mode="drop",
            unique_indices=True)[:MAXI]

    def a12g(gT, src, off, end):
        g_ext = jnp.concatenate([gT, jnp.zeros((1, NF), gT.dtype)], axis=0)
        pre = g_ext[src]                       # [MAXI, NF]
        cs = jnp.cumsum(pre, axis=0)
        hi = cs[jnp.maximum(end - 1, 0)]
        lo = jnp.where((off > 0)[:, None], cs[jnp.maximum(off - 1, 0)], 0.0)
        return jnp.where((end > off)[:, None], hi - lo, 0.0)

    src_j = jax.jit(build_src)(es_j)

    r1 = np.asarray(jax.jit(a1)(g, rank_j))
    r1t = np.asarray(jax.jit(a1t)(gT, rank_j))
    np.testing.assert_allclose(r1.T, r1t, rtol=2e-5, atol=2e-5)

    # --- A12c (r5): expansion-space route in COLUMN layout ----------------
    # the r2 A12 measurement used the [slots, NF] ROW layout, whose scatter
    # is catastrophic (~101 ms, 40 B strided per index); the column flavor
    # pays the measured ~7 ns/index of a 1-col scatter-set instead. Still
    # needs the e-index plumbing (meta gather + tile expand) on top.
    def a12c(g, es, off, end):
        pre = jnp.zeros((NF, MAXI + 1), jnp.float32).at[:, es].set(
            g, mode="drop", unique_indices=True)[:, :MAXI]
        cs = jnp.cumsum(pre, axis=1)
        hi = cs[:, jnp.maximum(end - 1, 0)]
        lo = jnp.where((off > 0)[None, :], cs[:, jnp.maximum(off - 1, 0)],
                       0.0)
        return jnp.where((end > off)[None, :], hi - lo, 0.0)

    # --- A1c (r5): the COMPACTED production path — same scatter-add, fewer
    # indices (the backward now writes a dense walked-chunk prefix;
    # rasterize_pallas.py grad_cols). 60% walked fraction at bench shape.
    COMPACT = int(PAD * 0.60) // 128 * 128
    rank_c = jnp.asarray(rank[:COMPACT])
    g_c = g[:, :COMPACT]

    def a1c(g, idx):
        safe = jnp.maximum(idx, 0)
        gz = jnp.where((idx >= 0)[None, :], g, 0.0)
        return jnp.zeros((NF, P), jnp.float32).at[:, safe].add(gz)

    report("A1   [NF,P] scatter-add (r1 baseline)", a1, g, rank_j)
    report("A1T  [P,NF] transposed scatter-add", a1t, gT, rank_j)
    report("A1TU A1T + unique hint (timing probe)", a1tu, gT, rank_j)
    report("A12  es scatter-set + cumsum + bdry", a12, gT, es_j, off_j, end_j)
    report("  [plumb] src build (1-col scatter)", build_src, es_j)
    report("A12g src gather + cumsum + bdry", a12g, gT, src_j, off_j, end_j)
    report("A12c es scatter-set COLUMN + cumsum", a12c, g, es_j, off_j, end_j)
    report("A1c  compacted scatter-add (60% idx)", a1c, g_c, rank_c)


if __name__ == "__main__":
    main()
