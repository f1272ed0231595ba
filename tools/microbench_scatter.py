"""Microbenchmark: candidate implementations of the rasterizer's two
random-access-bound stages at 1080p scale (see docs/kernels.md profile).

  A. per-instance -> per-gaussian gradient segment reduction
     (currently XLA scatter-add via gather VJP: ~56 ms)
  B. instance feature gather (currently [10, P] column gather: ~18 ms)
  C. binning expansion gathers (meta[gid], dorder un-permute: ~45 ms total)

Run on the real TPU chip:  python tools/microbench_scatter.py
"""
from __future__ import annotations

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from tputime import device_time_ms  # noqa: E402

P = 200_000          # gaussians
PAD = 1 << 21        # padded instances (2.1M)
NF = 10              # grad / feature columns


def timeit(fn, *args):
    # slope-based device timing — block_until_ready does not synchronize on
    # the axon tunnel (see tools/tputime.py)
    return device_time_ms(fn, *args)


def main():
    rng = np.random.default_rng(0)
    gid = jnp.asarray(rng.integers(0, P, size=PAD), jnp.int32)
    gid_sorted_per_tile = jnp.asarray(
        np.sort(rng.integers(0, P, size=PAD).reshape(-1, 512), axis=1).ravel(),
        jnp.int32)
    grads_fm = jnp.asarray(rng.standard_normal((NF, PAD)), jnp.float32)
    grads_im = jnp.asarray(np.ascontiguousarray(
        rng.standard_normal((PAD, NF))), jnp.float32)
    feats_fm = jnp.asarray(rng.standard_normal((NF, P)), jnp.float32)
    feats_im = jnp.asarray(rng.standard_normal((P, NF)), jnp.float32)
    # 128-padded to lane width for row-gather variants
    feats_im128 = jnp.pad(feats_im, ((0, 0), (0, 128 - NF)))
    grads_im128 = jnp.pad(grads_im, ((0, 0), (0, 128 - NF)))

    res = {}

    # ---- A: gradient reduction ------------------------------------------
    res["A1 scatter-add col [NF,P].at[:,gid]+= (current)"] = timeit(
        lambda g, i: jnp.zeros((NF, P), jnp.float32).at[:, i].add(g),
        grads_fm, gid)
    res["A2 scatter-add row [P,NF].at[gid]+="] = timeit(
        lambda g, i: jnp.zeros((P, NF), jnp.float32).at[i].add(g),
        grads_im, gid)
    res["A3 scatter-add row 128-wide"] = timeit(
        lambda g, i: jnp.zeros((P, 128), jnp.float32).at[i].add(g),
        grads_im128, gid)
    res["A4 segment_sum (unsorted)"] = timeit(
        lambda g, i: jax.ops.segment_sum(g, i, num_segments=P),
        grads_im, gid)
    res["A5 scatter-add row, per-tile-sorted ids + hint"] = timeit(
        lambda g, i: jnp.zeros((P, NF), jnp.float32).at[i].add(
            g, indices_are_sorted=False, unique_indices=False),
        grads_im, gid_sorted_per_tile)

    # A6: sort-by-gid then blocked cumsum+boundary. payload NF f32.
    def a6(g, i):
        order = jnp.argsort(i)  # bitonic, 1 key + 1 payload
        gs = g[order]           # NF-col gather
        isrt = i[order]
        cs = jnp.cumsum(gs, axis=0)
        # boundary rows: last slot of each gid run
        last = jnp.searchsorted(isrt, jnp.arange(P, dtype=jnp.int32),
                                side="right") - 1
        tot = cs[jnp.maximum(last, 0)]
        prev = jnp.where((last >= 0)[:, None] & (jnp.arange(P) > 0)[:, None],
                         cs[jnp.maximum(last - 0, 0)], 0.0)
        return tot  # (approximate work; measures sort+gather+cumsum cost)
    res["A6 sort-by-gid + cumsum + P gathers"] = timeit(a6, grads_im, gid)

    # A7: bf16-packed scatter: pack 2 bf16 per f32 -> 5 cols
    def a7(g, i):
        gb = g.astype(jnp.bfloat16)
        packed = jax.lax.bitcast_convert_type(
            gb.reshape(PAD, NF // 2, 2), jnp.float32).reshape(PAD, NF // 2)
        return jnp.zeros((P, NF // 2), jnp.float32).at[i].add(packed)
    try:
        res["A7 bf16-packed scatter (INVALID math, cost probe)"] = timeit(
            a7, grads_im, gid)
    except Exception as e:  # pragma: no cover
        res["A7 bf16-packed scatter"] = f"fail: {e}"

    # A8: one-column scatter (cost scaling probe)
    res["A8 scatter-add 1 col"] = timeit(
        lambda g, i: jnp.zeros((P,), jnp.float32).at[i].add(g),
        grads_im[:, 0], gid)

    # A9: presort-order reduction candidate — gather instance grads into
    # pre-sort (gaussian-contiguous) order, cumsum along the instance axis,
    # per-gaussian boundary differences. Candidate VJP for _pack_features.
    MAXI = PAD
    presort_dst = jnp.asarray(rng.permutation(PAD), jnp.int32)[:MAXI]
    seg_off = jnp.asarray(
        np.sort(rng.integers(0, MAXI, size=P)), jnp.int32)
    seg_end = jnp.concatenate([seg_off[1:], jnp.asarray([MAXI], jnp.int32)])

    def a9(g, dst, off, end):
        g_ext = jnp.concatenate([g, jnp.zeros((NF, 1), g.dtype)], axis=1)
        gp = g_ext[:, dst]                      # [NF, MAXI] gather
        cs = jnp.cumsum(gp, axis=1)             # [NF, MAXI]
        hi = cs[:, jnp.maximum(end - 1, 0)]
        lo = jnp.where((off > 0)[None, :], cs[:, jnp.maximum(off - 1, 0)], 0.0)
        return jnp.where((end > off)[None, :], hi - lo, 0.0)
    res["A9 presort gather+cumsum+boundary (candidate)"] = timeit(
        a9, grads_fm, presort_dst, seg_off, seg_end)

    # A10: the cumsum alone (is XLA's [NF, 2M] cumsum fast on TPU?)
    res["A10 cumsum [NF,2M] axis=1"] = timeit(
        lambda g: jnp.cumsum(g, axis=1), grads_fm)

    # A11: WINNING CANDIDATE — sort grads by rank key (payload sort is ~1 ms
    # per array), then contiguous segment reduction: cumsum + boundary diff.
    def a11(g, rank):
        key = jnp.where(rank < 0, P, rank)
        srt = jax.lax.sort((key, *[g[r] for r in range(NF)]), num_keys=1,
                           is_stable=False)
        key_s = srt[0]
        gs = jnp.stack(srt[1:], axis=0)            # [NF, PAD]
        cs = jnp.cumsum(gs, axis=1)
        ids = jnp.arange(P, dtype=jnp.int32)
        starts = jnp.searchsorted(key_s, ids, side="left").astype(jnp.int32)
        ends = jnp.searchsorted(key_s, ids, side="right").astype(jnp.int32)
        hi = cs[:, jnp.maximum(ends - 1, 0)]
        lo = jnp.where((starts > 0)[None, :],
                       cs[:, jnp.maximum(starts - 1, 0)], 0.0)
        return jnp.where((ends > starts)[None, :], hi - lo, 0.0)
    rank_ids = jnp.asarray(
        np.where(rng.random(PAD) < 0.25, -1,
                 rng.integers(0, P, size=PAD)), jnp.int32)
    res["A11 sort(key+10 payload)+cumsum+boundary"] = timeit(
        a11, grads_fm, rank_ids)

    # A13: the exact _pack_features gather at padded capacity 3.13M
    PADCAP = 3_133_568
    big_idx = jnp.asarray(rng.integers(-1, P, size=PADCAP), jnp.int32)
    def a13(f, i):
        safe = jnp.maximum(i, 0)
        inst = f[:, safe]
        dead = (i < 0)[None, :]
        inst = jnp.where(dead & (jnp.arange(NF)[:, None] == 5), 0.0, inst)
        return jnp.concatenate(
            [inst, jnp.zeros((16 - NF, PADCAP), inst.dtype)], axis=0)
    res["A13 exact pack: gather@3.13M + where + pad"] = timeit(
        a13, feats_fm, big_idx)
    res["A14 pack gather only @3.13M"] = timeit(
        lambda f, i: f[:, jnp.maximum(i, 0)], feats_fm, big_idx)

    # ---- B: feature gather -----------------------------------------------
    res["B1 col gather [NF,P][:, gid] (current)"] = timeit(
        lambda f, i: f[:, i], feats_fm, gid)
    res["B2 row gather [P,NF][gid]"] = timeit(
        lambda f, i: f[i], feats_im, gid)
    res["B3 row gather 128-wide"] = timeit(
        lambda f, i: f[i], feats_im128, gid)
    res["B4 one-col gather"] = timeit(
        lambda f, i: f[i], feats_im[:, 0], gid)
    res["B5 take_along_axis fm"] = timeit(
        lambda f, i: jnp.take(f, i, axis=1), feats_fm, gid)

    # ---- C: binning-style ops --------------------------------------------
    offs = jnp.asarray(np.sort(rng.integers(0, PAD, size=P)), jnp.int32)
    vals = jnp.asarray(rng.integers(0, 1 << 28, size=P), jnp.int32)
    res["C1 scatter(200k)+cummax(2M)"] = timeit(
        lambda o, v: jax.lax.cummax(
            jnp.zeros((PAD,), jnp.int32).at[o].max(v, mode="drop")),
        offs, vals)
    res["C2 2M int32 gather meta[gid]"] = timeit(
        lambda v, i: v[i], vals[:P], gid)
    key = jnp.asarray(rng.integers(0, 1 << 30, size=PAD), jnp.int32)
    res["C3 lax.sort 2M (key only)"] = timeit(
        lambda k: jax.lax.sort((k,), num_keys=1, is_stable=False)[0], key)
    res["C3b lax.sort 2M (key+1 payload)"] = timeit(
        lambda k, g: jax.lax.sort((k, g), num_keys=1, is_stable=False),
        key, gid)
    res["C4 lax.sort 2M (key+3 payload)"] = timeit(
        lambda k, a, b, c: jax.lax.sort((k, a, b, c), num_keys=1,
                                        is_stable=False),
        key, gid, gid, gid)
    res["C5 2M int32 scatter .at[dst].set"] = timeit(
        lambda v, i: jnp.zeros((PAD,), jnp.int32).at[i].set(v, mode="drop"),
        gid, jnp.asarray(rng.permutation(PAD), jnp.int32))

    for k, v in res.items():
        print(f"{k:55s} {v if isinstance(v, str) else f'{v:8.2f} ms'}")


if __name__ == "__main__":
    main()
