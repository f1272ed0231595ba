"""Microbench the exact sub-ops of bin_instances + _pack_features at the
CURRENT bench scale (855k instances, supertile 2x2) to find where the
~22 ms (binning) and ~5 ms (pack) go. Uses slope-based device timing
(block_until_ready does not synchronize over the axon tunnel)."""
from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp

from tputime import report

P = 200_000
MAXI = 6678 * 128            # bench budget
PAD = 906_624                # bench padded capacity (slack 0.2)
NTILES = 2040                # supertile 2x2 grid at 1080p


def timeit(name, fn, *args, iters=8):
    report(name, fn, *args)


def main():
    rng = np.random.default_rng(0)
    k = jnp.asarray(rng.integers(0, 1 << 18, size=MAXI), jnp.int32)
    rw = jnp.asarray(rng.integers(1, 40, size=MAXI), jnp.int32)

    timeit("int k//rw + k%rw (2M, variable)",
           lambda k, w: (k // w) + (k % w), k, rw)

    def float_divmod(k, w):
        kf = k.astype(jnp.float32)
        q = jnp.floor(kf * (1.0 / w.astype(jnp.float32))).astype(jnp.int32)
        r = k - q * w
        # one fixup step (float recip can be off by one either way)
        q = jnp.where(r < 0, q - 1, jnp.where(r >= w, q + 1, q))
        r = k - q * w
        return q + r

    timeit("float-recip divmod + fixup (2M)", float_divmod, k, rw)

    timeit("int k//16 (2M, const)", lambda k: k // 16, k)

    # argsort 200k
    d = jnp.asarray(rng.standard_normal(P), jnp.float32)
    timeit("argsort 200k f32 stable",
           lambda d: jnp.argsort(d, stable=True), d)

    # searchsorted 8160 tiles over 2M sorted
    srt = jnp.asarray(np.sort(rng.integers(0, NTILES, size=MAXI)), jnp.int32)
    tids = jnp.arange(NTILES, dtype=jnp.int32)
    timeit("searchsorted tiles in sorted x2",
           lambda s, t: (jnp.searchsorted(s, t, side="left"),
                         jnp.searchsorted(s, t, side="right")), srt, tids)

    # the fused-key sort at real scale (PAD entries? no — sort is over MAXI)
    key = jnp.asarray(rng.integers(0, 1 << 30, size=MAXI), jnp.int32)
    gid = jnp.asarray(rng.integers(0, P, size=MAXI), jnp.int32)
    timeit("lax.sort 2M key+payload (stable=False)",
           lambda a, b: jax.lax.sort((a, b), num_keys=1, is_stable=False),
           key, gid)

    # pack-features gather at PAD scale
    feats = jnp.asarray(rng.standard_normal((10, P)), jnp.float32)
    gid_pad = jnp.asarray(rng.integers(-1, P, size=PAD), jnp.int32)

    def pack(feats, gid):
        safe = jnp.maximum(gid, 0)
        inst = feats[:, safe]
        dead = (gid < 0)[None, :]
        inst = jnp.where(dead & (jnp.arange(10)[:, None] == 5), 0.0, inst)
        return jnp.concatenate(
            [inst, jnp.zeros((6, inst.shape[1]), inst.dtype)], axis=0)

    timeit("pack_features gather (10,P)->(16,PAD)", pack, feats, gid_pad)

    feats_r = jnp.asarray(
        np.ascontiguousarray(rng.standard_normal((P, 16))), jnp.float32)
    timeit("row-major gather (P,16)->(PAD,16)",
           lambda f, i: f[jnp.maximum(i, 0)], feats_r, gid_pad)

    # scatter+cummax at 2M (x4 in binning)
    offs = jnp.asarray(np.sort(rng.integers(0, MAXI, size=P)), jnp.int32)
    vals = jnp.asarray(rng.integers(0, 1 << 28, size=P), jnp.int32)
    timeit("scatter(200k)+cummax(2M) x4",
           lambda o, v: sum(jax.lax.cummax(
               jnp.zeros((MAXI,), jnp.int32).at[o].max(v + i, mode="drop"))
               for i in range(4)), offs, vals)

    # final aligned-layout scatter at PAD
    dst = jnp.asarray(rng.permutation(PAD), jnp.int32)
    timeit("final scatter set (2M -> PAD+1)",
           lambda v, i: jnp.full((PAD + 1,), -1, jnp.int32)
           .at[i].set(v, mode="drop")[:PAD], gid_pad[:MAXI], dst[:MAXI])

    # dorder un-permute gather at PAD
    dorder = jnp.asarray(rng.permutation(P), jnp.int32)
    timeit("dorder[gauss_id] gather (PAD)",
           lambda d, g: jnp.where(g >= 0, d[jnp.maximum(g, 0)], -1),
           dorder, gid_pad)


if __name__ == "__main__":
    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                     ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    main()
