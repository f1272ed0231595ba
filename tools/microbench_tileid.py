"""Isolate the binning 'tileid & cull' 7 ms: which sub-op doesn't fuse?

Cuts: (a) elementwise chain baseline on [M] f32; (b) the row-slice +
int-extract stage; (c) + div-free q/rem; (d) + tile id; (e) + cull.
Run on TPU.
"""
from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

M = 6700 * 128  # 857.6k instance slots
ROWS = 13


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                     ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    from tputime import report

    from gslivm_tpu.ops.rasterize_reference import TILE, tile_min_power

    rng = np.random.default_rng(0)
    m = jnp.asarray(rng.uniform(1.0, 100.0, (ROWS, M)), jnp.float32)
    slots = jnp.arange(M, dtype=jnp.int32)
    sgx = 60

    def chain50(m):
        x = m[0]
        for _ in range(25):
            x = x * 1.0001 + 0.5
        return x

    def extract(m):
        r_x, r_y, r_w, off_slot = (m[i].astype(jnp.int32) for i in range(4))
        return r_x + r_y + r_w + off_slot

    def qrem(m):
        r_x, r_y, r_w, off_slot = (m[i].astype(jnp.int32) for i in range(4))
        k = slots - off_slot
        q = jnp.floor(k.astype(jnp.float32) * m[4]).astype(jnp.int32)
        rem = k - q * r_w
        q = q + (rem >= r_w).astype(jnp.int32) - (rem < 0).astype(jnp.int32)
        rem = k - q * r_w
        return q + rem

    def tileid(m):
        r_x, r_y, r_w, off_slot = (m[i].astype(jnp.int32) for i in range(4))
        k = slots - off_slot
        q = jnp.floor(k.astype(jnp.float32) * m[4]).astype(jnp.int32)
        rem = k - q * r_w
        q = q + (rem >= r_w).astype(jnp.int32) - (rem < 0).astype(jnp.int32)
        rem = k - q * r_w
        ty = r_y + q
        tx = r_x + rem
        return ty * sgx + tx

    def cull_only(m):
        f = m[5:]
        tx = (slots % jnp.int32(sgx))
        ty = (slots // jnp.int32(sgx))
        qmin = tile_min_power(f[0], f[1], f[2], f[3], f[4], tx, ty,
                              pw=TILE * 2, ph=TILE * 2,
                              rb_a=f[5], rb_c=f[6])
        return qmin <= f[7]

    def full(m):
        tid = tileid(m)
        f = m[5:]
        r_x = m[0].astype(jnp.int32)
        r_y = m[1].astype(jnp.int32)
        tx = tid % sgx
        ty = tid // sgx
        qmin = tile_min_power(f[0], f[1], f[2], f[3], f[4], tx, ty,
                              pw=TILE * 2, ph=TILE * 2,
                              rb_a=f[5], rb_c=f[6])
        keep = qmin <= f[7]
        return jnp.where(keep, tid, 0)

    report("chain50 elementwise [M]", chain50, m)
    report("extract int rows", extract, m)
    report("qrem (div-free)", qrem, m)
    report("tileid", tileid, m)
    report("cull only (iota tiles)", cull_only, m)
    report("tileid + cull", full, m)


if __name__ == "__main__":
    main()


def main2():
    """2-D layout experiment: same math on [M/128, 128] vs flat [M]."""
    import jax
    import jax.numpy as jnp

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                     ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    from tputime import report

    rng = np.random.default_rng(0)
    m = jnp.asarray(rng.uniform(1.0, 100.0, (ROWS, M)), jnp.float32)
    R = M // 128
    m2 = jnp.asarray(rng.uniform(1.0, 100.0, (ROWS, R, 128)), jnp.float32)

    def chain50_flat(m):
        x = m[0]
        for _ in range(25):
            x = x * 1.0001 + 0.5
        return x

    def chain50_2d(m2):
        x = m2[0]
        for _ in range(25):
            x = x * 1.0001 + 0.5
        return x

    def chain50_reshape(m):
        x = m[0].reshape(R, 128)
        for _ in range(25):
            x = x * 1.0001 + 0.5
        return x.reshape(M)

    def qrem_2d(m2):
        slots2 = jnp.arange(M, dtype=jnp.int32).reshape(R, 128)
        r_w = m2[2].astype(jnp.int32)
        off_slot = m2[3].astype(jnp.int32)
        k = slots2 - off_slot
        q = jnp.floor(k.astype(jnp.float32) * m2[4]).astype(jnp.int32)
        rem = k - q * r_w
        q = q + (rem >= r_w).astype(jnp.int32) - (rem < 0).astype(jnp.int32)
        rem = k - q * r_w
        return q + rem

    def gather_then_2d(tab_gid):
        tab, gid = tab_gid
        g = tab[:, gid]              # [13, M] gather (index-bound)
        x = g.reshape(ROWS, R, 128)  # relayout
        y = x[0]
        for _ in range(25):
            y = y * 1.0001 + x[1]
        return y

    tab = jnp.asarray(rng.uniform(1.0, 2.0, (ROWS, 200_000)), jnp.float32)
    gid = jnp.asarray(rng.integers(0, 200_000, (M,)), jnp.int32)

    report("chain50 flat [M]", chain50_flat, m)
    report("chain50 2-D [R,128]", chain50_2d, m2)
    report("chain50 reshape->2-D->flat", chain50_reshape, m)
    report("qrem 2-D", qrem_2d, m2)
    report("gather + reshape + chain", gather_then_2d, (tab, gid))


if __name__ == "__main__":
    import sys as _s
    if len(_s.argv) > 1 and _s.argv[1] == "2d":
        main2()
    else:
        main()
