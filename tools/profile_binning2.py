"""Sub-stage cumulative profile INSIDE bin_instances (r3).

Mirrors ops/binning.py's sorted-layout path with cut points after each
phase; per-stage cost = difference between consecutive rows. One-off
measurement tool — keep in sync with binning.py when the pipeline changes.

Run on the real TPU chip: python tools/profile_binning2.py
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
MAXI = 6700 * 128
BLOCK = (2, 2)
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
    from gslivm_tpu.ops.rasterize_reference import (
        TILE, TILE_CULL_EPS, preprocess, tile_grid, tile_min_power)

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
    max_instances = MAXI

    # --- mirrored stages (sorted layout, tile_cull=True, blocked) ---------
    def upto_gtab(pre):
        depth = pre.depth
        dorder = jnp.argsort(jnp.where(pre.valid, depth, jnp.inf),
                             stable=True).astype(jnp.int32)
        base_rows = [
            pre.rect_min[:, 0].astype(jnp.float32),
            pre.rect_min[:, 1].astype(jnp.float32),
            pre.rect_max[:, 0].astype(jnp.float32),
            pre.rect_max[:, 1].astype(jnp.float32),
            pre.valid.astype(jnp.float32),
        ]
        mean2d, conic = pre.mean2d, pre.conic
        op = jnp.where(pre.valid, pre.opacity, 0.0)
        ca, cb, cc = conic[:, 0], conic[:, 1], conic[:, 2]
        lq = jnp.where(op > 0.0,
                       jnp.log(jnp.maximum(op, 1e-30) / TILE_CULL_EPS) + 1e-6,
                       -jnp.inf)
        base_rows += [mean2d[:, 0], mean2d[:, 1], ca, cb, cc,
                      -cb / jnp.maximum(ca, 1e-12),
                      -cb / jnp.maximum(cc, 1e-12), lq]
        gtab = jnp.stack(base_rows, axis=0)[:, dorder]
        return dorder, gtab

    def upto_counts(pre):
        dorder, gtab = upto_gtab(pre)
        rmin_x, rmin_y = gtab[0], gtab[1]
        rmax_x, rmax_y = gtab[2], gtab[3]
        validg = gtab[4] > 0.0
        empty = (rmax_x <= rmin_x) | (rmax_y <= rmin_y)
        rmin_x = jnp.floor(rmin_x / bx)
        rmin_y = jnp.floor(rmin_y / by)
        rmax_x = -jnp.floor(-rmax_x / bx)
        rmax_y = -jnp.floor(-rmax_y / by)
        rmax_x = jnp.where(empty, rmin_x, rmax_x)
        rmax_y = jnp.where(empty, rmin_y, rmax_y)
        counts = jnp.where(validg,
                           (rmax_x - rmin_x) * (rmax_y - rmin_y),
                           0.0).astype(jnp.int32)
        offsets = jnp.concatenate(
            [jnp.zeros((1,), jnp.int32),
             jnp.cumsum(counts)[:-1].astype(jnp.int32)])
        return dorder, gtab, rmin_x, rmin_y, rmax_x, rmax_y, counts, offsets

    def upto_gid(pre):
        (dorder, gtab, rmin_x, rmin_y, rmax_x, rmax_y, counts,
         offsets) = upto_counts(pre)
        marks = jnp.zeros((max_instances,), jnp.int32).at[offsets].max(
            jnp.arange(N, dtype=jnp.int32), mode="drop")
        gid = jax.lax.cummax(marks)
        return dorder, gtab, rmin_x, rmin_y, rmax_x, rmax_y, counts, offsets, gid

    def upto_meta(pre):
        (dorder, gtab, rmin_x, rmin_y, rmax_x, rmax_y, counts, offsets,
         gid) = upto_gid(pre)
        ftab = gtab[5:]
        rect_w = jnp.maximum(rmax_x - rmin_x, 1.0)
        meta_rows = [rmin_x, rmin_y, rect_w,
                     jnp.minimum(offsets, max_instances).astype(jnp.float32),
                     1.0 / rect_w]
        meta = jnp.concatenate([jnp.stack(meta_rows, axis=0), ftab], axis=0)
        m = meta[:, gid]
        return m, gid

    def upto_tileid(pre):
        m, gid = upto_meta(pre)
        slots = jnp.arange(max_instances, dtype=jnp.int32)
        total = jnp.int32(0)  # placeholder; slot_valid needs offsets+counts
        r_x, r_y, r_w, off_slot = (m[i].astype(jnp.int32) for i in range(4))
        k = slots - off_slot
        qq = jnp.floor(k.astype(jnp.float32) * m[4]).astype(jnp.int32)
        rem = k - qq * r_w
        qq = qq + (rem >= r_w).astype(jnp.int32) - (rem < 0).astype(jnp.int32)
        rem = k - qq * r_w
        ty = r_y + qq
        tx = r_x + rem
        tile_id = ty * sgx + tx
        f = m[5:]
        qmin = tile_min_power(f[0], f[1], f[2], f[3], f[4], tx, ty,
                              pw=TILE * bx, ph=TILE * by,
                              rb_a=f[5], rb_c=f[6])
        keep = qmin <= f[7]
        tile_id = jnp.where(keep, tile_id, num_tiles)
        return tile_id, gid

    def upto_sort(pre):
        tile_id, gid = upto_tileid(pre)
        bits_p = max(int(np.ceil(np.log2(max(N, 2)))), 1)
        key = (tile_id << bits_p) | gid
        key_sorted = jax.lax.sort((key,), num_keys=1, is_stable=False)[0]
        return key_sorted

    def full(pre):
        return B.bin_instances(pre, WIDTH, HEIGHT, MAXI, MAXCH,
                               capacity_slack=0.2, block_x=bx, block_y=by,
                               aligned_layout=False)

    report("argsort+gtab permute", upto_gtab, pre0)
    report("+ counts/offsets", upto_counts, pre0)
    report("+ expansion gid", upto_gid, pre0)
    report("+ meta gather", upto_meta, pre0)
    report("+ tileid & cull", upto_tileid, pre0)
    report("+ sort", upto_sort, pre0)
    report("FULL bin_instances", full, pre0)


if __name__ == "__main__":
    main()
