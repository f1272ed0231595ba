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

    # re-run the bin_instances pipeline up to successive cut points by
    # calling the real function but returning early via monkey-style copies
    # is fragile; instead we re-implement the prefix stages inline with the
    # SAME ops (kept in sync with ops/binning.py).
    CHUNK = B.CHUNK

    def stage_rank(pre):
        depth = pre.depth
        dorder = jnp.argsort(
            jnp.where(pre.valid, depth, jnp.inf), stable=True
        ).astype(jnp.int32)
        rect_min = pre.rect_min[dorder]
        rect_max = pre.rect_max[dorder]
        blk = jnp.asarray([bx, by], jnp.int32)
        empty = (rect_max[:, 0] <= rect_min[:, 0]) | (
            rect_max[:, 1] <= rect_min[:, 1])
        rect_min = rect_min // blk
        rect_max = -((-rect_max) // blk)
        rect_max = jnp.where(empty[:, None], rect_min, rect_max)
        counts = jnp.where(
            pre.valid[dorder],
            (rect_max[:, 0] - rect_min[:, 0])
            * (rect_max[:, 1] - rect_min[:, 1]), 0).astype(jnp.int32)
        return dorder, rect_min, rect_max, counts

    def stage_gid(pre):
        dorder, rect_min, rect_max, counts = stage_rank(pre)
        offsets = jnp.concatenate(
            [jnp.zeros((1,), jnp.int32),
             jnp.cumsum(counts)[:-1].astype(jnp.int32)])
        total = offsets[-1] + counts[-1]
        slots = jnp.arange(MAXI, dtype=jnp.int32)
        marks = jnp.zeros((MAXI,), jnp.int32).at[offsets].max(
            jnp.arange(N, dtype=jnp.int32), mode="drop")
        gid = jax.lax.cummax(marks)
        slot_valid = slots < jnp.minimum(total, MAXI)
        return (dorder, rect_min, rect_max, counts, offsets, total, slots,
                gid, slot_valid)

    def stage_tile(pre):
        (dorder, rect_min, rect_max, counts, offsets, total, slots, gid,
         slot_valid) = stage_gid(pre)
        rect_w = jnp.maximum(rect_max[:, 0] - rect_min[:, 0], 1)
        int_rows = [rect_min[:, 0], rect_min[:, 1], rect_w,
                    jnp.minimum(offsets, MAXI)]
        meta_rows = [v.astype(jnp.float32) for v in int_rows]
        mean2d = pre.mean2d
        conic = pre.conic
        op = jnp.where(pre.valid, pre.opacity, 0.0)
        ftab = jnp.stack(
            [mean2d[:, 0], mean2d[:, 1],
             conic[:, 0], conic[:, 1], conic[:, 2], op], axis=0)[:, dorder]
        meta = jnp.concatenate([jnp.stack(meta_rows, axis=0), ftab], axis=0)
        m = meta[:, gid]
        r_x, r_y, r_w, off_slot = (m[i].astype(jnp.int32) for i in range(4))
        k = slots - off_slot
        qq = jnp.floor(k.astype(jnp.float32) *
                       (1.0 / r_w.astype(jnp.float32))).astype(jnp.int32)
        rem = k - qq * r_w
        qq = qq + (rem >= r_w).astype(jnp.int32) - (rem < 0).astype(jnp.int32)
        rem = k - qq * r_w
        ty = r_y + qq
        tx = r_x + rem
        tile_id = ty * sgx + tx
        from gslivm_tpu.ops.rasterize_reference import (TILE, TILE_CULL_EPS,
                                                        tile_min_power)
        f = m[4:]
        qmin = tile_min_power(f[0], f[1], f[2], f[3], f[4], tx, ty,
                              pw=TILE * bx, ph=TILE * by)
        keep = f[5] * jnp.exp(-qmin) >= TILE_CULL_EPS
        tile_id = jnp.where(keep, tile_id, num_tiles)
        tile_id = jnp.where(slot_valid, tile_id, num_tiles)
        return tile_id, gid, total

    def stage_sort(pre):
        tile_id, gid, total = stage_tile(pre)
        bits_p = max(int(np.ceil(np.log2(max(N, 2)))), 1)
        key = (tile_id << bits_p) | gid
        key_sorted = jax.lax.sort((key,), num_keys=1, is_stable=False)[0]
        tile_sorted = key_sorted >> bits_p
        gid_sorted = key_sorted & ((1 << bits_p) - 1)
        return tile_sorted, gid_sorted, total

    def stage_full(pre):
        return B.bin_instances(pre, WIDTH, HEIGHT, MAXI, MAXCH,
                               capacity_slack=SLACK, block_x=bx, block_y=by)

    report("rank+rects", stage_rank, pre0)
    report("+ gid expansion", stage_gid, pre0)
    report("+ meta gather+divmod+cull", stage_tile, pre0)
    report("+ sort", stage_sort, pre0)
    report("FULL bin_instances", stage_full, pre0)


if __name__ == "__main__":
    main()
