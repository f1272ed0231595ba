"""Stage-by-stage profile of the 1080p rasterizer bench pipeline.

Profiles the EXACT bench configuration (supertile 2x2, max_instances 1<<20,
capacity slack 0.6 — bench.py) so the full fwd+bwd stage hits the same
persistent compile cache entry as bench.py. Times cumulative prefixes of
the pipeline (each jitted separately); per-stage cost is the difference
between consecutive rows. Uses slope-based device timing (tools/tputime.py)
because block_until_ready does not synchronize on the axon tunnel. Run on
TPU.
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
MAXI = 6700 * 128  # bench.py budget
BLOCK = (2, 2)
SLACK = 0.2
MAXCH = 16


def main():
    import jax
    import jax.numpy as jnp
    from tputime import report

    from gslivm_tpu.models.cameras import make_camera
    from gslivm_tpu.ops import binning as B
    from gslivm_tpu.ops import rasterize_pallas as RP
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
    gt = jnp.zeros((3, HEIGHT, WIDTH), jnp.float32)

    bx, by = BLOCK
    grid_x, grid_y = tile_grid(WIDTH, HEIGHT)
    sgx, sgy = -(-grid_x // bx), -(-grid_y // by)
    num_tiles = sgx * sgy
    pad_cols = B._padded_capacity(MAXI, num_tiles, SLACK)
    cfg = RP.PallasConfig(grid_x=sgx, grid_y=sgy,
                          max_chunks_per_tile=MAXCH, interpret=False,
                          pw=16 * bx, ph=16 * by, rect_test=True,
                          pad_cols=pad_cols)

    def _bin(pre, aligned=False):
        return B.bin_instances(pre, WIDTH, HEIGHT, MAXI, MAXCH,
                               capacity_slack=SLACK, block_x=bx, block_y=by,
                               aligned_layout=aligned)

    # ---- instance statistics (sizing max_instances) ----------------------
    pre0 = preprocess(means, scales, quats, opac, shs, cam)
    b = _bin(pre0, aligned=True)
    kept = int(jnp.sum(b.gauss_rank >= 0))
    print(f"expansion total (rect area): {int(b.num_instances)}")
    print(f"kept after cull+cap        : {kept}")
    print(f"overflow                   : {int(b.overflow)}")
    print(f"padded capacity            : {b.gauss_rank.shape[0]}")
    nch = np.asarray(b.tile_nchunks)
    print(f"chunks: total {nch.sum()}, max/tile {nch.max()}, "
          f"mean/tile {nch.mean():.2f}", flush=True)

    def s_pre(ms, sc, qu, op, sh):
        return preprocess(ms, sc, qu, op, sh, cam)

    def s_bin(ms, sc, qu, op, sh):
        return _bin(preprocess(ms, sc, qu, op, sh, cam))

    def _table_gid(ms, sc, qu, op, sh):
        pre = preprocess(ms, sc, qu, op, sh, cam)
        binned = _bin(pre)
        table = RP._build_rank_table(pre, binned.dorder, rect_rows=True)
        gid_ext = jnp.concatenate(
            [binned.gid_sorted, jnp.zeros((2 * B.CHUNK,), jnp.int32)])
        return binned, table, gid_ext

    def s_pack(ms, sc, qu, op, sh):
        binned, table, gid_ext = _table_gid(ms, sc, qu, op, sh)
        return table[:, gid_ext]

    def s_fwd(ms, sc, qu, op, sh):
        binned, table, gid_ext = _table_gid(ms, sc, qu, op, sh)
        return RP._render_from_table(
            cfg, table, gid_ext, binned.sorted_start, binned.tile_nchunks,
            binned.cnt_allowed, binned.tile_offset)

    def s_full_fwd(ms, sc, qu, op, sh):
        out = RP.rasterize_pallas(ms, sc, qu, op, sh, cam,
                                  max_instances=MAXI, interpret=False,
                                  block_x=bx, block_y=by)
        return jnp.sum((out.color - gt) ** 2) + 0.1 * jnp.sum(out.acc)

    grad_full = jax.grad(s_full_fwd, argnums=(0, 1, 2, 3, 4))

    def s_kernel_loss(ms, sc, qu, op, sh):
        binned, table, gid_ext = _table_gid(ms, sc, qu, op, sh)
        tiles = RP._render_from_table(
            cfg, table, gid_ext, binned.sorted_start, binned.tile_nchunks,
            binned.cnt_allowed, binned.tile_offset)
        return jnp.sum(tiles[:, :5, :] ** 2)

    grad_kernel = jax.grad(s_kernel_loss, argnums=(0, 1, 2, 3, 4))

    args = (means, scales, quats, opac, shs)
    report("preprocess", s_pre, *args)
    report("+ binning", s_bin, *args)
    report("+ feature pack", s_pack, *args)
    report("+ fwd kernel", s_fwd, *args)
    report("full fwd (loss)", s_full_fwd, *args)
    report("fwd+bwd kernel-only grads", grad_kernel, *args)
    report("FULL fwd+bwd", grad_full, *args)


def main_bwd():
    """Finer backward-side cuts: kernel-only vs +scatter vs +table-VJP."""
    import jax
    import jax.numpy as jnp
    from tputime import report

    from gslivm_tpu.models.cameras import make_camera
    from gslivm_tpu.ops import binning as B
    from gslivm_tpu.ops import rasterize_pallas as RP
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

    bx, by = BLOCK
    grid_x, grid_y = tile_grid(WIDTH, HEIGHT)
    sgx, sgy = -(-grid_x // bx), -(-grid_y // by)
    num_tiles = sgx * sgy
    pad_cols = B._padded_capacity(MAXI, num_tiles, SLACK)
    cfg = RP.PallasConfig(grid_x=sgx, grid_y=sgy,
                          max_chunks_per_tile=MAXCH, interpret=False,
                          pw=16 * bx, ph=16 * by, rect_test=True,
                          pad_cols=pad_cols)

    # precompute fwd state ONCE (host constants for the bwd-only stages)
    pre0 = preprocess(means, scales, quats, opac, shs, cam)
    pre0 = jax.tree.map(jax.lax.stop_gradient, pre0)
    binned = B.bin_instances(pre0, WIDTH, HEIGHT, MAXI, MAXCH,
                             capacity_slack=SLACK, block_x=bx, block_y=by,
                             aligned_layout=False)
    table = RP._build_rank_table(pre0, binned.dorder, rect_rows=True)
    gid_ext = jnp.concatenate(
        [binned.gid_sorted, jnp.zeros((2 * B.CHUNK,), jnp.int32)])
    inst = table[:, gid_ext]
    out, ckpt = RP._fwd_call(cfg, inst, binned.sorted_start,
                             binned.tile_nchunks, binned.cnt_allowed,
                             save_ckpt=True)
    out = jax.block_until_ready(out)
    neff = out[:, 7, 0].astype(jnp.int32)
    g_tiles = jnp.ones_like(out)

    def s_bwd_kernel(g_tiles):
        return RP._bwd_call(cfg, inst, binned.sorted_start, neff,
                            binned.cnt_allowed, binned.tile_offset, g_tiles,
                            out, ckpt)

    def s_bwd_zero(g_tiles):
        d_pad = s_bwd_kernel(g_tiles)
        pad = cfg.pad_cols
        bound_marks = jnp.zeros((pad,), jnp.int32).at[binned.tile_offset].max(
            binned.tile_offset + B.CHUNK * neff, mode="drop")
        bound = jax.lax.cummax(bound_marks)
        slot = jnp.arange(pad, dtype=jnp.int32)
        return jnp.where((slot < bound)[None, :], d_pad, 0.0)

    def s_bwd_scatter(g_tiles):
        d_pad = s_bwd_zero(g_tiles)
        ids = d_pad[RP._FID].astype(jnp.int32)
        return jnp.zeros((10, N), jnp.float32).at[:, ids].add(d_pad[:10])

    def s_fwd_only(g_tiles):
        o, c = RP._fwd_call(cfg, inst, binned.sorted_start,
                            binned.tile_nchunks, binned.cnt_allowed,
                            save_ckpt=True)
        return o[:, :5, :].sum() + g_tiles[0, 0, 0]

    report("fwd kernel (ckpt) only", s_fwd_only, g_tiles)
    report("bwd kernel only", s_bwd_kernel, g_tiles)
    report("+ zero never-written", s_bwd_zero, g_tiles)
    report("+ grad scatter-add", s_bwd_scatter, g_tiles)


if __name__ == "__main__":
    import jax
    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                     ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    if len(sys.argv) > 1 and sys.argv[1] == "bwd":
        main_bwd()
    else:
        main()
