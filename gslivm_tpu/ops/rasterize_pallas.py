"""Pallas TPU tile rasterizer — forward + hand-derived backward.

TPU-native redesign of the reference CUDA render kernels
(`src/cuda_rasterizer/forward.cu:291-407`, `backward.cu:439-613`):

  * One grid program per pixel block — a 16x16 tile by default, or a
    (16*block_x) x (16*block_y) SUPERTILE (block_x/block_y): coarser bins
    mean ~block_x*block_y fewer (gaussian, tile) instances, shrinking every
    instance-space XLA op (sort/pack/grad-scatter) while kernel pixel work
    stays constant (docs/kernels.md "Supertile"). Register layout is chosen
    for the VPU: the npix block pixels live on the LANE axis so all
    per-pixel carry state is (1, npix) — 2 vregs per 256 px; the 128
    instances of a chunk live on the SUBLANE axis. Compute arrays are
    (CHUNK, NPIX).
  * Instances arrive depth-sorted and CHUNK(=128)-aligned from `binning.py`;
    the kernel streams feature-major [16, CHUNK] blocks HBM->VMEM with
    double-buffered async DMA (the analog of the CUDA collective
    shared-memory fetch, forward.cu:346-353).
  * Front-to-back compositing inside a chunk is vectorized with an exclusive
    cumulative product over the sublane axis (multiplicative Hillis-Steele
    scan); the early-stop (T < 1e-4, forward.cu:377-381) becomes a
    self-latching mask.
  * The FORWARD kernel checkpoints per-chunk transmittance state (T with the
    done flag in the sign bit) to HBM and records the per-tile EFFECTIVE
    chunk count (first chunk at which every pixel saturated). The backward
    therefore needs NO replay pass — it walks chunks in reverse directly
    from the checkpoints and stops at the effective count, skipping the
    fully-occluded tail that CUDA's backward re-traverses
    (backward.cu:482-530).
  * The backward replaces CUDA's atomicAdd scatter (backward.cu:591-600)
    with per-INSTANCE gradients written to a dense [FEAT, PAD] array,
    segment-summed to per-gaussian gradients outside the kernel (TPU has no
    atomics). dL/dalpha uses ONE fused suffix scan per chunk; transmittance
    is never reconstructed by division (backward.cu's T /= (1 - alpha)).

Gradient semantics match the naive oracle (JAX autodiff of the exact forward
math). KNOWN DEVIATION from the CUDA backward: the reference ignores the
min(0.99, alpha) clamp when backpropagating (backward.cu:584-609 uses
dL_dG = opacity * dL_dalpha unconditionally); we apply the correct
subgradient (zero when clamped), matching autodiff. The clamp is active
only for near-opaque splats.

Gradient contract (which outputs get cotangents) is enforced one level up
in `rasterize.py` (depth-grad drop parity).

SEQUENTIAL-GRID INVARIANT: both kernels' cross-program handoffs (the
instance chunk-0 DMA baton, the forward's double-buffered ckpt_scr drain,
and the backward's single-buffer ckpt_scr overwrite) are correct ONLY
because the 1-D grid executes its programs strictly in order on one
TensorCore (the default 'arbitrary' dimension semantics — no
dimension_semantics=('parallel',), no megacore grid splitting). Any future
parallelization of the grid dimension must first remove these handoffs.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .binning import CHUNK, _padded_capacity, bin_instances
from .rasterize_reference import (
    TILE,
    PreprocessedGaussians,
    RenderOutput,
    preprocess,
    tile_grid,
)

NPIX = TILE * TILE  # 256 pixels per 16x16 tile (block_x = block_y = 1)
FEAT = 16  # packed instance feature columns (14 used, padded for tiling)
# feature column indices; _FX0.._FY1 are the splat's 16x16 TILE-rect bounds
# in pixels, used only in supertile mode (see _chunk_terms rect test)
(_FX, _FY, _FA, _FB, _FC, _FO, _FR, _FG, _FB2, _FD,
 _FX0, _FX1, _FY0, _FY1) = range(14)
_FID = 14  # sorted-input mode: depth-rank id rides as an exact-f32 feature
           # row; the backward writes it next to the per-instance grads so
           # the gradient scatter needs NO separately-materialized id array


class PallasConfig(NamedTuple):
    """Static kernel configuration (hashable -> usable as nondiff arg).

    grid_x/grid_y count PROGRAMS; each program composites a pw x ph pixel
    block (pw = 16*block_x, ph = 16*block_y — supertile rendering, see
    binning.py). Per-pixel carry state is (1, pw*ph)."""

    grid_x: int
    grid_y: int
    max_chunks_per_tile: int
    interpret: bool
    pw: int = TILE
    ph: int = TILE
    rect_test: bool = False
    # Instances always arrive in the UNPADDED depth-sorted layout the
    # binning sort emits: per-tile runs start at arbitrary offsets; the
    # kernel DMAs a 2*CHUNK aligned window and lane-rotates by the run
    # phase (docs/kernels.md "sorted-layout kernel input"). The earlier
    # CHUNK-aligned input mode (placement-scatter layout) was deleted in r3
    # once it went dead in production — aligned binning survives only for
    # the profiling/stat tools (bin_instances aligned_layout=True).
    pad_cols: int = 0           # width of the backward's CHUNK-aligned
                                # per-instance grad output
    grad_cols: int = 0          # COMPACTED grad-output width (0 = disabled:
    # grads use the full pad_cols layout at the static tile offsets). When
    # > 0 the backward writes each tile's chunks at CHUNK * prefix(neff)
    # — a dense prefix of exactly walked_chunks * CHUNK live slots — so the
    # per-gaussian gradient scatter-add (the ~15 ns/index wall,
    # docs/kernels.md) runs over grad_cols instead of pad_cols indices
    # (~60% walked fraction at the bench shape => ~1.5x fewer indices).
    # Too-small capacity clamps the excess chunks onto the last slot
    # (grads approximate, never OOB) and is counted into overflow by the
    # wrapper, which escalates like every other budget.
    skip_depth_grad: bool = False  # reference depth-grad-drop contract
    # (rasterizer.cu:79): when the caller drops the depth cotangent anyway,
    # the backward skips the psi depth term, the depth grad row, and its
    # share of the gradient scatter
    skip_contrib: bool = False  # skip the per-pixel n_contrib bookkeeping
    # (~5 VPU passes/chunk in the forward). The CUDA forward must always
    # record last_contributor because its BACKWARD starts from it
    # (forward.cu:398-405, backward.cu:478); our backward walks neff
    # checkpoints instead, so n_contrib is pure statistics here — production
    # paths drop it (n_contrib renders as zeros), tests/tools keep it

    @property
    def npix(self) -> int:
        return self.pw * self.ph


# ---------------------------------------------------------------------------
# In-kernel helpers
# ---------------------------------------------------------------------------


def _cumsum_rows(x, exclusive: bool):
    """Cumulative sum along the sublane (first) axis of a (CHUNK, NPIX) array.

    Hillis-Steele scan: log2(rows) shift-and-add steps with static shapes.
    (A two-level vreg-split scan — 4.1 full-array combines instead of 7 —
    was measured SLOWER on v5e: Mosaic's (16, 8, cols) regroup, sublane
    extraction and broadcast relayouts cost more than the saved combines;
    full step 88.9 -> 90.8 ms. Flat HS stays.)
    """
    orig = x
    n, cols = x.shape
    s = 1
    while s < n:
        shifted = jnp.concatenate(
            [jnp.zeros((s, cols), x.dtype), x[: n - s, :]], axis=0
        )
        x = x + shifted
        s *= 2
    return x - orig if exclusive else x


def _cumprod_rows(x, exclusive: bool):
    """Cumulative product along the sublane axis (ones-filled shifts).

    Multiplicative Hillis-Steele scan — bit-compatible with the oracle's
    jnp.cumprod (no log/exp roundtrip, which costs ~1e-3 accumulated error
    through the TPU's approximate transcendentals).
    """
    n, cols = x.shape
    s = 1
    while s < n:
        shifted = jnp.concatenate(
            [jnp.ones((s, cols), x.dtype), x[: n - s, :]], axis=0
        )
        x = x * shifted
        s *= 2
    return _shift_down_ones(x) if exclusive else x


def _shift_down_ones(x):
    """Exclusive from inclusive scan: prepend a ones row, drop the last."""
    return jnp.concatenate(
        [jnp.ones((1, x.shape[1]), x.dtype), x[:-1, :]], axis=0
    )


def _suffix_excl(x):
    """Sum over strictly-later rows: S[k] = sum_{j>k} x[j]."""
    total = jnp.sum(x, axis=0, keepdims=True)
    return total - _cumsum_rows(x, exclusive=False)


def _pixel_coords(t, cfg: PallasConfig):
    """Per-program pixel coordinates as (1, npix) f32 rows (row-major within
    the pw x ph block). Band-relative: when rendering a tile band, the
    instance mean2d.y is shifted into band-local coordinates by the wrapper
    (so a traced band start stays out of the static kernel config)."""
    tile_y = t // cfg.grid_x
    tile_x = t % cfg.grid_x
    p = jax.lax.broadcasted_iota(jnp.int32, (1, cfg.npix), 1)
    col = p % cfg.pw
    row = p // cfg.pw
    px = (tile_x * cfg.pw + col).astype(jnp.float32)
    py = (tile_y * cfg.ph + row).astype(jnp.float32)
    return px, py


def _chunk_terms(featT, px, py, T_in, done_in, rect_test: bool = False):
    """Shared fwd/bwd per-chunk math (exact oracle semantics, vectorized).

    featT: (CHUNK, FEAT) — transposed feature block (gaussians on sublanes);
    px/py/T_in/done_in: (1, NPIX).
    rect_test: in supertile mode a program's pixel block is a SUPERSET of a
    splat's 16x16 tile rect, so reference rect-cut semantics (a pixel only
    sees splats whose tile rect covers its tile, auxiliary.h:39-45 +
    forward.cu:291) need an explicit per-pixel rect membership test; at
    block 1x1 the binning guarantees it and the test is skipped.
    Returns a dict of (CHUNK, NPIX) / (1, NPIX) arrays.
    """
    x = featT[:, _FX][:, None]
    y = featT[:, _FY][:, None]
    ca = featT[:, _FA][:, None]
    cb = featT[:, _FB][:, None]
    cc = featT[:, _FC][:, None]
    op = featT[:, _FO][:, None]

    dx = x - px  # (CHUNK, NPIX)
    dy = y - py
    power = -0.5 * (ca * dx * dx + cc * dy * dy) - cb * dx * dy
    G = jnp.exp(power)
    raw_alpha = op * G
    alpha = jnp.minimum(0.99, raw_alpha)
    accepted = (power <= 0.0) & (alpha >= 1.0 / 255.0)
    if rect_test:
        accepted = (
            accepted
            & (px >= featT[:, _FX0][:, None]) & (px < featT[:, _FX1][:, None])
            & (py >= featT[:, _FY0][:, None]) & (py < featT[:, _FY1][:, None])
        )
    one_minus_eff = jnp.where(accepted, 1.0 - alpha, 1.0)

    T_prev = T_in * _cumprod_rows(one_minus_eff, exclusive=True)
    T_next = T_prev * (1.0 - alpha)
    would_stop = accepted & (T_next < 1e-4)
    # The early-stop latch needs NO cumulative scan: T_prev is non-increasing
    # over accepted splats, so once T_prev*(1-alpha) < 1e-4 fires, every
    # later accepted splat has T_prev below that same bound and fails the
    # test too — would_stop self-latches. contrib = accepted, not yet done,
    # and above the threshold; exactly the oracle's cumsum-latched mask.
    contrib = accepted & jnp.logical_not(done_in) & (T_next >= 1e-4)
    w = jnp.where(contrib, alpha * T_prev, 0.0)

    # T after the last contribution == min over contributions of T_next
    # (T is non-increasing); saves a third full scan.
    T_out = jnp.min(jnp.where(contrib, T_next, T_in), axis=0, keepdims=True)
    done_out = done_in | jnp.any(would_stop, axis=0, keepdims=True)
    return dict(
        dx=dx, dy=dy, G=G, raw_alpha=raw_alpha, alpha=alpha,
        contrib=contrib, w=w, T_prev=T_prev, T_out=T_out, done_out=done_out,
    )


# ---------------------------------------------------------------------------
# Forward kernel
# ---------------------------------------------------------------------------


def _inst_get_dma(cfg, inst_ref, buf_ref, sem_ref, off):
    """Chunk-fetch closure: per-tile runs start at arbitrary offsets in the
    sorted layout, so fetch the covering ALIGNED [FEAT, 2*CHUNK] window
    (all chunks of a tile share the phase off % CHUNK)."""
    base0 = (off // CHUNK) * CHUNK

    def get_dma(slot, i):
        start = pl.multiple_of(base0 + i * CHUNK, CHUNK)
        return pltpu.make_async_copy(
            inst_ref.at[:, pl.ds(start, 2 * CHUNK)],
            buf_ref.at[slot],
            sem_ref.at[slot],
        )
    return get_dma


def _chunk_feats(cfg, buf_ref, slot, phi, rem):
    """Materialize one chunk's (CHUNK, FEAT) transposed feature block:
    lane-rotate the 2*CHUNK window by the run phase (dynamic pltpu.roll),
    take the leading CHUNK, and ZERO rows past the run length (the window
    overruns into the next tile's instances — zeroing every feature makes
    opacity 0, so they composite as nothing). The shift is reduced mod
    2*CHUNK so the phase-0 case is an explicit identity rather than relying
    on roll's wrap-at-size semantics."""
    win = pltpu.roll(buf_ref[slot], jax.lax.rem(2 * CHUNK - phi, 2 * CHUNK),
                     axis=1)
    featT = win[:, :CHUNK].T
    row = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, FEAT), 0)
    return jnp.where(row < rem, featT, 0.0)


def _fwd_kernel(cfg: PallasConfig, save_ckpt: bool, off_ref, nch_ref,
                cnt_ref, inst_ref, out_ref, *rest):
    if save_ckpt:
        ckpt_ref, buf_ref, ckpt_scr, sem_ref, csem_ref = rest
    else:
        buf_ref, sem_ref = rest
    t = pl.program_id(0)
    off = off_ref[t]
    nchunks = nch_ref[t]
    cnt = cnt_ref[t]
    phi = off - (off // CHUNK) * CHUNK
    px, py = _pixel_coords(t, cfg)

    get_dma = _inst_get_dma(cfg, inst_ref, buf_ref, sem_ref, off)

    # Cross-program prefetch: tile t's chunk-0 DMA was started by program
    # t-1 (see the epilogue below), so its HBM latency hides behind the
    # predecessor's compute — with ~2 effective chunks/tile the pipeline
    # never warms up WITHIN a tile, and an exposed first-fetch wait per tile
    # is the dominant per-chunk overhead (docs/kernels.md r4 roofline).
    # Only program 0 cold-starts its own first chunk. Within-tile chunk i
    # rides slot rem(i, 2), so chunk 0 is always slot 0 and the handoff slot
    # is deterministic; program t's own slot-0 DMAs are all consumed before
    # its epilogue issues the successor's start (the loop waits every DMA it
    # starts), so the handoff never races a live buffer.
    @pl.when((t == 0) & (nchunks > 0))
    def _():
        get_dma(0, 0).start()

    if save_ckpt:
        # ckpt_scr is double-buffered and its HBM store is ASYNC: program t
        # writes slot rem(t, 2) and starts the store in its epilogue; the
        # store drains while t+1 computes (in the other slot) and is waited
        # here two programs later, just before this program's first store
        # into the same slot. This removes a blocking ~64 KB-DMA wait per
        # tile from the forward.
        cslot = jax.lax.rem(t, 2)

        @pl.when((t >= 2) & (nch_ref[jnp.maximum(t - 2, 0)] > 0))
        def _():
            pltpu.make_async_copy(
                ckpt_scr.at[cslot], ckpt_ref.at[jnp.maximum(t - 2, 0)],
                csem_ref.at[cslot]).wait()

    zeros = jnp.zeros((1, cfg.npix), jnp.float32)
    init = (
        jnp.ones((1, cfg.npix), jnp.float32),   # T
        jnp.zeros((1, cfg.npix), jnp.float32),  # done (f32 0/1: i1 loop carries
                                            # fail to legalize in Mosaic)
        zeros, zeros, zeros,                # C0, C1, C2
        zeros, zeros,                       # D, A
        zeros,                              # n_contrib (as f32)
        jnp.float32(-1.0),                  # neff: first all-done chunk
        jnp.where(nchunks > 0, 1.0, 0.0),   # pending: chunk i's DMA in flight
    )

    def body(i, carry):
        *state, neff, pending = carry
        T, done = state[0], state[1]
        slot = jax.lax.rem(i, 2)
        has_chunk = pending > 0.0

        @pl.when(has_chunk)
        def _():
            get_dma(slot, i).wait()

        # early exit (forward.cu:342-344 block vote): once every pixel is
        # done, stop fetching and computing; `done` is monotone so the
        # pending flag stays consistent with past start decisions.
        all_done = jnp.min(done) > 0.0
        neff = jnp.where((neff < 0.0) & all_done, i.astype(jnp.float32), neff)
        fetch_next = jnp.logical_and(
            has_chunk, jnp.logical_and(jnp.logical_not(all_done),
                                       i + 1 < nchunks))

        @pl.when(fetch_next)
        def _():
            get_dma(jax.lax.rem(i + 1, 2), i + 1).start()

        do_work = jnp.logical_and(has_chunk, jnp.logical_not(all_done))

        if save_ckpt:
            # checkpoint chunk-START state for the backward: T with the done
            # flag in the sign (T >= 1e-4 > 0 always, see _chunk_terms)
            @pl.when(do_work)
            def _():
                ckpt_scr[cslot, pl.ds(i, 1), :] = T * (1.0 - 2.0 * done)

        def compute(state):
            T, done, C0, C1, C2, D, A, N = state
            # (CHUNK, FEAT): gaussians on sublanes
            featT = _chunk_feats(cfg, buf_ref, slot, phi, cnt - i * CHUNK)
            m = _chunk_terms(featT, px, py, T, done > 0.0,
                             cfg.rect_test)
            w = m["w"]
            C0 = C0 + jnp.sum(w * featT[:, _FR][:, None], axis=0, keepdims=True)
            C1 = C1 + jnp.sum(w * featT[:, _FG][:, None], axis=0, keepdims=True)
            C2 = C2 + jnp.sum(w * featT[:, _FB2][:, None], axis=0, keepdims=True)
            D = D + jnp.sum(w * featT[:, _FD][:, None], axis=0, keepdims=True)
            A = A + jnp.sum(w, axis=0, keepdims=True)
            if not cfg.skip_contrib:
                row = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, cfg.npix), 0)
                idx = (row + i * CHUNK + 1).astype(jnp.float32)
                N = jnp.maximum(N, jnp.max(jnp.where(m["contrib"], idx, 0.0),
                                           axis=0, keepdims=True))
            return (m["T_out"], m["done_out"].astype(jnp.float32),
                    C0, C1, C2, D, A, N)

        state = jax.lax.cond(do_work, compute, lambda s: s, tuple(state))
        return (*state, neff, jnp.where(fetch_next, 1.0, 0.0))

    T, done, C0, C1, C2, D, A, N, neff, _ = jax.lax.fori_loop(
        0, nchunks, body, init)
    neff = jnp.where(neff < 0.0, nchunks.astype(jnp.float32), neff)

    # epilogue: hand off tile t+1's first chunk (see prologue note). Every
    # program issues it (a zero-chunk tile still forwards the baton).
    nt = cfg.grid_x * cfg.grid_y
    t1 = jnp.minimum(t + 1, nt - 1)

    @pl.when((t + 1 < nt) & (nch_ref[t1] > 0))
    def _():
        _inst_get_dma(cfg, inst_ref, buf_ref, sem_ref,
                      off_ref[t1])(0, 0).start()

    out_ref[0, :, :] = jnp.concatenate(
        [C0, C1, C2, D, A, T, N, jnp.full((1, cfg.npix), neff)], axis=0
    )

    if save_ckpt:
        @pl.when(nchunks > 0)
        def _():
            pltpu.make_async_copy(ckpt_scr.at[cslot], ckpt_ref.at[t],
                                  csem_ref.at[cslot]).start()

        # the final two programs' stores have no successor to wait them:
        # drain both here (the other slot first — it was started earlier)
        last = nt - 1
        other = jax.lax.rem(jnp.maximum(t - 1, 0), 2)

        @pl.when((t == last) & (t >= 1) & (nch_ref[jnp.maximum(t - 1, 0)] > 0))
        def _():
            pltpu.make_async_copy(ckpt_scr.at[other],
                                  ckpt_ref.at[jnp.maximum(t - 1, 0)],
                                  csem_ref.at[other]).wait()

        @pl.when((t == last) & (nchunks > 0))
        def _():
            pltpu.make_async_copy(ckpt_scr.at[cslot], ckpt_ref.at[t],
                                  csem_ref.at[cslot]).wait()


# ---------------------------------------------------------------------------
# Backward kernel
# ---------------------------------------------------------------------------


def _bwd_kernel(cfg: PallasConfig, off_ref, neff_ref, cnt_ref, poff_ref,
                inst_ref, g_ref, fwd_ref, ckpt_ref, dinst_ref, buf_ref,
                ckpt_scr, gbuf_ref, rsem_ref, wsem_ref, csem_ref):
    t = pl.program_id(0)
    off = off_ref[t]
    neff = neff_ref[t]
    cnt = cnt_ref[t]
    phi = off - (off // CHUNK) * CHUNK
    # grad OUTPUT is always CHUNK-aligned: poff carries the padded offsets
    # (writes cannot ride the unaligned instance layout)
    woff = poff_ref[t]
    px, py = _pixel_coords(t, cfg)

    get_dma = _inst_get_dma(cfg, inst_ref, buf_ref, rsem_ref, off)

    def put_dma(slot, i):
        start = woff + i * CHUNK
        if cfg.grad_cols > 0:
            # compacted layout: a too-small grad_cols budget clamps the
            # overflowing chunks onto the final slot (counted into overflow
            # by the wrapper) instead of writing OOB
            start = jnp.minimum(start, cfg.grad_cols - CHUNK)
        start = pl.multiple_of(start, CHUNK)
        return pltpu.make_async_copy(
            gbuf_ref.at[slot],
            dinst_ref.at[:, pl.ds(start, CHUNK)],
            wsem_ref.at[slot],
        )

    # This tile's forward checkpoints (ONE block DMA) and the first (i.e.
    # deepest, neff-1) feature chunk were started by program t-1's epilogue
    # (cross-program prefetch, same rationale as the forward kernel: with
    # ~2 effective chunks/tile the exposed per-tile first-fetch latency
    # dominates). Only program 0 cold-starts its own. The handoff slot
    # rem(neff-1, 2) is computed identically on both sides; ckpt_scr is a
    # single buffer — the predecessor issues the overwrite only after its
    # own loop finished reading it.
    @pl.when((t == 0) & (neff > 0))
    def _():
        pltpu.make_async_copy(ckpt_ref.at[t], ckpt_scr, csem_ref).start()
        get_dma(jax.lax.rem(neff - 1, 2), neff - 1).start()

    @pl.when(neff > 0)
    def _():
        pltpu.make_async_copy(ckpt_ref.at[t], ckpt_scr, csem_ref).wait()

    # Cotangents for this tile: rows C0,C1,C2,D,A,T of the fwd output.
    g = g_ref[0]  # (8, NPIX)
    gC0 = g[0:1, :]
    gC1 = g[1:2, :]
    gC2 = g[2:3, :]
    gD = g[3:4, :]
    gA = g[4:5, :]
    gT = g[5:6, :]
    T_fin = fwd_ref[0, 5:6, :]  # final transmittance from the forward
    gTT = gT * T_fin  # loop-invariant: hoisted out of the chunk walk

    # ---- Reverse chunk walk with suffix-sum carries. ---------------------
    zeros = jnp.zeros((1, cfg.npix), jnp.float32)
    carry0 = (zeros,)  # fused suffix-sum carry W_psi

    def reverse(j, carry):
        (Wpsi,) = carry
        i = neff - 1 - j
        slot = jax.lax.rem(i, 2)

        @pl.when(i - 1 >= 0)
        def _():
            get_dma(jax.lax.rem(i - 1, 2), i - 1).start()

        get_dma(slot, i).wait()
        featT = _chunk_feats(cfg, buf_ref, slot, phi, cnt - i * CHUNK)
        T_signed = ckpt_scr[pl.ds(i, 1), :]
        T_in = jnp.abs(T_signed)
        done_in = T_signed < 0.0
        m = _chunk_terms(featT, px, py, T_in, done_in, cfg.rect_test)

        w = m["w"]
        r = featT[:, _FR][:, None]
        gch = featT[:, _FG][:, None]
        b = featT[:, _FB2][:, None]
        dep = featT[:, _FD][:, None]

        # One fused suffix scan: the per-output cotangents enter dL/dalpha
        # only through psi_j = sum_ch g_ch * c_j_ch (+ gD*d_j + gA), so the
        # five per-channel suffix sums collapse to the suffix sum of w*psi.
        psi = gC0 * r + gC1 * gch + gC2 * b + gA
        if not cfg.skip_depth_grad:
            psi = psi + gD * dep
        S = _suffix_excl(w * psi) + Wpsi

        one_minus = 1.0 - m["alpha"]
        inv = 1.0 / jnp.maximum(one_minus, 1e-6)
        T_prev = m["T_prev"]
        dLda = T_prev * psi - (S + gTT) * inv
        dLda = jnp.where(m["contrib"], dLda, 0.0)

        # min(0.99, .) subgradient gate (deviation from CUDA, see module doc)
        not_clamped = m["raw_alpha"] < 0.99
        G = m["G"]
        op = featT[:, _FO][:, None]
        ca = featT[:, _FA][:, None]
        cb = featT[:, _FB][:, None]
        cc = featT[:, _FC][:, None]

        # per-instance grads: reduce over pixels (lanes) -> (CHUNK, 1)
        def psum(v):
            return jnp.sum(v, axis=1, keepdims=True)

        # (r3 negative result: computing the five d_power rows from MXU
        # pixel-moments of a shared integrand — dx separability turns them
        # into polynomial combos of six e-moments, one (CHUNK,NPIX)x(NPIX,6)
        # bf16-split matmul — measured EXACTLY the same bwd-kernel time,
        # 23.1 vs 23.2 ms: the cross-lane reductions are not the
        # bottleneck.)
        # r4: the per-instance conic factors (ca, cb, cc — constant across
        # the pixel lanes) DISTRIBUTE out of the pixel reductions:
        # sum(d_power*(ca*dx + cb*dy)) = ca*sum(u) + cb*sum(v) with
        # u = d_power*dx, v = d_power*dy (u, v feed the conic rows too) —
        # ~12 fewer full-array passes per chunk than the direct polynomial
        # forms, at f32-reassociation-level numerical difference.
        dx, dy = m["dx"], m["dy"]
        d_op = jnp.where(not_clamped, G, 0.0) * dLda
        d_power = jnp.where(not_clamped, op, 0.0) * dLda * G
        u = d_power * dx
        v = d_power * dy
        su = psum(u)
        sv = psum(v)
        grads = [
            -(ca * su + cb * sv),                     # d mean2d.x
            -(cc * sv + cb * su),                     # d mean2d.y
            -0.5 * psum(u * dx),                      # d conic a
            -psum(u * dy),                            # d conic b
            -0.5 * psum(v * dy),                      # d conic c
            psum(d_op),                               # d opacity
            psum(gC0 * w),                            # d color r
            psum(gC1 * w),                            # d color g
            psum(gC2 * w),                            # d color b
        ]
        if not cfg.skip_depth_grad:
            grads.append(psum(gD * w))                # d depth
        # the rank-id feature row rides along with the grads: the VJP's
        # gradient scatter indexes by it, so no padded id array is ever
        # materialized (masked overrun rows were zeroed -> id 0, grad 0)
        gout = jnp.concatenate(
            grads
            + [jnp.zeros((CHUNK, _FID - len(grads)), jnp.float32),
               featT[:, _FID][:, None],
               jnp.zeros((CHUNK, FEAT - _FID - 1), jnp.float32)],
            axis=1,
        )

        # write this chunk's grads (double-buffered store DMA)
        @pl.when(j >= 2)
        def _():
            put_dma(slot, i + 2).wait()

        gbuf_ref[slot] = gout.T  # back to feature-major (FEAT, CHUNK)
        put_dma(slot, i).start()

        return (Wpsi + jnp.sum(w * psi, axis=0, keepdims=True),)

    jax.lax.fori_loop(0, neff, reverse, carry0)

    # epilogue: hand off tile t+1's checkpoint block and deepest chunk (see
    # prologue note); every program forwards the baton
    nt = cfg.grid_x * cfg.grid_y
    t1 = jnp.minimum(t + 1, nt - 1)
    neff1 = neff_ref[t1]

    @pl.when((t + 1 < nt) & (neff1 > 0))
    def _():
        pltpu.make_async_copy(ckpt_ref.at[t1], ckpt_scr, csem_ref).start()
        _inst_get_dma(cfg, inst_ref, buf_ref, rsem_ref, off_ref[t1])(
            jax.lax.rem(neff1 - 1, 2), neff1 - 1).start()

    # drain outstanding grad writes
    @pl.when(neff >= 1)
    def _():
        put_dma(0, 0).wait()

    @pl.when(neff >= 2)
    def _():
        put_dma(1, 1).wait()


# ---------------------------------------------------------------------------
# pallas_call wrappers + custom VJP over the tile renderer
# ---------------------------------------------------------------------------


def _fwd_call(cfg: PallasConfig, inst, tile_offset, tile_nchunks, cnt,
              save_ckpt: bool):
    num_tiles = cfg.grid_x * cfg.grid_y
    bufw = 2 * CHUNK
    scratch = [
        pltpu.VMEM((2, FEAT, bufw), jnp.float32),
        pltpu.SemaphoreType.DMA((2,)),
    ]
    out_shape = jax.ShapeDtypeStruct((num_tiles, 8, cfg.npix), jnp.float32)
    out_specs = pl.BlockSpec(
        (1, 8, cfg.npix), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM
    )
    if save_ckpt:
        scratch = [
            pltpu.VMEM((2, FEAT, bufw), jnp.float32),
            # double-buffered: slot rem(t, 2) drains to HBM asynchronously
            # while program t+1 fills the other slot
            pltpu.VMEM((2, cfg.max_chunks_per_tile, cfg.npix), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ]
        out_shape = (out_shape, jax.ShapeDtypeStruct(
            (num_tiles, cfg.max_chunks_per_tile, cfg.npix), jnp.float32))
        out_specs = (out_specs, pl.BlockSpec(memory_space=pltpu.HBM))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(num_tiles,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)],
        out_specs=out_specs,
        scratch_shapes=scratch,
    )
    return pl.pallas_call(
        functools.partial(_fwd_kernel, cfg, save_ckpt),
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=cfg.interpret,
    )(tile_offset, tile_nchunks, cnt, inst)


def _bwd_call(cfg: PallasConfig, inst, tile_offset, neff, cnt, poff, g_tiles,
              fwd_tiles, ckpt):
    num_tiles = cfg.grid_x * cfg.grid_y
    pad = cfg.pad_cols
    bufw = 2 * CHUNK
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(num_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(
                (1, 8, cfg.npix), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, 8, cfg.npix), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.HBM),
        scratch_shapes=[
            pltpu.VMEM((2, FEAT, bufw), jnp.float32),
            pltpu.VMEM((cfg.max_chunks_per_tile, cfg.npix), jnp.float32),
            pltpu.VMEM((2, FEAT, CHUNK), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA,
        ],
    )
    out_cols = cfg.grad_cols if cfg.grad_cols > 0 else pad
    return pl.pallas_call(
        functools.partial(_bwd_kernel, cfg),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((FEAT, out_cols), jnp.float32),
        interpret=cfg.interpret,
    )(tile_offset, neff, cnt, poff, inst, g_tiles, fwd_tiles, ckpt)


# ---------------------------------------------------------------------------
# Public entry
# ---------------------------------------------------------------------------


@jax.custom_vjp
def _permute_cols(table, dorder, inv_dorder):
    """table[:, dorder] with a GATHER-based VJP: the cotangent is
    g[:, inv_dorder] (a permutation's adjoint is the inverse permutation),
    avoiding XLA's default scatter-add lowering."""
    return table[:, dorder]


def _permute_cols_fwd(table, dorder, inv_dorder):
    return table[:, dorder], (inv_dorder,)


def _permute_cols_bwd(res, g):
    (inv,) = res
    return (g[:, inv], np.zeros(inv.shape, jax.dtypes.float0),
            np.zeros(inv.shape, jax.dtypes.float0))


_permute_cols.defvjp(_permute_cols_fwd, _permute_cols_bwd)




def _build_rank_table(pre: PreprocessedGaussians, dorder, y_shift=0.0,
                      rect_rows: bool = False):
    """The [FEAT, P] per-gaussian screen-feature table in DEPTH-RANK column
    order (differentiable). The small [rows, P] stack is permuted into rank
    order with two cheap small-table gathers instead of one expensive
    PAD-wide un-permute; it is padded to FEAT rows BEFORE any wide gather
    (row count in a gather is nearly free; post-gather concats copy 77 MB).
    y_shift moves mean2d.y into band-local pixel coordinates. rect_rows
    appends the 4 tile-rect pixel bounds (supertile mode's in-kernel rect
    test); they are stop-gradient ints riding as exact f32 values. Row
    _FID is the column's own rank id (exact f32) — in sorted-input mode the
    instance gather propagates it so the backward's gradient scatter needs
    no separately-materialized id array."""
    rows = [
        pre.mean2d[:, 0],
        pre.mean2d[:, 1] - y_shift,
        pre.conic[:, 0],
        pre.conic[:, 1],
        pre.conic[:, 2],
        jnp.where(pre.valid, pre.opacity, 0.0),
        pre.color[:, 0],
        pre.color[:, 1],
        pre.color[:, 2],
        pre.depth,
    ]
    if rect_rows:
        rows += [
            (pre.rect_min[:, 0] * TILE).astype(jnp.float32),
            (pre.rect_max[:, 0] * TILE).astype(jnp.float32),
            (pre.rect_min[:, 1] * TILE).astype(jnp.float32) - y_shift,
            (pre.rect_max[:, 1] * TILE).astype(jnp.float32) - y_shift,
        ]
    nrows = len(rows)
    per_gauss = jnp.stack(rows, axis=0)  # [nrows, P] original order
    n = dorder.shape[0]
    inv_dorder = jnp.zeros((n,), jnp.int32).at[dorder].set(
        jnp.arange(n, dtype=jnp.int32))
    table = _permute_cols(per_gauss, dorder, inv_dorder)  # rank order
    pad = [jnp.zeros((_FID - nrows, n), table.dtype),
           jnp.arange(n, dtype=table.dtype)[None, :],
           jnp.zeros((FEAT - _FID - 1, n), table.dtype)]
    return jnp.concatenate([table] + pad, axis=0)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _render_from_table(cfg: PallasConfig, table, gid_ext, start, nchunks,
                       cnt, poff):
    """Sorted-input tile rendering straight from the rank table.

    Replaces pack-gather-into-padded-layout + placement scatter: instances
    stay in the UNPADDED depth-sorted order the binning sort emits
    (inst = table[:, gid_ext]); the kernels fetch aligned 2*CHUNK windows
    and lane-rotate by the per-tile run phase (pltpu.roll). The backward
    kernel writes per-instance grads to a CHUNK-aligned layout (poff) with
    the rank id riding in row _FID, so the per-gaussian gradient reduction
    scatter-adds directly off the kernel output — the ~7 ms 1-column
    placement scatter of the aligned layout disappears entirely
    (docs/kernels.md 'Measured instance-op primitives')."""
    inst = table[:, gid_ext]
    return _fwd_call(cfg, inst, start, nchunks, cnt, save_ckpt=False)


def _render_from_table_fwd(cfg, table, gid_ext, start, nchunks, cnt, poff):
    inst = table[:, gid_ext]
    out, ckpt = _fwd_call(cfg, inst, start, nchunks, cnt, save_ckpt=True)
    res = (inst, start, cnt, poff, out, ckpt, table.shape,
           gid_ext.shape, nchunks.shape)
    return out, res


def _render_from_table_bwd(cfg, res, g_tiles):
    (inst, start, cnt, poff, out, ckpt, tshape, gshape, nshape) = res
    neff = out[:, 7, 0].astype(jnp.int32)
    if cfg.grad_cols > 0:
        # COMPACTED layout: tile t writes its neff[t] chunks at
        # CHUNK * prefix(neff) — a dense prefix of the grad array, so the
        # scatter below runs over grad_cols ~= walked_chunks * CHUNK
        # indices instead of the full padded capacity (docs/kernels.md
        # "compacted grad output"). The bound-expansion machinery of the
        # padded layout collapses to one prefix mask.
        woff = CHUNK * (jnp.cumsum(neff) - neff).astype(jnp.int32)
        total = CHUNK * jnp.sum(neff)
        d_pad = _bwd_call(cfg, inst, start, neff, cnt, woff, g_tiles, out,
                          ckpt)
        slot = jnp.arange(cfg.grad_cols, dtype=jnp.int32)
        d_pad = jnp.where((slot < total)[None, :], d_pad, 0.0)
    else:
        d_pad = _bwd_call(cfg, inst, start, neff, cnt, poff, g_tiles, out,
                          ckpt)
        # zero never-written slots (chunks >= neff are fully occluded =>
        # zero gradient); the per-tile bound poff[t] + CHUNK*neff[t] is
        # non-decreasing, so it expands with a start-scatter + running max
        pad = cfg.pad_cols
        bound_marks = jnp.zeros((pad,), jnp.int32).at[poff].max(
            poff + CHUNK * neff, mode="drop")
        bound = jax.lax.cummax(bound_marks)
        slot = jnp.arange(pad, dtype=jnp.int32)
        d_pad = jnp.where((slot < bound)[None, :], d_pad, 0.0)
    # per-gaussian (rank-space) reduction: indices come from the kernel's
    # id row; masked/padding slots carry id 0 with zero grads
    ids = d_pad[_FID].astype(jnp.int32)
    ndg = 9 if cfg.skip_depth_grad else 10  # depth row skipped with the
    # reference's depth-grad-drop contract (kernel wrote zeros there)
    dg = jnp.zeros((ndg, tshape[1]), d_pad.dtype).at[:, ids].add(d_pad[:ndg])
    d_table = jnp.concatenate(
        [dg, jnp.zeros((tshape[0] - ndg, tshape[1]), d_pad.dtype)], axis=0)
    f0 = lambda s: np.zeros(s, jax.dtypes.float0)  # noqa: E731
    return (d_table, f0(gshape), f0(nshape), f0(nshape), f0(nshape),
            f0(nshape))


_render_from_table.defvjp(_render_from_table_fwd, _render_from_table_bwd)


class BandLayout(NamedTuple):
    """Static geometry of a render_tiles_raw call (supertile units)."""

    n_rows: int        # supertile rows rendered
    sgrid_x: int       # supertile columns
    sgrid_y: int       # full-image supertile rows
    pw: int            # program pixel width  (16 * block_x)
    ph: int            # program pixel height (16 * block_y)
    dynamic_band: bool


def render_tiles_raw(
    pre: PreprocessedGaussians,
    width: int,
    height: int,
    *,
    max_instances: int = 2**20,
    max_chunks_per_tile: int = 64,
    interpret: bool | None = None,
    tile_band: tuple[int, int] | None = None,
    band_rows: int | None = None,
    band_start=None,
    tile_cull: bool = True,
    capacity_slack: float = 0.6,
    block_x: int = 1,
    block_y: int = 1,
    depth_grad: bool = True,
    contrib_stats: bool = True,
    grad_capacity: int = 0,
):
    """Bin + render an already-PREPROCESSED gaussian set to raw tile images.

    Returns (band, binned, layout) where band is [8, n_rows*ph, sgrid_x*pw]
    with rows (C0, C1, C2, D, A, T, n_contrib, neff). Rows 0-5 are
    DIFFERENTIABLE — including transmittance T, which the primitive-sharded
    renderer needs live for the depth-ordered partial-composite merge
    (parallel/primitive.py); rasterize_pallas applies the reference's
    stop-gradient contract on top.

    Band arguments as in rasterize_pallas (all in SUPERTILE rows).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    # the T-checkpoint array is [tiles, max_chunks, npix] and its per-tile
    # HBM slice must be sublane(8)-aligned on the chunk dim (Mosaic tiling)
    max_chunks_per_tile = -(-max_chunks_per_tile // 8) * 8
    grid_x, grid_y = tile_grid(width, height)
    sgrid_x = -(-grid_x // block_x)
    sgrid_y = -(-grid_y // block_y)
    pw, ph = TILE * block_x, TILE * block_y
    if pw * ph > 2048:
        # (128, npix) f32 compute arrays: npix 4096 blows the 16 MB scoped
        # VMEM limit in the backward kernel (measured on v5e)
        raise ValueError(
            f"block_x*block_y={block_x * block_y} > 8: program pixel block "
            f"{pw}x{ph} exceeds the VMEM budget of the backward kernel")

    dynamic_band = band_rows is not None
    if dynamic_band:
        y0 = jnp.asarray(band_start, jnp.int32)
        n_rows = band_rows
    else:
        y0_i, y1_i = tile_band if tile_band is not None else (0, sgrid_y)
        y0 = y0_i
        n_rows = y1_i - y0_i

    blocked = block_x != 1 or block_y != 1
    num_tiles = sgrid_x * n_rows
    pad_cols = _padded_capacity(max_instances, num_tiles, capacity_slack)
    # compacted grad capacity: CHUNK-aligned, at least one chunk, and only
    # meaningful strictly below the padded layout it replaces
    grad_cols = 0
    if grad_capacity > 0:
        grad_cols = max(CHUNK, -(-grad_capacity // CHUNK) * CHUNK)
        if grad_cols >= pad_cols:
            grad_cols = 0
    cfg = PallasConfig(
        grid_x=sgrid_x,
        grid_y=n_rows,
        max_chunks_per_tile=max_chunks_per_tile,
        interpret=bool(interpret),
        pw=pw,
        ph=ph,
        rect_test=blocked,
        pad_cols=pad_cols,
        grad_cols=grad_cols,
        skip_depth_grad=not depth_grad,
        skip_contrib=not contrib_stats,
    )

    banded = dynamic_band or tile_band is not None
    binned = bin_instances(
        pre, width, height, max_instances, max_chunks_per_tile,
        band_start=y0 if banded else None,
        band_rows=n_rows if banded else None,
        tile_cull=tile_cull, capacity_slack=capacity_slack,
        block_x=block_x, block_y=block_y, aligned_layout=False)
    y_shift = (y0 * ph).astype(jnp.float32) if dynamic_band else float(y0 * ph)
    table = _build_rank_table(pre, binned.dorder,
                              y_shift=y_shift if banded else 0.0,
                              rect_rows=blocked)
    # extend the sorted id array so the last tile's 2*CHUNK DMA window
    # never reads out of bounds (overrun rows are masked in-kernel)
    gid_ext = jnp.concatenate(
        [binned.gid_sorted,
         jnp.zeros((2 * CHUNK,), jnp.int32)], axis=0)

    tiles = _render_from_table(cfg, table, gid_ext, binned.sorted_start,
                               binned.tile_nchunks, binned.cnt_allowed,
                               binned.tile_offset)

    if grad_cols:
        # a compacted grad budget below the walked-chunk total clamps the
        # excess onto the last slot (approximate grads): count it into
        # overflow so consumers escalate exactly like the other budgets
        walked = jnp.sum(
            jax.lax.stop_gradient(tiles[:, 7, 0])).astype(jnp.int32)
        grad_ovf = jnp.maximum(0, CHUNK * walked - grad_cols)
        binned = binned._replace(overflow=binned.overflow + grad_ovf)

    # [T, 8, npix] -> [8, band_h, Wp]
    band = (
        tiles.reshape(n_rows, sgrid_x, 8, ph, pw)
        .transpose(2, 0, 3, 1, 4)
        .reshape(8, n_rows * ph, sgrid_x * pw)
    )
    layout = BandLayout(n_rows=n_rows, sgrid_x=sgrid_x, sgrid_y=sgrid_y,
                        pw=pw, ph=ph, dynamic_band=dynamic_band)
    return band, binned, layout


def rasterize_pallas(
    means,
    scales,
    quats,
    opacities,
    shs,
    camera,
    bg_color=None,
    sh_degree: int = 0,
    scale_modifier: float = 1.0,
    active_mask=None,
    colors_precomp=None,
    max_instances: int = 2**20,
    max_chunks_per_tile: int = 64,
    interpret: bool | None = None,
    tile_band: tuple[int, int] | None = None,
    band_rows: int | None = None,
    band_start=None,
    tile_cull: bool = True,
    capacity_slack: float = 0.6,
    block_x: int = 1,
    block_y: int = 1,
    depth_grad: bool = True,
    contrib_stats: bool = True,
    grad_capacity: int = 0,
) -> RenderOutput:
    """Tile-binned Pallas rasterization, API-compatible with rasterize_naive.

    block_x/block_y set the SUPERTILE factor: each kernel program (and each
    binning cell) covers a (16*block_x) x (16*block_y) pixel block. Larger
    blocks shrink the instance expansion (fewer duplicated splats => cheaper
    sort / feature pack / gradient scatter) while the kernel evaluates each
    instance over more pixels; at 1080p/200k-gaussian scale 2x2 is a large
    net win (the XLA instance-space ops dominate the kernel). All band
    arguments are in SUPERTILE rows.

    Two banded-rendering modes (the pixel-axis sharding unit):
      tile_band=(y0, y1): STATIC supertile-row band; outputs keep the full
        image shape with rows outside the band background-only (T=1).
      band_rows=h, band_start=y0: h static, y0 may be a TRACED scalar (e.g.
        jax.lax.axis_index inside shard_map); outputs are band-only
        [.., h*16*block_y (cropped), W].
    """
    H, W = camera.height, camera.width
    if bg_color is None:
        bg_color = jnp.ones((3,), dtype=means.dtype)

    pre = preprocess(
        means, scales, quats, opacities, shs, camera,
        sh_degree=sh_degree, scale_modifier=scale_modifier,
        active_mask=active_mask, colors_precomp=colors_precomp,
    )
    band, binned, layout = render_tiles_raw(
        pre, W, H, max_instances=max_instances,
        max_chunks_per_tile=max_chunks_per_tile, interpret=interpret,
        tile_band=tile_band, band_rows=band_rows, band_start=band_start,
        tile_cull=tile_cull, capacity_slack=capacity_slack,
        block_x=block_x, block_y=block_y, depth_grad=depth_grad,
        contrib_stats=contrib_stats, grad_capacity=grad_capacity)
    n_rows, sgrid_x, sgrid_y = layout.n_rows, layout.sgrid_x, layout.sgrid_y
    pw, ph = layout.pw, layout.ph
    dynamic_band = layout.dynamic_band
    if not dynamic_band:
        y0 = tile_band[0] if tile_band is not None else 0
    # per-tile effective (walked) chunk total — the grad_capacity fit signal
    walked = jnp.sum(jax.lax.stop_gradient(
        band[7, ::ph, ::pw])).astype(jnp.int32)

    def out_from(img, crop_h):
        color = img[0:3] + img[5][None] * bg_color[:, None, None]
        return RenderOutput(
            color=color,
            depth=img[3],
            acc=img[4],
            final_T=jax.lax.stop_gradient(img[5]),
            n_contrib=jax.lax.stop_gradient(img[6]).astype(jnp.int32),
            radii=jax.lax.stop_gradient(pre.radius),
            overflow=jax.lax.stop_gradient(binned.overflow),
            num_instances=jax.lax.stop_gradient(binned.num_instances),
            max_nchunks=jax.lax.stop_gradient(
                jnp.max(binned.tile_nchunks)).astype(jnp.int32),
            walked_chunks=walked,
        )

    if dynamic_band:
        return out_from(band[:, :, :W], n_rows * ph)
    if tile_band is None:
        return out_from(band[:, :H, :W], H)
    # static band: embed into the full frame (T=1 outside the band)
    img = jnp.zeros((8, sgrid_y * ph, sgrid_x * pw), band.dtype)
    img = img.at[5].set(1.0)
    img = jax.lax.dynamic_update_slice(img, band, (0, y0 * ph, 0))
    return out_from(img[:, :H, :W], H)
