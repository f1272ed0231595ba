"""Tile binning: per-gaussian tile rects -> depth-sorted per-tile instance lists.

TPU-native replacement for the reference's dynamic tile binning
(`src/cuda_rasterizer/rasterizer_impl.cu`): cub InclusiveSum (270-273),
duplicateWithKeys (64-101), cub radix SortPairs (295-309) and
identifyTileRanges (106-125). The CUDA path allocates `num_rendered`
instances dynamically and syncs it to the host mid-pipeline
(rasterizer_impl.cu:277) — a pattern XLA cannot express. Instead:

  1. A STATIC instance budget `max_instances`. The slot->gaussian mapping is
     recovered with scatter+running-max expansions (the inverse of the CUDA
     scatter loop), so the whole expansion is fixed-shape. Budget overflow is
     counted, not crashed on.
  2. ONE single-array `jax.lax.sort` over fused [tile | depth-rank] int32
     keys replaces the radix sort on packed [tile|depth-bits] keys
     (rasterizer_impl.cu:94). Gaussians are depth-ranked FIRST, so rank order
     == (depth, index) order and the fused key reproduces cub's stable radix
     sort ordering exactly; both tile and gaussian ids are recovered from the
     sorted key by bit masking — the sort carries NO payload.
  3. Per-tile runs are REPADDED to 128-instance alignment so the render
     kernel's DMA chunks are lane-aligned; padding slots carry id -1 and
     render as alpha=0.
  4. Optional per-(gaussian, tile) ELLIPSE CULL (tile_cull=True): drops
     instances whose tile lies entirely outside the splat's alpha >= 1/255
     level set (exact min of the conic quadratic over the tile box,
     rasterize_reference.tile_min_power). Lossless for C/D/S images and all
     gradients — the render kernel itself skips those pixels
     (forward.cu:374) — but shrinks per-tile lists substantially for
     anisotropic splats (the reference bins the full 3-sigma square).

Instance ids are returned in DEPTH-RANK space (`gauss_rank`) together with
the rank->original permutation (`dorder`): un-permuting 2M+ instance slots
costs an 18 ms HBM-random gather at 1080p, while consumers can instead
permute their small per-gaussian tables once (~0.5 ms).

Everything here is integer bookkeeping on stop-gradient values; gradients
flow through the separate instance-feature gather (rasterize_pallas.py).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .rasterize_reference import (
    TILE,
    TILE_CULL_EPS,
    PreprocessedGaussians,
    tile_grid,
    tile_min_power,
)

CHUNK = 128  # render-kernel chunk size; per-tile runs are padded to this.
# 128 is also the minimum Mosaic HBM slice alignment on the lane axis
# (64-wide DMA windows are rejected). Measured dead ends (v5e, 1080p):
# computing chunks in two 64-row halves with a mid-chunk early-exit is
# ~4 ms SLOWER (lax.cond overhead + duplicated scan prologues), and MXU
# moment-matmuls for the per-chunk reductions lose to the VPU (f32 needs
# 6 MXU passes and the tiny contraction dims pad to full tiles).


class BinnedInstances(NamedTuple):
    gauss_rank: jnp.ndarray | None  # [max_instances_padded] int32 DEPTH-RANK ids,
                               #   -1 = padding; original id = dorder[rank].
                               #   None when aligned_layout=False (the
                               #   placement scatter building it is the
                               #   single most expensive binning op; the
                               #   sorted-input kernel path skips it)
    dorder: jnp.ndarray        # [num_gauss] int32 rank -> original gaussian id
    tile_nchunks: jnp.ndarray  # [num_tiles] int32 — chunks of CHUNK instances
    tile_offset: jnp.ndarray   # [num_tiles] int32 — start slot (CHUNK-aligned)
    num_instances: jnp.ndarray # [] int32 — real (unpadded, unclamped) count
    overflow: jnp.ndarray      # [] int32 — instances dropped by the budgets
    gid_sorted: jnp.ndarray    # [max_instances] int32 rank id per SORTED
                               #   slot (tile-major, depth order within tile)
    sorted_start: jnp.ndarray  # [num_tiles] int32 — tile run start in the
                               #   UNPADDED sorted layout (arbitrary phase)
    cnt_allowed: jnp.ndarray   # [num_tiles] int32 — kept instances per tile


def bin_instances(
    pre: PreprocessedGaussians,
    width: int,
    height: int,
    max_instances: int,
    max_chunks_per_tile: int = 64,
    band_start=None,
    band_rows: int | None = None,
    tile_cull: bool = True,
    capacity_slack: float = 1.0,
    block_x: int = 1,
    block_y: int = 1,
    aligned_layout: bool = True,
) -> BinnedInstances:
    """Expand gaussians into depth-sorted, tile-aligned instance slots.

    max_instances bounds the pre-sort expansion; max_chunks_per_tile bounds
    the per-tile list (front-most survive — the sort puts the nearest
    instances first, so the cap drops the most-occluded tail). The padded
    output is `max_instances + capacity_slack * num_tiles * (CHUNK - 1)`
    rounded up, a static shape: slack 1.0 is the lossless worst case for
    the CHUNK alignment padding; smaller slack shrinks every downstream
    per-instance array (feature pack, kernel grads, gradient reduction all
    scale with this capacity) and converts a too-small budget into counted
    overflow (rear tiles lose their most-occluded instances first), never
    into OOB access.

    gauss_rank in the result is ONLY produced with aligned_layout=True (the
    profiling/stat layout); the production sorted-input path returns None
    there and consumers must use gid_sorted/sorted_start instead.

    band_start/band_rows restrict binning to tile ROWS [band_start,
    band_start + band_rows) — the unit of pixel-axis sharding: each device
    bins and renders only its band (tile ids come out band-relative).
    band_rows must be static; band_start may be a traced scalar (e.g.
    derived from jax.lax.axis_index inside shard_map).

    block_x/block_y bin at SUPERTILE granularity: one bin covers a
    (block_x·16) × (block_y·16) pixel block (= one render-kernel program).
    Coarser bins mean each gaussian expands into ~block_x·block_y× fewer
    instances, shrinking every instance-space op (this sort, the feature
    pack, the backward's gradient scatter) at the cost of the render kernel
    evaluating each instance over a larger pixel block — a pure win while
    the kernel is not the bottleneck. All tile/row arguments (band_start,
    band_rows, returned tile ids) are then in SUPERTILE units.
    """
    grid_x, grid_y = tile_grid(width, height)
    if max(grid_x, grid_y) >= 4096:
        # the rect/counts bookkeeping rides int values as exact f32, which
        # holds only while tile coords stay below 2^12 (~65k px per axis);
        # fail loudly instead of silently mis-binning oversized grids
        raise ValueError(
            f"tile grid {grid_x}x{grid_y} exceeds the exact-f32 bound 4096")
    blocked = block_x != 1 or block_y != 1
    sgrid_x = -(-grid_x // block_x)
    sgrid_y = -(-grid_y // block_y)
    banded = band_rows is not None
    if banded:
        y0 = band_start
        y1 = band_start + band_rows
        num_tiles = sgrid_x * band_rows
    else:
        y0, y1 = 0, sgrid_y
        num_tiles = sgrid_x * sgrid_y
    num_gauss = pre.depth.shape[0]

    depth = jax.lax.stop_gradient(pre.depth)

    # 1) Depth-order the gaussians FIRST (stable; invalid last). After this
    #    permutation, gaussian index == depth rank, which makes the fused
    #    sort key below exact and lets instance ids stay in rank space.
    dorder = jnp.argsort(
        jnp.where(pre.valid, depth, jnp.inf), stable=True
    ).astype(jnp.int32)

    # ONE stacked permute at dorder for every per-gaussian row the binning
    # needs (rects + validity + the cull terms): gather cost on TPU is
    # per-INDEX, so merging the 5+ separate [P]-gathers into one [rows, P]
    # fetch is a direct win. Rects ride as exact f32 (values < 2^12); the
    # supertile cover and band clip below stay exact in f32 (IEEE division
    # by a small-int constant never crosses an integer away from an exact
    # multiple at these magnitudes).
    base_rows = [
        pre.rect_min[:, 0].astype(jnp.float32),
        pre.rect_min[:, 1].astype(jnp.float32),
        pre.rect_max[:, 0].astype(jnp.float32),
        pre.rect_max[:, 1].astype(jnp.float32),
        pre.valid.astype(jnp.float32),
    ]
    if tile_cull:
        mean2d = jax.lax.stop_gradient(pre.mean2d)
        conic = jax.lax.stop_gradient(pre.conic)
        op = jax.lax.stop_gradient(jnp.where(pre.valid, pre.opacity, 0.0))
        ca, cb, cc = conic[:, 0], conic[:, 1], conic[:, 2]
        # hoisted per-gaussian cull terms: edge-stationary-point slopes
        # (tile_min_power rb_a/rb_c) and the LOG-domain keep threshold
        # (q_min <= log(op / EPS) <=> op * exp(-q_min) >= EPS), replacing a
        # per-instance exp with a compare; +1e-6 slack keeps the boundary
        # strictly conservative (never culls a contributing instance)
        lq = jnp.where(
            op > 0.0,
            jnp.log(jnp.maximum(op, 1e-30) / TILE_CULL_EPS) + 1e-6,
            -jnp.inf)
        base_rows += [mean2d[:, 0], mean2d[:, 1], ca, cb, cc,
                      -cb / jnp.maximum(ca, 1e-12),
                      -cb / jnp.maximum(cc, 1e-12), lq]
    gtab = jnp.stack(base_rows, axis=0)[:, dorder]
    rmin_x, rmin_y = gtab[0], gtab[1]
    rmax_x, rmax_y = gtab[2], gtab[3]
    validg = gtab[4] > 0.0
    ftab = gtab[5:]
    if blocked:
        # exact supertile cover of the tile range [rect_min, rect_max):
        # floor/ceil division by python-int block factors. Empty rects must
        # STAY empty (ceil(k/b) > floor(k/b) when b doesn't divide k),
        # hence the area gate below.
        empty = (rmax_x <= rmin_x) | (rmax_y <= rmin_y)
        rmin_x = jnp.floor(rmin_x / block_x)
        rmin_y = jnp.floor(rmin_y / block_y)
        rmax_x = -jnp.floor(-rmax_x / block_x)
        rmax_y = -jnp.floor(-rmax_y / block_y)
        rmax_x = jnp.where(empty, rmin_x, rmax_x)
        rmax_y = jnp.where(empty, rmin_y, rmax_y)
    if banded:
        # clip rects to the band (band-relative y) and recompute counts
        y0f = jnp.asarray(y0, jnp.float32)
        y1f = jnp.asarray(y1, jnp.float32)
        rmin_y = jnp.clip(rmin_y, y0f, y1f) - y0f
        rmax_y = jnp.clip(rmax_y, y0f, y1f) - y0f
    counts = jnp.where(
        validg, (rmax_x - rmin_x) * (rmax_y - rmin_y), 0.0
    ).astype(jnp.int32)

    offsets = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(counts)[:-1].astype(jnp.int32)]
    )
    total = offsets[-1] + counts[-1]

    # The per-INSTANCE section below runs in a [R, 128] 2-D layout, not
    # flat [max_instances]: TPU lays 1-D arrays out as (1, M) — one sublane
    # of eight live — so every elementwise pass over ~1M flat slots wastes
    # ~8x VPU throughput (measured tools/microbench_tileid.py: the same
    # chain is ~6x faster on [R, 128]). The 2-D gather below produces the
    # layout directly (no relayout copy); only the final sort key is
    # flattened (lax.sort sorts along the last axis).
    mi2 = -(-max_instances // 128) * 128
    R = mi2 // 128
    slots = jax.lax.broadcasted_iota(jnp.int32, (R, 128), 0) * 128 \
        + jax.lax.broadcasted_iota(jnp.int32, (R, 128), 1)

    # 2) slot -> (depth-ranked) gaussian WITHOUT searchsorted (XLA lowers
    #    searchsorted to ~log2(P) serial 2M-gathers — 276 ms at 1080p):
    #    scatter each gaussian's index at its start offset, then a running
    #    max fills the runs. Equal offsets (zero-count gaussians) resolve to
    #    the largest index, which is the run owner. The running max is a
    #    TWO-LEVEL scan in the 2-D layout: within rows, then a [R] row
    #    carry (rows are scanned sublane-parallel; the 1-D carry is 128x
    #    smaller than the flat scan).
    marks2 = jnp.zeros((R, 128), jnp.int32).at[offsets // 128,
                                               offsets % 128].max(
        jnp.arange(num_gauss, dtype=jnp.int32), mode="drop")
    within = jax.lax.cummax(marks2, axis=1)
    row_carry = jax.lax.cummax(within[:, -1])
    prev_rows = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), row_carry[:-1]])
    gid = jnp.maximum(within, prev_rows[:, None])
    slot_valid = slots < jnp.minimum(total, max_instances)

    # 3) slot -> tile within the gaussian's rect, row-major like the CUDA
    #    loop (duplicateWithKeys, rasterizer_impl.cu:64-101). ALL per-slot
    #    metadata (rect, run offset, and the cull's splat params) comes from
    #    ONE gather of a small (rows, P) rank-space table — gather cost
    #    on TPU scales with the index count, not the row count, so merging
    #    the gathers (and folding the run-offset expansion into a table row)
    #    is ~2x cheaper than separate fetches. Int rows ride as exact f32
    #    VALUES (rects < 2^12; offsets clamped to max_instances < 2^24 —
    #    only runs intersecting [0, max_instances) are ever read back), NOT
    #    bitcasts: bitcast int32 bit patterns are f32 denormals, which TPU
    #    flushes to zero outside fused computations.
    rect_w = jnp.maximum(rmax_x - rmin_x, 1.0)
    meta_rows = [rmin_x, rmin_y, rect_w,
                 jnp.minimum(offsets, max_instances).astype(jnp.float32),
                 # per-GAUSSIAN reciprocal of the rect width: every
                 # per-instance f32 divide (the costliest VPU elementwise
                 # op) is hoisted to the (30x smaller) rank table and
                 # GATHERED — row count in the merged gather is nearly
                 # free, index count is what costs (docs/kernels.md)
                 1.0 / rect_w]
    if tile_cull:
        meta = jnp.concatenate([jnp.stack(meta_rows, axis=0), ftab], axis=0)
    else:
        meta = jnp.stack(meta_rows, axis=0)
    m = meta[:, gid]  # [rows, R, 128]: 2-D indices -> layout-friendly output
    r_x, r_y, r_w, off_slot = (m[i].astype(jnp.int32) for i in range(4))
    k = slots - off_slot
    # k // r_w and k % r_w via the GATHERED per-gaussian f32 reciprocal +
    # fixup (int div lowers to a long VPU sequence; k < 2^24 and r_w < 2^12
    # make the f32 path exact after a +-1 correction).
    q = jnp.floor(k.astype(jnp.float32) * m[4]).astype(jnp.int32)
    rem = k - q * r_w
    q = q + (rem >= r_w).astype(jnp.int32) - (rem < 0).astype(jnp.int32)
    rem = k - q * r_w
    ty = r_y + q  # band-relative when banded
    tx = r_x + rem
    tile_id = ty * sgrid_x + tx

    if tile_cull:
        # Per-instance lossless ellipse cull (module doc #4).
        f = m[5:]
        ty_abs = ty + y0 if banded else ty
        qmin = tile_min_power(f[0], f[1], f[2], f[3], f[4], tx, ty_abs,
                              pw=TILE * block_x, ph=TILE * block_y,
                              rb_a=f[5], rb_c=f[6])
        keep = qmin <= f[7]
        tile_id = jnp.where(keep, tile_id, num_tiles)

    tile_id = jnp.where(slot_valid, tile_id, num_tiles)  # sentinel -> end

    # 4) ONE-array sort on fused key (tile << bits_p) | rank. Identical
    #    ordering to the reference's [tile | depth-bits] radix sort with
    #    stable ties (rasterizer_impl.cu:94, 295-309), since rank order ==
    #    (depth, index) order. Falls back to a 2-key sort if the packed key
    #    would overflow int32 ((tile, rank) pairs are unique, so stability
    #    is irrelevant there). Slots in [max_instances, mi2) (the 128-pad
    #    of the 2-D layout) carry the sentinel and sort to the end with the
    #    other invalid slots; the flat views below trim back to
    #    max_instances, which can only drop sentinel slots.
    bits_p = max(int(np.ceil(np.log2(max(num_gauss, 2)))), 1)
    bits_tile = int(np.ceil(np.log2(num_tiles + 2)))
    if bits_p + bits_tile <= 31:
        key = (tile_id << bits_p) | gid
        key_sorted = jax.lax.sort((key.reshape(mi2),), num_keys=1,
                                  is_stable=False)[0][:max_instances]
        tile_sorted = key_sorted >> bits_p
        gid_sorted = key_sorted & ((1 << bits_p) - 1)
    else:
        tile_sorted, gid_sorted = jax.lax.sort(
            (tile_id.reshape(mi2), gid.reshape(mi2)), num_keys=2,
            is_stable=False
        )
        tile_sorted = tile_sorted[:max_instances]
        gid_sorted = gid_sorted[:max_instances]

    # 5) Per-tile ranges (identifyTileRanges equivalent; 8k-element
    #    searchsorted over the sorted 2M keys is cheap) + cap + CHUNK-pad.
    # keys are ints, so right(t) == left(t+1): ONE searchsorted with T+1
    # queries replaces the left/right pair
    tids = jnp.arange(num_tiles + 1, dtype=jnp.int32)
    bounds = jnp.searchsorted(tile_sorted, tids,
                              side="left").astype(jnp.int32)
    start = bounds[:num_tiles]
    end = bounds[1:]
    cnt = end - start

    cnt_capped = jnp.minimum(cnt, CHUNK * max_chunks_per_tile)
    cnt_padded = ((cnt_capped + CHUNK - 1) // CHUNK) * CHUNK
    tile_offset = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(cnt_padded)[:-1].astype(jnp.int32)]
    )

    padded_size = _padded_capacity(max_instances, num_tiles, capacity_slack)

    # Clip per-tile budgets to the static capacity (no-op at slack 1.0):
    # tile_offset and padded_size are CHUNK multiples, so `avail` is too,
    # and every DMA window stays inside the padded array.
    avail = jnp.clip(padded_size - tile_offset, 0, cnt_padded)
    cnt_allowed = jnp.minimum(cnt_capped, avail)

    # 6) Move sorted instances into the aligned layout: dst = s +
    #    delta[tile_sorted[s]]; slot s is kept iff s < start + cnt_allowed
    #    (s - start is its rank within the tile's run). Both per-tile
    #    quantities are NON-DECREASING in t (delta grows by cnt_padded -
    #    cnt >= 0; start + cnt_allowed grows because start[t+1] = start[t] +
    #    cnt[t] >= start[t] + cnt_allowed[t]), and tile_sorted is sorted —
    #    so instead of a 2M-wide gather (~23 ms: TPU random access) each
    #    expands with a start-position scatter + running max (~5 ms).
    #    NOTE (r2): a "backward monotone gather" placement (out slot ->
    #    sorted slot) and a sorted-space gradient reduction were both built
    #    and measured SLOWER on v5e — TPU gather cost is ~5 ns per index
    #    regardless of index monotonicity, so trading one 1-column scatter
    #    for two PAD-wide gathers loses (full step 88.9 -> 98.1 ms).
    if aligned_layout:
        delta_t = tile_offset - start
        keep_end_t = start + cnt_allowed
        neg = jnp.int32(-(1 << 30))

        # Both expansions fused into ONE 2-row scatter + cummax (the scan
        # cost is sublane-parallel: (2, M) costs the same cycles as (M,)).
        marks2 = jnp.full(
            (2, max_instances), neg, jnp.int32).at[:, start].max(
            jnp.stack([delta_t, keep_end_t]).astype(jnp.int32), mode="drop")
        expanded = jax.lax.cummax(marks2, axis=1)
        delta_s, keep_end_s = expanded[0], expanded[1]
        flat_slots = jnp.arange(max_instances, dtype=jnp.int32)
        dst = flat_slots + delta_s
        keep = (tile_sorted < num_tiles) & (flat_slots < keep_end_s)
        dst = jnp.where(keep, dst, padded_size)  # dropped -> discard slot
        gauss_rank = jnp.full((padded_size + 1,), -1, dtype=jnp.int32)
        gauss_rank = gauss_rank.at[dst].set(
            jnp.where(keep, gid_sorted, -1), mode="drop")
        gauss_rank = gauss_rank[:padded_size]
    else:
        gauss_rank = None

    # NOTE: ids stay in rank space — no PAD-wide un-permute (module doc).

    overflow = jnp.maximum(total - max_instances, 0) + jnp.sum(cnt - cnt_allowed)

    return BinnedInstances(
        gauss_rank=gauss_rank,
        dorder=dorder,
        tile_nchunks=(cnt_allowed + CHUNK - 1) // CHUNK,
        tile_offset=tile_offset,
        num_instances=total,
        overflow=overflow,
        gid_sorted=gid_sorted,
        sorted_start=start,
        cnt_allowed=cnt_allowed,
    )


def _padded_capacity(max_instances: int, num_tiles: int,
                     slack: float = 1.0) -> int:
    """Static output capacity: worst-case CHUNK-alignment padding, scaled
    by `slack` (average tiles waste ~CHUNK/2 alignment slots, so slack 0.6
    is usually lossless in practice while shrinking every downstream
    per-instance array)."""
    worst = max_instances + num_tiles * (CHUNK - 1)
    cap = min(max_instances + int(slack * num_tiles * (CHUNK - 1)), worst)
    return ((cap + CHUNK - 1) // CHUNK) * CHUNK
