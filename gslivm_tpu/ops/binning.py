"""Tile binning: per-gaussian tile rects -> depth-sorted per-tile instance lists.

TPU-native replacement for the reference's dynamic tile binning
(`src/cuda_rasterizer/rasterizer_impl.cu`): cub InclusiveSum (270-273),
duplicateWithKeys (64-101), cub radix SortPairs (295-309) and
identifyTileRanges (106-125). The CUDA path allocates `num_rendered`
instances dynamically and syncs it to the host mid-pipeline
(rasterizer_impl.cu:277) — a pattern XLA cannot express. Instead:

  1. A STATIC instance budget `max_instances`. The slot->gaussian mapping is
     recovered with a searchsorted over the exclusive-cumsum offsets (the
     inverse of the CUDA scatter loop), so the whole expansion is a fixed-
     shape gather. Budget overflow is counted, not crashed on.
  2. A two-key lexicographic `jax.lax.sort` (tile_id, depth) replaces the
     radix sort on packed [tile|depth-bits] keys (rasterizer_impl.cu:94).
     lax.sort is stable, so equal (tile, depth) keep gaussian-index order
     exactly like cub's stable radix sort.
  3. Per-tile runs are REPADDED to 128-instance alignment so the render
     kernel's DMA chunks are lane-aligned; padding slots carry gaussian id
     -1 and render as alpha=0.

Everything here is integer bookkeeping on stop-gradient values; gradients
flow through the separate instance-feature gather (rasterize_pallas.py).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .rasterize_reference import TILE, PreprocessedGaussians, tile_grid

CHUNK = 128  # render-kernel chunk size; per-tile runs are padded to this


class BinnedInstances(NamedTuple):
    gauss_id: jnp.ndarray      # [max_instances_padded] int32, -1 = padding
    tile_nchunks: jnp.ndarray  # [num_tiles] int32 — chunks of CHUNK instances
    tile_offset: jnp.ndarray   # [num_tiles] int32 — start slot (CHUNK-aligned)
    num_instances: jnp.ndarray # [] int32 — real (unpadded, unclamped) count
    overflow: jnp.ndarray      # [] int32 — instances dropped by the budgets


def bin_instances(
    pre: PreprocessedGaussians,
    width: int,
    height: int,
    max_instances: int,
    max_chunks_per_tile: int = 64,
) -> BinnedInstances:
    """Expand gaussians into depth-sorted, tile-aligned instance slots.

    max_instances bounds the pre-sort expansion; max_chunks_per_tile bounds
    the per-tile list (front-most survive — the sort puts the nearest
    instances first, so the cap drops the most-occluded tail). The padded
    output is `max_instances + num_tiles * (CHUNK - 1)` rounded up, a static
    shape.
    """
    grid_x, grid_y = tile_grid(width, height)
    num_tiles = grid_x * grid_y

    counts = jax.lax.stop_gradient(pre.tiles_touched).astype(jnp.int32)
    depth = jax.lax.stop_gradient(pre.depth)
    rect_min = pre.rect_min
    rect_max = pre.rect_max

    offsets = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(counts)[:-1].astype(jnp.int32)]
    )
    total = offsets[-1] + counts[-1]

    # slot -> gaussian: rightmost g with offsets[g] <= s (inverse of the CUDA
    # duplicateWithKeys scatter, rasterizer_impl.cu:64-101).
    slots = jnp.arange(max_instances, dtype=jnp.int32)
    gid = jnp.searchsorted(offsets, slots, side="right").astype(jnp.int32) - 1
    slot_valid = slots < jnp.minimum(total, max_instances)
    gid = jnp.where(slot_valid, gid, 0)

    # slot -> tile within the gaussian's rect, row-major like the CUDA loop.
    k = slots - offsets[gid]
    rect_w = jnp.maximum(rect_max[gid, 0] - rect_min[gid, 0], 1)
    tile_x = rect_min[gid, 0] + k % rect_w
    tile_y = rect_min[gid, 1] + k // rect_w
    tile_id = tile_y * grid_x + tile_x
    tile_id = jnp.where(slot_valid, tile_id, num_tiles)  # sentinel -> end

    # Lexicographic stable sort by (tile, depth); ties keep gaussian order.
    tile_sorted, _, gid_sorted = jax.lax.sort(
        (tile_id, depth[gid], gid), num_keys=2, is_stable=True
    )

    # Per-tile ranges in the sorted array (identifyTileRanges equivalent).
    tids = jnp.arange(num_tiles, dtype=jnp.int32)
    start = jnp.searchsorted(tile_sorted, tids, side="left").astype(jnp.int32)
    end = jnp.searchsorted(tile_sorted, tids, side="right").astype(jnp.int32)
    cnt = end - start

    # Cap per-tile length (drop the most-occluded tail) and pad to CHUNK.
    cnt_capped = jnp.minimum(cnt, CHUNK * max_chunks_per_tile)
    cnt_padded = ((cnt_capped + CHUNK - 1) // CHUNK) * CHUNK
    tile_offset = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(cnt_padded)[:-1].astype(jnp.int32)]
    )

    padded_size = _padded_capacity(max_instances, num_tiles)

    # Scatter sorted instances into the aligned layout.
    sorted_slots = jnp.arange(max_instances, dtype=jnp.int32)
    in_tile_pos = sorted_slots - start[jnp.clip(tile_sorted, 0, num_tiles - 1)]
    keep = (tile_sorted < num_tiles) & (in_tile_pos < cnt_capped[jnp.clip(tile_sorted, 0, num_tiles - 1)])
    dst = jnp.where(
        keep,
        tile_offset[jnp.clip(tile_sorted, 0, num_tiles - 1)] + in_tile_pos,
        padded_size,  # dropped slots scatter into a discard slot
    )
    gauss_id = jnp.full((padded_size + 1,), -1, dtype=jnp.int32)
    gauss_id = gauss_id.at[dst].set(jnp.where(keep, gid_sorted, -1), mode="drop")
    gauss_id = gauss_id[:padded_size]

    overflow = jnp.maximum(total - max_instances, 0) + jnp.sum(cnt - cnt_capped)

    return BinnedInstances(
        gauss_id=gauss_id,
        tile_nchunks=cnt_padded // CHUNK,
        tile_offset=tile_offset,
        num_instances=total,
        overflow=overflow,
    )


def _padded_capacity(max_instances: int, num_tiles: int) -> int:
    """Static output capacity: worst-case CHUNK-alignment padding."""
    cap = max_instances + num_tiles * (CHUNK - 1)
    return ((cap + CHUNK - 1) // CHUNK) * CHUNK
