"""Primitive-sharded rendering: a TRUE "gauss" model-parallel axis.

The reference is single-GPU (SURVEY §2.6); this is the TPU-native scaling
design of SURVEY §5/§7 phase 7 for 10M+ gaussian maps, replacing the
FSDP-style full all_gather of parameters (sharding.py `_gather_params`)
with per-device work that genuinely shrinks with the "gauss" axis:

  1. Each device PREPROCESSES only its local parameter shard (P/g
     gaussians) — projection, conics, SH colors (forward.cu:180-286
     semantics via ops.rasterize_reference.preprocess).
  2. DEPTH-SLAB RE-PARTITION: the per-gaussian depth keys (4 B each — the
     only O(P) replicated quantity) are all_gathered and argsorted, giving
     every gaussian a global front-to-back rank; ONE all_to_all of the
     ~15-float *screen features* (not the 60+-float parameters + Adam
     state) moves each gaussian to the device owning its rank slab. Slabs
     are contiguous rank ranges, so the per-device sets are depth-disjoint
     per construction — the precondition that makes the composite merge
     below EXACT, not approximate.
  3. Each device bins + renders ITS SLAB over its pixel band with the
     standard Pallas pipeline (ops.rasterize_pallas.render_tiles_raw),
     producing partial premultiplied (C, D, A) and transmittance T.
  4. DEPTH-ORDERED PARTIAL-COMPOSITE MERGE: alpha compositing over
     depth-disjoint groups is associative —
        C = C_a + T_a * C_b,   D/A likewise,   T = T_a * T_b
     — so one all_gather of the 6-row partials over "gauss" and a
     front-to-back fold reconstructs the exact full composite
     (SURVEY §5 "long-context" analog).
  5. Gradients: jax.grad flows through the all_to_all (transpose: the
     reverse all_to_all) and the partial all_gather (transpose:
     reduce_scatter over "gauss") — XLA inserts the ghost-gradient
     reductions; no hand-written backward communication.

Per-device peak memory: parameters + Adam state O(P/g); exchange buffers
O(slack * P/g * 15 floats); partials O(6 * band pixels * g). The only O(P)
term is the 1-f32 depth-key gather (step 2).

Known (tiny, documented) deviation from the single-device renderer: the
early-stop latch (T < 1e-4, forward.cu:377-381) fires per-slab, so a slab
cannot see that upstream slabs already saturated a pixel — splats the
fused walk would have skipped still contribute, each weighted by the true
upstream T < 1e-4. The result differs from the fused path by < 1e-4 in
absolute pixel value (it is strictly MORE accurate); the parity test pins
the two paths at that tolerance.

Everything here is written to run INSIDE jax.shard_map over a
("gauss", "pixel") mesh — see parallel/sharding.py for the train step.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops.rasterize_pallas import render_tiles_raw
from ..ops.rasterize_reference import PreprocessedGaussians

# exchange feature-row layout (f32): differentiable screen state first,
# stop-gradient integer metadata (exact small ints as f32 values) after
_R_MEAN2D = (0, 1)
_R_CONIC = (2, 3, 4)
_R_OPACITY = 5
_R_COLOR = (6, 7, 8)
_R_DEPTH = 9
_R_RECT = (10, 11, 12, 13)  # rect_min.x, rect_min.y, rect_max.x, rect_max.y
_R_VALID = 14
N_ROWS = 15


def _pre_to_rows(pre: PreprocessedGaussians) -> jnp.ndarray:
    """[N_ROWS, n_local] feature table for the slab exchange."""
    valid_f = pre.valid.astype(jnp.float32)
    return jnp.stack([
        pre.mean2d[:, 0], pre.mean2d[:, 1],
        pre.conic[:, 0], pre.conic[:, 1], pre.conic[:, 2],
        jnp.where(pre.valid, pre.opacity, 0.0),
        pre.color[:, 0], pre.color[:, 1], pre.color[:, 2],
        pre.depth,
        pre.rect_min[:, 0].astype(jnp.float32),
        pre.rect_min[:, 1].astype(jnp.float32),
        pre.rect_max[:, 0].astype(jnp.float32),
        pre.rect_max[:, 1].astype(jnp.float32),
        valid_f,
    ], axis=0)


def _rows_to_pre(rows: jnp.ndarray) -> PreprocessedGaussians:
    """Rebuild a PreprocessedGaussians view of an exchanged slab buffer."""
    valid = rows[_R_VALID] > 0.5
    rect_min = jnp.stack([rows[10], rows[11]], axis=-1).astype(jnp.int32)
    rect_max = jnp.stack([rows[12], rows[13]], axis=-1).astype(jnp.int32)
    tiles = (rect_max[:, 0] - rect_min[:, 0]) * (rect_max[:, 1] - rect_min[:, 1])
    return PreprocessedGaussians(
        valid=valid,
        mean2d=jnp.stack([rows[0], rows[1]], axis=-1),
        conic=jnp.stack([rows[2], rows[3], rows[4]], axis=-1),
        opacity=rows[_R_OPACITY],
        color=jnp.stack([rows[6], rows[7], rows[8]], axis=-1),
        depth=rows[_R_DEPTH],
        radius=jnp.zeros_like(rows[_R_DEPTH]),  # diagnostic; not exchanged
        rect_min=rect_min,
        rect_max=rect_max,
        tiles_touched=jnp.where(valid, tiles, 0).astype(jnp.int32),
    )


def exchange_by_depth_slab(pre: PreprocessedGaussians, axis_name: str,
                           budget_per_pair: int | None = None):
    """Re-partition preprocessed gaussians into contiguous depth-rank slabs.

    Runs inside shard_map. Device k of the `axis_name` axis (size g) ends up
    holding exactly the gaussians whose global front-to-back rank lies in
    [k*S, (k+1)*S), S = P/g, positioned AT their rank offset — so a stable
    local depth sort downstream reproduces the single-device global order
    bit-exactly (ties break by global index because ranks do).

    budget_per_pair bounds the (src, dst) all_to_all boxes (default
    4*S/g, the statistical mean + 4x slack); overflowing gaussians are
    DROPPED and counted (never OOB), mirroring binning.py's budget
    philosophy. Returns (slab_pre, overflow) with overflow summed over the
    axis.
    """
    g = jax.lax.axis_size(axis_name)
    k = jax.lax.axis_index(axis_name)
    n_local = pre.depth.shape[0]
    S = n_local  # slab size == local shard size (equal split)
    P = n_local * g
    if budget_per_pair is None:
        budget_per_pair = min(n_local, -(-4 * n_local // g))
    B = int(budget_per_pair)

    # ---- global depth ranks (the one O(P) replicated computation; 4 B/gauss)
    key_local = jnp.where(pre.valid, jax.lax.stop_gradient(pre.depth),
                          jnp.inf)
    keys = jax.lax.all_gather(key_local, axis_name, axis=0, tiled=True)  # [P]
    order = jnp.argsort(keys, stable=True).astype(jnp.int32)  # rank -> gidx
    rank_of = jnp.zeros((P,), jnp.int32).at[order].set(
        jnp.arange(P, dtype=jnp.int32))
    my_rank = jax.lax.dynamic_slice(rank_of, (k * n_local,), (n_local,))

    dest = my_rank // S                       # owning device of each local g
    pos_in_slab = my_rank - dest * S          # rank offset within the slab

    # ---- pack send boxes: group local gaussians by destination ----------
    rows = _pre_to_rows(pre)                                  # [R, n_local]
    sortix = jnp.argsort(dest, stable=True).astype(jnp.int32)
    dsorted = dest[sortix]
    group_start = jnp.searchsorted(dsorted, jnp.arange(g, dtype=jnp.int32),
                                   side="left").astype(jnp.int32)
    idx_in_group = jnp.arange(n_local, dtype=jnp.int32) - group_start[dsorted]
    keep = idx_in_group < B
    slot = jnp.where(keep, dsorted * B + idx_in_group, g * B)  # drop slot
    overflow_local = jnp.sum(jnp.logical_not(keep).astype(jnp.int32))

    payload = jnp.concatenate(
        [rows[:, sortix],
         pos_in_slab[sortix][None].astype(jnp.float32),  # exact: < 2^24
         jnp.ones((1, n_local), jnp.float32)], axis=0)   # occupied flag
    send = jnp.zeros((payload.shape[0], g * B + 1), jnp.float32)
    send = send.at[:, slot].set(payload, mode="drop")[:, : g * B]

    # ---- ONE all_to_all of the screen features ---------------------------
    recv = jax.lax.all_to_all(send, axis_name, split_axis=1, concat_axis=1,
                              tiled=True)                  # [R+2, g*B]

    # ---- scatter received gaussians to their rank offset in the slab -----
    occupied = recv[-1] > 0.5
    slab_pos = jnp.where(occupied, recv[-2].astype(jnp.int32), S)
    slab = jnp.zeros((N_ROWS, S + 1), jnp.float32)
    slab = slab.at[:, slab_pos].set(
        jnp.where(occupied[None], recv[:N_ROWS], 0.0), mode="drop")[:, :S]

    overflow = jax.lax.psum(overflow_local, axis_name)
    return _rows_to_pre(slab), overflow


def render_slab_band(slab_pre: PreprocessedGaussians, width: int, height: int,
                     band_rows: int, band_start, *, max_instances: int,
                     max_chunks_per_tile: int = 64, interpret=None,
                     block: tuple[int, int] = (1, 1),
                     capacity_slack: float = 0.6):
    """Render this device's depth slab over its supertile-row band.

    Returns (partial [6, band_h, W_padded], overflow): rows are
    premultiplied C0 C1 C2, D, A, and DIFFERENTIABLE transmittance T —
    exactly what the composite merge consumes.
    """
    band, binned, layout = render_tiles_raw(
        slab_pre, width, height, max_instances=max_instances,
        max_chunks_per_tile=max_chunks_per_tile, interpret=interpret,
        band_rows=band_rows, band_start=band_start,
        capacity_slack=capacity_slack, block_x=block[0], block_y=block[1])
    return band[:6], binned.overflow


def merge_partials(partial: jnp.ndarray, axis_name: str):
    """Depth-ordered associative merge of per-slab partial composites.

    partial: [6, h, w] local (C0, C1, C2, D, A, T). Gathers all slabs over
    `axis_name` (device order == slab order == front-to-back) and folds
       C <- C + T * C_k,  D <- D + T * D_k,  A <- A + T * A_k,  T <- T * T_k.
    Returns merged [6, h, w], identical (replicated) on every device of the
    axis. The fold is differentiable; its transpose gives each slab its
    upstream-transmittance-weighted cotangent plus the T-path terms.
    """
    g = jax.lax.axis_size(axis_name)
    parts = jax.lax.all_gather(partial, axis_name, axis=0)  # [g, 6, h, w]
    C = parts[0, :3]
    D = parts[0, 3]
    A = parts[0, 4]
    T = parts[0, 5]
    for i in range(1, g):
        C = C + T[None] * parts[i, :3]
        D = D + T * parts[i, 3]
        A = A + T * parts[i, 4]
        T = T * parts[i, 5]
    return jnp.concatenate([C, D[None], A[None], T[None]], axis=0)


def sharded_simi_loss(xyz_shard, scaling_shard, inputs, axis_name: str):
    """simi_loss (models/training.simi_loss; gaussian.cu:87-114, 201-239)
    over gauss-SHARDED parameters: the radius (a global mean of selected
    scales) psums, and the per-anchor min-distance pmins — no parameter
    gather. gauss_idx are GLOBAL indices; each device handles the ones in
    its shard."""
    n_local = xyz_shard.shape[0]
    k = jax.lax.axis_index(axis_name)
    idx = inputs.gauss_idx
    local = inputs.gauss_mask & (idx >= k * n_local) & (idx < (k + 1) * n_local)
    lidx = jnp.clip(idx - k * n_local, 0, n_local - 1)
    xyz = xyz_shard[lidx]
    scales = scaling_shard[lidx]

    sum_scales = jax.lax.psum(
        jnp.sum(jnp.where(local[:, None], scales, 0.0)), axis_name)
    n_scales = jax.lax.psum(jnp.sum(local) * 3, axis_name)
    radius = sum_scales / jnp.maximum(n_scales, 1)

    d = jnp.linalg.norm(inputs.points[:, None, :] - xyz[None, :, :], axis=-1)
    surf = jnp.maximum(d - radius, 0.0)
    surf = jnp.where(local[None, :], surf, jnp.inf)
    # cross-shard min via a tiny all_gather ([g, MAX_SIMI] floats) rather
    # than lax.pmin, which has no differentiation rule — gradients must flow
    # to the winning shard's xyz/scaling
    min_local = jnp.min(surf, axis=1)
    min_d = jnp.min(jax.lax.all_gather(min_local, axis_name, axis=0), axis=0)
    pmask = inputs.point_mask & jnp.isfinite(min_d)
    return jnp.sum(jnp.where(pmask, min_d, 0.0)) / jnp.maximum(
        jnp.sum(pmask), 1)
