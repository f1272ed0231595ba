"""Ablation map of the forward kernel's per-chunk cost (r4).

A self-contained copy of the fwd compositing chunk-walk over fabricated
sorted-layout inputs (no early stop, uniform chunk counts), with pieces
removable one at a time. The deltas from FULL attribute the measured
~2.9 us/chunk (microbench_kernelcost.py) to: the cumprod scan, the exp,
the featT roll+transpose+mask build, the accept/bookkeeping chain, and
the five weighted accumulations.

ABLATED VARIANTS ARE NUMERICALLY WRONG — they exist only to measure op
cost with identical array shapes/layouts.

Run ALONE on the real TPU chip: python tools/microbench_fwdablate.py
"""
from __future__ import annotations

import functools
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax  # noqa: E402

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                 ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402
from tputime import device_time_ms  # noqa: E402

from gslivm_tpu.ops import rasterize_pallas as RP  # noqa: E402
from gslivm_tpu.ops.binning import CHUNK  # noqa: E402

GX, GY = 60, 34
NPIX = 1024
PW = PH = 32
FEAT = RP.FEAT
P = 200_000
NCH = 4  # uniform chunks/tile


def kernel(flags, off_ref, nch_ref, cnt_ref, inst_ref, out_ref, buf_ref,
           sem_ref):
    t = pl.program_id(0)
    off = off_ref[t]
    nchunks = nch_ref[t]
    cnt = cnt_ref[t]
    phi = off - (off // CHUNK) * CHUNK
    tile_y = t // GX
    tile_x = t % GX
    p = jax.lax.broadcasted_iota(jnp.int32, (1, NPIX), 1)
    px = (tile_x * PW + p % PW).astype(jnp.float32)
    py = (tile_y * PH + p // PW).astype(jnp.float32)

    get_dma = RP._inst_get_dma(None, inst_ref, buf_ref, sem_ref, off)

    @pl.when((t == 0) & (nchunks > 0))
    def _():
        get_dma(0, 0).start()

    zeros = jnp.zeros((1, NPIX), jnp.float32)
    init = (jnp.ones((1, NPIX), jnp.float32), zeros, zeros, zeros, zeros,
            zeros, zeros)

    def body(i, carry):
        T, C0, C1, C2, D, A, _pend = carry
        slot = jax.lax.rem(i, 2)
        get_dma(slot, i).wait()

        @pl.when(i + 1 < nchunks)
        def _():
            get_dma(jax.lax.rem(i + 1, 2), i + 1).start()

        if "notrans" in flags:
            # read the window as feature-major rows, skip roll/T/mask: each
            # feature is a (1, CHUNK) lane row broadcast against pixels --
            # WRONG layout semantics, measures the build cost
            win = buf_ref[slot]
            feat = lambda k: win[k:k + 1, :CHUNK].T  # (CHUNK, 1)  # noqa: E731
        else:
            featT = RP._chunk_feats(None, buf_ref, slot, phi, cnt - i * CHUNK)
            feat = lambda k: featT[:, k][:, None]  # noqa: E731

        x = feat(RP._FX)
        y = feat(RP._FY)
        ca = feat(RP._FA)
        cb = feat(RP._FB)
        cc = feat(RP._FC)
        op = feat(RP._FO)
        dx = x - px
        dy = y - py
        power = -0.5 * (ca * dx * dx + cc * dy * dy) - cb * dx * dy
        G = power if "noexp" in flags else jnp.exp(power)
        raw_alpha = op * G
        alpha = jnp.minimum(0.99, raw_alpha)
        if "noaccept" in flags:
            one_minus_eff = 1.0 - alpha
            contrib = alpha > 1e30  # constant-ish compare, keeps a mask op
        else:
            accepted = (power <= 0.0) & (alpha >= 1.0 / 255.0)
            accepted = (accepted
                        & (px >= feat(RP._FX0)) & (px < feat(RP._FX1))
                        & (py >= feat(RP._FY0)) & (py < feat(RP._FY1)))
            one_minus_eff = jnp.where(accepted, 1.0 - alpha, 1.0)
            contrib = accepted
        if "noscan" in flags:
            T_prev = T * one_minus_eff  # no cumulative product
        else:
            T_prev = T * RP._cumprod_rows(one_minus_eff, exclusive=True)
        T_next = T_prev * (1.0 - alpha)
        w = jnp.where(contrib, alpha * T_prev, 0.0)
        T = jnp.min(jnp.where(contrib, T_next, T), axis=0, keepdims=True)
        if "noaccum" in flags:
            C0 = C0 + jnp.sum(w, axis=0, keepdims=True)
        else:
            C0 = C0 + jnp.sum(w * feat(RP._FR), axis=0, keepdims=True)
            C1 = C1 + jnp.sum(w * feat(RP._FG), axis=0, keepdims=True)
            C2 = C2 + jnp.sum(w * feat(RP._FB2), axis=0, keepdims=True)
            D = D + jnp.sum(w * feat(RP._FD), axis=0, keepdims=True)
            A = A + jnp.sum(w, axis=0, keepdims=True)
        return (T, C0, C1, C2, D, A, _pend)

    T, C0, C1, C2, D, A, _ = jax.lax.fori_loop(0, nchunks, body, init)

    nt = GX * GY
    t1 = jnp.minimum(t + 1, nt - 1)

    @pl.when((t + 1 < nt) & (nch_ref[t1] > 0))
    def _():
        RP._inst_get_dma(None, inst_ref, buf_ref, sem_ref,
                         off_ref[t1])(0, 0).start()

    out_ref[0, :, :] = jnp.concatenate(
        [C0, C1, C2, D, A, T, T, T], axis=0)


def build_inputs():
    rng = np.random.default_rng(0)
    num_tiles = GX * GY
    total = num_tiles * NCH * CHUNK
    inst = np.zeros((FEAT, total + 2 * CHUNK), np.float32)
    inst[RP._FX] = rng.uniform(0, GX * 32, inst.shape[1])
    inst[RP._FY] = rng.uniform(0, GY * 32, inst.shape[1])
    inst[RP._FA] = 2e-4
    inst[RP._FC] = 2e-4
    inst[RP._FO] = 0.02
    inst[RP._FR] = rng.uniform(0, 1, inst.shape[1])
    inst[RP._FX1] = 1e9
    inst[RP._FY1] = 1e9
    inst[RP._FX0] = -1e9
    inst[RP._FY0] = -1e9
    start = np.arange(num_tiles, dtype=np.int32) * (NCH * CHUNK)
    return (jnp.asarray(inst),
            jnp.asarray(start),
            jnp.full((num_tiles,), NCH, jnp.int32),
            jnp.full((num_tiles,), NCH * CHUNK, jnp.int32))


def run(flags):
    inst, start, nch, cnt = build_inputs()
    num_tiles = GX * GY
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(num_tiles,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)],
        out_specs=pl.BlockSpec((1, 8, NPIX), lambda i, *_: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((2, FEAT, 2 * CHUNK), jnp.float32),
                        pltpu.SemaphoreType.DMA((2,))],
    )
    f = pl.pallas_call(
        functools.partial(kernel, flags),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((num_tiles, 8, NPIX), jnp.float32),
    )
    ms = device_time_ms(lambda i: f(start, nch, cnt, i), inst)
    us = ms * 1e3 / (num_tiles * NCH)
    print(f"{','.join(sorted(flags)) or 'FULL':28s} {ms:7.2f} ms "
          f"({us:.2f} us/chunk)", flush=True)
    return us


def main():
    base = run(frozenset())
    for f in ("noscan", "noexp", "notrans", "noaccept", "noaccum"):
        us = run(frozenset({f}))
        print(f"   -> {f} saves {base - us:.2f} us/chunk", flush=True)


if __name__ == "__main__":
    main()
