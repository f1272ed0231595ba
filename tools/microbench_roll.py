"""Cost of the sorted-input window realignment inside the render kernels.

Four kernel variants stream ~7k chunks (bench-scale: 2040 tiles x ~3.4
chunks) and reduce the chunk features to a scalar per tile:

  A  aligned DMA [FEAT, CHUNK], no realign        (old padded layout)
  B  [FEAT, 2C] window + dynamic pltpu.roll+slice (current sorted path)
  C  [FEAT, 2C] window + lax.dynamic_slice load
  D  [FEAT, 2C] window + transpose + SUBLANE roll

Run on the real TPU chip: python tools/microbench_roll.py
"""
from __future__ import annotations

import functools
import os
import sys

import numpy as np

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
from tputime import report  # noqa: E402

FEAT, CHUNK = 16, 128
T = 2040
NCH = 4  # chunks per tile
MAXI = T * NCH * CHUNK + 2 * CHUNK


def kernel(variant, off_ref, nch_ref, inst_ref, out_ref, buf_ref, sem_ref):
    t = pl.program_id(0)
    off = off_ref[t]
    nch = nch_ref[t]
    phi = off - (off // CHUNK) * CHUNK
    w = 2 * CHUNK if variant != "A" else CHUNK

    def get_dma(slot, i):
        if variant == "A":
            start = pl.multiple_of(off + i * CHUNK, CHUNK)
        else:
            start = pl.multiple_of((off // CHUNK) * CHUNK + i * CHUNK, CHUNK)
        return pltpu.make_async_copy(
            inst_ref.at[:, pl.ds(start, w)], buf_ref.at[slot],
            sem_ref.at[slot])

    get_dma(0, 0).start()

    def body(i, acc):
        slot = jax.lax.rem(i, 2)
        get_dma(slot, i).wait()

        @pl.when(i + 1 < nch)
        def _():
            get_dma(jax.lax.rem(i + 1, 2), i + 1).start()

        if variant == "A":
            featT = buf_ref[slot].T
        elif variant == "B":
            win = pltpu.roll(buf_ref[slot], 2 * CHUNK - phi, axis=1)
            featT = win[:, :CHUNK].T
        elif variant == "C":
            win = jax.lax.dynamic_slice(buf_ref[slot], (0, phi),
                                        (FEAT, CHUNK))
            featT = win.T
        else:  # D
            winT = buf_ref[slot].T  # (2C, FEAT)
            winT = pltpu.roll(winT, 2 * CHUNK - phi, axis=0)
            featT = winT[:CHUNK, :]
        return acc + jnp.sum(featT * featT)

    acc = jax.lax.fori_loop(0, nch, body, jnp.float32(0))
    out_ref[0, :, :] = jnp.full((8, 128), acc)


def run(variant):
    rng = np.random.default_rng(0)
    inst = jnp.asarray(rng.standard_normal((FEAT, MAXI)), jnp.float32)
    if variant == "A":
        off = jnp.asarray(np.arange(T, dtype=np.int32) * NCH * CHUNK)
    else:
        starts = np.cumsum(rng.integers(
            NCH * CHUNK - 90, NCH * CHUNK, T)).astype(np.int32)
        off = jnp.asarray(np.concatenate([[0], starts[:-1]]))
    nch = jnp.full((T,), NCH, jnp.int32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2, grid=(T,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)],
        out_specs=pl.BlockSpec((1, 8, 128), lambda i, *_: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, FEAT, 2 * CHUNK if variant != "A" else CHUNK),
                       jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ])
    f = pl.pallas_call(functools.partial(kernel, variant),
                       grid_spec=grid_spec,
                       out_shape=jax.ShapeDtypeStruct((T, 8, 128), jnp.float32))

    def g(off, nch, inst):
        return f(off, nch, inst)

    report(f"variant {variant}", g, off, nch, inst)


def main():
    for v in ("A", "B", "C", "D"):
        try:
            run(v)
        except Exception as e:  # noqa: BLE001
            print(f"variant {v} FAILED: {type(e).__name__}: "
                  f"{str(e).splitlines()[0][:120]}", flush=True)


if __name__ == "__main__":
    main()
