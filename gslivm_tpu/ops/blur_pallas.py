"""Fused separable 11-tap blur as a Pallas TPU kernel.

The SSIM loss is built from per-channel separable gaussian blurs
(`losses._gaussian_blur_shift_add`). XLA's fused shift-add chain runs each
blur as TWO full HBM sweeps (horizontal pass, materialize, vertical pass)
at an effective ~80 GB/s — ~10x below the chip's bandwidth — making the
image losses ~21 ms of the production 3-camera step (tools/profile_step3).
This kernel performs BOTH passes on a VMEM-resident row band: each input
element is read from HBM once (plus a 2r-row halo re-read), both blur
axes run at register speed, and independent images/channels ride one grid.

Semantics: zero-padded SAME correlation with arbitrary static taps on the
last two axes of [N, H, W] — exactly `_gaussian_blur_shift_add` (which
matches torch's conv2d with the outer-product window to f32
reassociation). Linear in x, so the VJP is the blur with REVERSED taps
(adjoint of correlation), defined via custom_vjp below.

Reference trace: loss_utils.cuh:24-70 (window + depthwise SSIM convs).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BAND = 128  # output rows per grid program


def _kernel(taps, band, r, W, Wout, center_ref, below_ref, out_ref):
    # assemble the (band + 2r, Wp) window: the center block plus the first
    # 2r rows of the block below (the array is pre-padded so both exist)
    A = jnp.concatenate([center_ref[0], below_ref[0, : 2 * r]], axis=0)
    # horizontal pass: static lane slices of the column-padded window
    Hh = sum(float(taps[k]) * jax.lax.slice_in_dim(A, k, k + W, axis=1)
             for k in range(len(taps)))
    # vertical pass: static sublane slices
    out = sum(float(taps[k]) * jax.lax.slice_in_dim(Hh, k, k + band, axis=0)
              for k in range(len(taps)))
    if Wout > W:
        out = jnp.pad(out, ((0, 0), (0, Wout - W)))
    out_ref[0] = out


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def blur_many(x, taps: tuple, interpret: bool = False):
    """Blur each [H, W] slice of x [N, H, W] with the separable taps.

    taps must be a hashable tuple of floats (static). Zero-padded SAME on
    both axes, matching `_gaussian_blur_shift_add` / torch conv2d.
    """
    return _blur_impl(x, taps, interpret)


def _blur_impl(x, taps, interpret):
    N, H, W = x.shape
    k = len(taps)
    r = k // 2
    band = _BAND
    nbands = -(-H // band)
    Wp = -(-(W + 2 * r) // 128) * 128
    Wout = -(-W // 128) * 128
    # rows: r top pad + H + enough bottom pad for (nbands + 1) full blocks
    rows_needed = (nbands + 1) * band
    xp = jnp.pad(x, ((0, 0), (r, rows_needed - H - r), (r, Wp - W - r)))

    out = pl.pallas_call(
        functools.partial(_kernel, taps, band, r, W, Wout),
        grid=(N, nbands),
        in_specs=[
            pl.BlockSpec((1, band, Wp), lambda n, i: (n, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, band, Wp), lambda n, i: (n, i + 1, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, band, Wout), lambda n, i: (n, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, nbands * band, Wout), x.dtype),
        interpret=interpret,
    )(xp, xp)
    return out[:, :H, :W]


def _blur_fwd(x, taps, interpret):
    return _blur_impl(x, taps, interpret), None


def _blur_bwd(taps, interpret, _, g):
    # adjoint of zero-padded SAME correlation = same blur, reversed taps
    return (_blur_impl(g, tuple(reversed(taps)), interpret),)


blur_many.defvjp(_blur_fwd, _blur_bwd)


def use_pallas_blur() -> bool:
    """Pallas blur on real TPUs; the XLA shift-add chain elsewhere (CPU
    interpret mode would be slower than XLA for tests)."""
    return jax.default_backend() == "tpu"
