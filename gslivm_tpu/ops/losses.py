"""Photometric losses: L1, SSIM, PSNR, inverse depth.

Behavioral spec: reference `include/gs/gs/loss_utils.cuh`:
  - l1_loss (loss_utils.cuh:11-13)
  - inv_depth (15-21): 1/clamp(depth, eps) with depth<=eps zeroed.
  - gaussian window (24-30): NOTE the reference builds the 11-tap window as
    exp(-floor((x - window_size)/2)^2 / (2 sigma^2)) — an ASYMMETRIC window
    (an integer-division quirk of the C++ port of 3DGS). We reproduce it
    bit-for-bit for parity; `gaussian_window(symmetric=True)` gives the
    textbook window.
  - ssim (43-70): 11x11, sigma=1.5, per-channel depthwise conv, SAME padding
    via zero padding of size window//2 (torch conv2d default zero-pads).
  - psnr (89-93): 20*log10(1/sqrt(mse)) with mse averaged per channel, then
    averaged over channels.

Images here are channel-first [C, H, W] float32 in [0, 1], matching the
reference's torch layout so tests can compare directly.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

_C1 = 0.01**2
_C2 = 0.03**2


def l1_loss(pred, gt):
    return jnp.abs(pred - gt).mean()


def inv_depth(depth, epsilon: float = 1e-2):
    """loss_utils.cuh:15-21."""
    mask = depth <= epsilon
    inverse = 1.0 / jnp.clip(depth, min=epsilon)
    return jnp.where(mask, 0.0, inverse)


def gaussian_1d(window_size: int = 11, sigma: float = 1.5, symmetric: bool = False):
    """1D normalized gaussian taps (loss_utils.cuh:24-30), as a numpy array
    (host-side constant — safe to build under jit tracing).

    symmetric=False reproduces the reference's floor((x - ws)/2) exponent.
    """
    x = np.arange(window_size, dtype=np.float64)
    if symmetric:
        g = np.exp(-((x - window_size // 2) ** 2) / (2.0 * sigma * sigma))
    else:
        g = np.exp(-(np.floor((x - window_size) / 2.0) ** 2) / (2.0 * sigma * sigma))
    g = g / g.sum()
    return g.astype(np.float32)


def _depthwise_conv2d_same(img, window):
    """img [C, H, W], window [k, k] -> per-channel zero-padded SAME conv."""
    k = window.shape[0]
    lhs = img[None]  # [1, C, H, W]
    rhs = jnp.broadcast_to(window, (img.shape[0], 1, k, k))  # [C, 1, k, k]
    out = jax.lax.conv_general_dilated(
        lhs,
        rhs,
        window_strides=(1, 1),
        padding=[(k // 2, k // 2), (k // 2, k // 2)],
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        feature_group_count=img.shape[0],
        # full f32: at the default bf16 MXU precision the variance
        # cancellation conv(img^2) - mu^2 has errors comparable to C2, and
        # SSIM can exceed 1 on TPU (driving the image loss negative)
        precision=jax.lax.Precision.HIGHEST,
    )
    return out[0]


def _gaussian_blur_shift_add(img, taps: np.ndarray):
    """Separable gaussian filter as shift-and-add (zero-padded SAME).

    The 2D window is outer(taps, taps), so two 1D passes are exact. Each
    pass is a chain of k scaled shifted adds that XLA fuses into ONE memory
    sweep — measured 6.3 ms fwd+bwd for the full 5-conv SSIM at 1080p on
    v5e vs 100 ms for lax.conv's depthwise lowering (grouped convs lower
    poorly on TPU) and 41 ms for separable lax.conv. Values match the 2D
    convolution to ~4e-8 (f32 reassociation only)."""
    k = len(taps)
    r = k // 2
    C, H, W = img.shape
    x = jnp.pad(img, ((0, 0), (0, 0), (r, r)))
    out = sum(float(taps[i]) * jax.lax.dynamic_slice_in_dim(x, i, W, 2)
              for i in range(k))
    x = jnp.pad(out, ((0, 0), (r, r), (0, 0)))
    return sum(float(taps[i]) * jax.lax.dynamic_slice_in_dim(x, i, H, 1)
               for i in range(k))


def _blur_parts(parts, taps: np.ndarray):
    """Blur several same-shaped [C, H, W] fields with shared taps.

    On real TPUs the parts are stacked through ONE fused Pallas kernel
    (ops/blur_pallas.py): both separable passes run on a VMEM-resident row
    band, so each element makes one HBM round trip instead of the XLA
    chain's two full sweeps per blur — the image-loss block of the
    production step drops ~2x. Elsewhere (and under CPU tests) each part
    keeps its own XLA shift-add chain, which fuses into its producer (the
    r3 negative result on XLA-side stacking still holds: a concatenate
    there breaks that fusion)."""
    from .blur_pallas import blur_many, use_pallas_blur

    if use_pallas_blur():
        stack = jnp.concatenate(parts, axis=0)
        out = blur_many(stack, tuple(float(t) for t in taps))
        sizes = np.cumsum([0] + [p.shape[0] for p in parts])
        return [out[sizes[i]:sizes[i + 1]] for i in range(len(parts))]
    return [_gaussian_blur_shift_add(x, taps) for x in parts]


def ssim_ref_stats(img2, window_size: int = 11, sigma: float = 1.5,
                   symmetric_window: bool = False):
    """Precompute the REFERENCE-side SSIM statistics (mu2, sigma2_sq).

    They depend only on img2 — for a training loop where img2 is a ground-
    truth keyframe reused across many iterations, hoisting these two blur
    sweeps out of the step removes 2 of the 5 forward blurs with EXACTLY
    the same ops (bit-identical result, pinned by
    test_ssim_ref_stats_exact)."""
    taps = gaussian_1d(window_size, sigma, symmetric_window)
    mu2, m22 = _blur_parts([img2, img2 * img2], taps)
    sigma2_sq = m22 - mu2 * mu2
    return mu2, sigma2_sq


def ssim(img1, img2, window_size: int = 11, sigma: float = 1.5,
         symmetric_window: bool = False, ref_stats=None):
    """Mean SSIM over the image (loss_utils.cuh:43-70). Inputs [C, H, W].

    ref_stats: optional precomputed (mu2, sigma2_sq) from ssim_ref_stats —
    must have been computed from THIS img2 with the same window.

    (r3 negative result: stacking the five blurs into ONE [5C, H, W]
    shift-add sweep measured 2x SLOWER on v5e — 12.6 vs 6.0 ms fwd+bwd at
    1080p: the concatenate materializes the stack and breaks XLA's fusion
    of each blur into its producer. Five separate fused chains stay. r4
    negative result: riding the 11-tap separable blur on the MXU as a dense
    band-matrix einsum produced garbage gradients at 1080p under
    precision=HIGHEST — tools/microbench_ssim2.py.)"""
    taps = gaussian_1d(window_size, sigma, symmetric_window)
    if ref_stats is None:
        mu1, mu2, m11, m22, m12 = _blur_parts(
            [img1, img2, img1 * img1, img2 * img2, img1 * img2], taps)
        sigma2_sq = m22 - mu2 * mu2
    else:
        mu2, sigma2_sq = ref_stats
        mu1, m11, m12 = _blur_parts(
            [img1, img1 * img1, img1 * img2], taps)
    mu1_sq = mu1 * mu1
    mu2_sq = mu2 * mu2
    mu1_mu2 = mu1 * mu2
    sigma1_sq = m11 - mu1_sq
    sigma12 = m12 - mu1_mu2
    ssim_map = ((2.0 * mu1_mu2 + _C1) * (2.0 * sigma12 + _C2)) / (
        (mu1_sq + mu2_sq + _C1) * (sigma1_sq + sigma2_sq + _C2)
    )
    return ssim_map.mean()


def ssim_band_sum(img1, img2, row_lo, n_rows: int, window_size: int = 11,
                  sigma: float = 1.5, symmetric_window: bool = False):
    """SUM of the SSIM map over image rows [row_lo, row_lo + n_rows).

    The pixel-sharded loss building block: each device of a "pixel" axis
    evaluates the blurs only over its band (+ the window radius of halo
    rows), and the full-image mean is psum(band sums) / (C*H*W) — instead
    of every device redundantly blurring the entire gathered frame.
    Exact: the inputs are zero-padded by the radius before the dynamic
    band slice, so the band blur sees precisely the zero-padded-SAME
    neighborhood `ssim` uses; rows at or beyond H contribute zero.
    row_lo may be traced (e.g. axis_index * n_rows); n_rows is static.
    """
    taps = gaussian_1d(window_size, sigma, symmetric_window)
    r = window_size // 2
    C, H, W = img1.shape
    row_lo = jnp.clip(row_lo, 0, H)

    def band(x):
        xp = jnp.pad(x, ((0, 0), (r, r + n_rows), (0, 0)))
        return jax.lax.dynamic_slice_in_dim(xp, row_lo, n_rows + 2 * r, 1)

    a = band(img1)
    b = band(img2)
    mu1, mu2, m11, m22, m12 = _blur_parts([a, b, a * a, b * b, a * b], taps)
    mu1_sq = mu1 * mu1
    mu2_sq = mu2 * mu2
    mu1_mu2 = mu1 * mu2
    sigma1_sq = m11 - mu1_sq
    sigma2_sq = m22 - mu2_sq
    sigma12 = m12 - mu1_mu2
    ssim_map = ((2.0 * mu1_mu2 + _C1) * (2.0 * sigma12 + _C2)) / (
        (mu1_sq + mu2_sq + _C1) * (sigma1_sq + sigma2_sq + _C2)
    )
    core = ssim_map[:, r:r + n_rows, :]
    ridx = row_lo + jnp.arange(n_rows)
    mask = (ridx < H).astype(core.dtype)[None, :, None]
    return jnp.sum(core * mask)


def l1_band_sum(img1, img2, row_lo, n_rows: int):
    """SUM of |img1 - img2| over image rows [row_lo, row_lo + n_rows).

    Pixel-sharded L1 building block (sibling of ssim_band_sum): each device
    of a "pixel" axis reduces only its row band of the replicated frame and
    the full-image mean is psum(band sums) / (C*H*W). row_lo may be traced;
    n_rows is static. Rows at or beyond H contribute zero."""
    C, H, W = img1.shape
    row_lo = jnp.clip(row_lo, 0, H)
    a = jax.lax.dynamic_slice_in_dim(
        jnp.pad(img1, ((0, 0), (0, n_rows), (0, 0))), row_lo, n_rows, 1)
    b = jax.lax.dynamic_slice_in_dim(
        jnp.pad(img2, ((0, 0), (0, n_rows), (0, 0))), row_lo, n_rows, 1)
    ridx = row_lo + jnp.arange(n_rows)
    mask = (ridx < H).astype(img1.dtype)[None, :, None]
    return jnp.sum(jnp.abs(a - b) * mask)


def psnr(pred, gt):
    """loss_utils.cuh:89-93. Inputs [C, H, W] in [0, 1]."""
    mse = ((pred - gt) ** 2).reshape(pred.shape[0], -1).mean(axis=1)
    return (20.0 * jnp.log10(1.0 / jnp.sqrt(mse))).mean()


def image_loss(pred, gt, lambda_dssim: float = 0.2):
    """The training image loss (lioOptimization.cpp:1705-1712):
    (1 - lambda) * L1 + lambda * (1 - SSIM)."""
    return (1.0 - lambda_dssim) * l1_loss(pred, gt) + lambda_dssim * (1.0 - ssim(pred, gt))


def smooth_depth(depth):
    """loss_utils.cuh:73-87: |3x3-gaussian-smoothed depth - depth| mean."""
    kernel = jnp.asarray(
        [[1.0, 2.0, 1.0], [2.0, 4.0, 2.0], [1.0, 2.0, 1.0]], dtype=jnp.float32
    ) / 16.0
    sm = _depthwise_conv2d_same(depth[None], kernel)[0]
    return jnp.abs(sm - depth).mean()
