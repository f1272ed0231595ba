"""Naive differentiable rasterizer — the correctness oracle.

A direct, pure-JAX O(P * pixels) implementation of the reference CUDA
rasterizer semantics (`src/cuda_rasterizer/forward.cu`,
`rasterizer_impl.cu`), used as the allclose oracle for the Pallas kernels
(BASELINE.json config[0]) and as a CPU-executable fallback. Gradients come
from JAX autodiff of the exact forward math, which matches the reference's
hand-written backward (`backward.cu`) analytically.

Parity quirks reproduced deliberately:
  - near cull at z <= 0.2 (forward.cu:223-225)
  - oversize-scale cull s*mod > 0.3 (forward.cu:19-25, 227)
  - unnormalized quaternion in cov3D (forward.cu:146)
  - +0.3 pixel low-pass on cov2D (forward.cu:130-131)
  - sqrt(max(0.1, ...)) eigenvalue clamp for the radius (forward.cu:261-262)
  - 1/(w + 1e-7) projection guard (forward.cu:233)
  - 16x16 tile-rect membership: a pixel only sees gaussians whose tile rect
    covers the pixel's tile (getRect, auxiliary.h:39-45) — so splats are
    clipped to their 3-sigma rect exactly like the tiled renderer
  - alpha = min(0.99, o*exp(power)), skip power>0, skip alpha<1/255,
    stop when T*(1-alpha) < 1e-4 (forward.cu:357-394)
  - depth-sorted front-to-back with ties broken by gaussian index (stable
    radix sort over float depth bits, rasterizer_impl.cu:94, 295-309)
  - output color = C + T_final * bg (forward.cu:402-403); depth/acc get no
    background term
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from . import covariance as cov_ops
from . import sh as sh_ops
from ..models.cameras import Camera

TILE = 16  # config.h:16-17 (BLOCK_X = BLOCK_Y = 16)


class PreprocessedGaussians(NamedTuple):
    """Per-gaussian screen-space quantities (the CUDA preprocess outputs)."""

    valid: jnp.ndarray  # [N] bool — survives all culls
    mean2d: jnp.ndarray  # [N, 2] pixel coords
    conic: jnp.ndarray  # [N, 3] inverse 2D covariance (a, b, c)
    opacity: jnp.ndarray  # [N]
    color: jnp.ndarray  # [N, 3]
    depth: jnp.ndarray  # [N] view-space z
    radius: jnp.ndarray  # [N] pixel radius (0 for culled)
    rect_min: jnp.ndarray  # [N, 2] int32 tile coords (x, y)
    rect_max: jnp.ndarray  # [N, 2] int32 tile coords, exclusive
    tiles_touched: jnp.ndarray  # [N] int32


def tile_grid(width: int, height: int) -> tuple[int, int]:
    return (width + TILE - 1) // TILE, (height + TILE - 1) // TILE


def get_rect(mean2d, radius_xy, grid_x: int, grid_y: int):
    """auxiliary.h:39-45 — trunc-toward-zero then clamp to [0, grid].

    radius_xy: [..., 2] per-axis half-extents in pixels (the reference passes
    the same scalar radius for both axes; the tight-rect path passes the
    ellipse AABB half-extents — see preprocess).
    """
    lo = jnp.trunc((mean2d - radius_xy) / TILE)
    hi = jnp.trunc((mean2d + radius_xy + TILE - 1) / TILE)
    limits = jnp.asarray([grid_x, grid_y], dtype=jnp.int32)
    rect_min = jnp.clip(lo.astype(jnp.int32), 0, limits)
    rect_max = jnp.clip(hi.astype(jnp.int32), 0, limits)
    return rect_min, rect_max


def tile_min_power(mx, my, ca, cb, cc, tile_x, tile_y, pw: int = TILE,
                   ph: int = TILE, rb_a=None, rb_c=None):
    """Exact minimum of q(d) = 0.5(a dx² + c dy²) + b dx dy over a tile's
    pixel box [pw·tx, pw·tx+pw−1] × [ph·ty, ph·ty+ph−1] (continuous hull of
    the tile's pixel centers; conservative for the integer pixel grid).
    pw/ph default to the 16×16 reference tile; supertile binning passes the
    program block's pixel pitch.

    q = -power of the splat kernel (forward.cu:355), so a tile with
    opacity·exp(-q_min) < 1/255 contains NO pixel that passes the render
    kernel's alpha test (forward.cu:374) — dropping the (gaussian, tile)
    instance is lossless for C/D/S and all gradients. All args broadcast.
    """
    x0 = tile_x * pw - mx
    x1 = x0 + (pw - 1)
    y0 = tile_y * ph - my
    y1 = y0 + (ph - 1)
    inside = (x0 <= 0) & (0 <= x1) & (y0 <= 0) & (0 <= y1)
    # rb_a/rb_c = -cb / max(ca, 1e-12), -cb / max(cc, 1e-12): callers
    # evaluating PER-INSTANCE (binning's tile cull at ~1M slots) precompute
    # these per GAUSSIAN and gather them — f32 divides are the most
    # expensive VPU elementwise op, so hoisting 4 divides per instance
    # into 2 per gaussian is a measured multi-ms win (profile_binning.py)
    if rb_a is None:
        rb_a = -cb / jnp.maximum(ca, 1e-12)
    if rb_c is None:
        rb_c = -cb / jnp.maximum(cc, 1e-12)

    def q(dx, dy):
        return 0.5 * (ca * dx * dx + cc * dy * dy) + cb * dx * dy

    # min over each of the 4 box edges: 1-D quadratic, stationary point
    # clamped into the edge segment
    qy0 = q(x0, jnp.clip(x0 * rb_c, y0, y1))
    qy1 = q(x1, jnp.clip(x1 * rb_c, y0, y1))
    qx0 = q(jnp.clip(y0 * rb_a, x0, x1), y0)
    qx1 = q(jnp.clip(y1 * rb_a, x0, x1), y1)
    qmin = jnp.minimum(jnp.minimum(qy0, qy1), jnp.minimum(qx0, qx1))
    return jnp.where(inside, 0.0, jnp.maximum(qmin, 0.0))


# keep-threshold for the tile cull: alpha >= 1/255 with a small conservative
# margin so f32 rounding differences between the cull's bound and the render
# kernel's own alpha evaluation can never drop a passing pixel
TILE_CULL_EPS = 1.0 / 255.0 * (1.0 - 1e-5)


def tile_accepts(mx, my, ca, cb, cc, opacity, tile_x, tile_y):
    """True if any pixel of the tile can pass the alpha >= 1/255 test."""
    qmin = tile_min_power(mx, my, ca, cb, cc, tile_x, tile_y)
    return opacity * jnp.exp(-qmin) >= TILE_CULL_EPS


def preprocess(
    means,
    scales,
    quats,
    opacities,
    shs,
    camera: Camera,
    sh_degree: int = 0,
    scale_modifier: float = 1.0,
    active_mask=None,
    colors_precomp=None,
) -> PreprocessedGaussians:
    """preprocessCUDA (forward.cu:180-286) in vectorized JAX.

    `active_mask` supports capacity-padded parameter buffers: padded slots
    behave exactly like culled gaussians.
    """
    grid_x, grid_y = tile_grid(camera.width, camera.height)

    p_view = means @ camera.R_cw.T + camera.t_cw
    z = p_view[..., 2]
    near_ok = z > 0.2

    size_ok = ~cov_ops.scale_abnormal(scales, scale_modifier)

    # z + 1e-7 can be ~0 for culled slots; substitute a safe depth there so
    # the projection stays finite (culled slots never contribute, but inf
    # values would poison gradients through downstream where-masks)
    z_div = jnp.where(near_ok, z, 1.0)
    w_inv = 1.0 / (z_div + 1e-7)
    ndc_x = (p_view[..., 0] / camera.tan_fovx) * w_inv
    ndc_y = (p_view[..., 1] / camera.tan_fovy) * w_inv
    pix_x = ((ndc_x + 1.0) * camera.width - 1.0) * 0.5
    pix_y = ((ndc_y + 1.0) * camera.height - 1.0) * 0.5
    mean2d = jnp.stack([pix_x, pix_y], axis=-1)

    cov3d = cov_ops.compute_cov3d(scales, quats, scale_modifier)
    p_view_safe = p_view.at[..., 2].set(z_div)
    cov2d = cov_ops.compute_cov2d(
        p_view_safe, cov3d, camera.R_cw, camera.fx, camera.fy, camera.tan_fovx, camera.tan_fovy
    )
    conic, radius, det = cov_ops.conic_and_radius(cov2d)
    det_ok = det != 0.0

    # Tight LOSSLESS binning rect. The reference bins a square of half-side
    # radius = ceil(3·sqrt(λmax)) (forward.cu:261-263, getRect auxiliary.h:39)
    # but its render kernel only composites pixels with alpha = op·G >= 1/255
    # (forward.cu:374), i.e. inside the Mahalanobis ellipse of radius
    # r* = sqrt(2·ln(255·op)). Visible contributions therefore live in
    # square(3σ) ∩ ellipse(r*), whose axis-aligned hull has half-extents
    # hx = min(radius, r*·sqrt(Σxx)), hy = min(radius, r*·sqrt(Σyy))
    # (the AABB of the level set dᵀΣ⁻¹d = r*² is ±r*·sqrt(Σ_ii)). Binning
    # this rect instead of the square leaves C/D/S images and gradients
    # unchanged (up to f32 re-association in the tiled kernel's chunk scans)
    # while touching far fewer tiles for anisotropic or low-opacity splats. Reported `radius` (radii output) keeps reference
    # semantics. n_contrib list ranks shift (documented deviation).
    op = opacities.reshape(opacities.shape[0])
    rstar = jnp.sqrt(jnp.maximum(
        2.0 * jnp.log(jnp.maximum(255.0 * op, 1e-12)), 0.0)) * (1.0 + 1e-5)
    hx = jnp.minimum(radius, rstar * jnp.sqrt(jnp.maximum(cov2d[..., 0], 0.0)))
    hy = jnp.minimum(radius, rstar * jnp.sqrt(jnp.maximum(cov2d[..., 2], 0.0)))
    half_extents = jax.lax.stop_gradient(jnp.stack([hx, hy], axis=-1))

    rect_min, rect_max = get_rect(mean2d, half_extents, grid_x, grid_y)
    tiles = (rect_max[..., 0] - rect_min[..., 0]) * (rect_max[..., 1] - rect_min[..., 1])
    rect_ok = tiles > 0

    valid = near_ok & size_ok & det_ok & rect_ok
    if active_mask is not None:
        valid = valid & active_mask

    if colors_precomp is not None:
        color = colors_precomp
    else:
        color = sh_ops.sh_to_color(shs, means, camera.cam_center, sh_degree)

    return PreprocessedGaussians(
        valid=valid,
        mean2d=mean2d,
        conic=conic,
        opacity=opacities.reshape(opacities.shape[0]),
        color=color,
        depth=z,
        radius=jnp.where(valid, radius, 0.0),
        rect_min=rect_min,
        rect_max=rect_max,
        tiles_touched=jnp.where(valid, tiles, 0).astype(jnp.int32),
    )


def depth_order(pre: PreprocessedGaussians):
    """Front-to-back order with index tie-break (stable sort; invalid last)."""
    key = jnp.where(pre.valid, pre.depth, jnp.inf)
    return jnp.argsort(jax.lax.stop_gradient(key), stable=True)


def _composite_pixels(pix_xy, tile_xy, pre_sorted, bg_color):
    """Alpha-composite all sorted gaussians onto a block of pixels.

    pix_xy: [B, 2] float pixel coords; tile_xy: [B, 2] int tile coords.
    pre_sorted: PreprocessedGaussians already in front-to-back order.
    Returns (color [B,3], depth [B], acc [B], final_T [B], n_contrib [B]).
    """
    d = pix_xy[:, None, :] - pre_sorted.mean2d[None, :, :]  # [B, N, 2]
    a = pre_sorted.conic[None, :, 0]
    b = pre_sorted.conic[None, :, 1]
    c = pre_sorted.conic[None, :, 2]
    power = (
        -0.5 * (a * d[..., 0] * d[..., 0] + c * d[..., 1] * d[..., 1])
        - b * d[..., 0] * d[..., 1]
    )  # [B, N]

    in_rect = jnp.all(
        (tile_xy[:, None, :] >= pre_sorted.rect_min[None]) &
        (tile_xy[:, None, :] < pre_sorted.rect_max[None]),
        axis=-1,
    )  # [B, N]

    alpha = jnp.minimum(0.99, pre_sorted.opacity[None, :] * jnp.exp(power))
    accepted = (
        pre_sorted.valid[None, :] & in_rect & (power <= 0.0) & (alpha >= 1.0 / 255.0)
    )
    alpha_eff = jnp.where(accepted, alpha, 0.0)

    # Transmittance BEFORE each gaussian: exclusive cumprod of (1 - alpha),
    # computed by shifting the inclusive cumprod (no division).
    one_minus = 1.0 - alpha_eff
    T_prev = jnp.concatenate(
        [jnp.ones_like(alpha_eff[:, :1]), jnp.cumprod(one_minus, axis=1)[:, :-1]],
        axis=1,
    )

    # Early-stop: first accepted gaussian with T*(1-alpha) < 1e-4 sets "done";
    # it and everything after contribute nothing (forward.cu:377-381).
    would_stop = accepted & (T_prev * (1.0 - alpha) < 1e-4)
    done = jnp.cumsum(would_stop.astype(jnp.int32), axis=1) > 0
    contrib = accepted & ~done

    w = jnp.where(contrib, alpha_eff * T_prev, 0.0)  # [B, N]
    # full f32: the default MXU matmul precision (bf16) costs ~1e-3 here
    color = jnp.einsum("bn,nc->bc", w, pre_sorted.color,
                       precision=jax.lax.Precision.HIGHEST)  # [B, 3]
    depth = (w * pre_sorted.depth[None, :]).sum(axis=1)
    acc = w.sum(axis=1)
    final_T = jnp.where(contrib, one_minus, 1.0).prod(axis=1)

    # n_contrib counts positions within the pixel's TILE list (the reference's
    # `contributor` counter, forward.cu:333,359): rank among in-rect valid
    # gaussians that survive the (lossless) tile cull — the same list the
    # tiled rasterizer builds (binning.py tile_cull).
    in_list = pre_sorted.valid[None, :] & in_rect & tile_accepts(
        pre_sorted.mean2d[None, :, 0], pre_sorted.mean2d[None, :, 1],
        pre_sorted.conic[None, :, 0], pre_sorted.conic[None, :, 1],
        pre_sorted.conic[None, :, 2], pre_sorted.opacity[None, :],
        tile_xy[:, None, 0], tile_xy[:, None, 1],
    )
    rank = jnp.cumsum(in_list.astype(jnp.int32), axis=1)
    n_contrib = jnp.max(jnp.where(contrib, rank, 0), axis=1)

    out_color = color + final_T[:, None] * bg_color[None, :]
    return out_color, depth, acc, final_T, n_contrib


class RenderOutput(NamedTuple):
    color: jnp.ndarray  # [3, H, W]
    depth: jnp.ndarray  # [H, W]
    acc: jnp.ndarray  # [H, W] (silhouette)
    final_T: jnp.ndarray  # [H, W]
    n_contrib: jnp.ndarray  # [H, W] int32
    radii: jnp.ndarray  # [N]
    # Binning diagnostics (stop-gradient; the TPU analog of the CUDA
    # dynamic-resize callback's num_rendered, rasterize_points.cu:36-44):
    # instances dropped by the static budgets, and the true expansion size.
    # overflow > 0 means the most-occluded instances of the busiest tiles
    # were truncated — images AND gradients are then approximate; consumers
    # (training.TrainMetrics, pipeline.IncrementalMapper, bench.py) surface
    # it and escalate max_instances. Always 0 for the oracle backend.
    overflow: jnp.ndarray = np.int32(0)       # [] int32
    num_instances: jnp.ndarray = np.int32(0)  # [] int32
    # busiest tile's chunk count (pallas backend; 0 for the oracle) — the
    # feedback signal for fitting max_chunks_per_tile (pipeline auto-fit)
    max_nchunks: jnp.ndarray = np.int32(0)    # [] int32
    # total chunks the kernels actually WALK (sum of per-tile neff — the
    # early-stop vote): the backward writes exactly walked_chunks * CHUNK
    # per-instance grad slots, so this is the feedback signal for fitting
    # RasterizeSettings.grad_capacity (the compacted grad layout)
    walked_chunks: jnp.ndarray = np.int32(0)  # [] int32


def rasterize_naive(
    means,
    scales,
    quats,
    opacities,
    shs,
    camera: Camera,
    bg_color=None,
    sh_degree: int = 0,
    scale_modifier: float = 1.0,
    active_mask=None,
    colors_precomp=None,
    pixel_chunk: int = 4096,
) -> RenderOutput:
    """Render C/D/S images; differentiable through all parameters.

    No depth-gradient-drop here — this is the raw math. Use
    `gslivm_tpu.ops.rasterize.rasterize` for the reference-parity autograd
    behavior (grad_out_depth silently dropped, rasterizer.cu:79).
    """
    H, W = camera.height, camera.width
    if bg_color is None:
        bg_color = jnp.ones((3,), dtype=means.dtype)  # white_background=true

    pre = preprocess(
        means, scales, quats, opacities, shs, camera,
        sh_degree=sh_degree, scale_modifier=scale_modifier,
        active_mask=active_mask, colors_precomp=colors_precomp,
    )
    order = depth_order(pre)
    pre_sorted = jax.tree.map(lambda x: x[order], pre)

    ys, xs = jnp.meshgrid(jnp.arange(H), jnp.arange(W), indexing="ij")
    pix_xy = jnp.stack([xs.reshape(-1), ys.reshape(-1)], axis=-1).astype(means.dtype)
    tile_xy = (pix_xy // TILE).astype(jnp.int32)

    n_pix = H * W
    pad = (-n_pix) % pixel_chunk
    pix_xy_p = jnp.pad(pix_xy, ((0, pad), (0, 0)))
    tile_xy_p = jnp.pad(tile_xy, ((0, pad), (0, 0)))
    n_chunks = (n_pix + pad) // pixel_chunk

    def body(args):
        px, tx = args
        return _composite_pixels(px, tx, pre_sorted, bg_color)

    outs = jax.lax.map(
        body,
        (
            pix_xy_p.reshape(n_chunks, pixel_chunk, 2),
            tile_xy_p.reshape(n_chunks, pixel_chunk, 2),
        ),
    )
    color, depth, acc, final_T, n_contrib = (o.reshape(-1, *o.shape[2:])[:n_pix] for o in outs)

    return RenderOutput(
        color=color.reshape(H, W, 3).transpose(2, 0, 1),
        depth=depth.reshape(H, W),
        acc=acc.reshape(H, W),
        final_T=jax.lax.stop_gradient(final_T.reshape(H, W)),
        n_contrib=n_contrib.reshape(H, W),
        radii=jax.lax.stop_gradient(pre.radius),
        overflow=jnp.zeros((), jnp.int32),  # oracle composites everything
        num_instances=jax.lax.stop_gradient(jnp.sum(pre.tiles_touched)),
    )
