"""Batched voxel Gaussian-process regression (the reference's "gp3d").

Behavioral spec: reference `src/gp3d/gpprocess.cu` — per-voxel 2.5D GP
regression, batched across voxels:

  - direction-projected training data (processVoxelsKernel:142-159): each
    surface cell regresses f(c1, c2) where (c1, c2, f) is a permutation of
    (x, y, z) chosen by PCA (cell.cpp); f is mean-centered (calculateMean).
  - uniform test grid of test_side^2 points (= num_gp_side*neighbour_size
    per side, 12x12=144) at cell-relative coordinates
    (deviceEvenSetLinSpaced:7-12; +0.5-interval offsets unless full_cover).
  - OU/Laplacian kernel K = exp(-kernel_size * dist2d) with per-point
    sensor variance^2 added to the diagonal (computeKernelMatrices:16-46).
  - posterior mean f* = K* K^-1 f and "explained variance"
    v = diag(K* K^-1 K*^T) (the cublas pipeline, gpprocess.cu:602-668).
    KNOWN DEVIATION: we solve via Cholesky (K is SPD: positive kernel Gram
    + positive diagonal) instead of the reference's LU inverse
    (cublasSgetrf/getriBatched) — better conditioned, same math.
  - variance gate (processVoxelsVarianceKernel:63-122): var_mean =
    1 - mean(v); > max_var_mean -> voxel reopened, per-train-point update
    values 0.2*(1 - kvar[x_idx, y_idx]) where (x_idx, y_idx) are the train
    point's TEST-GRID coordinates — note the reference indexes the 144x144
    covariance at [x_idx, y_idx] (both < 12), i.e. the covariance between
    low-index test points, NOT the diagonal at the nearest test point; we
    reproduce this exactly for parity. var_mean outside [0,1] is the
    reference's exit(-404); here it is a reported error mask.
  - fastInitial3DGS (gpprocess.cu:420-458): 144 samples -> 4x4 blocks of
    3x3 -> 16 gaussians/voxel via inverse-"variance" weighted mean and
    covariance (weights = 1/explained-variance, replicated faithfully).
  - colorization (getColors:917-983): world->camera transform, radial
    distortion projection, nearest-pixel sample; out-of-image -> dropped.

Everything is fixed-shape and jit'ed: V (padded voxel batch) is the batch
dim; NT = min_points_num_to_gp = 10 train points.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..config import GpParams

# (c1, c2, f) world-axis indices per direction (processVoxelsKernel:142-159)
_PERM = jnp.asarray([[1, 2, 0], [2, 0, 1], [0, 1, 2]], dtype=jnp.int32)


class GpBatch(NamedTuple):
    """A padded batch of surface cells ready for GP regression."""

    points: jnp.ndarray      # [V, NT, 3] world train points (last NT of cell)
    variance: jnp.ndarray    # [V, NT] per-point sensor std
    direction: jnp.ndarray   # [V] int32 in {0,1,2}
    region_min: jnp.ndarray  # [V, 3] voxel min corner (world)
    mask: jnp.ndarray        # [V] bool


class GpResult(NamedTuple):
    test_points: jnp.ndarray  # [V, T, 3] GP sample points (world)
    test_var: jnp.ndarray     # [V, T] explained variance (kvar diagonal)
    var_mean: jnp.ndarray     # [V] 1 - mean(explained)
    reopen: jnp.ndarray       # [V] bool — var_mean > max_var_mean
    update_variance: jnp.ndarray  # [V, NT] new per-point variances (x0.2)
    error: jnp.ndarray        # [V] bool — var_mean outside [0,1] (ref -404)
    means: jnp.ndarray        # [V, 16, 3] fast-init gaussian centers
    covs: jnp.ndarray         # [V, 16, 3, 3] fast-init covariances
    loss_points: jnp.ndarray  # [V, 5, 3] every-30th test point (loss anchors
                              # for reopened voxels, gpprocess.cu:783-789)


@functools.partial(jax.jit, static_argnames=("cfg",))
def gp_forward(batch: GpBatch, cfg: GpParams = GpParams()) -> GpResult:
    V, NT, _ = batch.points.shape
    S = cfg.test_side          # 12
    T = S * S                  # 144
    interval = cfg.grid / ((S - 1) if cfg.full_cover else S)

    perm = _PERM[batch.direction]          # [V, 3]
    inv_perm = jnp.argsort(perm, axis=-1)  # scatter-back permutation

    proj = jnp.take_along_axis(batch.points, perm[:, None, :], axis=2)  # [V,NT,3]
    c1, c2, f = proj[..., 0], proj[..., 1], proj[..., 2]
    f_mean = f.mean(axis=1, keepdims=True)
    fc = f - f_mean  # [V, NT]

    mins = jnp.take_along_axis(batch.region_min, perm[:, :2], axis=1)  # [V,2]

    # test grid (deviceEvenSetLinSpaced): i//S along c1, i%S along c2
    ii = jnp.arange(T) // S
    jj = jnp.arange(T) % S
    offset = 0.0 if cfg.full_cover else 0.5
    t1 = mins[:, 0:1] + interval * (ii[None, :] + offset)  # [V, T]
    t2 = mins[:, 1:2] + interval * (jj[None, :] + offset)

    # kernel matrices (OU kernel on 2D distance)
    dtrain = jnp.sqrt(
        (c1[:, :, None] - c1[:, None, :]) ** 2
        + (c2[:, :, None] - c2[:, None, :]) ** 2
    )  # [V, NT, NT]
    K = jnp.exp(-cfg.kernel_size * dtrain) + jnp.einsum(
        "vn,nm->vnm", batch.variance**2, jnp.eye(NT)
    )

    dstar = jnp.sqrt(
        (c1[:, None, :] - t1[:, :, None]) ** 2
        + (c2[:, None, :] - t2[:, :, None]) ** 2
    )  # [V, T, NT]
    Kstar = jnp.exp(-cfg.kernel_size * dstar)

    # Cholesky solve (deviation from LU inverse, see module doc)
    L = jnp.linalg.cholesky(K)
    A = jax.scipy.linalg.cho_solve((L, True), jnp.swapaxes(Kstar, 1, 2))  # [V,NT,T]
    f_star = jnp.einsum("vn,vnt->vt", fc, A) + f_mean  # [V, T]
    v_expl = jnp.einsum("vtn,vnt->vt", Kstar, A)       # [V, T] kvar diagonal

    # reassemble world points: (c1, c2, f) scattered back through inv_perm
    proj_pts = jnp.stack([t1, t2, f_star], axis=-1)  # [V, T, 3]
    world = jnp.take_along_axis(proj_pts, inv_perm[:, None, :], axis=2)

    var_mean = 1.0 - v_expl.mean(axis=1)
    error = ((var_mean > 1.0) | (var_mean < 0.0)) & batch.mask
    reopen = (var_mean > cfg.max_var_mean) & batch.mask & ~error

    # parity variance update: kvar[x_idx, y_idx] with train-point grid coords
    x_idx = jnp.clip(((c1 - mins[:, 0:1]) / interval).astype(jnp.int32), 0, S - 1)
    y_idx = jnp.clip(((c2 - mins[:, 1:2]) / interval).astype(jnp.int32), 0, S - 1)
    # kvar[a, b] = Kstar[a] @ A[:, b]
    kvar_small = jnp.einsum("vam,vmb->vab", Kstar[:, :S, :], A[:, :, :S])  # [V,S,S]
    upd = 1.0 - kvar_small[
        jnp.arange(V)[:, None], x_idx, y_idx
    ]  # [V, NT]
    update_variance = 0.2 * upd

    means, covs = _fast_initial_3dgs(world, v_expl, cfg)

    loss_points = world[:, ::30, :]  # indices 0,30,60,90,120 (5 points)

    return GpResult(
        test_points=world,
        test_var=v_expl,
        var_mean=var_mean,
        reopen=reopen,
        update_variance=update_variance,
        error=error,
        means=means,
        covs=covs,
        loss_points=loss_points,
    )


def _fast_initial_3dgs(world, v_expl, cfg: GpParams):
    """fastInitial3DGS (gpprocess.cu:420-458): 3x3 neighbourhoods -> 16
    weighted gaussians. weights = 1/explained-variance (reference semantics;
    clamped at 1e-12 to avoid inf on pathological cells)."""
    V = world.shape[0]
    S = cfg.test_side
    nb = cfg.neighbour_size
    gs = S // nb  # grid_size = 4

    pts = world.reshape(V, gs, nb, gs, nb, 3).transpose(0, 1, 3, 2, 4, 5)
    pts = pts.reshape(V, gs * gs, nb * nb, 3)  # [V, 16, 9, 3]
    var = v_expl.reshape(V, gs, nb, gs, nb).transpose(0, 1, 3, 2, 4)
    var = var.reshape(V, gs * gs, nb * nb)  # [V, 16, 9]

    w = 1.0 / jnp.maximum(var, 1e-12)
    wsum = w.sum(axis=-1, keepdims=True)
    mean = jnp.einsum("vgk,vgkc->vgc", w, pts) / wsum  # [V, 16, 3]
    centered = pts - mean[:, :, None, :]
    cov = jnp.einsum("vgk,vgkc,vgkd->vgcd", w, centered, centered) / wsum[..., None]
    return mean, cov


class CameraProjection(NamedTuple):
    """World->camera transform + distorted pinhole intrinsics for
    colorization (camOptions, gp_types.h:61-75)."""

    R_wc: jnp.ndarray  # [3,3] world->camera rotation
    t_wc: jnp.ndarray  # [3]
    fx: jnp.ndarray
    fy: jnp.ndarray
    cx: jnp.ndarray
    cy: jnp.ndarray
    dist: jnp.ndarray  # [4] radial distortion d0..d3


def colorize(points, proj: CameraProjection, image):
    """getColors + projectPointsToImage (gpprocess.cu:917-983).

    points: [..., 3] world; image: [H, W, 3] RGB (uint8 or float).
    Returns (colors [..., 3] float, valid [...] bool). Nearest-pixel
    sampling with int truncation, radial distortion r*(1 + d0 r^2 + d1 r^4
    + d2 r^6 + d3 r^8). Out-of-image (or behind-camera) -> invalid.
    """
    H, W = image.shape[:2]
    p_cam = points @ proj.R_wc.T + proj.t_wc
    X, Y, Z = p_cam[..., 0], p_cam[..., 1], p_cam[..., 2]
    zsafe = jnp.where(Z != 0, Z, 1.0)
    xp = X / zsafe
    yp = Y / zsafe
    r2 = xp * xp + yp * yp
    r = jnp.sqrt(r2)
    d0, d1, d2, d3 = proj.dist[0], proj.dist[1], proj.dist[2], proj.dist[3]
    rd = r * (1 + d0 * r2 + d1 * r2**2 + d2 * r2**3 + d3 * r2**4)
    scale = jnp.where(r > 0, rd / jnp.where(r > 0, r, 1.0), 1.0)
    u = jnp.trunc(proj.fx * xp * scale + proj.cx).astype(jnp.int32)
    v = jnp.trunc(proj.fy * yp * scale + proj.cy).astype(jnp.int32)
    valid = (u >= 0) & (u < W) & (v >= 0) & (v < H)
    # NOTE: the reference samples behind-camera points too (no Z>0 check,
    # gpprocess.cu:942-957) — they usually land out of image; we keep the
    # same behavior (validity is in-image only).
    ui = jnp.clip(u, 0, W - 1)
    vi = jnp.clip(v, 0, H - 1)
    colors = image[vi, ui].astype(jnp.float32)
    return colors, valid
