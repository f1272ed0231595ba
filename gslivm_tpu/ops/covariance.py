"""Gaussian covariance math: quat/scale -> 3D covariance, EWA 2D projection.

Behavioral spec: reference `src/cuda_rasterizer/forward.cu`:
  - computeCov3D (forward.cu:138-176): Sigma = R diag(s^2) R^T, built from the
    RAW quaternion WITHOUT normalization (forward.cu:146 — the reference model
    normalizes in Get_rotation() before calling the rasterizer, but the
    rasterizer itself must accept unnormalized quats for parity).
  - computeCov2D (forward.cu:79-133): EWA projection J W Sigma W^T J^T with
    the 1.3*tan(fov) frustum clamp of the view-space mean and the +0.3 pixel
    low-pass on the 2D diagonal.
  - conic/radius (forward.cu:250-263): inverse 2D covariance, 3-sigma radius
    with sqrt(max(0.1, ...)) eigenvalue clamp.

All functions operate on single Gaussians and vectorize with jax.vmap /
broadcasting; shapes are written batched ([N, ...]) since that is how they
are always called.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

# Small 3x3 algebra must not be downcast to bf16 by the MXU default: these
# feed conic inversion where catastrophic cancellation in the determinant is
# already delicate in f32.
_einsum = functools.partial(jnp.einsum, precision=jax.lax.Precision.HIGHEST)


def quat_to_rotmat(q):
    """Quaternion [..., 4] (w, x, y, z) -> rotation matrix [..., 3, 3].

    NOTE: deliberately does NOT normalize q (forward.cu:146). For unit q this
    is a rotation; for non-unit q it is the same polynomial the reference
    evaluates, preserving its numerical behavior.
    """
    r, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    row0 = jnp.stack(
        [1.0 - 2.0 * (y * y + z * z), 2.0 * (x * y - r * z), 2.0 * (x * z + r * y)],
        axis=-1,
    )
    row1 = jnp.stack(
        [2.0 * (x * y + r * z), 1.0 - 2.0 * (x * x + z * z), 2.0 * (y * z - r * x)],
        axis=-1,
    )
    row2 = jnp.stack(
        [2.0 * (x * z - r * y), 2.0 * (y * z + r * x), 1.0 - 2.0 * (x * x + y * y)],
        axis=-1,
    )
    return jnp.stack([row0, row1, row2], axis=-2)


def compute_cov3d(scales, quats, scale_modifier=1.0):
    """Scale+quat -> symmetric world covariance, packed [..., 6].

    Packing order matches forward.cu:170-175: (xx, xy, xz, yy, yz, zz).
    Sigma = R diag((mod*s)^2) R^T with R from the unnormalized quat.
    """
    # Written as explicit channel arithmetic (no batched 3x3 matmuls): XLA
    # lowers [N,3,3] einsums to tiny MXU calls that run ~10x slower than the
    # fused elementwise chain on the VPU.
    R = quat_to_rotmat(quats)  # [..., 3, 3]
    s2 = (scale_modifier * scales) ** 2  # [..., 3]
    r0, r1, r2 = R[..., 0, :], R[..., 1, :], R[..., 2, :]

    def dot_s2(a, b):
        return (a * s2 * b).sum(axis=-1)

    return jnp.stack(
        [
            dot_s2(r0, r0),
            dot_s2(r0, r1),
            dot_s2(r0, r2),
            dot_s2(r1, r1),
            dot_s2(r1, r2),
            dot_s2(r2, r2),
        ],
        axis=-1,
    )


def unpack_cov3d(cov6):
    """[..., 6] packed -> [..., 3, 3] symmetric matrix."""
    c0, c1, c2, c3, c4, c5 = (cov6[..., i] for i in range(6))
    row0 = jnp.stack([c0, c1, c2], axis=-1)
    row1 = jnp.stack([c1, c3, c4], axis=-1)
    row2 = jnp.stack([c2, c4, c5], axis=-1)
    return jnp.stack([row0, row1, row2], axis=-2)


def compute_cov2d(mean_view, cov3d6, R_cw, focal_x, focal_y, tan_fovx, tan_fovy):
    """EWA: project world covariance to 2D screen covariance (forward.cu:79-133).

    Args:
      mean_view: [..., 3] gaussian center in CAMERA frame (t in the reference;
        computed as R_cw @ p_world + t_cw by the caller).
      cov3d6:    [..., 6] packed world covariance.
      R_cw:      [3, 3] world->camera rotation (top-left of the view matrix).
      focal_x, focal_y: focal lengths in pixels (W/(2 tanfovx), H/(2 tanfovy)).
      tan_fovx, tan_fovy: half-FoV tangents.

    Returns: [..., 3] packed 2D covariance (a, b, c) = (cov[0,0], cov[0,1],
    cov[1,1]) with the +0.3 low-pass already added (forward.cu:130-131).
    """
    # Culled slots (z <= 0.2 or degenerate) can sit at tz ~ 0; clamp the
    # value used for division so inf never enters the gradient graph (the
    # clamp only activates on slots the caller excludes via the valid mask).
    tz = mean_view[..., 2]
    tz = jnp.where(jnp.abs(tz) > 1e-6, tz, 1e-6)
    # Frustum clamp of the linearization point (forward.cu:93-98).
    limx = 1.3 * tan_fovx
    limy = 1.3 * tan_fovy
    tx = jnp.clip(mean_view[..., 0] / tz, -limx, limx) * tz
    ty = jnp.clip(mean_view[..., 1] / tz, -limy, limy) * tz

    # cov2d = J R_cw Vrk R_cw^T J^T (the glm transposes in forward.cu:100-126
    # reduce to exactly this once column-major storage is accounted for),
    # written as explicit row arithmetic — see compute_cov3d note.
    # J rows: j0 = (fx/tz, 0, -fx*tx/tz^2), j1 = (0, fy/tz, -fy*ty/tz^2).
    inv_z = 1.0 / tz
    j00 = focal_x * inv_z
    j02 = -(focal_x * tx) * inv_z * inv_z
    j11 = focal_y * inv_z
    j12 = -(focal_y * ty) * inv_z * inv_z

    # rows of T = J @ R_cw (R_cw is a single 3x3, entries are scalars)
    t0 = [j00 * R_cw[0, i] + j02 * R_cw[2, i] for i in range(3)]
    t1 = [j11 * R_cw[1, i] + j12 * R_cw[2, i] for i in range(3)]

    c0, c1, c2, c3, c4, c5 = (cov3d6[..., i] for i in range(6))

    def vrk_dot(u):  # Vrk @ u for symmetric packed Vrk
        return (
            c0 * u[0] + c1 * u[1] + c2 * u[2],
            c1 * u[0] + c3 * u[1] + c4 * u[2],
            c2 * u[0] + c4 * u[1] + c5 * u[2],
        )

    v0 = vrk_dot(t0)
    v1 = vrk_dot(t1)
    a = t0[0] * v0[0] + t0[1] * v0[1] + t0[2] * v0[2] + 0.3
    b = t0[0] * v1[0] + t0[1] * v1[1] + t0[2] * v1[2]
    c = t1[0] * v1[0] + t1[1] * v1[1] + t1[2] * v1[2] + 0.3
    return jnp.stack([a, b, c], axis=-1)


def conic_and_radius(cov2d):
    """Invert 2D covariance and compute the 3-sigma pixel radius.

    Matches forward.cu:250-263 including the sqrt(max(0.1, ...)) clamp and
    ceil on the radius. Returns (conic [..., 3], radius [...], det [...]).
    det == 0 means the gaussian is degenerate and must be culled
    (forward.cu:251-252); callers handle via the validity mask.
    """
    a, b, c = cov2d[..., 0], cov2d[..., 1], cov2d[..., 2]
    det = a * c - b * b
    # safe-where: divide by a nonzero stand-in so the zero branch does not
    # produce inf whose vjp (0 * inf) poisons gradients of culled slots
    det_inv = jnp.where(det != 0.0, 1.0 / jnp.where(det != 0.0, det, 1.0), 0.0)
    conic = jnp.stack([c * det_inv, -b * det_inv, a * det_inv], axis=-1)
    mid = 0.5 * (a + c)
    disc = jnp.sqrt(jnp.maximum(0.1, mid * mid - det))
    lambda1 = mid + disc
    lambda2 = mid - disc
    radius = jnp.ceil(3.0 * jnp.sqrt(jnp.maximum(lambda1, lambda2)))
    return conic, radius, det


def scale_abnormal(scales, scale_modifier=1.0, limit=0.3):
    """Oversize-scale cull mask (forward.cu:19-25): True -> cull."""
    s = scale_modifier * scales
    return jnp.any(s > limit, axis=-1)
