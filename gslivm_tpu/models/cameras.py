"""Camera model and projection conventions.

Behavioral spec: reference `src/gs/camera.cu` + `src/cuda_rasterizer/auxiliary.h`:
  - Camera ctor (camera.cu:6-56): takes R = camera->world rotation and
    T = camera center in world; world->camera is p_cam = R^T (p_world - T).
  - getProjectionMatrix (camera.cu:57-82): centered pinhole, znear=0.01,
    zfar=100; the rasterizer only uses x,y of the projected NDC and w = z.
  - ndc2Pix (auxiliary.h:35-37): pix = ((ndc + 1) * S - 1) / 2, i.e.
    pix = focal * x/z + (S - 1)/2 with focal = S / (2 tan(fov/2)).
  - focal/fov conversion (camera.cu:84-90).

The principal point is always centered for rasterization (the reference K
with cx, cy is used only by the delta-depth reprojection, gaussian.cu:116+).
"""

from __future__ import annotations

import flax.struct
import jax.numpy as jnp
import numpy as np


@flax.struct.dataclass
class Camera:
    """A single camera; a jit-able pytree with static image dimensions.

    R_cw: [3,3] world->camera rotation.
    t_cw: [3]   world->camera translation (p_cam = R_cw @ p_world + t_cw).
    fx, fy: scalar focals in pixels for rasterization, = W/(2 tanfovx) etc.
    tan_fovx, tan_fovy: scalar half-FoV tangents.
    cam_center: [3] camera center in world (for SH view directions).
    K: [3,3] intrinsics (fx, fy, cx, cy) for reprojection losses.
    width/height are static (shape-determining, not traced).
    """

    R_cw: jnp.ndarray
    t_cw: jnp.ndarray
    fx: jnp.ndarray
    fy: jnp.ndarray
    tan_fovx: jnp.ndarray
    tan_fovy: jnp.ndarray
    cam_center: jnp.ndarray
    K: jnp.ndarray
    width: int = flax.struct.field(pytree_node=False)
    height: int = flax.struct.field(pytree_node=False)


def fov2focal(fov: float, pixels: int) -> float:
    """camera.cu:84-86."""
    return pixels / (2.0 * np.tan(fov / 2.0))


def focal2fov(focal: float, pixels: int) -> float:
    """camera.cu:88-90."""
    return 2.0 * np.arctan(pixels / (2.0 * focal))


def make_camera(
    R_wc,
    cam_center,
    width: int,
    height: int,
    fovx: float | None = None,
    fovy: float | None = None,
    fx: float | None = None,
    fy: float | None = None,
    cx: float | None = None,
    cy: float | None = None,
    dtype=jnp.float32,
) -> Camera:
    """Build a Camera from cam->world rotation + camera center (reference
    Camera ctor convention, camera.cu:36-40).

    Either (fovx, fovy) or (fx, fy) must be given; the rasterization focal is
    always recomputed from the fov so that pixel coordinates match
    ndc2Pix exactly.
    """
    R_wc = np.asarray(R_wc, dtype=np.float64)
    cam_center = np.asarray(cam_center, dtype=np.float64)
    if fovx is None:
        assert fx is not None and fy is not None
        fovx = focal2fov(fx, width)
        fovy = focal2fov(fy, height)
    tan_fovx = np.tan(fovx / 2.0)
    tan_fovy = np.tan(fovy / 2.0)
    rast_fx = width / (2.0 * tan_fovx)
    rast_fy = height / (2.0 * tan_fovy)
    if fx is None:
        fx, fy = rast_fx, rast_fy
    if cx is None:
        cx, cy = (width - 1) / 2.0, (height - 1) / 2.0
    R_cw = R_wc.T
    t_cw = -R_wc.T @ cam_center
    K = np.array([[fx, 0, cx], [0, fy, cy], [0, 0, 1]], dtype=np.float64)
    return Camera(
        R_cw=jnp.asarray(R_cw, dtype=dtype),
        t_cw=jnp.asarray(t_cw, dtype=dtype),
        fx=jnp.asarray(rast_fx, dtype=dtype),
        fy=jnp.asarray(rast_fy, dtype=dtype),
        tan_fovx=jnp.asarray(tan_fovx, dtype=dtype),
        tan_fovy=jnp.asarray(tan_fovy, dtype=dtype),
        cam_center=jnp.asarray(cam_center, dtype=dtype),
        K=jnp.asarray(K, dtype=dtype),
        width=int(width),
        height=int(height),
    )


def world_to_cam(camera: Camera, points):
    """[..., 3] world -> camera frame."""
    return points @ camera.R_cw.T + camera.t_cw


def project_to_pixels(camera: Camera, points):
    """World points -> (pixel xy [..., 2], view-space depth [...]).

    Implements the projmatrix + ndc2Pix path of preprocessCUDA
    (forward.cu:231-234, 264) including the 1/(w + 1e-7) guard.
    """
    p_view = world_to_cam(camera, points)
    z = p_view[..., 2]
    w_inv = 1.0 / (z + 1e-7)
    ndc_x = (p_view[..., 0] / camera.tan_fovx) * w_inv
    ndc_y = (p_view[..., 1] / camera.tan_fovy) * w_inv
    pix_x = ((ndc_x + 1.0) * camera.width - 1.0) * 0.5
    pix_y = ((ndc_y + 1.0) * camera.height - 1.0) * 0.5
    return jnp.stack([pix_x, pix_y], axis=-1), z
