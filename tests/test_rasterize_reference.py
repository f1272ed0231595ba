"""Oracle rasterizer tests: hand-computed values, finite-difference gradients,
and the reference's gradient-contract quirks."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gslivm_tpu.models.cameras import make_camera
from gslivm_tpu.ops import sh as sh_ops
from gslivm_tpu.ops.rasterize import RasterizeSettings, rasterize
from gslivm_tpu.ops.rasterize_reference import rasterize_naive


def _simple_camera(w=64, h=64, fov=0.8):
    return make_camera(np.eye(3), np.zeros(3), w, h, fovx=fov, fovy=fov)


def _one_gaussian(color=(1.0, 0.0, 0.0), z=5.0, opacity=0.5, scale=0.05):
    means = jnp.asarray([[0.0, 0.0, z]])
    scales = jnp.full((1, 3), scale)
    quats = jnp.asarray([[1.0, 0.0, 0.0, 0.0]])
    opac = jnp.asarray([opacity])
    shs = sh_ops.rgb_to_sh(jnp.asarray([color]))[:, None, :]  # [1,1,3]
    return means, scales, quats, opac, shs


def test_center_pixel_alpha_blend():
    cam = _simple_camera()
    means, scales, quats, opac, shs = _one_gaussian(opacity=0.5)
    bg = jnp.zeros(3)
    out = rasterize_naive(means, scales, quats, opac, shs, cam, bg_color=bg)
    # Hand computation: the center projects to pixel (31.5, 31.5); pixel
    # (31,31) sits at (dx,dy)=(0.5,0.5). Screen sigma = (f/z)*scale with
    # f = W/(2 tan(fov/2)) = 75.69 -> cov2d = (75.69/5*0.05)^2 + 0.3 = 0.8729
    # (isotropic), conic a=c=1/0.8729. power = -0.5*(a*0.25 + c*0.25) =
    # -0.28646 -> alpha = 0.5*exp(power) = 0.37547.
    f = 64 / (2 * np.tan(0.4))
    var = (f / 5.0 * 0.05) ** 2 + 0.3
    alpha = 0.5 * np.exp(-0.5 * (0.25 + 0.25) / var)
    c = np.asarray(out.color)
    center = c[:, 31, 31]
    np.testing.assert_allclose(center[0], alpha, rtol=1e-4)
    assert center[1] < 1e-4 and center[2] < 1e-4
    # depth = alpha * z, silhouette = alpha at the center pixel
    np.testing.assert_allclose(np.asarray(out.depth)[31, 31], alpha * 5.0, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(out.acc)[31, 31], alpha, rtol=1e-4)
    # far corner untouched (outside 3-sigma rect)
    assert np.all(c[:, 0, 0] == 0.0)
    assert np.asarray(out.acc)[0, 0] == 0.0


def test_white_background_blend():
    cam = _simple_camera()
    means, scales, quats, opac, shs = _one_gaussian(opacity=0.5)
    out = rasterize_naive(means, scales, quats, opac, shs, cam)  # default white bg
    c = np.asarray(out.color)
    # empty pixel = pure background
    np.testing.assert_allclose(c[:, 0, 0], 1.0, atol=1e-6)
    # center pixel: green = (1 - alpha) * white_bg with alpha = 0.37547
    # (see test_center_pixel_alpha_blend hand computation)
    np.testing.assert_allclose(c[1, 31, 31], 1.0 - 0.37547, rtol=1e-3)


def test_front_occludes_back():
    cam = _simple_camera()
    means = jnp.asarray([[0.0, 0.0, 2.0], [0.0, 0.0, 8.0]])
    scales = jnp.full((2, 3), 0.05)
    quats = jnp.tile(jnp.asarray([[1.0, 0.0, 0.0, 0.0]]), (2, 1))
    opac = jnp.asarray([0.99, 0.99])  # front nearly opaque
    shs = sh_ops.rgb_to_sh(jnp.asarray([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]]))[:, None, :]
    out = rasterize_naive(means, scales, quats, opac, shs, cam, bg_color=jnp.zeros(3))
    c = np.asarray(out.color)[:, 31, 31]
    assert c[0] > 0.9, "front red gaussian should dominate"
    assert c[1] < 0.05, "back green gaussian occluded"


def test_near_cull():
    cam = _simple_camera()
    means, scales, quats, opac, shs = _one_gaussian(z=0.15)  # z <= 0.2 -> culled
    out = rasterize_naive(means, scales, quats, opac, shs, cam, bg_color=jnp.zeros(3))
    assert float(jnp.abs(out.color).max()) == 0.0
    assert float(out.radii[0]) == 0.0


def test_scale_cull():
    cam = _simple_camera()
    means, scales, quats, opac, shs = _one_gaussian(scale=0.31)
    out = rasterize_naive(means, scales, quats, opac, shs, cam, bg_color=jnp.zeros(3))
    assert float(jnp.abs(out.color).max()) == 0.0


def test_active_mask_hides_gaussian():
    cam = _simple_camera()
    means, scales, quats, opac, shs = _one_gaussian()
    out = rasterize_naive(
        means, scales, quats, opac, shs, cam, bg_color=jnp.zeros(3),
        active_mask=jnp.asarray([False]),
    )
    assert float(jnp.abs(out.color).max()) == 0.0


def test_alpha_clamp_099():
    cam = _simple_camera()
    means, scales, quats, opac, shs = _one_gaussian(opacity=5.0)  # pre-activation abuse
    out = rasterize_naive(means, scales, quats, opac, shs, cam, bg_color=jnp.zeros(3))
    assert float(out.acc.max()) <= 0.99 + 1e-6


@pytest.mark.parametrize("seed", [0, 1])
def test_finite_difference_grads(seed):
    """Validate the oracle's autodiff against float64 numerical gradients.

    Runs in x64 with a small eps so FD noise is negligible; the oracle's
    math (and the reference's) is piecewise-smooth, and a tiny eps makes
    crossing a cull/threshold boundary vanishingly unlikely.
    """
    jax.config.update("jax_enable_x64", True)
    try:
        rng = np.random.default_rng(seed)
        n = 5
        cam = _simple_camera(w=32, h=32)
        cam = jax.tree.map(lambda x: jnp.asarray(x, jnp.float64), cam)
        means = jnp.asarray(rng.normal(0, 0.3, (n, 3)) + [0, 0, 4.0])
        scales = jnp.asarray(rng.uniform(0.05, 0.15, (n, 3)))
        q = rng.normal(size=(n, 4))
        quats = jnp.asarray(q / np.linalg.norm(q, axis=1, keepdims=True))
        opac = jnp.asarray(rng.uniform(0.3, 0.8, (n,)))
        shs = jnp.asarray(rng.uniform(-0.5, 0.5, (n, 1, 3)))
        gt = jnp.asarray(rng.uniform(size=(3, 32, 32)))

        @jax.jit
        def loss(means, scales, quats, opac, shs):
            out = rasterize_naive(means, scales, quats, opac, shs, cam,
                                  bg_color=jnp.zeros(3, dtype=jnp.float64))
            return jnp.sum((out.color - gt) ** 2) + 0.1 * jnp.sum(out.acc)

        grads = jax.jit(jax.grad(loss, argnums=(0, 1, 2, 3, 4)))(
            means, scales, quats, opac, shs)

        eps = 1e-6
        args = [means, scales, quats, opac, shs]
        for ai in range(5):
            flat = np.asarray(args[ai]).ravel()
            # spot-check a few coordinates
            for ci in rng.choice(flat.size, size=min(4, flat.size), replace=False):
                pert = flat.copy()
                pert[ci] += eps
                args_p = list(args)
                args_p[ai] = jnp.asarray(pert.reshape(args[ai].shape))
                lp = float(loss(*args_p))
                pert[ci] -= 2 * eps
                args_m = list(args)
                args_m[ai] = jnp.asarray(pert.reshape(args[ai].shape))
                lm = float(loss(*args_m))
                fd = (lp - lm) / (2 * eps)
                ad = float(np.asarray(grads[ai]).ravel()[ci])
                assert abs(fd - ad) < 1e-4 + 1e-4 * abs(fd), (
                    f"arg {ai} coord {ci}: fd={fd} ad={ad}"
                )
    finally:
        jax.config.update("jax_enable_x64", False)


def test_depth_grad_dropped_by_default():
    """Parity with rasterizer.cu:79: depth gradients are silently dropped."""
    cam = _simple_camera(w=32, h=32)
    means, scales, quats, opac, shs = _one_gaussian()

    def depth_loss(means):
        out = rasterize(means, scales, quats, opac, shs, cam,
                        bg_color=jnp.zeros(3),
                        settings=RasterizeSettings(backend="naive"))
        return jnp.sum(out.depth)

    g = jax.grad(depth_loss)(means)
    assert float(jnp.abs(g).max()) == 0.0

    def depth_loss_enabled(means):
        out = rasterize(means, scales, quats, opac, shs, cam,
                        bg_color=jnp.zeros(3),
                        settings=RasterizeSettings(backend="naive", depth_grad=True))
        return jnp.sum(out.depth)

    g2 = jax.grad(depth_loss_enabled)(means)
    assert float(jnp.abs(g2).max()) > 0.0


def test_color_and_acc_grads_flow_through_wrapper():
    cam = _simple_camera(w=32, h=32)
    means, scales, quats, opac, shs = _one_gaussian()

    def color_loss(means, opac):
        out = rasterize(means, scales, quats, opac, shs, cam,
                        bg_color=jnp.zeros(3),
                        settings=RasterizeSettings(backend="naive"))
        return jnp.sum(out.color) + jnp.sum(out.acc)

    g_means, g_opac = jax.grad(color_loss, argnums=(0, 1))(means, opac)
    assert float(jnp.abs(g_means).max()) > 0.0
    assert float(jnp.abs(g_opac).max()) > 0.0
