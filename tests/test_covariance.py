"""Covariance math parity tests (reference forward.cu:79-176)."""

import jax.numpy as jnp
import numpy as np

from gslivm_tpu.ops import covariance as cov


def _rand_unit_quat(rng, n):
    q = rng.normal(size=(n, 4))
    return q / np.linalg.norm(q, axis=1, keepdims=True)


def test_quat_rotmat_orthonormal(rng):
    q = jnp.asarray(_rand_unit_quat(rng, 16), dtype=jnp.float32)
    R = np.asarray(cov.quat_to_rotmat(q))
    eye = np.eye(3)[None].repeat(16, 0)
    np.testing.assert_allclose(R @ R.transpose(0, 2, 1), eye, atol=1e-5)
    np.testing.assert_allclose(np.linalg.det(R), np.ones(16), atol=1e-5)


def test_identity_quat_gives_diag_cov():
    scales = jnp.asarray([[0.1, 0.2, 0.3]])
    quats = jnp.asarray([[1.0, 0.0, 0.0, 0.0]])
    c6 = np.asarray(cov.compute_cov3d(scales, quats))
    np.testing.assert_allclose(
        c6[0], [0.01, 0.0, 0.0, 0.04, 0.0, 0.09], atol=1e-7
    )


def test_cov3d_is_R_s2_Rt(rng):
    scales = jnp.asarray(rng.uniform(0.05, 0.3, size=(8, 3)), dtype=jnp.float32)
    quats = jnp.asarray(_rand_unit_quat(rng, 8), dtype=jnp.float32)
    sigma = np.asarray(cov.unpack_cov3d(cov.compute_cov3d(scales, quats)))
    R = np.asarray(cov.quat_to_rotmat(quats))
    s2 = np.asarray(scales) ** 2
    expected = np.einsum("nij,nj,nkj->nik", R, s2, R)
    np.testing.assert_allclose(sigma, expected, atol=1e-5)


def test_unnormalized_quat_not_normalized():
    """forward.cu:146 — the rasterizer must NOT normalize the quat."""
    scales = jnp.asarray([[0.1, 0.1, 0.1]])
    q2 = jnp.asarray([[2.0, 0.0, 0.0, 0.0]])  # 2x identity quat
    c6 = np.asarray(cov.compute_cov3d(scales, q2))
    # R(2q_id) = identity still (1 - 2*0, ...), so same as identity here,
    # but a quat with nonzero vector part scaled differs:
    q = jnp.asarray([[1.0, 1.0, 0.0, 0.0]])
    qn = q / jnp.linalg.norm(q)
    c_raw = np.asarray(cov.compute_cov3d(scales, q))
    c_norm = np.asarray(cov.compute_cov3d(scales, qn))
    assert not np.allclose(c_raw, c_norm), "raw vs normalized quats must differ"
    np.testing.assert_allclose(c6[0][0], 0.01, atol=1e-6)


def test_cov2d_lowpass_added():
    # A gaussian on the optical axis with tiny world covariance: cov2d
    # collapses to the +0.3 low-pass diagonal.
    mean_view = jnp.asarray([[0.0, 0.0, 10.0]])
    cov3d6 = jnp.zeros((1, 6))
    R = jnp.eye(3)
    out = np.asarray(
        cov.compute_cov2d(mean_view, cov3d6, R, 100.0, 100.0, 0.5, 0.5)
    )
    np.testing.assert_allclose(out[0], [0.3, 0.0, 0.3], atol=1e-6)


def test_cov2d_hand_value():
    # Isotropic world cov sigma^2 I at distance z on-axis: J = diag(f/z, f/z)
    # (third column vanishes at tx=ty=0) so cov2d = (f/z)^2 sigma^2 I + 0.3 I.
    sigma2 = 0.04
    f, z = 200.0, 5.0
    mean_view = jnp.asarray([[0.0, 0.0, z]])
    cov3d6 = jnp.asarray([[sigma2, 0, 0, sigma2, 0, sigma2]])
    out = np.asarray(cov.compute_cov2d(mean_view, cov3d6, jnp.eye(3), f, f, 1.0, 1.0))
    expected = (f / z) ** 2 * sigma2 + 0.3
    np.testing.assert_allclose(out[0], [expected, 0.0, expected], rtol=1e-5)


def test_conic_radius():
    cov2d = jnp.asarray([[4.0, 0.0, 1.0]])
    conic, radius, det = cov.conic_and_radius(cov2d)
    np.testing.assert_allclose(np.asarray(conic)[0], [0.25, 0.0, 1.0], atol=1e-6)
    # lambda_max = 4 -> radius = ceil(3*2) = 6
    assert float(radius[0]) == 6.0
    assert float(det[0]) == 4.0


def test_scale_cull():
    s = jnp.asarray([[0.1, 0.1, 0.31], [0.1, 0.1, 0.2]])
    mask = np.asarray(cov.scale_abnormal(s))
    assert mask.tolist() == [True, False]
