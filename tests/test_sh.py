"""SH eval parity tests (reference forward.cu:29-76, sh_utils.cuh)."""

import jax.numpy as jnp
import numpy as np

from gslivm_tpu.ops import sh


def test_rgb_sh_roundtrip():
    rgb = jnp.asarray([[0.2, 0.5, 0.9]])
    back = sh.sh_to_rgb(sh.rgb_to_sh(rgb))
    np.testing.assert_allclose(np.asarray(back), np.asarray(rgb), atol=1e-6)


def test_degree0_is_direction_independent():
    coeffs = jnp.zeros((2, 1, 3)).at[:, 0, :].set(jnp.asarray([[1.0, 2.0, 3.0], [0.5, 0.5, 0.5]]))
    means = jnp.asarray([[0.0, 0.0, 5.0], [3.0, -2.0, 7.0]])
    campos = jnp.zeros(3)
    out = sh.sh_to_color(coeffs, means, campos, degree=0)
    expected = np.maximum(np.asarray(coeffs)[:, 0, :] * sh.SH_C0 + 0.5, 0.0)
    np.testing.assert_allclose(np.asarray(out), expected, rtol=1e-6)


def test_degree1_hand_value():
    # Single gaussian straight down +z: dir = (0,0,1).
    K = sh.num_sh_coeffs(1)
    coeffs = jnp.zeros((1, K, 3)).at[0, 0, 0].set(1.0).at[0, 2, 0].set(2.0)
    means = jnp.asarray([[0.0, 0.0, 4.0]])
    campos = jnp.zeros(3)
    out = sh.sh_to_color(coeffs, means, campos, degree=1)
    # result = C0*sh0 + C1*z*sh2 + 0.5 (z term has +, forward.cu:51)
    expected_r = sh.SH_C0 * 1.0 + sh.SH_C1 * 1.0 * 2.0 + 0.5
    np.testing.assert_allclose(float(out[0, 0]), expected_r, rtol=1e-6)


def test_negative_clamped_to_zero():
    coeffs = jnp.full((1, 1, 3), -10.0)
    out = sh.sh_to_color(coeffs, jnp.asarray([[0.0, 0.0, 1.0]]), jnp.zeros(3), degree=0)
    assert float(out.min()) == 0.0
