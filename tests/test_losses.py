"""Loss parity tests (reference loss_utils.cuh)."""

import jax.numpy as jnp
import numpy as np

from gslivm_tpu.ops import losses


def test_l1():
    a = jnp.zeros((3, 4, 4))
    b = jnp.full((3, 4, 4), 0.5)
    assert abs(float(losses.l1_loss(a, b)) - 0.5) < 1e-7


def test_inv_depth():
    d = jnp.asarray([[0.0, 0.005, 2.0]])
    out = np.asarray(losses.inv_depth(d))
    np.testing.assert_allclose(out[0], [0.0, 0.0, 0.5], atol=1e-7)


def test_gaussian_window_matches_reference_quirk():
    """Reproduce loss_utils.cuh:24-30 exactly (floor((x-ws)/2) exponent)."""
    g = np.asarray(losses.gaussian_1d(11, 1.5))
    # direct C++-style recomputation
    raw = np.array(
        [np.exp(-(np.floor((x - 11) / 2.0) ** 2) / (2 * 1.5**2)) for x in range(11)]
    )
    np.testing.assert_allclose(g, raw / raw.sum(), rtol=1e-6)
    # and it is NOT the symmetric window
    gsym = np.asarray(losses.gaussian_1d(11, 1.5, symmetric=True))
    assert not np.allclose(g, gsym)


def test_ssim_self_is_one(rng):
    img = jnp.asarray(rng.uniform(size=(3, 32, 32)), dtype=jnp.float32)
    assert abs(float(losses.ssim(img, img)) - 1.0) < 1e-4


def test_ssim_decreases_with_noise(rng):
    img = jnp.asarray(rng.uniform(size=(3, 32, 32)), dtype=jnp.float32)
    noisy = img + 0.2 * jnp.asarray(rng.normal(size=(3, 32, 32)), dtype=jnp.float32)
    assert float(losses.ssim(img, noisy)) < 0.95


def test_psnr_known_value():
    a = jnp.zeros((3, 8, 8))
    b = jnp.full((3, 8, 8), 0.1)
    # mse = 0.01 -> psnr = 20*log10(1/0.1) = 20
    assert abs(float(losses.psnr(a, b)) - 20.0) < 1e-4


def test_image_loss_combination(rng):
    img = jnp.asarray(rng.uniform(size=(3, 16, 16)), dtype=jnp.float32)
    gt = jnp.asarray(rng.uniform(size=(3, 16, 16)), dtype=jnp.float32)
    lam = 0.2
    expected = (1 - lam) * float(losses.l1_loss(img, gt)) + lam * (
        1 - float(losses.ssim(img, gt))
    )
    assert abs(float(losses.image_loss(img, gt, lam)) - expected) < 1e-6


def test_ssim_band_sum_partitions_full_ssim():
    """Band sums over a row partition reassemble the full-image SSIM mean
    exactly (the pixel-sharded loss identity), including a partition that
    overruns H and bands at both zero-padded edges."""
    import jax.numpy as jnp

    from gslivm_tpu.ops import losses as L

    rng = np.random.default_rng(3)
    a = jnp.asarray(rng.uniform(size=(3, 29, 40)), jnp.float32)
    b = jnp.asarray(rng.uniform(size=(3, 29, 40)), jnp.float32)
    full = float(L.ssim(a, b))
    for n_dev in (2, 4):
        rows = -(-29 // n_dev)
        total = sum(float(L.ssim_band_sum(a, b, k * rows, rows))
                    for k in range(n_dev))
        np.testing.assert_allclose(total / (3 * 29 * 40), full, rtol=2e-6)


def test_l1_band_sum_partitions_full_l1():
    """Band sums over a row partition reassemble the full-image L1 mean
    exactly (the pixel-sharded loss identity), including an overrunning
    partition."""
    import jax.numpy as jnp

    from gslivm_tpu.ops import losses as L

    rng = np.random.default_rng(4)
    a = jnp.asarray(rng.uniform(size=(3, 29, 40)), jnp.float32)
    b = jnp.asarray(rng.uniform(size=(3, 29, 40)), jnp.float32)
    full = float(L.l1_loss(a, b))
    for n_dev in (2, 4, 8):
        rows = -(-29 // n_dev)
        total = sum(float(L.l1_band_sum(a, b, k * rows, rows))
                    for k in range(n_dev))
        np.testing.assert_allclose(total / (3 * 29 * 40), full, rtol=2e-6)
