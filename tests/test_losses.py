"""Loss parity tests (reference loss_utils.cuh)."""

import jax
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


def test_ssim_ref_stats_exact():
    """Hoisted GT-side stats (ssim_ref_stats) must reproduce the inline
    ssim BIT-identically — same ops, just precomputed."""
    rng = np.random.default_rng(3)
    a = jnp.asarray(rng.uniform(size=(3, 40, 56)), jnp.float32)
    b = jnp.asarray(rng.uniform(size=(3, 40, 56)), jnp.float32)
    inline = jax.jit(losses.ssim)(a, b)
    stats = jax.jit(losses.ssim_ref_stats)(b)
    hoisted = jax.jit(lambda x, y, s: losses.ssim(x, y, ref_stats=s))(
        a, b, stats)
    assert float(inline) == float(hoisted)
    # and the img1 gradient path is unchanged (fusion-level reassociation
    # only — the two programs compile differently around the hoisted stats)
    g1 = jax.grad(lambda x: losses.ssim(x, b))(a)
    g2 = jax.grad(lambda x: losses.ssim(x, b, ref_stats=stats))(a)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                               atol=1e-8, rtol=1e-6)


def test_train_step_gt_stats_equivalence():
    """train_step with precomputed gt_stats must match the stats-free step
    exactly (loss and updated params)."""
    from gslivm_tpu.models import gaussian_model as gm
    from gslivm_tpu.models import training
    from gslivm_tpu.models.cameras import make_camera
    from gslivm_tpu.ops.rasterize import RasterizeSettings

    rng = np.random.default_rng(7)
    n = 32
    cam = make_camera(np.eye(3), np.zeros(3), 32, 24, fovx=1.0, fovy=0.8)
    params = gm.GaussianParams(
        xyz=jnp.asarray(rng.normal(0, 1, (n, 3)) + [0, 0, 4], jnp.float32),
        features_dc=jnp.asarray(rng.uniform(-0.3, 0.8, (n, 1, 3)), jnp.float32),
        features_rest=jnp.zeros((n, 0, 3), jnp.float32),
        scaling=jnp.log(jnp.asarray(rng.uniform(0.05, 0.2, (n, 3)), jnp.float32)),
        rotation=jnp.asarray(rng.normal(size=(n, 4)), jnp.float32),
        opacity=jnp.zeros((n, 1), jnp.float32),
        n_active=jnp.asarray(n, jnp.int32),
    )
    opt = training.make_optimizer(training.GsOptimParams())
    os0 = opt.init(params)
    simi = training.empty_simi(max_gauss=64)
    gt = jnp.asarray(rng.uniform(size=(1, 3, 24, 32)), jnp.float32)
    settings = RasterizeSettings(backend="naive")

    p_a, _, m_a = training.train_step(params, os0, [cam], gt, simi,
                                      settings=settings)
    stats = jax.jit(losses.ssim_ref_stats)(gt[0])
    p_b, _, m_b = training.train_step(params, os0, [cam], gt, simi,
                                      settings=settings,
                                      gt_stats=(stats[0][None], stats[1][None]))
    assert float(m_a.loss) == float(m_b.loss)
    np.testing.assert_array_equal(np.asarray(p_a.xyz), np.asarray(p_b.xyz))


def test_pallas_blur_matches_shift_add(rng):
    """blur_pallas.blur_many (interpret) must reproduce the XLA shift-add
    separable blur exactly (same zero-padded SAME semantics), including the
    reference's ASYMMETRIC 11-tap window, and its custom VJP (reversed-tap
    adjoint) must match autodiff through the shift-add chain."""
    import jax

    from gslivm_tpu.ops.blur_pallas import blur_many
    from gslivm_tpu.ops.losses import _gaussian_blur_shift_add, gaussian_1d

    x = jnp.asarray(rng.standard_normal((4, 37, 150)), jnp.float32)
    for symmetric in (False, True):
        taps = gaussian_1d(11, 1.5, symmetric)
        ref = _gaussian_blur_shift_add(x, taps)
        got = blur_many(x, tuple(float(t) for t in taps), True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=1e-6, rtol=1e-5)

        w = jnp.asarray(rng.standard_normal(ref.shape), jnp.float32)
        g_ref = jax.grad(
            lambda v: jnp.sum(_gaussian_blur_shift_add(v, taps) * w))(x)
        g_got = jax.grad(lambda v: jnp.sum(
            blur_many(v, tuple(float(t) for t in taps), True) * w))(x)
        np.testing.assert_allclose(np.asarray(g_got), np.asarray(g_ref),
                                   atol=1e-5, rtol=1e-4)
