"""Stage profile of the PRODUCTION-shape 3-camera train step (bench.py's
train_step3 measurement) + per-tile overdraw statistics.

Cuts the 280 ms step into: 3x render fwd+bwd / image losses + Adam /
delta-depth block, and reports the kernel's effective-chunk statistics
(neff vs nchunks, n_contrib) to size the occlusion headroom — VERDICT r3
"measure contributions/pixel before building anything".

Run ALONE on the TPU (one job at a time — docs/kernels.md measurement
hygiene).
"""
from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

WIDTH, HEIGHT = 1920, 1080
N = 200_000
MAXI = 6700 * 128
BLOCK = (2, 2)
SLACK = 0.2
MAXCH = 16


def main():
    import jax
    import jax.numpy as jnp
    from tputime import device_time_ms

    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "..", ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from gslivm_tpu.models import gaussian_model as gm
    from gslivm_tpu.models import training
    from gslivm_tpu.models.cameras import make_camera
    from gslivm_tpu.ops.rasterize import RasterizeSettings, rasterize
    from gslivm_tpu.ops.rasterize_pallas import rasterize_pallas

    rng = np.random.default_rng(0)
    n = N
    means = jnp.asarray(rng.normal(0, 2.0, (n, 3)) + [0, 0, 6.0], jnp.float32)
    scales = jnp.asarray(rng.uniform(0.01, 0.05, (n, 3)), jnp.float32)
    q = rng.normal(size=(n, 4))
    quats = jnp.asarray(q / np.linalg.norm(q, axis=1, keepdims=True),
                        jnp.float32)
    opac = jnp.asarray(rng.uniform(0.3, 0.9, (n,)), jnp.float32)
    shs = jnp.asarray(rng.uniform(-0.3, 0.8, (n, 1, 3)), jnp.float32)
    cam = make_camera(np.eye(3), np.zeros(3), WIDTH, HEIGHT, fovx=1.2,
                      fovy=0.8)
    cam_l = make_camera(np.eye(3), np.asarray([0.05, 0.0, 0.0]), WIDTH,
                        HEIGHT, fovx=1.2, fovy=0.8)
    cam_r = make_camera(np.eye(3), np.asarray([0.0, 0.05, 0.0]), WIDTH,
                        HEIGHT, fovx=1.2, fovy=0.8)
    gt = jnp.zeros((3, HEIGHT, WIDTH), jnp.float32)
    gt3 = jnp.stack([gt, gt, gt])

    params = gm.GaussianParams(
        xyz=means, features_dc=shs,
        features_rest=jnp.zeros((n, 0, 3), jnp.float32),
        scaling=jnp.log(scales), rotation=quats,
        opacity=jnp.log(opac / (1.0 - opac))[:, None],
        n_active=jnp.asarray(n, jnp.int32))
    optimizer = training.make_optimizer(training.GsOptimParams())
    opt_state = optimizer.init(params)
    simi = training.empty_simi(max_gauss=2048)

    # ---- overdraw statistics (one fwd) ---------------------------------
    out = jax.jit(lambda p: rasterize_pallas(
        p.xyz, p.get_scaling(), p.get_rotation(), p.get_opacity()[:, 0],
        p.get_features(), cam, max_instances=MAXI, capacity_slack=SLACK,
        block_x=BLOCK[0], block_y=BLOCK[1], max_chunks_per_tile=MAXCH,
        depth_grad=False))(params)
    # compacted grad capacity, fitted from the measured walk (bench.py AUTO)
    grad_cap = -(-int(1.10 * 128 * int(out.walked_chunks)) // 128) * 128
    print(f"grad_capacity (auto): {grad_cap}")
    settings = RasterizeSettings(
        backend="pallas", max_instances=MAXI, max_chunks_per_tile=MAXCH,
        capacity_slack=SLACK, block_x=BLOCK[0], block_y=BLOCK[1],
        grad_capacity=grad_cap)
    ncon = np.asarray(out.n_contrib, np.float64)
    print(f"n_contrib: mean {ncon.mean():.1f}  p50 {np.percentile(ncon, 50):.0f}"
          f"  p90 {np.percentile(ncon, 90):.0f}  p99 {np.percentile(ncon, 99):.0f}"
          f"  max {ncon.max():.0f}")
    # neff rides in fwd row 7: re-render raw tiles for it
    from gslivm_tpu.ops.rasterize_reference import preprocess
    from gslivm_tpu.ops import rasterize_pallas as RP

    def raw(p):
        pre = preprocess(p.xyz, p.get_scaling(), p.get_rotation(),
                         p.get_opacity()[:, 0], p.get_features(), cam)
        band, binned, _ = RP.render_tiles_raw(
            pre, WIDTH, HEIGHT, max_instances=MAXI, capacity_slack=SLACK,
            block_x=BLOCK[0], block_y=BLOCK[1],
            max_chunks_per_tile=MAXCH)
        return band[7, ::32, ::32], binned.tile_nchunks

    neff_img, nchunks = jax.jit(raw)(params)
    neff = np.asarray(neff_img, np.float64).ravel()
    nch = np.asarray(nchunks, np.float64)
    print(f"chunks: sum nchunks {nch.sum():.0f}  sum neff {neff.sum():.0f}"
          f"  (walked fraction {neff.sum() / max(nch.sum(), 1):.3f})")

    # ---- stage timings --------------------------------------------------
    def render3_loss(p):
        tot = 0.0
        for c in (cam, cam_l, cam_r):
            o = rasterize(p.xyz, p.get_scaling(), p.get_rotation(),
                          p.get_opacity(), p.get_features(), c,
                          settings=settings)
            tot = tot + jnp.sum((o.color - gt) ** 2) + 0.1 * jnp.sum(o.acc)
        return tot

    g3 = jax.grad(render3_loss, allow_int=True)
    t = device_time_ms(g3, params)
    print(f"render3 (3x fwd+bwd, trivial loss): {t:.1f} ms")

    t1 = device_time_ms(
        lambda p, o: training.train_step(p, o, [cam], gt[None], simi,
                                         settings=settings),
        params, opt_state)
    print(f"train1: {t1:.1f} ms")

    t3n = device_time_ms(
        lambda p, o: training.train_step(p, o, [cam, cam_l, cam_r], gt3,
                                         simi, settings=settings,
                                         n_history_pairs=0),
        params, opt_state)
    print(f"train3 no-pair: {t3n:.1f} ms")

    t3 = device_time_ms(
        lambda p, o: training.train_step(p, o, [cam, cam_l, cam_r], gt3,
                                         simi, settings=settings,
                                         n_history_pairs=1),
        params, opt_state)
    print(f"train3 full: {t3:.1f} ms")
    print(f"  => image losses + Adam - trivial: {t3n - t:.1f} ms; "
          f"delta block: {t3 - t3n:.1f} ms")

    # ---- image-loss batching A/B (3 cameras) ---------------------------
    from gslivm_tpu.ops import losses as L

    lam = 0.2
    col3 = jnp.asarray(rng.uniform(size=(3, 3, HEIGHT, WIDTH)), jnp.float32)

    def loss_sep(c3):
        return sum((1 - lam) * L.l1_loss(c3[i], gt3[i])
                   + lam * (1.0 - L.ssim(c3[i], gt3[i])) for i in range(3))

    def loss_bat(c3):
        flat = c3.reshape(9, HEIGHT, WIDTH)
        gflat = gt3.reshape(9, HEIGHT, WIDTH)
        l1 = jnp.abs(flat - gflat).mean() * 3.0
        ss = L.ssim(flat, gflat) * 3.0  # channel mean == mean of per-cam
        return (1 - lam) * l1 + lam * (3.0 - ss)

    ts = device_time_ms(jax.grad(loss_sep), col3)
    tb = device_time_ms(jax.grad(loss_bat), col3)
    print(f"image loss 3-cam fwd+bwd: separate {ts:.1f} ms, batched {tb:.1f} ms")

    # warp forward alone (fixed depth images)
    depth_a = jnp.asarray(rng.uniform(1, 10, (HEIGHT, WIDTH)), jnp.float32)
    depth_b = jnp.asarray(rng.uniform(1, 10, (HEIGHT, WIDTH)), jnp.float32)
    acc_im = jnp.ones((HEIGHT, WIDTH), jnp.float32)
    tw = device_time_ms(
        lambda da, db: training.delta_depth_loss(da, acc_im, cam_l,
                                                 db, acc_im, cam_r),
        depth_a, depth_b)
    print(f"delta_depth_loss fwd alone: {tw:.1f} ms")


if __name__ == "__main__":
    main()
