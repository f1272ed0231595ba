"""GaussianParams model + training-step tests (reference gaussian.cu,
optimize_vis loop). A synthetic scene must be fittable: PSNR increases."""

import jax
import jax.numpy as jnp
import numpy as np

from gslivm_tpu.config import GsOptimParams
from gslivm_tpu.models import gaussian_model as gm
from gslivm_tpu.models import training
from gslivm_tpu.models.cameras import make_camera
from gslivm_tpu.ops.rasterize import RasterizeSettings


def _batch(rng, m, valid=None):
    xyz = jnp.asarray(rng.normal(0, 1.0, (m, 3)) + [0, 0, 5.0], jnp.float32)
    rgb = jnp.asarray(rng.uniform(0, 255, (m, 3)), jnp.float32)
    cov = jnp.tile(jnp.eye(3)[None] * 0.002, (m, 1, 1)).astype(jnp.float32)
    mask = jnp.ones((m,), bool) if valid is None else valid
    return gm.PointBatch(xyz=xyz, rgb=rgb, cov=cov, mask=mask)


def test_create_from_points_init_parity(rng):
    batch = _batch(rng, 10)
    p = gm.create_from_points(batch, scale_factor=3.0, capacity=16)
    assert int(p.n_active) == 10
    # scaling = log(sqrt(diag(cov) * sf)) (gaussian.cu:353)
    expected = 0.5 * np.log(0.002 * 3.0)
    np.testing.assert_allclose(np.asarray(p.scaling[:10]), expected, rtol=1e-5)
    # identity quat, zero (logit 0.5) opacity
    np.testing.assert_allclose(np.asarray(p.rotation[:10, 0]), 1.0)
    np.testing.assert_allclose(np.asarray(p.opacity[:10]), 0.0)
    np.testing.assert_allclose(np.asarray(p.get_opacity()[:10]), 0.5)
    # DC feature roundtrip
    from gslivm_tpu.ops import sh as sh_ops
    np.testing.assert_allclose(
        np.asarray(sh_ops.sh_to_rgb(p.features_dc[:10, 0])),
        np.asarray(batch.rgb) / 255.0,
        rtol=1e-5, atol=1e-6,
    )


def test_append_with_mask_and_growth(rng):
    p = gm.create_from_points(_batch(rng, 10), 3.0, capacity=16)
    # masked batch: only 4 of 8 valid
    valid = jnp.asarray([True, False, True, True, False, False, True, False])
    p = gm.append_points(p, _batch(rng, 8, valid), 3.0)
    assert int(p.n_active) == 14
    # grow capacity, append more than old capacity allowed
    p = gm.ensure_capacity(p, 10)
    assert p.capacity >= 24
    p2 = gm.append_points(p, _batch(rng, 10), 3.0)
    assert int(p2.n_active) == 24
    # previously active rows unchanged by growth
    np.testing.assert_array_equal(np.asarray(p2.xyz[:14]), np.asarray(p.xyz[:14]))


def test_append_overflow_drops(rng):
    p = gm.create_from_points(_batch(rng, 10), 3.0, capacity=12)
    p = gm.append_points(p, _batch(rng, 8), 3.0)
    assert int(p.n_active) == 12  # clamped at capacity, no crash


def test_ply_roundtrip(tmp_path, rng):
    p = gm.create_from_points(_batch(rng, 7), 3.0, capacity=8)
    path = str(tmp_path / "map.ply")
    gm.save_ply(p, path)
    q = gm.load_ply(path, sh_degree=0)
    assert int(q.n_active) == 7
    np.testing.assert_allclose(np.asarray(q.xyz[:7]), np.asarray(p.xyz[:7]), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(q.scaling[:7]), np.asarray(p.scaling[:7]), rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(q.features_dc[:7]), np.asarray(p.features_dc[:7]), rtol=1e-6)


def test_hash_registry():
    reg = gm.HashIndexRegistry()
    assert reg.insert(42, 0, 16)
    assert not reg.insert(42, 16, 16)  # duplicate -> reported
    assert reg.insert(43, 16, 16)
    assert reg.lookup(42) == (0, 16)
    idx = reg.indices_for([42, 43, 99])
    assert len(idx) == 32 and idx[0] == 0 and idx[-1] == 31
    # multi-range extension (deferred-colorization completion): a voxel can
    # grow a SECOND range; lookup keeps the reference API shape (first
    # range), ranges()/indices_for see both, and pruning remaps each range
    reg.append_range(42, 32, 4)
    assert reg.lookup(42) == (0, 16)
    assert reg.ranges(42) == [(0, 16), (32, 4)]
    assert len(reg.indices_for([42])) == 20
    keep = np.ones(36, bool)
    keep[0:8] = False  # drop the first half of range 1
    reg.remap_pruned(keep)
    assert reg.ranges(42) == [(0, 8), (24, 4)]
    assert reg.ranges(43) == [(8, 16)]


def test_simi_loss_values(rng):
    p = gm.create_from_points(_batch(rng, 6), 3.0, capacity=8)
    # anchor points exactly at gaussian centers -> loss 0 (within radius)
    simi = training.SimiInputs(
        points=jnp.zeros((training.MAX_SIMI, 3)).at[:6].set(p.xyz[:6]),
        point_mask=jnp.arange(training.MAX_SIMI) < 6,
        gauss_idx=jnp.arange(64, dtype=jnp.int32) % 6,
        gauss_mask=jnp.arange(64) < 6,
    )
    l0 = float(training.simi_loss(p, simi))
    assert l0 == 0.0
    # distant anchor point -> positive loss ~ distance
    far = jnp.zeros((training.MAX_SIMI, 3)).at[0].set(jnp.asarray([100.0, 0, 5]))
    simi_far = simi._replace(points=far, point_mask=jnp.arange(training.MAX_SIMI) < 1)
    l1 = float(training.simi_loss(p, simi_far))
    assert l1 > 50.0


def test_grid_sample_matches_torch():
    import torch
    rng = np.random.default_rng(0)
    img = rng.uniform(size=(9, 13)).astype(np.float32)
    gx = rng.uniform(-1.3, 1.3, size=(5, 7)).astype(np.float32)
    gy = rng.uniform(-1.3, 1.3, size=(5, 7)).astype(np.float32)
    # non-finite / far-outside coordinates: the warp produces inf (division
    # by ~0 ref-z at zero-depth pixels) — torch returns exact 0 there, and
    # so must we (NOT NaN; the r3 code NaN'd un-jitted and survived under
    # jit only by fast-math luck)
    gx[0, 0] = np.inf
    gy[0, 1] = -np.inf
    gx[1, 0] = np.nan
    gx[1, 1] = 1e8
    gy[1, 1] = -1e8
    ours = np.asarray(training._grid_sample_2d(
        jnp.asarray(img), jnp.asarray(gx), jnp.asarray(gy)))
    assert np.isfinite(ours).all()
    grid = torch.from_numpy(np.stack([gx, gy], axis=-1))[None]
    theirs = torch.nn.functional.grid_sample(
        torch.from_numpy(img)[None, None], grid,
        mode="bilinear", padding_mode="zeros", align_corners=True,
    )[0, 0].numpy()
    # torch itself NaNs on the nan-coordinate pixel; everywhere else match
    fin = np.isfinite(theirs)
    np.testing.assert_allclose(ours[fin], theirs[fin], atol=1e-6)
    assert ours[~fin].sum() == 0.0


def test_training_improves_psnr(rng):
    """Mini end-to-end fit: render a target scene, perturb params, train."""
    cam = make_camera(np.eye(3), np.zeros(3), 64, 48, fovx=1.0, fovy=0.8)
    settings = RasterizeSettings(backend="naive")
    opt_params = GsOptimParams(position_lr_init=0.01, feature_lr=0.05,
                               opacity_lr=0.05, scaling_lr=0.01)

    target = gm.create_from_points(_batch(rng, 40), 3.0, capacity=64)
    bg = jnp.ones(3)
    gt = training.render_params(target, cam, bg, settings).color
    gt = jax.lax.stop_gradient(gt)

    # perturb colors + positions
    params = target.replace(
        features_dc=target.features_dc
        + 0.3 * jnp.asarray(rng.normal(size=target.features_dc.shape), jnp.float32),
        xyz=target.xyz
        + 0.05 * jnp.asarray(rng.normal(size=target.xyz.shape), jnp.float32),
    )
    optimizer = training.make_optimizer(opt_params)
    opt_state = optimizer.init(params)

    simi = training.empty_simi(max_gauss=64)
    cams = [cam]
    gts = gt[None]

    from gslivm_tpu.ops.losses import psnr
    p0 = float(psnr(training.render_params(params, cam, bg, settings).color, gt))
    metrics = None
    for _ in range(30):
        params, opt_state, metrics = training.train_step(
            params, opt_state, cams, gts, simi,
            opt_params=opt_params, settings=settings,
        )
    p1 = float(metrics.psnr)
    assert p1 > p0 + 2.0, (p0, p1)
    # n_active untouched by the optimizer
    assert int(params.n_active) == 40


def test_delta_depth_grad_dead_under_drop_contract(rng):
    """With depth_grad=False (the reference drop contract) the delta-depth
    term carries IDENTICALLY ZERO parameter gradient, so the train step may
    stop-gradient its inputs: parameter updates must match a run with the
    delta loss disabled, while the delta metric is still computed. With
    depth_grad=True the term must be live (updates differ)."""
    cam_a = make_camera(np.eye(3), np.zeros(3), 64, 48, fovx=1.0, fovy=0.8)
    cam_b = make_camera(np.eye(3), np.asarray([0.05, 0.0, 0.0]), 64, 48,
                        fovx=1.0, fovy=0.8)
    cam_c = make_camera(np.eye(3), np.asarray([0.0, 0.05, 0.0]), 64, 48,
                        fovx=1.0, fovy=0.8)
    params = gm.create_from_points(_batch(rng, 40), 3.0, capacity=64)
    bg = jnp.ones(3)
    base = RasterizeSettings(backend="naive")
    gt = training.render_params(params, cam_a, bg, base).color
    gt3 = jnp.stack([np.asarray(gt)] * 3)
    params = params.replace(
        xyz=params.xyz
        + 0.05 * jnp.asarray(rng.normal(size=params.xyz.shape), jnp.float32))
    optimizer = training.make_optimizer(GsOptimParams())
    opt_state = optimizer.init(params)
    simi = training.empty_simi(max_gauss=64)
    cams = [cam_a, cam_b, cam_c]

    p_drop, _, m_drop = training.train_step(
        params, opt_state, cams, gt3, simi, settings=base, n_history_pairs=1)
    # delta metric still computed under the drop contract
    assert np.isfinite(float(m_drop.delta))
    # parameter updates identical to a run with NO delta pairs (zero grad)
    p_none, _, _ = training.train_step(
        params, opt_state, cams, gt3, simi, settings=base, n_history_pairs=0)
    np.testing.assert_array_equal(np.asarray(p_drop.xyz), np.asarray(p_none.xyz))
    np.testing.assert_array_equal(np.asarray(p_drop.scaling),
                                  np.asarray(p_none.scaling))

    # with depth_grad=True the delta term is live: updates must differ
    live = base._replace(depth_grad=True)
    p_live, _, m_live = training.train_step(
        params, opt_state, cams, gt3, simi, settings=live, n_history_pairs=1)
    assert np.isfinite(float(m_live.delta))
    assert not np.array_equal(np.asarray(p_live.xyz), np.asarray(p_none.xyz))


def test_opt_state_growth(rng):
    opt_params = GsOptimParams()
    p = gm.create_from_points(_batch(rng, 10), 3.0, capacity=16)
    optimizer = training.make_optimizer(opt_params)
    state = optimizer.init(p)
    p2 = gm.grow_capacity(p, 32)
    state2 = training.grow_opt_state(state, 16, 32)
    # one step must run without shape errors after growth
    cam = make_camera(np.eye(3), np.zeros(3), 32, 32, fovx=1.0, fovy=1.0)
    gt = jnp.zeros((1, 3, 32, 32))
    params3, state3, _ = training.train_step(
        p2, state2, [cam], gt, training.empty_simi(max_gauss=32),
        opt_params=opt_params, settings=RasterizeSettings(backend="naive"),
    )
    assert params3.capacity == 32


def test_prune_low_opacity(rng):
    p = gm.create_from_points(_batch(rng, 20), 3.0, capacity=32)
    # push half the opacities far down
    p = p.replace(opacity=p.opacity.at[:10].set(-8.0))
    q = gm.prune_low_opacity(p, min_opacity=0.01)
    assert int(q.n_active) == 10
    # survivors are the original rows 10..19 in order
    np.testing.assert_array_equal(np.asarray(q.xyz[:10]), np.asarray(p.xyz[10:20]))
    # render path still works post-prune
    cam = make_camera(np.eye(3), np.zeros(3), 32, 32, fovx=1.0, fovy=1.0)
    out = training.render_params(q, cam, jnp.ones(3),
                                 RasterizeSettings(backend="naive"))
    assert np.all(np.isfinite(np.asarray(out.color)))


def test_expon_lr_and_loss_monitor():
    lr0 = training.expon_lr(0, 1e-2, 1e-4, max_steps=100)
    lr_mid = training.expon_lr(50, 1e-2, 1e-4, max_steps=100)
    lr_end = training.expon_lr(100, 1e-2, 1e-4, max_steps=100)
    assert abs(lr0 - 1e-2) < 1e-9 and abs(lr_end - 1e-4) < 1e-9
    assert abs(lr_mid - 1e-3) < 1e-9  # log-lerp midpoint

    mon = training.LossMonitor(buffer_size=3)
    assert mon.update(10.0) == 0.0
    assert mon.update(9.0) == 0.5  # mean of [0, 1]
    mon.update(9.0)
    assert not mon.is_converging(0.1)
    mon.update(9.0)
    mon.update(9.0)
    assert mon.is_converging(0.1)


def test_mark_visible(rng):
    from gslivm_tpu.ops.rasterize import mark_visible
    cam = make_camera(np.eye(3), np.zeros(3), 32, 32, fovx=1.0, fovy=1.0)
    means = jnp.asarray([[0, 0, 5.0], [0, 0, 0.1], [0, 0, -2.0]])
    vis = np.asarray(mark_visible(means, cam))
    assert vis.tolist() == [True, False, False]


def test_delta_depth_band_sum_partitions_full_loss(rng):
    """Band sums over an output-row partition reassemble the full
    delta-depth mean exactly (the pixel-sharded delta-loss identity)."""
    H, W = 29, 40
    cam_a = make_camera(np.eye(3), np.zeros(3), W, H, fovx=1.0, fovy=0.8)
    cam_b = make_camera(np.eye(3), np.asarray([0.06, 0.02, 0.0]), W, H,
                        fovx=1.0, fovy=0.8)
    depth_a = jnp.asarray(rng.uniform(2.0, 8.0, (H, W)), jnp.float32)
    depth_b = jnp.asarray(rng.uniform(2.0, 8.0, (H, W)), jnp.float32)
    acc_a = jnp.asarray(rng.uniform(0.0, 1.0, (H, W)), jnp.float32)
    acc_b = jnp.asarray(rng.uniform(0.0, 1.0, (H, W)), jnp.float32)
    full = float(training.delta_depth_loss(depth_a, acc_a, cam_a,
                                           depth_b, acc_b, cam_b))
    for n_dev in (2, 4, 8):
        rows = -(-H // n_dev)
        total = sum(float(training.delta_depth_band_sum(
            depth_a, acc_a, cam_a, depth_b, acc_b, cam_b, k * rows, rows))
            for k in range(n_dev))
        np.testing.assert_allclose(total / (H * W), full, rtol=2e-6, atol=1e-7)


def test_lr_decay_schedule_optional():
    """lr_max_steps > 0 log-lerps the xyz and scaling LRs (the Expon_lr
    the reference defines but never constructs); the default keeps the
    reference's constant-LR behavior bit-for-bit."""
    import optax

    from gslivm_tpu.config import GsOptimParams

    n = 8
    params = gm.create_empty(n, 0).replace(n_active=jnp.asarray(n, jnp.int32))
    grads = jax.tree.map(jnp.ones_like, params).replace(
        n_active=jnp.zeros((), jnp.float32))

    def step_sizes(p, n_steps):
        opt = training.make_optimizer(p)
        st = opt.init(params)
        sizes = []
        for _ in range(n_steps):
            upd, st = opt.update(grads, st, params)
            sizes.append((float(jnp.abs(upd.xyz).max()),
                          float(jnp.abs(upd.features_dc).max())))
        return sizes

    const = step_sizes(GsOptimParams(), 3)
    assert abs(const[0][0] - const[-1][0]) < 1e-7  # constant xyz lr

    dec = step_sizes(GsOptimParams(lr_max_steps=4, position_lr_final=1e-6,
                                   scaling_lr_final=1e-6), 4)
    xyz_sizes = [s[0] for s in dec]
    assert xyz_sizes[0] > xyz_sizes[-1] * 3  # decayed hard
    feat_sizes = [s[1] for s in dec]
    assert abs(feat_sizes[0] - feat_sizes[-1]) < 1e-7  # others constant
