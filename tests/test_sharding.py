"""Multi-device sharding tests on the 8-device virtual CPU mesh:
sharded train step must match the single-device step numerically."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gslivm_tpu.config import GsOptimParams
from gslivm_tpu.models import gaussian_model as gm
from gslivm_tpu.models import training
from gslivm_tpu.models.cameras import make_camera
from gslivm_tpu.ops.rasterize import RasterizeSettings
from gslivm_tpu.parallel import sharding


@pytest.fixture(scope="module")
def scene():
    rng = np.random.default_rng(3)
    m = 50
    xyz = jnp.asarray(rng.normal(0, 1.0, (m, 3)) + [0, 0, 5.0], jnp.float32)
    rgb = jnp.asarray(rng.uniform(0, 255, (m, 3)), jnp.float32)
    cov = jnp.tile(jnp.eye(3)[None] * 0.003, (m, 1, 1)).astype(jnp.float32)
    batch = gm.PointBatch(xyz=xyz, rgb=rgb, cov=cov, mask=jnp.ones(m, bool))
    params = gm.create_from_points(batch, 3.0, capacity=64)
    cam = make_camera(np.eye(3), np.zeros(3), 64, 48, fovx=1.0, fovy=0.8)
    gt = jnp.asarray(rng.uniform(size=(1, 3, 48, 64)), jnp.float32)
    return params, cam, gt


def test_mesh_shapes():
    mesh = sharding.make_mesh(8)
    assert mesh.devices.shape == (2, 4)
    assert mesh.axis_names == ("gauss", "pixel")
    mesh1 = sharding.make_mesh(8, gauss_axis=1)
    assert mesh1.devices.shape == (1, 8)


@pytest.mark.parametrize("gauss_axis", [1, 2])
def test_sharded_step_matches_single_device(scene, gauss_axis):
    params, cam, gt = scene
    opt_params = GsOptimParams()
    mesh = sharding.make_mesh(8, gauss_axis=gauss_axis)

    optimizer = training.make_optimizer(opt_params)

    # single-device reference step (no history pairs, white bg)
    ref_params, _, ref_metrics = training.train_step(
        params, optimizer.init(params), [cam], gt, training.empty_simi(max_gauss=64),
        opt_params=opt_params, settings=RasterizeSettings(backend="naive"),
    )

    sh_params = sharding.shard_params(params, mesh)
    opt_state = optimizer.init(sh_params)
    new_params, _, metrics = sharding.sharded_train_step(
        mesh, sh_params, opt_state, [cam], gt[0][None],
        training.empty_simi(max_gauss=64), opt_params=opt_params,
    )

    # image loss must match the single-device metric
    np.testing.assert_allclose(float(metrics.image_loss),
                               float(ref_metrics.image_loss),
                               rtol=1e-5, atol=1e-6)
    # updated parameters must match
    for field in ("xyz", "features_dc", "scaling", "rotation", "opacity"):
        a = np.asarray(getattr(ref_params, field))
        b = np.asarray(getattr(new_params, field))
        np.testing.assert_allclose(b, a, rtol=1e-4, atol=1e-6,
                                   err_msg=field)


def test_sharded_simi_loss_engages(scene):
    params, cam, gt = scene
    mesh = sharding.make_mesh(8, gauss_axis=2)
    opt_params = GsOptimParams()
    simi = training.SimiInputs(
        points=jnp.zeros((training.MAX_SIMI, 3)).at[0].set(jnp.asarray([50.0, 0, 5])),
        point_mask=jnp.arange(training.MAX_SIMI) < 1,
        gauss_idx=jnp.arange(64, dtype=jnp.int32) % 50,
        gauss_mask=jnp.arange(64) < 50,
    )
    optimizer = training.make_optimizer(opt_params)
    sh_params = sharding.shard_params(params, mesh)
    _, _, m_with = sharding.sharded_train_step(
        mesh, sh_params, optimizer.init(sh_params), [cam], gt[0][None], simi,
        opt_params=opt_params)
    _, _, m_without = sharding.sharded_train_step(
        mesh, sh_params, optimizer.init(sh_params), [cam], gt[0][None],
        training.empty_simi(max_gauss=64), opt_params=opt_params)
    assert float(m_with.loss) > float(m_without.loss) + 1.0  # far anchor penalty


def test_sharded_pallas_matches_single_device(scene):
    """The production path: per-device Pallas tile-band rendering under
    shard_map must match the single-device step (interpret mode on CPU)."""
    params, cam, gt = scene
    opt_params = GsOptimParams()
    mesh = sharding.make_mesh(8, gauss_axis=2)
    optimizer = training.make_optimizer(opt_params)

    ref_params, _, ref_metrics = training.train_step(
        params, optimizer.init(params), [cam], gt,
        training.empty_simi(max_gauss=64),
        opt_params=opt_params, settings=RasterizeSettings(backend="naive"),
    )

    sh_params = sharding.shard_params(params, mesh)
    opt_state = optimizer.init(sh_params)
    new_params, _, metrics = sharding.sharded_train_step(
        mesh, sh_params, opt_state, [cam], gt[0][None],
        training.empty_simi(max_gauss=64), opt_params=opt_params,
        renderer="pallas", max_instances=1 << 14,
    )
    np.testing.assert_allclose(float(metrics.image_loss),
                               float(ref_metrics.image_loss),
                               rtol=1e-4, atol=1e-5)
    assert int(metrics.overflow) == 0
    for field in ("xyz", "features_dc", "scaling", "opacity"):
        a = np.asarray(getattr(ref_params, field))
        b = np.asarray(getattr(new_params, field))
        np.testing.assert_allclose(b, a, rtol=1e-3, atol=1e-5, err_msg=field)


def test_sharded_pallas_supertile_matches_single_device(scene):
    """Supertile band rendering (block 2x2) under shard_map: band_rows are
    SUPERTILE rows; results must still match the single-device step."""
    params, cam, gt = scene
    opt_params = GsOptimParams()
    mesh = sharding.make_mesh(4, gauss_axis=1)
    optimizer = training.make_optimizer(opt_params)

    ref_params, _, ref_metrics = training.train_step(
        params, optimizer.init(params), [cam], gt,
        training.empty_simi(max_gauss=64),
        opt_params=opt_params, settings=RasterizeSettings(backend="naive"),
    )

    sh_params = sharding.shard_params(params, mesh)
    opt_state = optimizer.init(sh_params)
    new_params, _, metrics = sharding.sharded_train_step(
        mesh, sh_params, opt_state, [cam], gt[0][None],
        training.empty_simi(max_gauss=64), opt_params=opt_params,
        renderer="pallas", max_instances=1 << 14, block=(2, 2),
    )
    np.testing.assert_allclose(float(metrics.image_loss),
                               float(ref_metrics.image_loss),
                               rtol=1e-4, atol=1e-5)
    for field in ("xyz", "features_dc", "scaling", "opacity"):
        a = np.asarray(getattr(ref_params, field))
        b = np.asarray(getattr(new_params, field))
        np.testing.assert_allclose(b, a, rtol=1e-3, atol=1e-5, err_msg=field)


@pytest.mark.parametrize("gauss_axis", [2, 4])
def test_primitive_sharded_matches_single_device(scene, gauss_axis):
    """The TRUE gauss axis: depth-slab all_to_all + per-slab Pallas render +
    depth-ordered partial-composite merge (parallel/primitive.py) must match
    the single-device step — values AND gradients — with NO parameter
    all_gather. Tolerance 1e-4 absorbs the per-slab early-stop deviation
    (documented in primitive.py)."""
    params, cam, gt = scene
    opt_params = GsOptimParams()
    mesh = sharding.make_mesh(8, gauss_axis=gauss_axis)
    optimizer = training.make_optimizer(opt_params)

    ref_params, _, ref_metrics = training.train_step(
        params, optimizer.init(params), [cam], gt,
        training.empty_simi(max_gauss=64),
        opt_params=opt_params, settings=RasterizeSettings(backend="naive"),
    )

    sh_params = sharding.shard_params(params, mesh)
    opt_state = optimizer.init(sh_params)
    new_params, _, metrics = sharding.sharded_train_step(
        mesh, sh_params, opt_state, [cam], gt[0][None],
        training.empty_simi(max_gauss=64), opt_params=opt_params,
        renderer="primitive", max_instances=1 << 14,
    )
    np.testing.assert_allclose(float(metrics.image_loss),
                               float(ref_metrics.image_loss),
                               rtol=1e-4, atol=1e-4)
    assert int(metrics.overflow) == 0
    for field in ("xyz", "features_dc", "scaling", "opacity"):
        a = np.asarray(getattr(ref_params, field))
        b = np.asarray(getattr(new_params, field))
        np.testing.assert_allclose(b, a, rtol=1e-3, atol=1e-4, err_msg=field)


def test_primitive_sharded_simi_matches(scene):
    """sharded_simi_loss (psum radius + pmin distances over shards) must
    reproduce the gathered simi loss exactly."""
    params, cam, gt = scene
    opt_params = GsOptimParams()
    mesh = sharding.make_mesh(8, gauss_axis=2)
    optimizer = training.make_optimizer(opt_params)
    simi = training.SimiInputs(
        points=jnp.zeros((training.MAX_SIMI, 3)).at[0].set(
            jnp.asarray([2.0, 0.5, 5.0])).at[1].set(jnp.asarray([0.0, 1.0, 4.0])),
        point_mask=jnp.arange(training.MAX_SIMI) < 2,
        gauss_idx=jnp.arange(64, dtype=jnp.int32) % 50,
        gauss_mask=jnp.arange(64) < 50,
    )
    ref = float(training.simi_loss(params, simi))

    sh_params = sharding.shard_params(params, mesh)
    _, _, m = sharding.sharded_train_step(
        mesh, sh_params, optimizer.init(sh_params), [cam], gt[0][None], simi,
        opt_params=opt_params, renderer="primitive", max_instances=1 << 14)
    got = float(m.simi) / opt_params.lambda_depth_simi
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-7)


def test_sharded_history_pairs_match_single_device(scene):
    """Delta-depth history pairs in the sharded step must reproduce
    train_step(n_history_pairs=1) — VERDICT r1 item 6 (loss parity)."""
    params, cam, gt = scene
    rng = np.random.default_rng(7)
    # second camera: slight translation so the warp is nontrivial
    cam2 = make_camera(np.eye(3), np.asarray([0.08, -0.04, 0.0]),
                       cam.width, cam.height, fovx=1.0, fovy=0.8)
    gt2 = jnp.asarray(rng.uniform(size=(1, 3, cam.height, cam.width)),
                      jnp.float32)
    cams = [cam, cam2]
    gts = jnp.concatenate([gt, gt2], axis=0)
    opt_params = GsOptimParams()
    optimizer = training.make_optimizer(opt_params)

    ref_params, _, ref_metrics = training.train_step(
        params, optimizer.init(params), cams, gts,
        training.empty_simi(max_gauss=64), opt_params=opt_params,
        settings=RasterizeSettings(backend="naive"), n_history_pairs=1,
    )
    assert float(ref_metrics.delta) > 0.0  # the pair engaged

    mesh = sharding.make_mesh(8, gauss_axis=2)
    sh_params = sharding.shard_params(params, mesh)
    for renderer in ("oracle", "primitive"):
        new_params, _, m = sharding.sharded_train_step(
            mesh, sh_params, optimizer.init(sh_params), cams, gts,
            training.empty_simi(max_gauss=64), opt_params=opt_params,
            renderer=renderer, max_instances=1 << 14, n_history_pairs=1,
        )
        np.testing.assert_allclose(float(m.delta), float(ref_metrics.delta),
                                   rtol=1e-4, atol=1e-5, err_msg=renderer)
        np.testing.assert_allclose(float(m.loss), float(ref_metrics.loss),
                                   rtol=1e-4, atol=1e-4, err_msg=renderer)
        for field in ("xyz", "scaling", "opacity"):
            a = np.asarray(getattr(ref_params, field))
            b = np.asarray(getattr(new_params, field))
            np.testing.assert_allclose(b, a, rtol=1e-3, atol=1e-4,
                                       err_msg=f"{renderer}:{field}")


def test_primitive_exchange_overflow_counted(scene):
    """A deliberately tiny exchange budget must COUNT dropped gaussians (not
    crash or silently corrupt)."""
    params, cam, gt = scene
    opt_params = GsOptimParams()
    mesh = sharding.make_mesh(8, gauss_axis=4)
    optimizer = training.make_optimizer(opt_params)
    sh_params = sharding.shard_params(params, mesh)
    _, _, m = sharding.sharded_train_step(
        mesh, sh_params, optimizer.init(sh_params), [cam], gt[0][None],
        training.empty_simi(max_gauss=64), opt_params=opt_params,
        renderer="primitive", max_instances=1 << 14,
        exchange_slack=0.0625,  # budget 1 per (src, dst) pair
    )
    assert int(m.overflow) > 0
    assert np.isfinite(float(m.loss))


def test_primitive_memory_scales_with_gauss_axis():
    """VERDICT r1 'Done' criterion for the gauss axis: per-device peak
    memory must scale ~1/gauss. Proven from the COMPILED executables'
    memory analysis: per-device argument bytes (params + Adam state) scale
    exactly 1/g, the temp footprint decreases monotonically in g (the
    residual is image-sized state, invariant by design), and at the same
    mesh the primitive strategy is strictly leaner than the FSDP gather
    strategy (which materializes the full parameter set per device)."""
    rng = np.random.default_rng(0)
    m, cap = 12000, 1 << 14
    batch = gm.PointBatch(
        xyz=jnp.asarray(rng.normal(0, 1.0, (m, 3)) + [0, 0, 5.0], jnp.float32),
        rgb=jnp.asarray(rng.uniform(0, 255, (m, 3)), jnp.float32),
        cov=jnp.tile(jnp.eye(3)[None] * 0.003, (m, 1, 1)).astype(jnp.float32),
        mask=jnp.ones((m,), bool))
    params = gm.create_from_points(batch, 3.0, capacity=cap)
    cam = make_camera(np.eye(3), np.zeros(3), 64, 48, fovx=1.0, fovy=0.8)
    gt = jnp.asarray(rng.uniform(size=(1, 3, 48, 64)), jnp.float32)
    op = GsOptimParams()
    optimizer = training.make_optimizer(op)

    def mem(gauss_axis, renderer):
        mesh = sharding.make_mesh(gauss_axis * 2, gauss_axis=gauss_axis)
        sp = sharding.shard_params(params, mesh)
        lowered = sharding.sharded_train_step.lower(
            mesh, sp, optimizer.init(sp), [cam], gt[0][None],
            training.empty_simi(max_gauss=64), opt_params=op,
            renderer=renderer, max_instances=1 << 15)
        ma = lowered.compile().memory_analysis()
        return ma.temp_size_in_bytes, ma.argument_size_in_bytes

    t1, a1 = mem(1, "primitive")
    t2, a2 = mem(2, "primitive")
    t4, a4 = mem(4, "primitive")
    # parameter + optimizer arguments shard exactly 1/g
    assert abs(a2 - a1 / 2) < 0.05 * a1, (a1, a2)
    assert abs(a4 - a1 / 4) < 0.05 * a1, (a1, a4)
    # per-device temp decreases with the gauss axis
    assert t4 < t2 < t1, (t1, t2, t4)
    # and beats the full-gather strategy on the same mesh
    tg, _ = mem(4, "pallas")
    assert t4 < tg, (t4, tg)


def test_multihost_two_process_entry():
    """The jax.distributed multi-host entry (BASELINE configs[4] N>=2
    hosts): two OS processes initialize the global runtime, build one
    global ("gauss","pixel") mesh, and run a primitive-sharded train step
    whose collectives cross the process boundary (the DCN path shape).
    Runs the real tools/multihost_demo.py CLI."""
    import json
    import socket
    import subprocess
    import sys

    with socket.socket() as s:  # pick a free port
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    root = os.path.join(os.path.dirname(__file__), "..")
    script = os.path.join(root, "tools", "multihost_demo.py")
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}

    def proc(pid):
        return subprocess.Popen(
            [sys.executable, script, "--coordinator", f"localhost:{port}",
             "--num-processes", "2", "--process-id", str(pid),
             "--gauss", "1024", "--width", "48", "--height", "32"],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, env=env,
            cwd=root, text=True)

    p1 = proc(1)
    p0 = proc(0)
    out0, err0 = p0.communicate(timeout=600)
    out1, err1 = p1.communicate(timeout=60)
    assert p0.returncode == 0, err0[-2000:]
    assert p1.returncode == 0, err1[-2000:]
    row = json.loads([ln for ln in out0.splitlines()
                      if ln.startswith("{")][-1])
    assert row["global_devices"] == 4
    assert row["processes"] == 2
    assert row["mesh"] == {"gauss": 2, "pixel": 2}
    assert np.isfinite(row["loss"]) and row["loss"] > 0
