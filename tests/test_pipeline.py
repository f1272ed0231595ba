"""End-to-end pipeline integration: synthetic sequence -> GP map growth ->
training -> PSNR improves (the SURVEY §7 'minimum end-to-end slice' as a
self-contained test, analog of BASELINE config[1])."""

import numpy as np
import pytest

from gslivm_tpu.config import Config
from gslivm_tpu.frontend import synthetic
from gslivm_tpu.frontend.gpmap import GpMap
from gslivm_tpu.ops.rasterize import RasterizeSettings
from gslivm_tpu.pipeline import IncrementalMapper


def test_gpmap_lifecycle(rng):
    gp = GpMap()
    pts = rng.uniform(0, 0.2, (40, 3)) * [1, 1, 0.05]  # one flat-ish voxel
    div = gp.divide_points(pts)
    assert int(np.asarray(div.batch.mask).sum()) == 1
    st = gp.stats()
    assert st["converged"] == 1
    # further points in the converged voxel become loss anchors
    div2 = gp.divide_points(rng.uniform(0, 0.2, (10, 3)) * [1, 1, 0.05])
    assert div2.loss_points.shape[0] == 10
    assert int(np.asarray(div2.batch.mask).sum()) == 0
    # reopening queues the voxel for reprocessing
    h = div.hashes[0]
    gp.update_variance(np.asarray([h]), np.asarray([True]),
                       np.asarray([[0.01] * 10]))
    assert gp.stats()["converged"] == 0
    div3 = gp.divide_points(np.zeros((0, 3)))
    assert int(np.asarray(div3.batch.mask).sum()) == 1  # reprocessed


def test_synthetic_scene_consistency():
    frames = synthetic.make_sequence(n_frames=2, width=64, height=48,
                                     points_per_frame=500)
    f = frames[0]
    assert f.image.shape == (48, 64, 3)
    assert f.points_world.shape[1] == 3
    # sampled points must be in front of the camera
    import jax.numpy as jnp
    p_cam = f.points_world @ np.asarray(f.camera.R_cw).T + np.asarray(f.camera.t_cw)
    assert (p_cam[:, 2] > 0).mean() > 0.99


def test_end_to_end_mapping_improves_psnr():
    """SURVEY §7 minimum slice: GP growth + training on a tiny scene."""
    import dataclasses

    from gslivm_tpu.config import GpParams
    from gslivm_tpu.ops.losses import psnr
    import jax.numpy as jnp

    cfg = dataclasses.replace(Config(), gp=GpParams(grid=0.5))
    frames = synthetic.make_sequence(n_frames=3, width=48, height=36,
                                     points_per_frame=5000)
    mapper = IncrementalMapper(
        config=cfg,
        settings=RasterizeSettings(backend="naive"),
        bootstrap_points=200,
        initial_capacity=4096,
    )
    for fr in frames:
        stats = mapper.add_frame(fr)
    assert stats["active"] > 1000, stats
    assert stats["keyframes"] == 3
    assert stats["voxels"]["converged"] > 100

    def kf0_psnr():
        out = mapper.render_keyframe(0)
        return float(psnr(out.color, jnp.asarray(mapper.gt_images[0])))

    p0 = kf0_psnr()
    metrics = None
    for _ in range(10):
        metrics = mapper.train_iteration()
    assert metrics is not None
    p1 = kf0_psnr()
    assert p1 > p0 + 0.5, (p0, p1)
    # structural-loss machinery engaged (anchors from converged cells)
    assert len(mapper.loss_anchors) > 0
    assert float(metrics.simi) >= 0.0


def test_overflow_detection_and_escalation():
    """Dense scene with a deliberately tiny instance budget: the overflow is
    surfaced in TrainMetrics and the mapper escalates max_instances (the CUDA
    resize-callback analog, rasterize_points.cu:36-44) until it vanishes."""
    import dataclasses

    from gslivm_tpu.config import GpParams

    cfg = dataclasses.replace(Config(), gp=GpParams(grid=0.5))
    frames = synthetic.make_sequence(n_frames=2, width=48, height=36,
                                     points_per_frame=4000)
    mapper = IncrementalMapper(
        config=cfg,
        settings=RasterizeSettings(backend="pallas", max_instances=128,
                                   max_chunks_per_tile=1),
        bootstrap_points=200,
        initial_capacity=4096,
    )
    for fr in frames:
        mapper.add_frame(fr)

    m = mapper.train_iteration()
    assert int(m.overflow) > 0  # truncation detected, not silent
    budgets = [mapper.settings.max_instances]
    for _ in range(12):
        m = mapper.train_iteration()
        budgets.append(mapper.settings.max_instances)
        if int(m.overflow) == 0:
            break
    assert mapper.overflow_escalations >= 1
    assert budgets[-1] > budgets[0]
    assert int(m.overflow) == 0, f"budget growth never cleared overflow: {budgets}"


def test_camera_sampler_round_robin():
    """Every window camera is visited before any repeats (the exist-list +
    reset-on-exhaustion semantics of get_random_indices,
    lioOptimization.cpp:1571-1590, 1860-1913)."""
    import dataclasses

    from gslivm_tpu.config import GpParams

    cfg = dataclasses.replace(
        Config(), gp=GpParams(image_sliding_window=5, curr_cam_per_iter=1,
                              history_cam_per_iter=1))
    mapper = IncrementalMapper(config=cfg)
    mapper.cameras = list(range(12))  # stand-ins; sampler only uses len()

    # current window = [7..11]; one full cycle visits each exactly once
    seen = []
    for _ in range(5):
        curr, _h = mapper._sample_cameras()
        seen += curr
    assert sorted(seen) == [7, 8, 9, 10, 11], seen
    # next cycle starts over (reset on exhaustion), again without repeats
    seen2 = []
    for _ in range(5):
        curr, _h = mapper._sample_cameras()
        seen2 += curr
    assert sorted(seen2) == [7, 8, 9, 10, 11], seen2

    # history pairs round-robin the pre-window range [0, split-1) too
    # (start from a fresh cycle: the curr draws above also drew history)
    mapper._used_hist.clear()
    hist_seen = []
    for _ in range(6):
        _c, pairs = mapper._sample_cameras()
        hist_seen += [a for a, _b in pairs]
    assert sorted(set(hist_seen)) == [0, 1, 2, 3, 4, 5]
    # each pair partner is the +1 neighbor (delta-depth pairing)
    _c, pairs = mapper._sample_cameras()
    assert all(b == a + 1 for a, b in pairs)


def test_prune_lifecycle_compacts_everything():
    """Low-opacity pruning drops gaussians, keeps Adam moments attached to
    their surviving gaussian, and remaps the hash registry so the simi loss
    keeps finding the right indices (VERDICT r2 next #6)."""
    import dataclasses

    import jax.numpy as jnp

    from gslivm_tpu.config import GpParams, GsOptimParams
    from gslivm_tpu.models import gaussian_model as gm

    cfg = dataclasses.replace(Config(), gp=GpParams(grid=0.5),
                              gs=GsOptimParams(prune_interval=0))
    frames = synthetic.make_sequence(n_frames=2, width=48, height=36,
                                     points_per_frame=4000)
    mapper = IncrementalMapper(
        config=cfg, settings=RasterizeSettings(backend="naive"),
        bootstrap_points=200, initial_capacity=4096)
    for fr in frames:
        mapper.add_frame(fr)
    for _ in range(2):
        mapper.train_iteration()

    n0 = int(mapper.params.n_active)
    # force a third of the gaussians below the opacity floor
    kill = np.zeros(mapper.params.capacity, bool)
    kill[:n0:3] = True
    op = np.array(mapper.params.opacity)  # writable copy
    op[kill] = -12.0  # sigmoid ~ 6e-6 << 0.005
    mapper.params = mapper.params.replace(opacity=jnp.asarray(op))

    # remember a surviving gaussian's xyz and its Adam moment row
    import jax
    leaves0 = [leaf for leaf in jax.tree.leaves(mapper.opt_state)
               if hasattr(leaf, "ndim") and leaf.ndim >= 1
               and leaf.shape[0] == mapper.params.capacity]
    survivor = 1  # index 1 is not killed (kill pattern ::3)
    assert not kill[survivor]
    xyz_before = np.asarray(mapper.params.xyz[survivor])
    mom_before = [np.asarray(l[survivor]) for l in leaves0]
    reg_before = {h: mapper.registry.lookup(h)
                  for h in list(mapper.loss_anchors)[:5]
                  if mapper.registry.lookup(h) is not None}

    dropped = mapper.prune_map()
    assert dropped == int(kill.sum()), (dropped, int(kill.sum()))
    n1 = int(mapper.params.n_active)
    assert n1 == n0 - dropped

    # survivor slid to the front (it was index 1, one killed before it)
    assert np.allclose(np.asarray(mapper.params.xyz[0]), xyz_before)
    leaves1 = [leaf for leaf in jax.tree.leaves(mapper.opt_state)
               if hasattr(leaf, "ndim") and leaf.ndim >= 1
               and leaf.shape[0] == mapper.params.capacity]
    for m0, l1 in zip(mom_before, leaves1):
        assert np.allclose(np.asarray(l1[0]), m0)

    # registry ranges still point at the right (compacted) gaussians
    prefix = np.concatenate([[0], np.cumsum(~kill)])
    for h, (s, c) in reg_before.items():
        r = mapper.registry.lookup(h)
        expect_c = int(prefix[s + c] - prefix[s])
        if expect_c == 0:
            assert r is None
        else:
            assert r == (int(prefix[s]), expect_c), (h, r)

    # training continues cleanly after the prune
    m = mapper.train_iteration()
    assert m is not None and np.isfinite(float(m.loss))

    # pruning below the floor is idempotent
    assert mapper.prune_map() == 0


def test_budget_autofit_shrinks_to_scene():
    """Feedback budget fit: after a window of steps with measured expansion
    far below the loose default budgets, max_instances/max_chunks_per_tile
    shrink to the measured scale (+margin); overflow marks the budget as
    non-viable so the fit never shrinks back into it."""
    mapper = IncrementalMapper(
        settings=RasterizeSettings(backend="pallas", max_instances=2**20,
                                   max_chunks_per_tile=64))

    for _ in range(mapper.budget_fit_window):
        mapper._maybe_shrink_budgets(90_000, 4, 0)
    assert mapper.settings.max_instances == 2 * mapper._INST_BUCKET  # 131072
    assert mapper.settings.max_chunks_per_tile == 8
    fitted = mapper.settings.max_instances

    # overflow at the fitted budget pins the floor above it
    mapper._overflowed_at = fitted
    for _ in range(mapper.budget_fit_window):
        mapper._maybe_shrink_budgets(10_000, 2, 0)
    assert mapper.settings.max_instances == fitted  # no shrink into overflow

    # naive backend: fit is a no-op
    m2 = IncrementalMapper(settings=RasterizeSettings(backend="naive"))
    for _ in range(m2.budget_fit_window + 1):
        m2._maybe_shrink_budgets(1, 1, 0)
    assert m2.settings.max_instances == RasterizeSettings().max_instances


def test_concurrent_mapper_overlaps_and_converges():
    """ConcurrentMapper (the optimize_vis-thread analog): frames submitted
    from the producer thread are all mapped, the per-frame training credits
    are all spent, and the result improves PSNR just like the serial path —
    race-free under the lock discipline."""
    import dataclasses

    import jax.numpy as jnp

    from gslivm_tpu.config import GpParams
    from gslivm_tpu.ops.losses import psnr
    from gslivm_tpu.pipeline import ConcurrentMapper

    cfg = dataclasses.replace(Config(), gp=GpParams(grid=0.5))
    frames = synthetic.make_sequence(n_frames=3, width=48, height=36,
                                     points_per_frame=5000)
    mapper = IncrementalMapper(
        config=cfg, settings=RasterizeSettings(backend="naive"),
        bootstrap_points=200, initial_capacity=4096)

    cm = ConcurrentMapper(mapper, iters_per_frame=4)
    for fr in frames:
        cm.submit_frame(fr)
    mapper = cm.finish()

    assert cm.frames_mapped == 3
    assert cm.trained >= 4  # at least the post-bootstrap frames' credits
    assert cm.last_metrics is not None
    assert np.isfinite(float(cm.last_metrics.loss))
    assert cm.busy_s > 0

    out = mapper.render_keyframe(0)
    p = float(psnr(out.color, jnp.asarray(mapper.gt_images[0])))
    assert p > 10.0, p

    # worker errors surface on finish(), not silently
    cm2 = ConcurrentMapper(mapper, iters_per_frame=1)
    bad = frames[0]._replace(points_world="not an array")
    cm2.submit_frame(bad)
    with pytest.raises(RuntimeError):
        cm2.finish()


def test_concurrent_mapper_no_deadlock_on_worker_death():
    """A worker death with a FULL queue must surface to the producer
    instead of deadlocking submit_frame against a queue nobody drains."""
    from gslivm_tpu.pipeline import ConcurrentMapper

    mapper = IncrementalMapper(settings=RasterizeSettings(backend="naive"))
    cm = ConcurrentMapper(mapper, iters_per_frame=1, queue_size=1)
    bad = "not a frame"
    with pytest.raises(RuntimeError):
        # first bad frame kills the worker; subsequent puts must raise
        # within the poll interval, not block forever
        for _ in range(20):
            cm.submit_frame(bad)
    cm._stop.set()
    cm._thread.join(timeout=5)


def test_voxel_hash_collision_free_over_working_range():
    """Brute-force collision scan of the GP map's spatial hash — the analog
    of the reference's (disabled) test_hash.cpp program. The registry and
    loss-anchor bookkeeping key on this hash, so a collision would silently
    merge two voxels' gaussian ranges. The int64 3-prime linear map must be
    injective over the practical coordinate range."""
    from gslivm_tpu.frontend.gpmap import voxel_hash

    r = np.arange(-50, 50, dtype=np.int64)  # 100^3 cells around the origin
    ijk = np.stack(np.meshgrid(r, r, r, indexing="ij"), axis=-1).reshape(-1, 3)
    h = voxel_hash(ijk)
    assert len(np.unique(h)) == len(h)


def test_round_robin_trains_every_static_camera():
    """The r2 failure mode: with a static camera set the old sampler
    hammered one view and starved the rest. With round-robin, a few
    iterations must improve EVERY window camera's PSNR, not just the
    oldest one (VERDICT r2 weak #1 / next #3 'done' criterion)."""
    import dataclasses

    import jax.numpy as jnp

    from gslivm_tpu.config import GpParams
    from gslivm_tpu.ops.losses import psnr

    cfg = dataclasses.replace(
        Config(), gp=GpParams(grid=0.5, image_sliding_window=50,
                              curr_cam_per_iter=1, history_cam_per_iter=0))
    frames = synthetic.make_sequence(n_frames=3, width=48, height=36,
                                     points_per_frame=5000)
    mapper = IncrementalMapper(
        config=cfg, settings=RasterizeSettings(backend="naive"),
        bootstrap_points=200, initial_capacity=4096)
    for fr in frames:
        mapper.add_frame(fr)
    assert len(mapper.cameras) == 3

    def all_psnrs():
        return [float(psnr(mapper.render_keyframe(i).color,
                           jnp.asarray(mapper.gt_images[i])))
                for i in range(3)]

    before = all_psnrs()
    for _ in range(9):  # 3 full window cycles
        mapper.train_iteration()
    after = all_psnrs()
    gains = [a - b for a, b in zip(after, before)]
    assert min(gains) > 0.3, (before, after)


def test_prune_max_scale_drops_runaway_blobs():
    """With prune_max_scale > 0, gaussians whose activated scale exceeds
    the threshold are pruned even at full opacity (the offline-run
    runaway-blob guard, config.py GsOptimParams.prune_max_scale); with the
    parity default 0 they survive."""
    import dataclasses

    import jax.numpy as jnp

    from gslivm_tpu.config import GpParams, GsOptimParams

    def build(ms):
        cfg = dataclasses.replace(
            Config(), gp=GpParams(grid=0.5),
            gs=GsOptimParams(prune_interval=0, prune_max_scale=ms))
        frames = synthetic.make_sequence(n_frames=2, width=48, height=36,
                                         points_per_frame=4000)
        mapper = IncrementalMapper(
            config=cfg, settings=RasterizeSettings(backend="naive"),
            bootstrap_points=200, initial_capacity=4096)
        for fr in frames:
            mapper.add_frame(fr)
        return mapper

    mapper = build(0.5)
    n0 = int(mapper.params.n_active)
    sc = np.array(mapper.params.scaling)
    blobs = [0, 5, 9]
    sc[blobs, 0] = np.log(3.0)  # 3 m >> 0.5 m threshold
    mapper.params = mapper.params.replace(scaling=jnp.asarray(sc))
    # opacity healthy: the opacity criterion alone would keep them
    assert (np.asarray(mapper.params.get_opacity()[blobs, 0]) > 0.01).all()
    assert mapper.prune_map() == len(blobs)
    assert int(mapper.params.n_active) == n0 - len(blobs)
    assert float(np.asarray(
        mapper.params.get_scaling()[:n0 - len(blobs)]).max()) <= 0.5

    # parity default: scale criterion off, blobs survive
    mapper2 = build(0.0)
    sc2 = np.array(mapper2.params.scaling)
    sc2[blobs, 0] = np.log(3.0)
    mapper2.params = mapper2.params.replace(scaling=jnp.asarray(sc2))
    assert mapper2.prune_map() == 0


def _flat_voxel_points(center, rng, n=40):
    """A flat in-voxel point cluster that passes the PCA surface test."""
    pts = np.asarray(center) + np.stack([
        rng.uniform(0.0, 0.18, n),
        0.05 + rng.normal(0, 0.004, n),  # mid-voxel: stays in ONE cell
        rng.uniform(0.0, 0.18, n),
    ], axis=1)
    return pts


def test_deferred_colorization_inserts_when_seen(rng):
    """A voxel whose GP runs while OUTSIDE the camera image must not be
    dropped forever (the reference's added_final_gs_sample quirk,
    gpprocess.cu:804-812): it waits in the colorization pool and inserts
    when the first camera actually sees it (config.py
    GpParams.pending_colorize_max_age)."""
    from gslivm_tpu.models.cameras import make_camera

    cfg = Config()
    mapper = IncrementalMapper(
        config=cfg, settings=RasterizeSettings(backend="naive"),
        initial_capacity=1024)

    pts = _flat_voxel_points([5.0, 0.0, 2.0], rng)
    img = np.full((48, 64, 3), 128, np.uint8)

    # frame A: camera at origin looking +z — the cluster at x=5 is far
    # outside the frustum, so every gaussian colorizes invalid
    cam_a = make_camera(np.eye(3), np.zeros(3), 64, 48, fovx=1.0, fovy=0.8)
    from gslivm_tpu.pipeline import Frame
    stats = mapper.add_frame(Frame(
        points_world=pts, image=img, camera=cam_a,
        cam_projection=synthetic.camera_projection(cam_a)))
    assert stats["inserted"] == 0
    assert stats["pending_color"] == 1
    assert len(mapper.registry) == 0

    # frame B: camera moved under the cluster, looking straight at it
    cam_b = make_camera(np.eye(3), np.asarray([5.09, 0.0, -1.0]), 64, 48,
                        fovx=1.0, fovy=0.8)
    stats = mapper.add_frame(Frame(
        points_world=np.zeros((0, 3)), image=img, camera=cam_b,
        cam_projection=synthetic.camera_projection(cam_b)))
    assert stats["inserted"] == 16  # the full voxel, no partial drop
    assert stats["pending_color"] == 0
    assert len(mapper.registry) == 1


def test_deferred_colorization_strict_mode_drops(rng):
    """pending_colorize_max_age < 0 restores the exact reference behavior:
    a voxel processed out-of-view is dropped permanently."""
    import dataclasses

    from gslivm_tpu.config import GpParams
    from gslivm_tpu.models.cameras import make_camera
    from gslivm_tpu.pipeline import Frame

    cfg = dataclasses.replace(Config(),
                              gp=GpParams(pending_colorize_max_age=-1))
    mapper = IncrementalMapper(
        config=cfg, settings=RasterizeSettings(backend="naive"),
        initial_capacity=1024)
    pts = _flat_voxel_points([5.0, 0.0, 2.0], rng)
    img = np.full((48, 64, 3), 128, np.uint8)
    cam_a = make_camera(np.eye(3), np.zeros(3), 64, 48, fovx=1.0, fovy=0.8)
    stats = mapper.add_frame(Frame(
        points_world=pts, image=img, camera=cam_a,
        cam_projection=synthetic.camera_projection(cam_a)))
    assert stats["inserted"] == 0
    assert stats["pending_color"] == 0  # dropped, not pooled
    cam_b = make_camera(np.eye(3), np.asarray([5.09, 0.0, -1.0]), 64, 48,
                        fovx=1.0, fovy=0.8)
    stats = mapper.add_frame(Frame(
        points_world=np.zeros((0, 3)), image=img, camera=cam_b,
        cam_projection=synthetic.camera_projection(cam_b)))
    assert stats["inserted"] == 0  # gone forever (reference parity)
