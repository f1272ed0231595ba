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
