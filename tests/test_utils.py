"""Utils tests: timer dump format, PNG/PCD IO roundtrips, eval harness,
checkpoint/resume."""

import os

import numpy as np

from gslivm_tpu.utils import metrics, outputs
from gslivm_tpu.utils.timer import Timer


def test_timer_dump_format(tmp_path):
    Timer.reset()
    with Timer.evaluate("stage_a", stamp=100.0):
        pass
    with Timer.evaluate("stage_b", stamp=100.5):
        pass
    with Timer.evaluate("stage_a", stamp=101.0):
        pass
    path = str(tmp_path / "log_time.txt")
    Timer.dump_into_file(camera_size=10, duration=2000.0, file_name=path)
    lines = open(path).read().splitlines()
    assert float(lines[0]) == 200.0  # duration / camera_size
    assert "stage_a" in lines[1] and "stage_b" in lines[1]
    # row format "stamp=ms," parses like plot_all_time.py expects
    cell = lines[2].split(",")[0]
    stamp, ms = cell.split("=")
    assert float(stamp) == 100.0 and float(ms) >= 0.0
    assert Timer.summary()["stage_a"]["calls"] == 2
    Timer.reset()


def test_png_roundtrip(tmp_path, rng):
    img = rng.integers(0, 255, (20, 30, 3)).astype(np.uint8)
    p = str(tmp_path / "x.png")
    outputs.save_png(p, img)
    back = metrics.load_png(p)
    np.testing.assert_array_equal(back, img)


def test_pcd_roundtrip(tmp_path, rng):
    pts = rng.normal(size=(50, 3)).astype(np.float32)
    cols = rng.integers(0, 255, (50, 3)).astype(np.uint8)
    p = str(tmp_path / "map.pcd")
    outputs.save_pcd_rgb(p, pts, cols)
    pts2, cols2 = outputs.load_pcd_rgb(p)
    np.testing.assert_allclose(pts2, pts, rtol=1e-6)
    np.testing.assert_array_equal(cols2, cols)


def test_tum_pose_format(tmp_path):
    p = str(tmp_path / "pose.txt")
    outputs.append_tum_pose(p, 123.456, [1, 2, 3], [0.1, 0.2, 0.3, 0.9])
    parts = open(p).read().split()
    assert len(parts) == 8
    assert abs(float(parts[0]) - 123.456) < 1e-6
    assert abs(float(parts[7]) - 0.9) < 1e-9


def test_side_by_side_eval(tmp_path, rng):
    render = rng.uniform(size=(3, 24, 32)).astype(np.float32)
    gt = np.clip(render + rng.normal(0, 0.05, render.shape), 0, 1).astype(np.float32)
    d = tmp_path / "renders"
    d.mkdir()
    outputs.save_side_by_side(str(d / "0.png"), render, gt)
    outputs.save_side_by_side(str(d / "1.png"), render, render)
    res = metrics.evaluate_dir(str(d))
    assert res["count"] == 2
    assert res["mean_psnr"] > 20.0
    # identical pair dominates: second image PSNR is inf-like (clipped by u8)
    m_same = metrics.image_pair_metrics(
        (render.transpose(1, 2, 0) * 255).astype(np.uint8),
        (render.transpose(1, 2, 0) * 255).astype(np.uint8))
    assert m_same["l1"] == 0.0


def test_inverse_depth_l1():
    a = np.full((8, 8), 2.0)
    b = np.full((8, 8), 4.0)
    assert abs(metrics.inverse_depth_l1(a, b) - 0.25) < 1e-6


def test_checkpoint_roundtrip(tmp_path, rng):
    import dataclasses

    from gslivm_tpu.config import Config, GpParams
    from gslivm_tpu.frontend import synthetic
    from gslivm_tpu.ops.rasterize import RasterizeSettings
    from gslivm_tpu.pipeline import IncrementalMapper
    from gslivm_tpu.utils import checkpoint

    cfg = dataclasses.replace(Config(), gp=GpParams(grid=0.5))
    frames = synthetic.make_sequence(n_frames=2, width=48, height=36,
                                     points_per_frame=3000)
    mapper = IncrementalMapper(config=cfg,
                               settings=RasterizeSettings(backend="naive"),
                               bootstrap_points=100, initial_capacity=4096)
    for fr in frames:
        mapper.add_frame(fr)
    mapper.train_iteration()

    path = str(tmp_path / "ckpt")
    checkpoint.save_mapper(mapper, path)

    mapper2 = IncrementalMapper(config=cfg,
                                settings=RasterizeSettings(backend="naive"),
                                bootstrap_points=100, initial_capacity=4096)
    checkpoint.load_mapper(mapper2, path)
    assert int(mapper2.params.n_active) == int(mapper.params.n_active)
    np.testing.assert_array_equal(np.asarray(mapper2.params.xyz),
                                  np.asarray(mapper.params.xyz))
    assert len(mapper2.cameras) == len(mapper.cameras)
    assert mapper2.gpmap.stats() == mapper.gpmap.stats()
    # the deferred-colorization pool survives resume (dropping it would
    # reintroduce the permanent-hole failure it exists to fix)
    assert set(mapper2._pending_color) == set(mapper._pending_color)
    assert mapper2.registry._ranges == mapper.registry._ranges
    # resumed mapper can continue training + ingesting
    m = mapper2.train_iteration()
    assert m is not None and np.isfinite(float(m.loss))


def test_yaml_config_layering():
    from gslivm_tpu.config import load_config, load_yaml
    common = load_yaml("configs/basic_common.yaml")
    dataset = load_yaml("configs/synthetic_room.yaml")
    cfg = load_config(dataset_overrides=dataset, common_overrides=common)
    # common defaults preserved
    assert cfg.gs.scale_factor == 3.0
    assert cfg.icp.max_dist_to_plane_icp == 0.5
    # dataset layer wins
    assert cfg.gp.grid == 0.5
    assert cfg.odometry.init_num_frames == 2
    assert cfg.icp.num_iters_icp == 6


def test_parse_log_time_roundtrip(tmp_path):
    from gslivm_tpu.utils.metrics import parse_log_time
    Timer.reset()
    with Timer.evaluate("a", stamp=1.0):
        pass
    with Timer.evaluate("b", stamp=2.0):
        pass
    p = str(tmp_path / "log_time.txt")
    Timer.dump_into_file(4, 400.0, p)
    parsed = parse_log_time(p)
    assert parsed["realtime_ms"] == 100.0
    assert set(parsed["sections"]) == {"a", "b"}
    assert parsed["sections"]["a"][0][0] == 1.0
    Timer.reset()


def test_debug_dump_compare(tmp_path, rng):
    from gslivm_tpu.utils import debug
    a = rng.normal(size=(8, 3)).astype(np.float32)
    pa, pb = str(tmp_path / "a.npy"), str(tmp_path / "b.npy")
    debug.save_tensor(pa, a)
    debug.save_tensor(pb, a + 1e-7)
    rep = debug.compare_dumps(pa, pb)
    assert rep["match"] and rep["max_abs"] < 1e-6
    debug.save_tensor(pb, a + 1.0)
    assert not debug.compare_dumps(pa, pb)["match"]


def test_trajectory_ate(tmp_path, rng):
    from gslivm_tpu.utils import outputs, trajectory
    # ground truth + an estimate in a rotated/shifted frame with noise
    n = 40
    t = np.arange(n) * 0.1
    gt = np.stack([np.sin(t), np.cos(t), 0.1 * t], axis=1)
    ang = 0.7
    R = np.array([[np.cos(ang), -np.sin(ang), 0],
                  [np.sin(ang), np.cos(ang), 0], [0, 0, 1]])
    est = gt @ R.T + np.array([5.0, -2.0, 1.0]) + rng.normal(0, 0.005, (n, 3))
    pe, pg = str(tmp_path / "est.txt"), str(tmp_path / "gt.txt")
    for i in range(n):
        outputs.append_tum_pose(pe, t[i], est[i], [0, 0, 0, 1])
        outputs.append_tum_pose(pg, t[i], gt[i], [0, 0, 0, 1])
    rep = trajectory.evaluate_tum_files(pe, pg)
    assert rep["matched"] == n
    assert rep["ate_rmse"] < 0.02  # alignment removes the frame offset
    assert rep["rpe_rmse"] < 0.5
