"""Sensor sync + full front-end driver tests."""

import numpy as np
import pytest

from gslivm_tpu.config import CommonOptions, Config, IcpOptions, OdometryOptions
from gslivm_tpu.frontend import so3, synthetic
from gslivm_tpu.frontend.livo import LivoFrontend
from gslivm_tpu.frontend.sensors import (
    ImageSample, ImuSample, LidarSweep, MeasurementSync, filter_sweep)


def _sweep(t0, xyz, rel=None):
    n = len(xyz)
    rel = np.linspace(0, 0.09, n) if rel is None else rel
    return LidarSweep(t0, np.asarray(xyz, float), rel, np.zeros(n))


def test_filter_sweep_rules(rng):
    xyz = np.array([[0.05, 0, 0],      # inside blind -> cut
                    [1.0, 0, 0],
                    [200.0, 0, 0],     # beyond det_range -> cut
                    [2.0, 0, 0],
                    [3.0, 0, 0],
                    [4.0, 0, 0]])
    rel = np.array([0.0, 0.05, 0.01, 0.2, 0.03, 0.01])
    out = filter_sweep(_sweep(0.0, xyz, rel),
                       CommonOptions(point_filter_num=1),
                       lidar_type="velodyne", max_rel_time=0.1)
    # blind + det_range + >=0.1s rel-time removed; sorted by time
    assert out.xyz.shape[0] == 3
    assert np.all(np.diff(out.rel_time) >= 0)


def test_filter_sweep_vendor_quirks():
    """Per-vendor normalization differences (cloudProcessing.cpp:119-368):
    livox/ouster keep arrival order and never time-clip; robosense skips
    point_filter_num decimation; decimation indexes RAW positions."""
    xyz = np.tile(np.array([[2.0, 0.0, 0.0]]), (8, 1))
    rel = np.array([0.05, 0.2, 0.01, 0.15, 0.03, 0.02, 0.04, 0.06])
    opts = CommonOptions(point_filter_num=2)
    sweep = _sweep(0.0, xyz, rel)

    livox = filter_sweep(sweep, opts, lidar_type="livox")
    assert livox.xyz.shape[0] == 4  # raw indices 0,2,4,6; no clip
    np.testing.assert_allclose(livox.rel_time, rel[[0, 2, 4, 6]])

    ouster = filter_sweep(sweep, opts, lidar_type="ouster")
    np.testing.assert_allclose(ouster.rel_time, rel[[0, 2, 4, 6]])

    velo = filter_sweep(sweep, opts, lidar_type="velodyne")
    # sort -> [0.01..0.2], clip >= 0.1 leaves 6, decimate raw 0,2,4
    np.testing.assert_allclose(velo.rel_time, [0.01, 0.03, 0.05])

    robo = filter_sweep(sweep, opts, lidar_type="robosense")
    # sort + clip, NO decimation (the reference handler omits it)
    assert robo.xyz.shape[0] == 6
    np.testing.assert_allclose(robo.rel_time,
                               [0.01, 0.02, 0.03, 0.04, 0.05, 0.06])

    pandar = filter_sweep(sweep, opts, lidar_type="pandar")
    np.testing.assert_allclose(pandar.rel_time, [0.01, 0.03, 0.05])


def test_measurement_sync_burst_drains_all(rng):
    """A burst of buffered sweeps/images must drain in ONE get() call — the
    reference's getMeasurements loops until no packet can be formed
    (lioOptimization.cpp:852-958); rationing one packet per push starves
    the pipeline."""
    sync = MeasurementSync(sweep_interval=0.1)
    for i in range(200):
        sync.push_imu(ImuSample(i * 0.01, np.zeros(3), np.array([0, 0, 9.81])))
    for k in range(10):
        pts = rng.normal(0, 1, (30, 3)) + [0, 0, 5]
        sync.push_sweep(_sweep(0.05 + 0.1 * k, pts, np.linspace(0, 0.09, 30)))
    for k in range(8):
        sync.push_image(ImageSample(0.1 + 0.1 * k,
                                    np.zeros((4, 4, 3), np.uint8)))

    out = sync.get()
    assert len(out) == 8  # every ready packet in one call
    assert all(m.rendering for m in out)
    for k, m in enumerate(out):
        assert m.time_image == pytest.approx(0.1 + 0.1 * k)
    assert sync.get() == []  # drained


def test_image_filter_num_decimation():
    """common/image_filter_num gates images at the handler
    (lioOptimization.cpp:788,817): only every Nth enters the sync."""
    cfg = Config(common=CommonOptions(image_filter_num=3))
    fe = LivoFrontend(config=cfg, width=8, height=8, fx=4, fy=4, cx=4, cy=4)
    img = np.zeros((8, 8, 3), np.uint8)
    for i in range(7):
        fe.push_image(float(i), img)
    assert len(fe.sync.images) == 3  # indices 0, 3, 6


def test_measurement_sync_packets(rng):
    sync = MeasurementSync(sweep_interval=0.1)
    # imu at 100 Hz, images at 10 Hz, points continuous
    for i in range(120):
        sync.push_imu(ImuSample(i * 0.01, np.zeros(3), np.array([0, 0, 9.81])))
    for k in range(3):
        pts = rng.normal(0, 1, (50, 3)) + [0, 0, 5]
        sync.push_sweep(_sweep(0.05 + 0.1 * k, pts, np.linspace(0, 0.09, 50)))
    sync.push_image(ImageSample(0.1, np.zeros((4, 4, 3), np.uint8)))
    sync.push_image(ImageSample(0.2, np.zeros((4, 4, 3), np.uint8)))

    all_meas = []
    for _ in range(6):
        all_meas += sync.get()
    assert len(all_meas) >= 2
    m = all_meas[0]
    assert m.rendering and m.image is not None
    assert m.points.shape[0] > 0
    assert len(m.imu) > 2
    # points in a packet end before the image time
    # (rel times measured from their sweep's begin)
    assert m.time_image == pytest.approx(0.1)
    m2 = all_meas[1]
    assert m2.time_image == pytest.approx(0.2)
    assert m2.time_sweep_begin == pytest.approx(0.1)


def test_livo_frontend_end_to_end(rng):
    """Static-then-moving sensor over the synthetic room: the front-end must
    produce posed frames whose trajectory is consistent."""
    planes = synthetic.default_scene()
    cfg = Config(
        odometry=OdometryOptions(init_num_frames=2, voxel_size=0.05,
                                 sample_voxel_size=0.6, init_voxel_size=0.05,
                                 init_sample_voxel_size=0.6),
        icp=IcpOptions(min_number_neighbors=8, max_num_residuals=300,
                       size_voxel_map=0.5, num_iters_icp=6),
    )
    fe = LivoFrontend(config=cfg, fx=100.0, fy=100.0, cx=63.5, cy=47.5,
                      width=128, height=96, sweep_interval=0.1)

    g = np.array([0, 0, 9.81])
    cams = synthetic.make_trajectory(6, 128, 96)

    # 0.4 s static IMU to initialize the ESKF
    t = 0.0
    for i in range(80):
        fe.push_imu(t, np.zeros(3), g + rng.normal(0, 1e-3, 3))
        t += 0.005

    # per "sweep": sample points from the first camera pose (held static —
    # IMU consistency over a moving trajectory is covered in the odometry
    # test; here we exercise the full plumbing incl. images)
    cam = cams[0]
    R_wc = np.asarray(cam.R_cw).T
    center = np.asarray(cam.cam_center)
    for k in range(4):
        pts_w = synthetic.sample_surface_points(cam, planes, 3000, rng)
        pts_sensor = (pts_w - center) @ R_wc  # world -> sensor (imu==camera)
        fe.push_lidar(_sweep(t, pts_sensor, np.linspace(0, 0.09, len(pts_sensor))))
        img = synthetic.render_image(cam, planes)
        for j in range(20):
            fe.push_imu(t + j * 0.005, np.zeros(3), g + rng.normal(0, 1e-3, 3))
        fe.push_image(t + 0.095, img)
        t += 0.1

    frames = fe.pop_frames()
    assert len(frames) >= 2, len(frames)
    q, p = fe.pose
    assert np.linalg.norm(p) < 0.05  # static sensor stays put
    # colored map accumulated and got colors rendered
    assert len(fe.color_map) > 500
    assert (fe.color_map.n_rgb > 0).sum() > 100
    # emitted frames carry valid cameras + points
    f = frames[-1]
    assert f.points_world.shape[1] == 3
    assert f.image.shape == (96, 128, 3)


def _run_small_frontend(cfg, rng, n_sweeps=3, spin=False):
    """Tiny front-end run over the synthetic room; returns the frontend."""
    planes = synthetic.default_scene()
    fe = LivoFrontend(config=cfg, fx=100.0, fy=100.0, cx=63.5, cy=47.5,
                      width=128, height=96, sweep_interval=0.1)
    g = np.array([0, 0, 9.81])
    cams = synthetic.make_trajectory(6, 128, 96)
    t = 0.0
    for i in range(80):
        fe.push_imu(t, np.zeros(3), g + rng.normal(0, 1e-3, 3))
        t += 0.005
    cam = cams[0]
    R_wc = np.asarray(cam.R_cw).T
    center = np.asarray(cam.cam_center)
    gyr = np.array([0.0, 0.0, 0.3]) if spin else np.zeros(3)
    for k in range(n_sweeps):
        pts_w = synthetic.sample_surface_points(cam, planes, 2000, rng)
        pts_sensor = (pts_w - center) @ R_wc
        fe.push_lidar(_sweep(t, pts_sensor,
                             np.linspace(0, 0.09, len(pts_sensor))))
        img = synthetic.render_image(cam, planes)
        for j in range(20):
            fe.push_imu(t + j * 0.005, gyr, g + rng.normal(0, 1e-3, 3))
        fe.push_image(t + 0.095, img)
        t += 0.1
    return fe


def test_motion_compensation_config_dispatch(rng, monkeypatch):
    """OdometryOptions.motion_compensation drives which deskew path runs
    (lioOptimization.cpp:1006-1009): CONSTANT_VELOCITY -> constant slerp,
    IMU -> piecewise IMU-state deskew."""
    import dataclasses

    from gslivm_tpu.frontend import livo as livo_mod

    calls = {"imu": 0, "const": 0}
    real_imu = livo_mod.motion_compensate_imu
    real_const = livo_mod.motion_compensate_constant

    def spy_imu(*a, **k):
        calls["imu"] += 1
        return real_imu(*a, **k)

    def spy_const(*a, **k):
        calls["const"] += 1
        return real_const(*a, **k)

    monkeypatch.setattr(livo_mod, "motion_compensate_imu", spy_imu)
    monkeypatch.setattr(livo_mod, "motion_compensate_constant", spy_const)

    base = Config(odometry=OdometryOptions(init_num_frames=2, voxel_size=0.05,
                                           sample_voxel_size=0.6,
                                           init_voxel_size=0.05,
                                           init_sample_voxel_size=0.6),
                  icp=IcpOptions(min_number_neighbors=8, max_num_residuals=300,
                                 size_voxel_map=0.5, num_iters_icp=6))

    fe = _run_small_frontend(base, rng)
    assert calls == {"imu": 0, "const": calls["const"]} and calls["const"] > 0
    # the IMU state trail is recorded regardless (one entry per IMU sample)
    assert len(fe.odometry.imu_states) >= 2

    calls["imu"] = calls["const"] = 0
    cfg_imu = dataclasses.replace(
        base, odometry=dataclasses.replace(base.odometry,
                                           motion_compensation="IMU"))
    _run_small_frontend(cfg_imu, rng)
    # the FIRST packet has no real IMU timestamp to anchor the state trail
    # yet (begin_sweep_states runs before the packet's IMU samples), so it
    # falls back to constant-velocity once rather than extrapolating from a
    # bogus t0=0 seed (ADVICE r3); every later packet deskews via IMU states
    assert calls["imu"] > 0 and calls["const"] <= 1, calls


def test_vio_photometric_runs_in_live_path(rng, monkeypatch):
    """vioPhotometric runs every rendering frame after vioEsikf
    (imageProcessing.cpp:189-194); its covariance bookkeeping is part of
    reference behavior even with the estimation flags off."""
    from gslivm_tpu.frontend import livo as livo_mod

    calls = {"photo": 0, "esikf": 0}
    real_photo = livo_mod.vio_photometric
    real_esikf = livo_mod.vio_esikf

    def spy_photo(*a, **k):
        calls["photo"] += 1
        return real_photo(*a, **k)

    def spy_esikf(*a, **k):
        calls["esikf"] += 1
        return real_esikf(*a, **k)

    monkeypatch.setattr(livo_mod, "vio_photometric", spy_photo)
    monkeypatch.setattr(livo_mod, "vio_esikf", spy_esikf)

    cfg = Config(odometry=OdometryOptions(init_num_frames=2, voxel_size=0.05,
                                          sample_voxel_size=0.6,
                                          init_voxel_size=0.05,
                                          init_sample_voxel_size=0.6),
                 icp=IcpOptions(min_number_neighbors=8, max_num_residuals=300,
                                size_voxel_map=0.5, num_iters_icp=6))
    fe = _run_small_frontend(cfg, rng, n_sweeps=4)
    assert len(fe.pop_frames()) >= 2
    # the tracker needs a frame to warm up; after that every esikf update is
    # followed by a photometric update
    assert calls["esikf"] >= 1
    assert calls["photo"] == calls["esikf"], calls


def test_imu_deskew_beats_constant_under_acceleration(rng):
    """Spinning UP during the sweep (angular acceleration): the piecewise
    IMU deskew recovers the true point positions; the constant-velocity
    slerp cannot (it assumes a uniform rate). This is what the IMU mode is
    FOR (distortFrameByImu, utility.cpp:246-322)."""
    from gslivm_tpu.frontend.odometry import (
        motion_compensate_constant, motion_compensate_imu)

    # sensor rotates about z with theta(t) = 0.5 * a * t^2 (rate = a*t)
    a = 8.0  # rad/s^2 — aggressive spin-up
    T = 0.1

    def Rz(th):
        c, s = np.cos(th), np.sin(th)
        return np.array([[c, -s, 0], [s, c, 0], [0, 0, 1.0]])

    pts_w = rng.uniform(-2, 2, (200, 3)) + [0, 0, 3.0]
    rel = np.linspace(0.0, T, 200)
    # measured in the (rotating) lidar frame at each point's own time
    pts_l = np.stack([Rz(0.5 * a * t * t).T @ p for t, p in zip(rel, pts_w)])
    truth = np.stack([Rz(0.5 * a * T * T).T @ p for p in pts_w])

    q_of = lambda th: np.array([np.cos(th / 2), 0, 0, np.sin(th / 2)])  # noqa: E731
    q0, q1 = q_of(0.0), q_of(0.5 * a * T * T)
    zero = np.zeros(3)

    # fine IMU state trail (20 segments); un_gyr over [t_i, t_{i+1}] is the
    # mid-point rate a*(t_i + t_{i+1})/2, exactly what Odometry.add_imu logs
    states = [(0.0, q0, zero, zero, zero, zero)]
    ts = np.linspace(0.0, T, 21)
    for t0, t1 in zip(ts[:-1], ts[1:]):
        un_gyr = np.array([0, 0, a * 0.5 * (t0 + t1)])
        states.append((t1, q_of(0.5 * a * t1 * t1), zero, zero, zero, un_gyr))

    out_imu = motion_compensate_imu(pts_l, rel, states, 0.0, q1, zero,
                                    np.eye(3), zero)
    out_const = motion_compensate_constant(pts_l, rel, q0, zero, q1, zero,
                                           np.eye(3), zero, duration_s=T)
    err_imu = np.abs(out_imu - truth).max()
    err_const = np.abs(out_const - truth).max()
    assert err_imu < 0.01, err_imu
    assert err_const > 5 * err_imu, (err_imu, err_const)
