"""Front-end tests: SO3/S2 math, ESKF behavior, voxel map, plane-ICP
odometry tracking a synthetic trajectory."""

import numpy as np
import pytest

from gslivm_tpu.config import IcpOptions, OdometryOptions
from gslivm_tpu.frontend import so3
from gslivm_tpu.frontend.eskf import Eskf
from gslivm_tpu.frontend.odometry import Odometry, compute_neighborhood
from gslivm_tpu.frontend.voxelmap import VoxelMap, grid_sample


# ---------------------------------------------------------------- so3 ----

def test_so3_roundtrips(rng):
    for _ in range(10):
        w = rng.normal(0, 0.5, 3)
        R = so3.so3_to_rot(w)
        np.testing.assert_allclose(so3.rot_to_so3(R), w, atol=1e-9)
        q = so3.so3_to_quat(w)
        np.testing.assert_allclose(so3.quat_to_rot(q), R, atol=1e-9)
        np.testing.assert_allclose(so3.quat_to_so3(q), w, atol=1e-9)


def test_so3_small_angle():
    w = np.array([1e-9, 0, 0])
    np.testing.assert_allclose(so3.so3_to_rot(w), np.eye(3), atol=1e-8)
    q = so3.so3_to_quat(w)
    assert abs(np.linalg.norm(q) - 1) < 1e-12


def test_derivative_s2_tangency():
    g = np.array([0.1, -0.2, 9.7])
    B = so3.derivative_s2(g)
    gn = g / np.linalg.norm(g)
    # columns are tangent to the sphere at g
    np.testing.assert_allclose(B.T @ gn, 0.0, atol=1e-12)


def test_quat_slerp_endpoints():
    q0 = so3.so3_to_quat(np.array([0.0, 0, 0]))
    q1 = so3.so3_to_quat(np.array([0.0, 0.4, 0]))
    np.testing.assert_allclose(so3.quat_slerp(q0, q1, 0.0), q0, atol=1e-12)
    np.testing.assert_allclose(so3.quat_slerp(q0, q1, 1.0), q1, atol=1e-12)
    qm = so3.quat_slerp(q0, q1, 0.5)
    np.testing.assert_allclose(so3.quat_to_so3(qm), [0, 0.2, 0], atol=1e-9)


# --------------------------------------------------------------- eskf ----

def _static_imu(n=60, dt=0.005, g=9.81, rng=None):
    meas = []
    for i in range(n):
        gyr = np.zeros(3) if rng is None else rng.normal(0, 1e-4, 3)
        acc = np.array([0, 0, g]) if rng is None else np.array([0, 0, g]) + rng.normal(0, 1e-3, 3)
        meas.append((i * dt, gyr, acc))
    return meas


def test_eskf_static_init(rng):
    f = Eskf()
    # too few samples / too little time -> stays uninitialized
    assert not f.try_init(_static_imu(n=10, rng=rng))
    f2 = Eskf()
    meas = _static_imu(n=80, rng=rng)
    ok = f2.try_init(meas)
    assert ok and f2.initial_flag
    np.testing.assert_allclose(f2.g, [0, 0, 9.81], atol=0.01)
    np.testing.assert_allclose(f2.bg, 0.0, atol=1e-3)


def test_eskf_predict_at_rest(rng):
    f = Eskf()
    f.try_init(_static_imu(n=80, rng=rng))
    for i in range(100):
        f.predict(0.005, np.array([0, 0, 9.81]), np.zeros(3))
    # gravity cancels: no drift beyond noise-induced epsilon
    assert np.linalg.norm(f.p) < 1e-2
    assert np.linalg.norm(f.v) < 1e-2


def test_eskf_predict_acceleration():
    f = Eskf()
    f.try_init(_static_imu(n=80))
    # 1 m/s^2 forward for 1 s -> v ~ 1, p ~ 0.5
    for _ in range(200):
        f.predict(0.005, np.array([1.0, 0, 9.81]), np.zeros(3))
    np.testing.assert_allclose(f.v, [1.0, 0, 0], atol=0.02)
    np.testing.assert_allclose(f.p, [0.5, 0, 0], atol=0.02)


def test_eskf_observe_pose():
    f = Eskf()
    f.try_init(_static_imu(n=80))
    f.covariance = np.eye(17)
    target_q = so3.so3_to_quat(np.array([0, 0, 0.1]))
    for _ in range(10):
        f.observe_pose(np.array([1.0, 2.0, 3.0]), target_q, 1e-4, 1e-4)
    np.testing.assert_allclose(f.p, [1, 2, 3], atol=1e-3)
    np.testing.assert_allclose(so3.quat_to_so3(f.q), [0, 0, 0.1], atol=1e-3)


# ----------------------------------------------------------- voxel map ----

def test_voxelmap_insert_rules():
    vm = VoxelMap(voxel_size=1.0, max_points=3, min_distance=0.2)
    vm.add_points(np.array([[0.5, 0.5, 0.5]]))
    vm.add_points(np.array([[0.55, 0.5, 0.5]]))  # too close -> rejected
    assert len(vm) == 1
    vm.add_points(np.array([[0.9, 0.5, 0.5], [0.1, 0.1, 0.1], [0.9, 0.9, 0.9]]))
    assert len(vm) == 3  # capacity 3 caps the voxel
    nb = vm.search_neighbors(np.array([0.5, 0.5, 0.5]), 1, 10)
    assert nb.shape[0] == 3
    np.testing.assert_allclose(nb[0], [0.5, 0.5, 0.5])


def test_grid_sample_keeps_one_per_voxel(rng):
    pts = rng.uniform(0, 4, (500, 3))
    idx = grid_sample(pts, 1.0)
    keys = np.trunc(pts[idx] / 1.0).astype(int)
    assert len(np.unique(keys, axis=0)) == len(idx)


def test_neighborhood_plane(rng):
    pts = np.stack([rng.uniform(0, 1, 50), rng.uniform(0, 1, 50),
                    np.full(50, 0.3)], axis=1)
    nb = compute_neighborhood(pts)
    np.testing.assert_allclose(np.abs(nb.normal), [0, 0, 1], atol=1e-6)
    assert nb.a2D > 0.9


# ------------------------------------------------------------ odometry ----

def _sample_room(rng, q_wxyz, t, n=3000):
    """LiDAR points in sensor frame from 3 orthogonal planes."""
    R = so3.quat_to_rot(q_wxyz)
    pts_w = []
    # floor z=-1, wall x=4, wall y=4 patches around the sensor
    pts_w.append(np.stack([rng.uniform(-2, 4, n), rng.uniform(-2, 4, n),
                           np.full(n, -1.0)], axis=1))
    pts_w.append(np.stack([np.full(n, 4.0), rng.uniform(-2, 4, n),
                           rng.uniform(-1, 2, n)], axis=1))
    pts_w.append(np.stack([rng.uniform(-2, 4, n), np.full(n, 4.0),
                           rng.uniform(-1, 2, n)], axis=1))
    pts_w = np.concatenate(pts_w)
    noise = rng.normal(0, 0.002, pts_w.shape)
    return (pts_w + noise - t) @ R  # world -> sensor


def test_odometry_tracks_accelerating_trajectory(rng):
    """Full LIO loop: IMU predicts an accelerating motion, plane-ICP
    corrects the drift against the voxel map."""
    icp = IcpOptions(min_number_neighbors=8, max_num_residuals=300,
                     size_voxel_map=0.5, num_iters_icp=6)
    odom_opts = OdometryOptions(init_num_frames=2, voxel_size=0.05,
                                sample_voxel_size=0.6, init_voxel_size=0.05,
                                init_sample_voxel_size=0.6)
    od = Odometry(odom=odom_opts, icp=icp)
    od.eskf.try_init(_static_imu(n=80))
    od._last_imu_time = 0.0

    a_w = np.array([0.4, 0.2, 0.0])  # constant world acceleration
    g = np.array([0, 0, 9.81])
    imu_dt = 0.005
    sweep_dt = 0.1

    errs = []
    res = None
    for k in range(8):
        tau = k * sweep_dt
        t_gt = 0.5 * a_w * tau**2
        q_gt = np.array([1.0, 0, 0, 0])
        pts = _sample_room(rng, q_gt, t_gt)
        res = od.add_sweep(tau, pts)
        errs.append(np.linalg.norm(res.t - t_gt))
        # IMU between sweeps: specific force = a_w + g (identity attitude)
        for j in range(int(sweep_dt / imu_dt)):
            t_imu = tau + (j + 1) * imu_dt
            od.add_imu(t_imu, np.zeros(3), a_w + g
                       + rng.normal(0, 1e-3, 3))
    assert res.success
    assert errs[-1] < 0.02, errs
    dq = so3.quat_mul(so3.quat_conj(res.q_wxyz), q_gt)
    assert np.degrees(np.linalg.norm(so3.quat_to_so3(dq))) < 1.0
    # velocity estimate approaches a_w * t
    v_expected = a_w * (7 * sweep_dt)
    assert np.linalg.norm(od.eskf.v - v_expected) < 0.1


def test_motion_compensate_imu_matches_constant_for_const_velocity(rng):
    """With constant velocity and zero rotation, piecewise-IMU deskewing
    must agree with the constant-velocity slerp path."""
    from gslivm_tpu.frontend.odometry import (
        motion_compensate_constant, motion_compensate_imu)

    pts = rng.uniform(-1, 1, (50, 3))
    rel = np.sort(rng.uniform(0, 0.1, 50))
    v = np.array([1.0, 0.5, 0.0])
    q_id = np.array([1.0, 0, 0, 0])
    t0 = np.zeros(3)
    t1 = v * 0.1

    out_const = motion_compensate_constant(pts, rel, q_id, t0, q_id, t1,
                                           np.eye(3), np.zeros(3),
                                           duration_s=0.1)
    # IMU states every 0.02 s with exact velocity, no rotation/accel
    states = []
    for k in range(7):
        tk = k * 0.02
        states.append((tk, q_id, v * tk, v, np.zeros(3), np.zeros(3)))
    out_imu = motion_compensate_imu(pts, rel, states, 0.0, q_id, t1,
                                    np.eye(3), np.zeros(3))
    np.testing.assert_allclose(out_imu, out_const, atol=1e-9)
