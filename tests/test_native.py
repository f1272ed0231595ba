"""Native C++ voxel map vs numpy implementation equivalence."""

import numpy as np
import pytest

from gslivm_tpu.frontend import native
from gslivm_tpu.frontend.voxelmap import VoxelMap

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="no C++ toolchain")


def _fill(vm, rng, n=2000):
    pts = rng.uniform(-5, 5, (n, 3))
    vm.add_points(pts)
    return pts


def test_insert_and_size_match(rng):
    py = VoxelMap(0.5, 10, 0.1)
    nat = native.NativeVoxelMap(0.5, 10, 0.1)
    pts = rng.uniform(-5, 5, (3000, 3))
    py.add_points(pts)
    nat.add_points(pts)
    assert len(py) == len(nat)


def test_knn_match(rng):
    py = VoxelMap(0.5, 10, 0.05)
    nat = native.NativeVoxelMap(0.5, 10, 0.05)
    pts = rng.uniform(-3, 3, (4000, 3))
    py.add_points(pts)
    nat.add_points(pts)
    for _ in range(20):
        q = rng.uniform(-2.5, 2.5, 3)
        a = py.search_neighbors(q, 1, 12)
        b = nat.search_neighbors(q, 1, 12)
        assert a.shape == b.shape
        da = np.linalg.norm(a - q, axis=1)
        db = np.linalg.norm(b - q, axis=1)
        np.testing.assert_allclose(np.sort(da), np.sort(db), rtol=1e-12)


def test_plane_residuals_match(rng):
    from gslivm_tpu.config import IcpOptions
    from gslivm_tpu.frontend import so3
    from gslivm_tpu.frontend.odometry import build_plane_residuals

    icp = IcpOptions(min_number_neighbors=6, max_number_neighbors=12,
                     size_voxel_map=0.5, max_num_residuals=200)
    # planar scene
    pts = np.stack([rng.uniform(-3, 3, 5000), rng.uniform(-3, 3, 5000),
                    0.02 * rng.normal(size=5000)], axis=1)
    py = VoxelMap(0.5, 10, 0.05)
    nat = native.NativeVoxelMap(0.5, 10, 0.05)
    py.add_points(pts)
    nat.add_points(pts)

    kp = np.stack([rng.uniform(-2, 2, 60), rng.uniform(-2, 2, 60),
                   0.1 * rng.normal(size=60)], axis=1)
    q = so3.so3_to_quat(np.array([0.01, -0.02, 0.03]))
    t = np.array([0.05, -0.02, 0.01])
    last_t = np.array([0.0, 0.0, 1.0])

    res_py = build_plane_residuals(icp, py, kp, q, t, last_t, 1, 1)
    res_nat = build_plane_residuals(icp, nat, kp, q, t, last_t, 1, 1)
    assert res_py.success and res_nat.success
    assert res_py.num == res_nat.num
    # identical residuals and jacobians (up to fp assoc differences)
    np.testing.assert_allclose(res_nat.h, res_py.h, atol=1e-9)
    np.testing.assert_allclose(res_nat.H, res_py.H, atol=1e-9)


def test_native_odometry_runs(rng):
    import sys
    sys.path.insert(0, "tests")
    from test_frontend_odometry import _sample_room, _static_imu
    from gslivm_tpu.config import IcpOptions, OdometryOptions
    from gslivm_tpu.frontend.odometry import Odometry

    od = Odometry(
        OdometryOptions(init_num_frames=2, voxel_size=0.05,
                        sample_voxel_size=0.6, init_voxel_size=0.05,
                        init_sample_voxel_size=0.6),
        IcpOptions(min_number_neighbors=8, max_num_residuals=300,
                   size_voxel_map=0.5, num_iters_icp=6),
        use_native=True)
    od.eskf.try_init(_static_imu(n=80))
    od._last_imu_time = 0.0
    a_w = np.array([0.4, 0.2, 0.0])
    g = np.array([0, 0, 9.81])
    res = None
    for k in range(6):
        tau = k * 0.1
        t_gt = 0.5 * a_w * tau**2
        pts = _sample_room(rng, np.array([1.0, 0, 0, 0]), t_gt)
        res = od.add_sweep(tau, pts)
        for j in range(20):
            od.add_imu(tau + (j + 1) * 0.005, np.zeros(3), a_w + g)
    assert res.success
    assert np.linalg.norm(res.t - t_gt) < 0.02
