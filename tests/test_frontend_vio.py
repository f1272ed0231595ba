"""VIO tests: Bayesian color fusion, projection selection, LK tracking,
td estimation."""

import numpy as np
import pytest

from gslivm_tpu.config import MapOptions
from gslivm_tpu.frontend import vio


def test_color_map_add_rules():
    cmap = vio.ColorPointMap(MapOptions(size_voxel_map=1.0,
                                        max_num_points_in_voxel=2,
                                        min_distance_points=0.1))
    n = cmap.add_points(np.array([[0.5, 0.5, 0.5],
                                  [0.51, 0.5, 0.5],   # same dedup cell
                                  [0.8, 0.5, 0.5],
                                  [0.2, 0.2, 0.2]]))  # voxel full
    assert n == 2
    assert len(cmap.recent_voxels) == 1


def test_update_rgb_bayes_math():
    """Hand-check the recursive fusion (cloudMap.cpp:53-93)."""
    cmap = vio.ColorPointMap()
    cmap.add_points(np.array([[1.0, 1.0, 1.0]]))
    idx = np.array([0])
    # first observation: rounded color, sigma = 15
    cmap.update_rgb(idx, np.array([[100.4, 50.0, 25.0]]), np.array([2.0]), 1.0)
    np.testing.assert_allclose(cmap.rgb[0], [100, 50, 25])
    np.testing.assert_allclose(cmap.cov_rgb[0], 15.0)
    assert cmap.n_rgb[0] == 1
    # second observation at same distance: hand-computed fusion
    cmap.update_rgb(idx, np.array([[110.0, 50.0, 25.0]]), np.array([2.0]), 2.0)
    sigma = 15.0 + 0.1 * 1.0
    new_sigma = np.sqrt(1 / (1 / sigma**2 + 1 / 15.0**2))
    expected_r = new_sigma**2 * (100 / sigma**2 + 110 / 15.0**2)
    np.testing.assert_allclose(cmap.rgb[0, 0], expected_r, rtol=1e-12)
    assert cmap.n_rgb[0] == 2
    # far observation (>1.2x) rejected
    before = cmap.rgb[0].copy()
    cmap.update_rgb(idx, np.array([[0.0, 0.0, 0.0]]), np.array([3.0]), 3.0)
    np.testing.assert_array_equal(cmap.rgb[0], before)


def test_render_recent_and_selection(rng):
    cmap = vio.ColorPointMap(MapOptions(size_voxel_map=0.5))
    pts = np.stack([rng.uniform(-1, 1, 200), rng.uniform(-0.7, 0.7, 200),
                    rng.uniform(3, 5, 200)], axis=1)
    cmap.add_points(pts)
    img = np.full((120, 160, 3), 128, np.uint8)
    K = np.array([[100.0, 0, 79.5], [0, 100.0, 59.5], [0, 0, 1]])
    n = cmap.render_recent(img, np.eye(3), np.zeros(3), K, np.zeros(3), 1.0)
    assert (cmap.n_rgb > 0).sum() > 100
    sel, uv = cmap.select_points_for_projection(np.eye(3), np.zeros(3), K,
                                                160, 120, min_dist=20.0)
    assert sel.size > 5
    # spread: no two selected closer than ~one grid cell apart in the SAME cell
    assert uv[:, 0].max() < 160 and uv[:, 1].max() < 120


def test_lk_tracking_shift(rng):
    """A translating random-dot image: LK must follow the shift."""
    base = (rng.uniform(0, 255, (120, 160)) > 200).astype(np.uint8) * 255
    import cv2
    base = cv2.GaussianBlur(base, (5, 5), 1.0)
    cmap = vio.ColorPointMap()
    pts = np.stack([rng.uniform(-0.5, 0.5, 50), rng.uniform(-0.4, 0.4, 50),
                    np.full(50, 4.0)], axis=1)
    cmap.add_points(pts)

    tracker = vio.OpticalFlowTracker()
    uv0 = np.stack([rng.uniform(30, 130, 30), rng.uniform(30, 90, 30)],
                   axis=1).astype(np.float32)
    tracker.top_up(np.arange(30), uv0, min_sep=0.0)
    assert tracker.track(base, 0.0, cmap) in (True, False)  # primes prev

    shifted = np.roll(base, (3, 5), axis=(0, 1))
    ok = tracker.track(shifted, 0.1, cmap)
    assert ok
    moved = tracker.track_uv - uv0[:len(tracker.track_uv)]
    # median flow ~ (5, 3) pixels
    med = np.median(moved, axis=0)
    np.testing.assert_allclose(med, [5, 3], atol=1.0)


def test_vio_esikf_recovers_td(rng):
    """Tracks displaced by vel * td_true -> the esikf estimates td."""
    cmap = vio.ColorPointMap()
    pts = np.stack([rng.uniform(-1, 1, 40), rng.uniform(-1, 1, 40),
                    rng.uniform(3, 6, 40)], axis=1)
    cmap.add_points(pts)
    idx = np.arange(40)
    vel = rng.uniform(-80, 80, (40, 2))
    cmap.image_velocity[idx] = vel

    st = vio.VioState(fx=120.0, fy=120.0, cx=80.0, cy=60.0,
                      covariance=np.eye(11) * 1.0)
    td_true = 0.02
    p_cam = pts  # identity pose
    proj = np.stack([120 * p_cam[:, 0] / p_cam[:, 2] + 80,
                     120 * p_cam[:, 1] / p_cam[:, 2] + 60], axis=1)
    track_uv = proj + td_true * vel  # measured pixels include the delay

    st = vio.vio_esikf_td(st, cmap, idx, track_uv, np.eye(3), np.zeros(3),
                          number_new_voxels=100, num_iterations=5)
    assert abs(st.time_td - td_true) < 0.005, st.time_td


def test_vio_photometric_recovers_extrinsic_shift(rng):
    """With estimate_extrinsic=True, a small t_ic offset is corrected
    against a color-gradient image; with False (reference live config) the
    update is inert."""
    cmap = vio.ColorPointMap()
    n = 60
    pts = np.stack([rng.uniform(-1, 1, n), rng.uniform(-0.7, 0.7, n),
                    np.full(n, 4.0)], axis=1)
    cmap.add_points(pts)
    idx = np.arange(n)

    # steep color ramps (float image, deliberately beyond u8 range) so the
    # residuals stay above the reference's acc/n < 10 early-break and the
    # update iterates to convergence
    W, H = 160, 120
    img = np.zeros((H, W, 3))
    img[:, :, 0] = np.linspace(0, 2550, W)[None, :]
    img[:, :, 1] = np.linspace(0, 2550, H)[:, None]

    st = vio.VioState(fx=100.0, fy=100.0, cx=79.5, cy=59.5,
                      covariance=np.eye(11) * 10.0)
    # ground-truth colors = image colors at the TRUE (identity) extrinsic
    p_cam = pts
    u = 100 * p_cam[:, 0] / p_cam[:, 2] + 79.5
    v = 100 * p_cam[:, 1] / p_cam[:, 2] + 59.5
    cmap.rgb[idx] = vio._bilinear(img, u, v)
    cmap.cov_rgb[idx] = 5.0
    cmap.n_rgb[idx] = 5

    # perturb the extrinsic translation
    st.t_ic = np.array([0.02, -0.015, 0.0])
    err0 = np.linalg.norm(st.t_ic)
    st, acc = vio.vio_photometric(st, cmap, idx, img, np.eye(3), np.zeros(3),
                                  number_new_voxels=200, num_iterations=8,
                                  estimate_extrinsic=True)
    err1 = np.linalg.norm(st.t_ic[:2])  # t_z unobservable from ramps
    assert err1 < err0 * 0.5, (err0, err1)

    # inert mode: state unchanged (reference live-config parity)
    st2 = vio.VioState(fx=100.0, fy=100.0, cx=79.5, cy=59.5)
    st2.t_ic = np.array([0.02, -0.015, 0.0])
    before = st2.t_ic.copy()
    st2, _ = vio.vio_photometric(st2, cmap, idx, img, np.eye(3), np.zeros(3),
                                 number_new_voxels=200,
                                 estimate_extrinsic=False)
    np.testing.assert_allclose(st2.t_ic, before)


def test_vio_esikf_flags_off_matches_td_only(rng):
    """With both estimation flags off, the full-Jacobian vio_esikf must
    reproduce the td-only path exactly: extrinsics/intrinsics untouched, td
    identical (imageProcessing.cpp's live config, flags hardcoded false)."""
    cmap = vio.ColorPointMap()
    pts = np.stack([rng.uniform(-1, 1, 40), rng.uniform(-1, 1, 40),
                    rng.uniform(3, 6, 40)], axis=1)
    cmap.add_points(pts)
    idx = np.arange(40)
    vel = rng.uniform(-80, 80, (40, 2))
    cmap.image_velocity[idx] = vel
    proj = np.stack([120 * pts[:, 0] / pts[:, 2] + 80,
                     120 * pts[:, 1] / pts[:, 2] + 60], axis=1)
    track_uv = proj + 0.02 * vel

    st_a = vio.VioState(fx=120.0, fy=120.0, cx=80.0, cy=60.0,
                        covariance=np.eye(11) * 1.0)
    st_a = vio.vio_esikf_td(st_a, cmap, idx, track_uv, np.eye(3),
                            np.zeros(3), number_new_voxels=100,
                            num_iterations=3)
    st_b = vio.VioState(fx=120.0, fy=120.0, cx=80.0, cy=60.0,
                        covariance=np.eye(11) * 1.0)
    st_b = vio.vio_esikf(st_b, cmap, idx, track_uv, np.eye(3), np.zeros(3),
                         number_new_voxels=100, num_iterations=3)
    assert st_b.time_td == pytest.approx(st_a.time_td, abs=1e-12)
    np.testing.assert_allclose(st_b.R_ic, np.eye(3), atol=0)  # untouched
    np.testing.assert_allclose(st_b.t_ic, np.zeros(3), atol=0)
    assert (st_b.fx, st_b.fy, st_b.cx, st_b.cy) == (120.0, 120.0, 80.0, 60.0)
    np.testing.assert_allclose(st_b.covariance, st_a.covariance, atol=1e-12)


def test_vio_esikf_recovers_extrinsic_rotation(rng):
    """estimate_extrinsic=True: a known R_ic perturbation is recovered from
    exact reprojection residuals (the gated capability of
    imageProcessing.cpp:381-383 made live)."""
    from gslivm_tpu.frontend import so3

    cmap = vio.ColorPointMap()
    n = 80
    pts = np.stack([rng.uniform(-2, 2, n), rng.uniform(-1.5, 1.5, n),
                    rng.uniform(3, 8, n)], axis=1)
    cmap.add_points(pts)
    idx = np.arange(n)
    # zero image velocity: td column is inert; rotation must do the work
    R_true = so3.so3_to_rot(np.array([0.02, -0.015, 0.01]))
    # measurements generated with the TRUE extrinsic (R_wi = I, t = 0)
    R_cw = R_true.T
    p_cam = pts @ R_cw.T
    uv = np.stack([150 * p_cam[:, 0] / p_cam[:, 2] + 80,
                   150 * p_cam[:, 1] / p_cam[:, 2] + 60], axis=1)

    st = vio.VioState(fx=150.0, fy=150.0, cx=80.0, cy=60.0,
                      covariance=np.eye(11) * 10.0)  # weak prior
    err0 = np.linalg.norm(so3.rot_to_so3(st.R_ic.T @ R_true))
    for _ in range(25):
        st = vio.vio_esikf(st, cmap, idx, uv, np.eye(3), np.zeros(3),
                           number_new_voxels=100, num_iterations=3,
                           estimate_extrinsic=True)
    err = np.linalg.norm(so3.rot_to_so3(st.R_ic.T @ R_true))
    assert err < err0 / 10, (err0, err)


def test_vio_esikf_recovers_intrinsic(rng):
    """estimate_intrinsic=True: a focal-length error is recovered
    (imageProcessing.cpp:386-388 made live)."""
    cmap = vio.ColorPointMap()
    n = 80
    pts = np.stack([rng.uniform(-2, 2, n), rng.uniform(-1.5, 1.5, n),
                    rng.uniform(3, 8, n)], axis=1)
    cmap.add_points(pts)
    idx = np.arange(n)
    fx_true, fy_true = 160.0, 155.0
    uv = np.stack([fx_true * pts[:, 0] / pts[:, 2] + 80,
                   fy_true * pts[:, 1] / pts[:, 2] + 60], axis=1)

    st = vio.VioState(fx=150.0, fy=150.0, cx=80.0, cy=60.0,
                      covariance=np.eye(11) * 10.0)
    for _ in range(25):
        st = vio.vio_esikf(st, cmap, idx, uv, np.eye(3), np.zeros(3),
                           number_new_voxels=100, num_iterations=3,
                           estimate_intrinsic=True)
    assert abs(st.fx - fx_true) < 1.0, st.fx
    assert abs(st.fy - fy_true) < 1.0, st.fy
