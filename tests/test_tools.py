"""Offline tooling tests (gslivm_tpu.tools — python/ script parity)."""

import json
import os
import struct

import numpy as np
import pytest

from gslivm_tpu.tools import calib, memlog, nerf_export, sbs_video
from gslivm_tpu.utils.outputs import append_tum_pose, save_png

from test_rosbag import (_conn_record, _msg_record, _stamp_header,
                         _write_bag)


# ---------------------------------------------------------------------------
# calib
# ---------------------------------------------------------------------------


def test_compose_tic_roundtrip(rng):
    ang = rng.normal(size=3)
    c, s = np.cos(ang[0]), np.sin(ang[0])
    R = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]])
    til = calib.se3(R, rng.normal(size=3))
    tcl = calib.se3(np.eye(3), rng.normal(size=3))
    tic = calib.compose_tic(til, tcl)
    # T_ic @ T_cl == T_il by definition
    np.testing.assert_allclose(tic @ tcl, til, atol=1e-12)


def test_inv_se3_matches_general_inverse(rng):
    q = rng.normal(size=4)
    q /= np.linalg.norm(q)
    x, y, z, w = q
    R = nerf_export._quat_xyzw_to_R(np.array([x, y, z, w]))
    T = calib.se3(R, rng.normal(size=3))
    np.testing.assert_allclose(calib.inv_se3(T), np.linalg.inv(T), atol=1e-10)


def test_matrix_report():
    rep = calib.matrix_report(np.diag([2.0, 4.0]))
    assert rep["det"] == pytest.approx(8.0)
    np.testing.assert_allclose(rep["inv"], np.diag([0.5, 0.25]))


# ---------------------------------------------------------------------------
# trajectory / timing plots
# ---------------------------------------------------------------------------


def _write_tum(path, n=20):
    for i in range(n):
        append_tum_pose(path, 100.0 + i * 0.1,
                        [np.sin(i * 0.3), np.cos(i * 0.3), 0.05 * i],
                        [0, 0, 0, 1])


def test_traj_plot(tmp_path):
    tum = tmp_path / "pose.txt"
    _write_tum(str(tum))
    from gslivm_tpu.tools.traj_plot import plot_trajectory

    written = plot_trajectory(str(tum), str(tmp_path / "plots"))
    assert len(written) == 2
    assert all(os.path.getsize(p) > 1000 for p in written)


def test_time_plot(tmp_path):
    log = tmp_path / "log_time.txt"
    log.write_text(
        "33.3\n"
        "stageA, stageB,\n"
        "100.0=5.0, 100.0=2.0,\n"
        "100.1=6.0, 100.1=1.5,\n"
    )
    mem = tmp_path / "mem.csv"
    mem.write_text("100.0,512.0\n100.1,600.0\n")
    from gslivm_tpu.tools.time_plot import plot_log_time

    out = plot_log_time(str(log), str(tmp_path / "t.png"), str(mem))
    assert os.path.getsize(out) > 1000


# ---------------------------------------------------------------------------
# bag export
# ---------------------------------------------------------------------------


def _pose_stamped_msg(t, pos, quat_xyzw):
    return _stamp_header(t) + struct.pack("<7d", *pos, *quat_xyzw)


def _odometry_msg(t, pos, quat_xyzw):
    child = b"base"
    return (_stamp_header(t) + struct.pack("<I", len(child)) + child
            + struct.pack("<7d", *pos, *quat_xyzw)
            + struct.pack("<36d", *([0.0] * 36)))


def test_extract_poses(tmp_path):
    recs = [_conn_record(0, "/gt_poses", "geometry_msgs/PoseStamped"),
            _conn_record(1, "/Odometry", "nav_msgs/Odometry")]
    for i in range(3):
        recs.append(_msg_record(0, 10.0 + i,
                                _pose_stamped_msg(10.0 + i, [i, 0, 1],
                                                  [0, 0, 0, 1])))
        recs.append(_msg_record(1, 10.0 + i,
                                _odometry_msg(10.0 + i, [0, i, 2],
                                              [0, 0, 0, 1])))
    bag = tmp_path / "t.bag"
    _write_bag(str(bag), recs)

    from gslivm_tpu.tools.bag_export import extract_poses

    out = tmp_path / "gt.txt"
    assert extract_poses(str(bag), "/gt_poses", str(out)) == 3
    data = np.loadtxt(out).reshape(-1, 8)
    np.testing.assert_allclose(data[:, 1], [0, 1, 2], atol=1e-9)

    out2 = tmp_path / "odom.txt"
    assert extract_poses(str(bag), "/Odometry", str(out2)) == 3
    data2 = np.loadtxt(out2).reshape(-1, 8)
    np.testing.assert_allclose(data2[:, 2], [0, 1, 2], atol=1e-9)
    np.testing.assert_allclose(data2[:, 3], 2.0)


def test_extract_images(tmp_path, rng):
    from test_rosbag import _image_msg

    img = (rng.random((8, 6, 3)) * 255).astype(np.uint8)
    recs = [_conn_record(0, "/cam", "sensor_msgs/Image"),
            _msg_record(0, 5.0, _image_msg(img, t=5.0))]
    bag = tmp_path / "t.bag"
    _write_bag(str(bag), recs)

    from gslivm_tpu.tools.bag_export import extract_images

    outdir = tmp_path / "rgb"
    n = extract_images(str(bag), "/cam", str(outdir),
                       index_path=str(tmp_path / "rgb.txt"))
    assert n == 1
    pngs = list(outdir.glob("*.png"))
    assert len(pngs) == 1
    assert "rgb/" in (tmp_path / "rgb.txt").read_text()


# ---------------------------------------------------------------------------
# nerf export / sbs video / memlog
# ---------------------------------------------------------------------------


def test_nerf_export(tmp_path):
    tum = tmp_path / "pose.txt"
    _write_tum(str(tum), n=5)
    out = tmp_path / "transforms.json"
    store = nerf_export.export_transforms(
        str(tum), str(out), fx=430, fy=430, cx=320, cy=260,
        width=640, height=512)
    assert len(store["frames"]) == 5
    loaded = json.loads(out.read_text())
    assert loaded["fl_x"] == 430
    T = np.asarray(loaded["frames"][2]["transform_matrix"])
    assert T.shape == (4, 4) and T[3, 3] == 1.0


def test_sbs_video(tmp_path, rng):
    da, db = tmp_path / "a", tmp_path / "b"
    da.mkdir()
    db.mkdir()
    for i in range(3):
        img = (rng.random((16, 16, 3)) * 255).astype(np.uint8)
        save_png(str(da / f"{i}.png"), img)
        save_png(str(db / f"{i}.png"), img)
    out = tmp_path / "v.mp4"
    n = sbs_video.make_video(str(da), str(db), str(out), offset=1)
    assert n == 2
    assert out.exists() and out.stat().st_size > 0


def test_memlog(tmp_path):
    log = memlog.MemoryLogger(str(tmp_path / "mem.csv"))
    log.sample(stamp=1.0)
    log.sample(stamp=2.0)
    rows = (tmp_path / "mem.csv").read_text().strip().splitlines()
    assert len(rows) == 2 and rows[0].startswith("1.0")


def test_evaluate_dirs(tmp_path, rng):
    from gslivm_tpu.utils.metrics import evaluate_dirs

    rd, gd = tmp_path / "r", tmp_path / "g"
    rd.mkdir()
    gd.mkdir()
    for i in range(2):
        img = (rng.random((32, 32, 3)) * 255).astype(np.uint8)
        save_png(str(rd / f"{i}.png"), img)
        save_png(str(gd / f"{i}.png"), img)
    out = evaluate_dirs(str(rd), str(gd))
    assert out["count"] == 2
    assert out["mean_psnr"] > 50
    assert out["mean_l1"] < 1e-6


def test_lpips_required_fails_loudly(tmp_path, rng):
    """--lpips contract: when the optional `lpips` package (or its
    pretrained weights) is unavailable, asking for the metric must RAISE
    with a clear message — never silently report null (VERDICT r4 #8)."""
    from gslivm_tpu.utils import metrics

    a = rng.random((3, 16, 16)).astype(np.float32)
    if metrics.lpips_pair(a, a) is None:  # backend absent in this env
        with pytest.raises(RuntimeError, match="LPIPS is unsupported"):
            metrics.lpips_pair(a, a, required=True)
    else:  # backend present: required must succeed and agree
        assert metrics.lpips_pair(a, a, required=True) is not None


def test_watchdog_stall_detection():
    """heartHandler analog (lioOptimization.cpp:236,760-765): stall fires
    only after mapping started AND a full period passed with no data."""
    from gslivm_tpu.utils.watchdog import StallWatchdog

    calls = []
    d = StallWatchdog(period_s=0.01, on_stall=lambda: calls.append(1))
    # not started -> never stalls
    assert not d.check() and not d.check()
    d.notify_started()
    d.notify_data()
    assert not d.check()      # data arrived this period
    assert d.check()          # none since the last tick -> stop
    assert d.stopped and calls == [1]
    assert d.check()          # stays stopped, on_stall fires once


def test_see_image_tool(tmp_path):
    import numpy as np

    from gslivm_tpu.tools import see_image

    p = str(tmp_path / "d.npy")
    np.save(p, np.random.default_rng(0).random((16, 24)).astype(np.float32))
    out = str(tmp_path / "d.png")
    see_image.main([p, "--out", out])
    import os
    assert os.path.getsize(out) > 500


def test_gp_figure_tool(tmp_path):
    from gslivm_tpu.tools import gp_figure

    paths = gp_figure.main(["--out", str(tmp_path)])
    import os
    for p in paths:
        assert os.path.getsize(p) > 2000
