"""Rosbag reader + message decoder tests against synthetically written bags."""

import struct

import numpy as np

from gslivm_tpu.frontend import rosbag


def _header(fields: dict) -> bytes:
    out = b""
    for k, v in fields.items():
        item = k.encode() + b"=" + v
        out += struct.pack("<I", len(item)) + item
    return out


def _record(header: dict, data: bytes) -> bytes:
    h = _header(header)
    return struct.pack("<I", len(h)) + h + struct.pack("<I", len(data)) + data


def _std_header(secs=10, nsecs=500000000, frame=b"imu") -> bytes:
    return struct.pack("<III", 1, secs, nsecs) + struct.pack("<I", len(frame)) + frame


def _stamp_header(t: float) -> bytes:
    secs = int(t)
    return _std_header(secs, int((t - secs) * 1e9))


def _conn_record(conn, topic, dtype):
    ch = _header({"type": dtype.encode(), "md5sum": b"x",
                  "message_definition": b""})
    return _record({"op": bytes([0x07]), "conn": struct.pack("<I", conn),
                    "topic": topic.encode()}, ch)


def _msg_record(conn, t, data):
    secs = int(t)
    nsecs = int((t - secs) * 1e9)
    return _record({"op": bytes([0x02]), "conn": struct.pack("<I", conn),
                    "time": struct.pack("<II", secs, nsecs)}, data)


def _imu_msg(gyr, acc, t=10.5):
    return (_stamp_header(t) + struct.pack("<4d", 0, 0, 0, 1)
            + struct.pack("<9d", *([0] * 9))
            + struct.pack("<3d", *gyr) + struct.pack("<9d", *([0] * 9))
            + struct.pack("<3d", *acc) + struct.pack("<9d", *([0] * 9)))


def _pc2_msg(xyz, times):
    n = len(xyz)
    fields = [("x", 0, 7, 1), ("y", 4, 7, 1), ("z", 8, 7, 1),
              ("intensity", 12, 7, 1), ("time", 16, 7, 1)]
    fbytes = b""
    for name, off, dt, cnt in fields:
        nb = name.encode()
        fbytes += struct.pack("<I", len(nb)) + nb + struct.pack("<IBI", off, dt, cnt)
    step = 20
    buf = b""
    for p, t in zip(xyz, times):
        buf += struct.pack("<5f", p[0], p[1], p[2], 1.0, t)
    return (_std_header() + struct.pack("<II", 1, n)
            + struct.pack("<I", len(fields)) + fbytes
            + bytes([0]) + struct.pack("<II", step, step * n)
            + struct.pack("<I", len(buf)) + buf)


def _livox_msg(xyz, offsets_ns, tags, t=10.5):
    body = struct.pack("<Q", 123) + struct.pack("<I", len(xyz)) + bytes([0, 0, 0, 0])
    for p, off, tag in zip(xyz, offsets_ns, tags):
        body += struct.pack("<I", int(off)) + struct.pack("<3f", *p) + bytes([7, tag, 1])
    return _stamp_header(t) + body


def _write_bag(path, records):
    with open(path, "wb") as f:
        f.write(b"#ROSBAG V2.0\n")
        for r in records:
            f.write(r)


def test_bag_imu_and_pc2(tmp_path, rng):
    xyz = rng.uniform(-5, 5, (30, 3)).astype(np.float32)
    times = np.linspace(0, 0.09, 30).astype(np.float32)
    recs = [
        _conn_record(0, "/imu", "sensor_msgs/Imu"),
        _conn_record(1, "/lidar", "sensor_msgs/PointCloud2"),
        _msg_record(0, 100.0, _imu_msg([0.1, 0.2, 0.3], [0, 0, 9.81])),
        _msg_record(1, 100.05, _pc2_msg(xyz, times)),
    ]
    path = str(tmp_path / "test.bag")
    _write_bag(path, recs)

    msgs = list(rosbag.read_bag(path))
    assert len(msgs) == 2
    imu = rosbag.decode(msgs[0])
    np.testing.assert_allclose(imu.gyr, [0.1, 0.2, 0.3])
    np.testing.assert_allclose(imu.acc, [0, 0, 9.81])
    assert abs(imu.t - 10.5) < 1e-6  # header stamp default, not bag time

    sweep = rosbag.decode(msgs[1])
    np.testing.assert_allclose(sweep.xyz, xyz, rtol=1e-6)
    np.testing.assert_allclose(sweep.rel_time, times, atol=1e-6)


def test_bag_livox_tag_filter(tmp_path):
    xyz = [(1.0, 0, 0), (2.0, 0, 0), (3.0, 0, 0)]
    recs = [
        _conn_record(0, "/livox", "livox_ros_driver/CustomMsg"),
        _msg_record(0, 5.0, _livox_msg(xyz, [0, 1000, 2000],
                                       [0x10, 0x20, 0x10])),
    ]
    path = str(tmp_path / "livox.bag")
    _write_bag(path, recs)
    sweep = rosbag.decode(next(iter(rosbag.read_bag(path))))
    # middle point filtered by (tag & 0x30) != 0x10
    assert sweep.xyz.shape[0] == 2
    np.testing.assert_allclose(sweep.xyz[:, 0], [1.0, 3.0])


def test_bag_topic_filter(tmp_path, rng):
    recs = [
        _conn_record(0, "/imu", "sensor_msgs/Imu"),
        _conn_record(1, "/other", "sensor_msgs/Imu"),
        _msg_record(0, 1.0, _imu_msg([0, 0, 0], [0, 0, 9.8])),
        _msg_record(1, 1.0, _imu_msg([1, 1, 1], [1, 1, 1])),
    ]
    path = str(tmp_path / "two.bag")
    _write_bag(path, recs)
    msgs = list(rosbag.read_bag(path, topics={"/imu"}))
    assert len(msgs) == 1 and msgs[0].topic == "/imu"


def _image_msg(img, t=10.5):
    h, w = img.shape[:2]
    enc = b"rgb8"
    data = img.tobytes()
    return (_stamp_header(t) + struct.pack("<II", h, w)
            + struct.pack("<I", len(enc)) + enc
            + bytes([0]) + struct.pack("<I", w * 3)
            + struct.pack("<I", len(data)) + data)


def test_full_bag_pipeline(tmp_path, rng):
    """End-to-end: synthesize a mini livox+imu+image bag, run the complete
    run_bag flow (frontend + mapper) on it."""
    import subprocess
    import sys

    from gslivm_tpu.frontend import synthetic, so3

    planes = synthetic.default_scene()
    cams = synthetic.make_trajectory(3, 64, 48)
    cam = cams[0]
    R_wc = np.asarray(cam.R_cw).T
    center = np.asarray(cam.cam_center)
    fx = float(np.asarray(cam.fx))

    recs = [
        _conn_record(0, "/livox/imu", "sensor_msgs/Imu"),
        _conn_record(1, "/livox/lidar", "livox_ros_driver/CustomMsg"),
        _conn_record(2, "/cam", "sensor_msgs/Image"),
    ]
    g = [0, 0, 9.81]
    t = 1.0
    for _ in range(90):  # 0.45 s static init
        recs.append(_msg_record(0, t, _imu_msg([0, 0, 0], g, t)))
        t += 0.005
    for k in range(4):
        pts_w = synthetic.sample_surface_points(cam, planes, 4000, rng)
        pts_s = (pts_w - center) @ R_wc
        offs = np.linspace(0, 90e6, len(pts_s)).astype(np.uint64)
        recs.append(_msg_record(
            1, t, _livox_msg(pts_s.tolist(), offs.tolist(),
                             [0x10] * len(pts_s), t)))
        for j in range(20):
            tj = t + j * 0.005
            recs.append(_msg_record(0, tj, _imu_msg([0, 0, 0], g, tj)))
        img = synthetic.render_image(cam, planes)
        recs.append(_msg_record(2, t + 0.095, _image_msg(img, t + 0.095)))
        t += 0.1

    bag = str(tmp_path / "mini.bag")
    _write_bag(bag, recs)

    ds = tmp_path / "ds.yaml"
    ds.write_text(f"""
dataset:
    lidar_topic: "/livox/lidar"
    imu_topic: "/livox/imu"
    image_topic: "/cam"
    lidar_type: livox
    image_width: 64
    image_height: 48
    image_resize_ratio: 1.0
    fx: {fx}
    fy: {fx * 0.75 / (48 / 64 * 0.75) if False else float(np.asarray(cam.fy)) * 1.0}
    cx: 31.5
    cy: 23.5
    dist_k1: 0.0
    dist_k2: 0.0
    dist_p1: 0.0
    dist_p2: 0.0
    dist_k3: 0.0
    t_imu_lidar: "0,0,0"
    R_imu_lidar: "1,0,0,0,1,0,0,0,1"
    t_imu_camera: "0,0,0"
    R_imu_camera: "1,0,0,0,1,0,0,0,1"
gp:
    grid: 0.5
odometry:
    init_num_frames: 2
    voxel_size: 0.05
    sample_voxel_size: 0.6
    init_voxel_size: 0.05
    init_sample_voxel_size: 0.6
icp:
    min_number_neighbors: 8
    max_num_residuals: 300
    size_voxel_map: 0.5
    num_iters_icp: 6
""")
    out = tmp_path / "out"
    res = subprocess.run(
        [sys.executable, "examples/run_bag.py", bag,
         "--dataset", str(ds), "--out", str(out), "--cpu",
         "--backend", "naive", "--train-iters-per-frame", "2"],
        # generous: the box has 2 CPUs and a cold persistent-compile cache
        # costs several minutes of XLA:CPU compiles on first run
        capture_output=True, text=True, timeout=1500,
        env={**__import__("os").environ, "JAX_PLATFORMS": "cpu"},
    )
    assert res.returncode == 0, res.stderr[-2000:]
    produced = set(__import__("os").listdir(out))
    assert {"map.ply", "pose.txt", "log_time.txt", "training"} <= produced, produced


def _pc2_msg_generic(xyz, tvals, tname, tdtype, secs=10, nsecs=500000000):
    """PointCloud2 with a vendor-specific time field.

    tdtype: PC2 datatype code (6=u4, 7=f4, 8=f8)."""
    n = len(xyz)
    tsize = {6: 4, 7: 4, 8: 8}[tdtype]
    fields = [("x", 0, 7, 1), ("y", 4, 7, 1), ("z", 8, 7, 1),
              ("intensity", 12, 7, 1), (tname, 16, tdtype, 1)]
    fbytes = b""
    for name, off, dt, cnt in fields:
        nb = name.encode()
        fbytes += struct.pack("<I", len(nb)) + nb + struct.pack("<IBI", off, dt, cnt)
    step = 16 + tsize
    tfmt = {6: "<I", 7: "<f", 8: "<d"}[tdtype]
    buf = b""
    for p, t in zip(xyz, tvals):
        buf += struct.pack("<4f", p[0], p[1], p[2], 1.0)
        buf += struct.pack(tfmt, int(t) if tdtype == 6 else t)
    return (_std_header(secs, nsecs) + struct.pack("<II", 1, n)
            + struct.pack("<I", len(fields)) + fbytes
            + bytes([0]) + struct.pack("<II", step, step * n)
            + struct.pack("<I", len(buf)) + buf)


def test_pc2_vendor_time_units():
    """Per-vendor time decode (cloudProcessing.cpp:159-368): Ouster 't' is
    NANOseconds; Robosense 'timestamp' is absolute epoch (points keep their
    own epoch -> t_begin = earliest stamp); Pandar 'timestamp' is absolute
    but the header epoch wins (t_begin = header stamp)."""
    xyz = [(1.0, 0, 0), (2.0, 0, 0), (3.0, 0, 0)]
    header_t = 10.5

    # ouster: t in ns
    raw = _pc2_msg_generic(xyz, [0, 50_000_000, 90_000_000], "t", 6)
    sw = rosbag.decode_pointcloud2(raw, header_t, lidar_type="ouster")
    np.testing.assert_allclose(sw.rel_time, [0.0, 0.05, 0.09], atol=1e-9)
    assert sw.t_begin == header_t

    # robosense: absolute epoch seconds; rel rebased, t_begin = earliest
    ts0 = 2000.25
    raw = _pc2_msg_generic(xyz, [ts0 + 0.02, ts0, ts0 + 0.08], "timestamp", 8)
    sw = rosbag.decode_pointcloud2(raw, header_t, lidar_type="robosense")
    np.testing.assert_allclose(sw.rel_time, [0.02, 0.0, 0.08], atol=1e-9)
    assert sw.t_begin == ts0  # point epoch, NOT the header stamp

    # pandar: same field, but header epoch wins (quirk :351)
    sw = rosbag.decode_pointcloud2(raw, header_t, lidar_type="pandar")
    np.testing.assert_allclose(sw.rel_time, [0.02, 0.0, 0.08], atol=1e-9)
    assert sw.t_begin == header_t

    # auto-inference: 't' field -> ouster ns semantics
    raw = _pc2_msg_generic(xyz, [0, 50_000_000, 90_000_000], "t", 6)
    sw = rosbag.decode_pointcloud2(raw, header_t)
    np.testing.assert_allclose(sw.rel_time, [0.0, 0.05, 0.09], atol=1e-9)


def test_livox_tag_filter_accepts_both_returns(tmp_path):
    """(tag & 0x30) == 0x10 OR == 0x00 pass (cloudProcessing.cpp:141) —
    only 0x20/0x30 return types are dropped."""
    xyz = [(1.0, 0, 0), (2.0, 0, 0), (3.0, 0, 0), (4.0, 0, 0)]
    recs = [
        _conn_record(0, "/livox", "livox_ros_driver/CustomMsg"),
        _msg_record(0, 5.0, _livox_msg(xyz, [0, 1000, 2000, 3000],
                                       [0x10, 0x00, 0x20, 0x30])),
    ]
    path = str(tmp_path / "livox2.bag")
    _write_bag(path, recs)
    sweep = rosbag.decode(next(iter(rosbag.read_bag(path))))
    assert sweep.xyz.shape[0] == 2
    np.testing.assert_allclose(sweep.xyz[:, 0], [1.0, 2.0])
