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


def _imu_msg(gyr, acc):
    return (_std_header() + struct.pack("<4d", 0, 0, 0, 1)
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


def _livox_msg(xyz, offsets_ns, tags):
    body = struct.pack("<Q", 123) + struct.pack("<I", len(xyz)) + bytes([0, 0, 0, 0])
    for p, off, tag in zip(xyz, offsets_ns, tags):
        body += struct.pack("<I", off) + struct.pack("<3f", *p) + bytes([7, tag, 1])
    return _std_header() + body


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
    assert abs(imu.t - 10.5) < 1e-6  # header stamp, not bag time

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
