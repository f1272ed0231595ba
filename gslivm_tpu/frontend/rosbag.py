"""Dependency-free ROS1 bag reader + sensor message decoders.

The reference consumes its datasets (R3LIVE / FAST-LIVO / NTU VIRAL /
Botanic Garden, SURVEY §6) as rosbags played into ROS subscribers
(lioOptimization.cpp:742-850, cloudProcessing.cpp). This framework is
ROS-free, so this module reads bag files directly: the ROS1 bag v2.0
container (records, connection headers, chunked storage with none/bz2
compression) plus binary decoders for the sensor messages the reference
subscribes to:

  - sensor_msgs/Imu            -> ImuSample (imuHandler)
  - sensor_msgs/PointCloud2    -> LidarSweep (velodyne/ouster/robosense/
                                   pandar paths of cloudProcessing.cpp,
                                   per-point relative time from the
                                   'time'/'t'/'timestamp' field)
  - livox_ros_driver/CustomMsg -> LidarSweep (livoxHandler,
                                   cloudProcessing.cpp:119-157, incl. the
                                   tag filter)
  - sensor_msgs/CompressedImage / Image -> ImageSample (r3live/fastlivo
                                   compressed topics)

Decoding is schema-driven from the PointCloud2 field table, so any field
layout the reference supports decodes here too.
"""

from __future__ import annotations

import bz2
import os
import struct
from typing import Iterator, NamedTuple

import numpy as np

from .sensors import ImageSample, ImuSample, LidarSweep


def _read_header(data: bytes) -> dict:
    """Parse a record/connection header: [len][name=value]*."""
    fields = {}
    pos = 0
    while pos < len(data):
        (flen,) = struct.unpack_from("<I", data, pos)
        pos += 4
        item = data[pos:pos + flen]
        pos += flen
        eq = item.index(b"=")
        fields[item[:eq].decode()] = item[eq + 1:]
    return fields


class BagMessage(NamedTuple):
    topic: str
    datatype: str
    t: float
    raw: bytes


def read_bag(path: str, topics: set[str] | None = None) -> Iterator[BagMessage]:
    """Stream messages (in storage order) from a ROS1 v2.0 bag."""
    with open(path, "rb") as f:
        magic = f.readline()
        if not magic.startswith(b"#ROSBAG V2.0"):
            raise ValueError(f"not a ROS1 v2.0 bag: {magic!r}")
        connections: dict[int, tuple[str, str]] = {}

        def parse_records(buf: bytes):
            pos = 0
            while pos + 8 <= len(buf):
                (hlen,) = struct.unpack_from("<I", buf, pos)
                header = _read_header(buf[pos + 4:pos + 4 + hlen])
                pos += 4 + hlen
                (dlen,) = struct.unpack_from("<I", buf, pos)
                data = buf[pos + 4:pos + 4 + dlen]
                pos += 4 + dlen
                yield header, data

        def handle(header, data):
            op = header["op"][0]
            if op == 0x07:  # connection
                conn = struct.unpack("<I", header["conn"])[0]
                ch = _read_header(data)
                connections[conn] = (header["topic"].decode(),
                                     ch["type"].decode())
            elif op == 0x02:  # message data
                conn = struct.unpack("<I", header["conn"])[0]
                secs, nsecs = struct.unpack("<II", header["time"])
                topic, dtype = connections.get(conn, ("?", "?"))
                if topics is None or topic in topics:
                    return BagMessage(topic, dtype, secs + nsecs * 1e-9, data)
            return None

        while True:
            head = f.read(4)
            if len(head) < 4:
                return
            (hlen,) = struct.unpack("<I", head)
            header = _read_header(f.read(hlen))
            (dlen,) = struct.unpack("<I", f.read(4))
            data = f.read(dlen)
            op = header["op"][0]
            if op == 0x05:  # chunk
                compression = header["compression"].decode()
                if compression == "bz2":
                    data = bz2.decompress(data)
                elif compression == "lz4":
                    try:
                        import lz4.frame  # type: ignore

                        data = lz4.frame.decompress(data)
                    except ImportError as e:
                        raise RuntimeError("lz4-compressed bag needs lz4") from e
                for h2, d2 in parse_records(data):
                    msg = handle(h2, d2)
                    if msg is not None:
                        yield msg
            else:
                msg = handle(header, data)
                if msg is not None:
                    yield msg


# ---------------------------------------------------------------------------
# Message decoders
# ---------------------------------------------------------------------------

_PC2_DTYPES = {1: "i1", 2: "u1", 3: "i2", 4: "u2", 5: "i4", 6: "u4",
               7: "f4", 8: "f8"}


def decode_imu(raw: bytes) -> ImuSample:
    """sensor_msgs/Imu."""
    pos, stamp = _skip_std_header(raw)
    # orientation (4f8) + cov (9f8)
    pos += 4 * 8 + 9 * 8
    gyr = struct.unpack_from("<3d", raw, pos)
    pos += 3 * 8 + 9 * 8
    acc = struct.unpack_from("<3d", raw, pos)
    return ImuSample(stamp, np.asarray(gyr), np.asarray(acc))


def decode_pointcloud2(raw: bytes, stamp: float,
                       lidar_type: str = "auto") -> LidarSweep:
    """sensor_msgs/PointCloud2 -> LidarSweep with per-point relative time.

    Per-vendor time-field semantics (cloudProcessing.cpp:159-368):
      velodyne ('time'):     seconds from scan start; t_begin = header stamp
      ouster ('t'):          NANOseconds from scan start (tm_scale=1e9,
                             :221); t_begin = header stamp
      robosense ('timestamp'): ABSOLUTE per-point epoch seconds; rel is
                             re-based to the earliest point and t_begin is
                             that earliest stamp — the reference keeps the
                             points' own epoch (point.timestamp, :305), NOT
                             header+rel
      pandar ('timestamp'):  absolute stamps re-based to the earliest, but
                             absolute time = header + rel (:351 quirk —
                             the header epoch wins over the point epoch)

    lidar_type="auto" infers from the field table (time->velodyne,
    t->ouster, timestamp->robosense); pass it explicitly (config
    CommonOptions.lidar_type) to pin the pandar-vs-robosense epoch quirk."""
    pos, hdr_stamp = _skip_std_header(raw)
    height, width = struct.unpack_from("<II", raw, pos)
    pos += 8
    (nfields,) = struct.unpack_from("<I", raw, pos)
    pos += 4
    fields = []
    for _ in range(nfields):
        (nlen,) = struct.unpack_from("<I", raw, pos)
        pos += 4
        name = raw[pos:pos + nlen].decode()
        pos += nlen
        offset, datatype, count = struct.unpack_from("<IBI", raw, pos)
        pos += 9
        fields.append((name, offset, datatype, count))
    is_bigendian = raw[pos]
    pos += 1
    point_step, row_step = struct.unpack_from("<II", raw, pos)
    pos += 8
    (dlen,) = struct.unpack_from("<I", raw, pos)
    pos += 4
    buf = raw[pos:pos + dlen]

    n = height * width
    np_fields = {}
    for name, offset, datatype, count in fields:
        dt = _PC2_DTYPES[datatype]
        np_fields[name] = np.ndarray(
            (n,), dtype=("<" if not is_bigendian else ">") + dt,
            buffer=buf, offset=offset, strides=(point_step,)).copy()

    xyz = np.stack([np_fields["x"], np_fields["y"], np_fields["z"]],
                   axis=1).astype(np.float64)
    intensity = np_fields.get(
        "intensity", np.zeros(n, np.float32)).astype(np.float32)

    t_begin = stamp
    if lidar_type in ("auto", "livox"):  # livox PointCloud2 -> infer fields
        if "time" in np_fields:
            lidar_type = "velodyne"
        elif "t" in np_fields:
            lidar_type = "ouster"
        elif "timestamp" in np_fields:
            lidar_type = "robosense"
        else:
            lidar_type = "unknown"
    if lidar_type == "velodyne":   # 'time': seconds from scan start
        rel = np_fields["time"].astype(np.float64)
    elif lidar_type == "ouster":   # 't': NANOseconds from scan start
        rel = np_fields["t"].astype(np.float64) * 1e-9
    elif lidar_type in ("robosense", "pandar"):  # absolute epoch stamps
        ts = np_fields["timestamp"].astype(np.float64)
        ts0 = ts.min() if n else 0.0
        rel = ts - ts0
        if lidar_type == "robosense":
            t_begin = ts0  # keep the points' own epoch (:305)
    else:
        rel = np.zeros(n)
    return LidarSweep(t_begin, xyz, rel, intensity)


def decode_livox_custom(raw: bytes, stamp: float,
                        tag_filter: bool = True) -> LidarSweep:
    """livox_ros_driver/CustomMsg (livoxHandler, cloudProcessing.cpp:119-157
    incl. the `(tag & 0x30) == 0x10 || == 0x00` return-type filter :141)."""
    pos, _ = _skip_std_header(raw)
    (timebase,) = struct.unpack_from("<Q", raw, pos)
    pos += 8
    (point_num,) = struct.unpack_from("<I", raw, pos)
    pos += 4
    pos += 1 + 3  # lidar_id + rsvd
    rec = np.dtype([("offset_time", "<u4"), ("x", "<f4"), ("y", "<f4"),
                    ("z", "<f4"), ("reflectivity", "u1"), ("tag", "u1"),
                    ("line", "u1")])
    pts = np.frombuffer(raw, dtype=rec, count=point_num, offset=pos)
    if tag_filter:
        rt = pts["tag"] & 0x30
        pts = pts[(rt == 0x10) | (rt == 0x00)]
    xyz = np.stack([pts["x"], pts["y"], pts["z"]], axis=1).astype(np.float64)
    rel = pts["offset_time"].astype(np.float64) * 1e-9
    return LidarSweep(stamp, xyz, rel,
                      pts["reflectivity"].astype(np.float32))


def decode_compressed_image(raw: bytes, stamp: float) -> ImageSample:
    """sensor_msgs/CompressedImage -> RGB uint8 via cv2."""
    import cv2

    pos, _ = _skip_std_header(raw)
    (flen,) = struct.unpack_from("<I", raw, pos)
    pos += 4 + flen  # format string
    (dlen,) = struct.unpack_from("<I", raw, pos)
    pos += 4
    img = cv2.imdecode(np.frombuffer(raw, np.uint8, dlen, pos),
                       cv2.IMREAD_COLOR)
    return ImageSample(stamp, cv2.cvtColor(img, cv2.COLOR_BGR2RGB))


def decode_image(raw: bytes, stamp: float) -> ImageSample:
    """sensor_msgs/Image (raw bgr8/rgb8/mono8)."""
    import cv2

    pos, _ = _skip_std_header(raw)
    height, width = struct.unpack_from("<II", raw, pos)
    pos += 8
    (elen,) = struct.unpack_from("<I", raw, pos)
    pos += 4
    encoding = raw[pos:pos + elen].decode()
    pos += elen
    pos += 1  # is_bigendian
    (step,) = struct.unpack_from("<I", raw, pos)
    pos += 4
    (dlen,) = struct.unpack_from("<I", raw, pos)
    pos += 4
    img = np.frombuffer(raw, np.uint8, dlen, pos).reshape(height, step)
    if encoding in ("bgr8", "rgb8"):
        img = img[:, : width * 3].reshape(height, width, 3)
        if encoding == "bgr8":
            img = cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
    elif encoding == "mono8":
        img = np.repeat(img[:, :width, None], 3, axis=2)
    else:
        raise ValueError(f"unsupported image encoding {encoding!r}")
    return ImageSample(stamp, img)


def _skip_std_header(raw: bytes) -> tuple[int, float]:
    """std_msgs/Header: seq(u4) stamp(2u4) frame_id(string)."""
    seq, secs, nsecs = struct.unpack_from("<III", raw, 0)
    (flen,) = struct.unpack_from("<I", raw, 12)
    return 16 + flen, secs + nsecs * 1e-9


class PoseSample(NamedTuple):
    t: float
    position: np.ndarray   # [3]
    quat_xyzw: np.ndarray  # [4]


def _decode_pose_at(raw: bytes, off: int, t: float) -> PoseSample:
    vals = struct.unpack_from("<7d", raw, off)
    return PoseSample(t, np.asarray(vals[:3], np.float64),
                      np.asarray(vals[3:], np.float64))


def decode_pose_stamped(raw: bytes) -> PoseSample:
    """geometry_msgs/PoseStamped: Header + position(3d) + orientation(4d)
    (ground-truth pose topics, python/parse_pose.py:20-28)."""
    off, stamp = _skip_std_header(raw)
    return _decode_pose_at(raw, off, stamp)


def decode_odometry(raw: bytes) -> PoseSample:
    """nav_msgs/Odometry: Header + child_frame_id(string) + pose (7d +
    36d covariance) [+ twist, ignored] (python/listen_odom.py's /Odometry
    recording)."""
    off, stamp = _skip_std_header(raw)
    (clen,) = struct.unpack_from("<I", raw, off)
    return _decode_pose_at(raw, off + 4 + clen, stamp)


def decode(msg: BagMessage, lidar_type: str = "auto"):
    """Route a BagMessage to the matching sensor record."""
    if msg.datatype == "sensor_msgs/Imu":
        return decode_imu(msg.raw)
    if msg.datatype == "sensor_msgs/PointCloud2":
        return decode_pointcloud2(msg.raw, msg.t, lidar_type=lidar_type)
    if msg.datatype == "livox_ros_driver/CustomMsg":
        return decode_livox_custom(msg.raw, msg.t)
    if msg.datatype == "sensor_msgs/CompressedImage":
        return decode_compressed_image(msg.raw, msg.t)
    if msg.datatype == "sensor_msgs/Image":
        return decode_image(msg.raw, msg.t)
    if msg.datatype == "geometry_msgs/PoseStamped":
        return decode_pose_stamped(msg.raw)
    if msg.datatype == "nav_msgs/Odometry":
        return decode_odometry(msg.raw)
    return None


def play_bag(path: str, frontend, imu_topic: str, lidar_topic: str,
             image_topic: str, limit_messages: int | None = None):
    """Stream a bag into a LivoFrontend (the rosbag-play + subscriber loop)."""
    count = 0
    lidar_type = frontend.cfg.common.lidar_type if hasattr(frontend, "cfg") \
        else "auto"
    for msg in read_bag(path, {imu_topic, lidar_topic, image_topic}):
        rec = decode(msg, lidar_type=lidar_type)
        if isinstance(rec, ImuSample):
            frontend.push_imu(rec.t, rec.gyr, rec.acc)
        elif isinstance(rec, LidarSweep):
            frontend.push_lidar(rec)
        elif isinstance(rec, ImageSample):
            frontend.push_image(rec.t, rec.image)
        count += 1
        if limit_messages and count >= limit_messages:
            break
    return count
