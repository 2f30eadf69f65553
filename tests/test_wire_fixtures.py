"""Independent wire-format fixtures for the sensor decoders (VERDICT r4
missing #2).

Every byte string here is assembled FIELD BY FIELD from the published
message definition (quoted inline), one ``struct.pack`` per field, with a
distinct sentinel value per field — never by calling this repo's
``encode_*`` helpers. A shared encoder/decoder misunderstanding of the
genpy layout (header framing, array length prefixes, field widths or
order) fails these tests; the roundtrip tests in test_sensor_bag.py
cannot catch that class of bug.

genpy serialization rules exercised: little-endian throughout, no
alignment padding, ``string`` = u32 length + raw bytes (no NUL),
fixed-size arrays (e.g. ``float64[9]``) have NO length prefix,
variable-length arrays are u32 count + elements, nested messages are
serialized inline.
"""

import struct

import numpy as np

from toyslam_tpu.runtime import rosbag


def _header(seq, sec, nsec, frame_id: bytes) -> bytes:
    """std_msgs/Header:
        uint32 seq
        time stamp        (uint32 secs + uint32 nsecs)
        string frame_id   (uint32 len + bytes)
    """
    out = struct.pack("<I", seq)
    out += struct.pack("<I", sec)
    out += struct.pack("<I", nsec)
    out += struct.pack("<I", len(frame_id)) + frame_id
    return out


def test_imu_fixture_hand_assembled():
    """sensor_msgs/Imu:
        Header header
        geometry_msgs/Quaternion orientation          (x y z w, 4 f64)
        float64[9] orientation_covariance
        geometry_msgs/Vector3 angular_velocity        (3 f64)
        float64[9] angular_velocity_covariance
        geometry_msgs/Vector3 linear_acceleration     (3 f64)
        float64[9] linear_acceleration_covariance
    """
    raw = _header(7, 1700000123, 250_000_000, b"imu_link")
    # orientation x, y, z, w — distinct sentinels
    for v in (0.125, -0.25, 0.5, 0.8125):
        raw += struct.pack("<d", v)
    raw += struct.pack("<9d", *[100.0 + k for k in range(9)])
    for v in (0.01, -0.02, 0.03):  # angular_velocity
        raw += struct.pack("<d", v)
    raw += struct.pack("<9d", *[200.0 + k for k in range(9)])
    for v in (0.1, -9.8, 0.3):  # linear_acceleration
        raw += struct.pack("<d", v)
    raw += struct.pack("<9d", *[300.0 + k for k in range(9)])

    m = rosbag.decode_imu(raw)
    assert abs(m["stamp"] - 1700000123.25) < 1e-6
    np.testing.assert_array_equal(m["quat"], [0.125, -0.25, 0.5, 0.8125])
    np.testing.assert_array_equal(m["gyro"], [0.01, -0.02, 0.03])
    np.testing.assert_array_equal(m["accel"], [0.1, -9.8, 0.3])


def test_imu_fixture_empty_frame_id():
    """frame_id may be empty (len prefix 0, no bytes) — the stamp and the
    first payload field must not shift."""
    raw = _header(0, 1_600_000_000, 0, b"")
    raw += struct.pack("<4d", 0.0, 0.0, 0.0, 1.0)
    raw += struct.pack("<9d", *([0.0] * 9))
    raw += struct.pack("<3d", 1.0, 2.0, 3.0)
    raw += struct.pack("<9d", *([0.0] * 9))
    raw += struct.pack("<3d", 4.0, 5.0, 6.0)
    raw += struct.pack("<9d", *([0.0] * 9))
    m = rosbag.decode_imu(raw)
    assert m["stamp"] == 1_600_000_000.0
    np.testing.assert_array_equal(m["gyro"], [1.0, 2.0, 3.0])
    np.testing.assert_array_equal(m["accel"], [4.0, 5.0, 6.0])


def test_navsatfix_fixture_hand_assembled():
    """sensor_msgs/NavSatFix:
        Header header
        sensor_msgs/NavSatStatus status   (int8 status, uint16 service)
        float64 latitude
        float64 longitude
        float64 altitude
        float64[9] position_covariance
        uint8 position_covariance_type
    int8 + uint16 serialize as 3 bytes, NO alignment padding.
    """
    raw = _header(42, 1_650_000_000, 500_000_000, b"gps")
    raw += struct.pack("<b", -1)  # STATUS_NO_FIX = -1 (signed!)
    raw += struct.pack("<H", 1)  # SERVICE_GPS
    raw += struct.pack("<d", 22.304_5)
    raw += struct.pack("<d", 114.179_7)
    raw += struct.pack("<d", -4.25)
    raw += struct.pack("<9d", *[float(k + 1) for k in range(9)])
    raw += struct.pack("<B", 2)  # COVARIANCE_TYPE_DIAGONAL_KNOWN

    m = rosbag.decode_navsatfix(raw)
    assert abs(m["stamp"] - 1_650_000_000.5) < 1e-6
    assert m["status"] == -1  # signed decode — a u8 read would give 255
    assert m["lat"] == 22.304_5
    assert m["lon"] == 114.179_7
    assert m["alt"] == -4.25
    np.testing.assert_array_equal(m["cov"], np.arange(1.0, 10.0))


def test_inspvax_fixture_hand_assembled():
    """novatel_msgs/INSPVAX (novatel_span_driver, message id 1465). No
    std_msgs Header — the reference reads ``msg->header.gps_week``
    (``uwb_imu_batch_node.cpp:2289``), i.e. ``header`` IS the NovAtel
    CommonHeader:
        uint16 message_id      uint8  message_type   uint8  port_address
        uint16 message_length  uint16 sequence       uint8  idle_time
        uint8  time_status     uint16 gps_week       uint32 gps_week_seconds
        uint32 receiver_status uint16 reserved       uint16 software_version
    Body:
        uint32 ins_status, uint32 position_type,
        float64 latitude/longitude/altitude, float32 undulation,
        float64 north/east/up_velocity, float64 roll/pitch/azimuth,
        float32[9] stds, uint32 extended_status,
        uint16 seconds_since_update
    """
    raw = struct.pack("<H", 1465)  # message_id
    raw += struct.pack("<B", 0)  # message_type
    raw += struct.pack("<B", 0x20)  # port_address
    raw += struct.pack("<H", 126)  # message_length
    raw += struct.pack("<H", 9)  # sequence
    raw += struct.pack("<B", 44)  # idle_time
    raw += struct.pack("<B", 180)  # time_status FINESTEERING
    raw += struct.pack("<H", 2354)  # gps_week
    raw += struct.pack("<I", 111_600_250)  # gps_week_seconds (ms!)
    raw += struct.pack("<I", 0)  # receiver_status
    raw += struct.pack("<H", 0)  # reserved
    raw += struct.pack("<H", 0)  # software_version
    assert len(raw) == 24  # CommonHeader is 24 bytes on the wire

    raw += struct.pack("<I", 3)  # ins_status INS_SOLUTION_GOOD
    raw += struct.pack("<I", 56)  # position_type INS_RTKFIXED
    raw += struct.pack("<d", 22.297_8)  # latitude
    raw += struct.pack("<d", 114.177_3)  # longitude
    raw += struct.pack("<d", 8.75)  # altitude
    raw += struct.pack("<f", -2.5)  # undulation
    raw += struct.pack("<d", 1.5)  # north_velocity
    raw += struct.pack("<d", -0.75)  # east_velocity
    raw += struct.pack("<d", 0.125)  # up_velocity
    raw += struct.pack("<d", 1.25)  # roll
    raw += struct.pack("<d", -3.5)  # pitch
    raw += struct.pack("<d", 271.5)  # azimuth
    raw += struct.pack("<9f", *[10.0 + k for k in range(9)])  # stds
    raw += struct.pack("<I", 0x41)  # extended_status
    raw += struct.pack("<H", 4)  # seconds_since_update

    m = rosbag.decode_inspvax(raw)
    assert m["gps_week"] == 2354
    assert m["gps_week_ms"] == 111_600_250
    assert m["lat"] == 22.297_8
    assert m["lon"] == 114.177_3
    assert m["alt"] == 8.75
    assert m["north_velocity"] == 1.5
    assert m["east_velocity"] == -0.75
    assert m["up_velocity"] == 0.125
    assert m["roll"] == 1.25 and m["pitch"] == -3.5
    assert m["azimuth"] == 271.5


def test_gnss_meas_fixture_hand_assembled():
    """gnss_comm/GnssMeasMsg:
        Header header
        GnssObsMsg[] meas            (u32 count + inline messages)
    gnss_comm/GnssObsMsg:
        GnssTimeMsg time             (uint32 week, float64 tow — inline,
                                      NO length prefix: nested message)
        uint32 sat
        float64[] freqs              } every variable-length array is
        float64[] CN0                } u32 count + elements
        uint8[]  LLI
        uint8[]  code
        float64[] psr
        float64[] psr_std
        float64[] cp
        float64[] cp_std
        float64[] dopp
        float64[] dopp_std
        uint8[]  status
    Two satellites with different array lengths (dual-freq on the second)
    so the framing of EVERY per-array count is exercised.
    """

    def f64s(*vals):
        return struct.pack("<I", len(vals)) + struct.pack(
            f"<{len(vals)}d", *vals)

    def u8s(*vals):
        return struct.pack("<I", len(vals)) + bytes(vals)

    raw = _header(3, 1_651_000_000, 0, b"gnss")
    raw += struct.pack("<I", 2)  # meas array count

    # --- satellite 1: single-frequency L1 ---
    raw += struct.pack("<I", 2354)  # time.week
    raw += struct.pack("<d", 345_600.5)  # time.tow
    raw += struct.pack("<I", 7)  # sat
    raw += f64s(1575.42e6)  # freqs
    raw += f64s(45.5)  # CN0
    raw += u8s(0)  # LLI
    raw += u8s(1)  # code
    raw += f64s(21_234_567.89)  # psr
    raw += f64s(1.5)  # psr_std
    raw += f64s(111_222_333.0)  # cp
    raw += f64s(0.01)  # cp_std
    raw += f64s(-1234.5)  # dopp
    raw += f64s(0.1)  # dopp_std
    raw += u8s(1)  # status

    # --- satellite 2: dual-frequency (2-element arrays) ---
    raw += struct.pack("<I", 2354)
    raw += struct.pack("<d", 345_600.5)
    raw += struct.pack("<I", 30)
    raw += f64s(1575.42e6, 1227.6e6)
    raw += f64s(41.0, 38.5)
    raw += u8s(0, 0)
    raw += u8s(1, 17)
    raw += f64s(23_456_789.01, 23_456_795.5)
    raw += f64s(2.0, 2.5)
    raw += f64s(0.0, 0.0)
    raw += f64s(0.0, 0.0)
    raw += f64s(2500.25, 1948.5)
    raw += f64s(0.1, 0.2)
    raw += u8s(1, 1)

    obs = rosbag.decode_gnss_meas(raw)
    assert len(obs) == 2
    o1, o2 = obs
    assert o1["week"] == 2354 and o1["tow"] == 345_600.5
    assert o1["sat"] == 7
    np.testing.assert_array_equal(o1["freqs"], [1575.42e6])
    np.testing.assert_array_equal(o1["CN0"], [45.5])
    np.testing.assert_array_equal(o1["psr"], [21_234_567.89])
    np.testing.assert_array_equal(o1["dopp"], [-1234.5])
    assert o2["sat"] == 30
    np.testing.assert_array_equal(o2["freqs"], [1575.42e6, 1227.6e6])
    np.testing.assert_array_equal(o2["CN0"], [41.0, 38.5])
    np.testing.assert_array_equal(o2["psr"], [23_456_789.01, 23_456_795.5])
    np.testing.assert_array_equal(o2["code"], [1, 17])
    np.testing.assert_array_equal(o2["dopp"], [2500.25, 1948.5])


def test_pointcloud2_fixture_hand_assembled():
    """sensor_msgs/PointCloud2 (the rosbag mapping node's input,
    ``ndt_rosbag_mapping_node.cpp:50``):
        Header header
        uint32 height, uint32 width
        PointField[] fields          (u32 count; each: string name,
                                      uint32 offset, uint8 datatype,
                                      uint32 count)
        uint8 is_bigendian           (bool)
        uint32 point_step, uint32 row_step
        uint8[] data                 (u32 count + bytes)
        uint8 is_dense               (bool)
    Fixture uses a 22-byte point_step with x/y/z/intensity at offsets
    0/4/8/18 (a gap at 12 — real Velodyne layouts have ring/time gaps) so
    a packed-stride assumption fails.
    """

    def field(name: bytes, offset: int, datatype: int, count: int) -> bytes:
        return (struct.pack("<I", len(name)) + name
                + struct.pack("<I", offset)
                + struct.pack("<B", datatype)
                + struct.pack("<I", count))

    points = [
        (1.0, 2.0, 3.0, 10.0),
        (-4.5, 5.25, -6.125, 20.0),
        (7.0, -8.0, 9.5, 30.0),
    ]
    step = 22
    data = bytearray()
    for x, y, z, inten in points:
        rec = bytearray(step)
        rec[0:4] = struct.pack("<f", x)
        rec[4:8] = struct.pack("<f", y)
        rec[8:12] = struct.pack("<f", z)
        rec[12:18] = b"\xaa" * 6  # ring/time filler the decoder must skip
        rec[18:22] = struct.pack("<f", inten)
        data += rec

    raw = _header(11, 1_660_000_000, 0, b"velodyne")
    raw += struct.pack("<I", 1)  # height
    raw += struct.pack("<I", 3)  # width
    raw += struct.pack("<I", 4)  # fields count
    raw += field(b"x", 0, 7, 1)  # FLOAT32 = 7
    raw += field(b"y", 4, 7, 1)
    raw += field(b"z", 8, 7, 1)
    raw += field(b"intensity", 18, 7, 1)
    raw += struct.pack("<B", 0)  # is_bigendian
    raw += struct.pack("<I", step)  # point_step
    raw += struct.pack("<I", step * 3)  # row_step
    raw += struct.pack("<I", len(data)) + bytes(data)
    raw += struct.pack("<B", 1)  # is_dense

    xyzi = rosbag.decode_pointcloud2(raw)
    np.testing.assert_allclose(xyzi, np.asarray(points, np.float32))
