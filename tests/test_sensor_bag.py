"""Real-data ingestion tests: Imu / NavSatFix / INSPVAX / GnssMeas
decoders, the mixed-topic bag writer, and the packed-array adapters.

The reference consumes these exact message types from live topics or bag
replay: ``sensor_msgs/Imu`` (``uwb_imu_batch_node.cpp:3027``), NovAtel
``INSPVAX`` (``:2284``), raw ``gnss_comm`` measurements
(``gnssSpp.cpp:827``). Each decoder is pinned by an encode->decode
roundtrip plus an end-to-end mixed-topic bag (lz4-compressed, like real
UrbanNav releases) feeding the packed layouts the estimators consume.
"""

import numpy as np
import pytest

from toyslam_tpu.core import geodesy
from toyslam_tpu.runtime import rosbag


def test_imu_roundtrip(rng):
    gyro = rng.normal(0, 0.1, 3)
    accel = rng.normal(0, 1, 3) + np.array([0, 0, 9.81])
    quat = np.array([0.1, 0.2, 0.3, 0.9])
    raw = rosbag.encode_imu(1234.5678, gyro, accel, quat)
    m = rosbag.decode_imu(raw)
    assert abs(m["stamp"] - 1234.5678) < 1e-6
    np.testing.assert_array_equal(m["gyro"], gyro)
    np.testing.assert_array_equal(m["accel"], accel)
    np.testing.assert_array_equal(m["quat"], quat)


def test_navsatfix_roundtrip():
    raw = rosbag.encode_navsatfix(99.25, 22.3045, 114.1797, 5.5, status=1)
    m = rosbag.decode_navsatfix(raw)
    assert abs(m["stamp"] - 99.25) < 1e-6
    assert m["status"] == 1
    assert m["lat"] == 22.3045 and m["lon"] == 114.1797 and m["alt"] == 5.5


def test_inspvax_roundtrip_and_time():
    raw = rosbag.encode_inspvax(2156, 111_600_000, 22.3, 114.18, 3.0,
                                vn=1.0, ve=-2.0, vu=0.5,
                                roll=1.5, pitch=-0.5, azimuth=270.0)
    m = rosbag.decode_inspvax(raw)
    assert m["gps_week"] == 2156 and m["gps_week_ms"] == 111_600_000
    assert m["lat"] == 22.3 and m["azimuth"] == 270.0
    assert m["north_velocity"] == 1.0 and m["up_velocity"] == 0.5
    # The reference converts week + ms/1000 through gpsToUnixTime
    # (uwb_imu_batch_node.cpp:2289); our ingestion must agree.
    ts = float(geodesy.gps_to_unix_time(2156, 111_600_000 / 1000.0))
    assert ts > 1.6e9  # sane unix epoch (2021+)


def test_gnss_meas_roundtrip(rng):
    sats = np.array([3, 7, 12, 30])
    psr = 2.0e7 + rng.normal(0, 1e4, 4)
    cn0 = np.array([45.0, 38.0, 41.0, 50.0])
    dopp = rng.normal(0, 1000, 4)
    raw = rosbag.encode_gnss_meas(2156, 345600.0, sats, psr, cn0, dopp)
    obs = rosbag.decode_gnss_meas(raw)
    assert [o["sat"] for o in obs] == list(sats)
    for i, o in enumerate(obs):
        assert o["week"] == 2156 and o["tow"] == 345600.0
        assert o["psr"][0] == psr[i]
        assert o["CN0"][0] == cn0[i]
        assert o["dopp"][0] == dopp[i]
        assert o["freqs"][0] == 1575.42e6


@pytest.mark.parametrize("comp", ["none", "lz4"])
def test_mixed_topic_bag_end_to_end(tmp_path, rng, comp):
    """One bag carrying scans + 200 Hz IMU + INSPVAX + GnssMeas (the
    reference's uwb_imu_batch + gnssSpp input graph) round-trips through
    every packed-array adapter."""
    records = []
    # 2 scans
    for i in range(2):
        pts = rng.normal(0, 5, (100, 4)).astype(np.float32)
        records.append(("/velodyne_points", "sensor_msgs/PointCloud2",
                        10.0 + i, rosbag.encode_pointcloud2(pts, 10.0 + i)))
    # 20 IMU samples at 200 Hz
    for i in range(20):
        t = 10.0 + i * 0.005
        records.append(("/imu/data", "sensor_msgs/Imu", t,
                        rosbag.encode_imu(t, [0.0, 0.0, 0.01 * i],
                                          [0.1, 0.0, 9.81])))
    # 2 INSPVAX fixes
    for i in range(2):
        records.append((
            "/novatel_data/inspvax", "novatel_msgs/INSPVAX", 10.0 + i,
            rosbag.encode_inspvax(2156, 111_600_000 + 1000 * i,
                                  22.30 + 1e-5 * i, 114.18, 3.0, vn=1.0)))
    # 2 GnssMeas epochs
    for i in range(2):
        records.append((
            "/ublox_driver/range_meas", "gnss_comm/GnssMeasMsg", 10.0 + i,
            rosbag.encode_gnss_meas(2156, 345600.0 + i, [3, 7],
                                    [2.0e7, 2.1e7])))

    bag = tmp_path / f"mixed_{comp}.bag"
    rosbag.write_mixed_bag(bag, records, compression=comp)

    xyzi, mask, times, counts = rosbag.pack_bag_scans(bag, capacity=128)
    assert len(times) == 2 and counts[0] == 100

    t_imu, acc, gyro, dt = rosbag.pack_bag_imu(bag)
    assert acc.shape == (20, 3) and gyro.shape == (20, 3)
    np.testing.assert_allclose(dt[1:], 0.005, atol=1e-6)
    assert dt[0] == dt[1]
    np.testing.assert_allclose(acc[:, 2], 9.81, atol=1e-6)
    np.testing.assert_allclose(gyro[-1, 2], 0.19, atol=1e-6)

    t_gps, lla, vel = rosbag.pack_bag_gps(bag)
    assert lla.shape == (2, 3)
    np.testing.assert_allclose(lla[1, 0], 22.30001)
    np.testing.assert_allclose(vel[:, 1], 1.0)  # north -> ENU slot 1
    assert abs((t_gps[1] - t_gps[0]) - 1.0) < 1e-9  # 1000 ms apart

    epochs = rosbag.pack_bag_gnss_meas(bag)
    assert len(epochs) == 2
    np.testing.assert_array_equal(epochs[0]["sats"], [3, 7])
    assert epochs[1]["tow"] == 345601.0


def test_navsatfix_gps_fallback(tmp_path, rng):
    """pack_bag_gps also ingests plain NavSatFix (zero velocity)."""
    records = [("/fix", "sensor_msgs/NavSatFix", 5.0 + i,
                rosbag.encode_navsatfix(5.0 + i, 22.3 + 1e-5 * i, 114.18,
                                        4.0))
               for i in range(3)]
    bag = tmp_path / "navsat.bag"
    rosbag.write_mixed_bag(bag, records)
    t, lla, vel = rosbag.pack_bag_gps(bag, topic="/fix")
    assert lla.shape == (3, 3)
    np.testing.assert_array_equal(vel, 0.0)
    np.testing.assert_allclose(t, [5.0, 6.0, 7.0])
