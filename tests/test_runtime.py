from pathlib import Path

import numpy as np
import pytest

from toyslam_tpu.core import pcd_io
from toyslam_tpu.runtime import loader, native


def test_native_lib_builds_and_lzf():
    assert native.available()
    data = bytes(range(25)) * 4
    stream = b""
    for i in range(0, len(data), 30):
        chunk = data[i:i + 30]
        stream += bytes([len(chunk) - 1]) + chunk
    assert native.lzf_decompress(stream, len(data)) == data


def test_native_extract_xyzi(rng):
    pts = rng.normal(size=(100, 4)).astype(np.float32)
    raw = pts.tobytes()
    out = native.extract_xyzi(raw, 100, 16, 0, 4, 8, 12)
    np.testing.assert_array_equal(out, pts)


def test_scan_stack_loader(tmp_path, rng):
    paths = []
    for i in range(5):
        pts = rng.normal(size=(50 + i * 10, 4)).astype(np.float32)
        p = tmp_path / f"cloud_{i}.pcd"
        pcd_io.write_pcd(p, pts)
        paths.append(p)
    # numeric sort handles cloud_10 < cloud_2 correctly
    pcd_io.write_pcd(tmp_path / "cloud_10.pcd",
                     rng.normal(size=(30, 4)).astype(np.float32))
    files = loader.list_scan_files(tmp_path)
    assert [f.stem for f in files] == [f"cloud_{i}" for i in [0, 1, 2, 3, 4, 10]]

    xyzi, mask = loader.load_scan_stack(files, capacity=128)
    assert xyzi.shape == (6, 128, 4)
    assert mask[0].sum() == 50 and mask[4].sum() == 90 and mask[5].sum() == 30


def test_directory_watcher(tmp_path, rng):
    w = loader.DirectoryWatcher(tmp_path)
    assert w.poll() == []
    pcd_io.write_pcd(tmp_path / "cloud_0.pcd", rng.normal(size=(10, 4)).astype(np.float32))
    fresh = w.poll()
    assert len(fresh) == 1
    assert w.poll() == []


def test_scan_stream(tmp_path, rng):
    for i in range(3):
        pcd_io.write_pcd(tmp_path / f"cloud_{i}.pcd",
                         (rng.normal(size=(20, 4))).astype(np.float32))
    stream = loader.ScanStream(loader.list_scan_files(tmp_path), capacity=32)
    scans = list(stream)
    assert len(scans) == 3
    assert scans[0][0].shape == (32, 4)
    assert int(np.asarray(scans[0][1]).sum()) == 20


def test_rosbag_roundtrip_and_pipeline(tmp_path, rng):
    from toyslam_tpu.runtime import rosbag

    scans = [(0.1 * i, rng.normal(size=(100 + i, 4)).astype(np.float32))
             for i in range(4)]
    bag = tmp_path / "test.bag"
    rosbag.write_bag(bag, scans)

    out = list(rosbag.read_pointclouds(bag))
    assert len(out) == 4
    for (t0, pts0), (t1, pts1) in zip(scans, out):
        assert abs(t0 - t1) < 1e-6
        np.testing.assert_array_equal(pts0, pts1)

    # Generic message iteration sees topic + type
    msgs = list(rosbag.read_messages(bag))
    assert msgs[0][0] == "/velodyne_points"
    assert "PointCloud2" in msgs[0][2]


def test_native_pack_scans_matches_python(tmp_path, rng):
    """The C pthread batch packer (native/scanpack.c) must produce exactly
    what the Python thread-pool path produces, across ascii, binary and
    binary_compressed PCDs plus the real reference scan."""
    from toyslam_tpu.core import pcd_io
    from toyslam_tpu.runtime import loader, native

    if not native.available():
        pytest.skip("native library unavailable")

    pts = rng.normal(0, 10, (700, 4)).astype(np.float32)
    pts[5, 0] = np.nan  # an invalid point must mask out identically
    files = []
    for binary in (False, True):
        f = tmp_path / f"cloud_{len(files)}.pcd"
        pcd_io.write_pcd(f, pts, binary=binary)
        files.append(f)

    # binary_compressed: literal-only LZF (ctrl<32 = run of ctrl+1 bytes)
    # over the field-major payload PCL uses
    soa = np.concatenate([pts[:, c].copy() for c in range(4)]).tobytes()
    lit = bytearray()
    for i in range(0, len(soa), 32):
        chunk = soa[i:i + 32]
        lit.append(len(chunk) - 1)
        lit.extend(chunk)
    f = tmp_path / f"cloud_{len(files)}.pcd"
    header = ("# .PCD v0.7\nVERSION 0.7\nFIELDS x y z intensity\n"
              "SIZE 4 4 4 4\nTYPE F F F F\nCOUNT 1 1 1 1\n"
              f"WIDTH {len(pts)}\nHEIGHT 1\nVIEWPOINT 0 0 0 1 0 0 0\n"
              f"POINTS {len(pts)}\nDATA binary_compressed\n")
    with open(f, "wb") as fh:
        fh.write(header.encode())
        fh.write(np.uint32(len(lit)).tobytes())
        fh.write(np.uint32(len(soa)).tobytes())
        fh.write(bytes(lit))
    files.append(f)

    ref = Path("/root/reference/ndt_omp/data/251370668.pcd")
    if ref.exists():
        files.append(ref)

    cap = 70000
    nat = native.pack_scans(files, cap)
    assert nat is not None
    x_n, m_n = nat

    # Pure-python path (force the fallback)
    import unittest.mock as mock
    with mock.patch.object(native, "pack_scans", lambda *a, **k: None):
        x_p, m_p = loader.load_scan_stack(files, cap)

    np.testing.assert_array_equal(m_n, m_p)
    # NaN-safe exact comparison
    np.testing.assert_array_equal(np.nan_to_num(x_n, nan=12345.0),
                                  np.nan_to_num(x_p, nan=12345.0))


def test_rosbag_timestamp_spec_conformant(tmp_path):
    """Regression: the bag 2.0 `time` header field is secs(u32 LE) then
    nsecs(u32 LE). Hand-craft a record byte-for-byte per the spec (not via
    our own writer, which would mask a symmetric encode/decode bug) and
    check the decoded timestamp."""
    import struct

    from toyslam_tpu.runtime import rosbag

    def header_bytes(fields):
        out = b""
        for k, v in fields.items():
            entry = k.encode() + b"=" + v
            out += struct.pack("<I", len(entry)) + entry
        return out

    def record(fields, data):
        h = header_bytes(fields)
        return (struct.pack("<I", len(h)) + h
                + struct.pack("<I", len(data)) + data)

    sec, nsec = 1738856408, 123456789  # 2025-02-06T16:30:08.123456789
    conn_rec = record(
        {"op": b"\x07", "conn": struct.pack("<I", 0),
         "topic": b"/velodyne_points"},
        header_bytes({"topic": b"/velodyne_points",
                      "type": b"sensor_msgs/PointCloud2"}))
    # spec layout: secs first (low 4 bytes), then nsecs
    msg_rec = record(
        {"op": b"\x02", "conn": struct.pack("<I", 0),
         "time": struct.pack("<II", sec, nsec)},
        rosbag.encode_pointcloud2(np.zeros((3, 4), np.float32)))
    chunk = record({"op": b"\x05", "compression": b"none",
                    "size": struct.pack("<I", len(conn_rec + msg_rec))},
                   conn_rec + msg_rec)
    bag_hdr = record({"op": b"\x03", "index_pos": struct.pack("<Q", 0),
                      "conn_count": struct.pack("<I", 1),
                      "chunk_count": struct.pack("<I", 1)}, b" " * 4096)
    bag = tmp_path / "spec.bag"
    bag.write_bytes(b"#ROSBAG V2.0\n" + bag_hdr + chunk)

    msgs = list(rosbag.read_messages(bag))
    assert len(msgs) == 1
    assert abs(msgs[0][1] - (sec + nsec * 1e-9)) < 1e-7


def test_malformed_compressed_pcd_rejected(tmp_path):
    """Truncated/oversized binary_compressed payloads must be rejected by
    both the native packer (count slot -1 -> pack_scans None) and the
    pure-Python reader, not read out of bounds."""
    header = ("# .PCD v0.7\nVERSION 0.7\nFIELDS x y z intensity\n"
              "SIZE 4 4 4 4\nTYPE F F F F\nCOUNT 1 1 1 1\n"
              "WIDTH 100\nHEIGHT 1\nVIEWPOINT 0 0 0 1 0 0 0\n"
              "POINTS 100\nDATA binary_compressed\n").encode()

    bad = {
        # comp size claims more bytes than the file holds
        "oversized_comp": header + np.uint32(10_000).tobytes()
        + np.uint32(1600).tobytes() + b"\x00" * 16,
        # file ends inside the 8-byte comp/uncomp header
        "truncated_header": header + b"\x00\x01",
        # uncomp smaller than the SoA column extent (100 pts * 16 B)
        "short_uncomp": header + np.uint32(4).tobytes()
        + np.uint32(64).tobytes() + bytes([3]) + b"abcd",
    }
    files = []
    for name, blob in bad.items():
        f = tmp_path / f"{name}.pcd"
        f.write_bytes(blob)
        files.append(f)

    if native.available():
        assert native.pack_scans(files, 128) is None
    for f in files:
        with pytest.raises(ValueError):
            pcd_io.read_pcd(f)


def test_native_bag_pack_matches_python(tmp_path, rng):
    """The C one-pass bag reader (native/bagpack.c) must produce exactly
    the Python reader's packed output across none/bz2/lz4 chunk
    compression, NaN points, capacity overflow, and off-topic
    messages."""
    from toyslam_tpu.runtime import native, rosbag

    if not native.available():
        pytest.skip("native library unavailable")

    scans = [(100.0 + 0.1 * i,
              rng.normal(0, 10, (200 + 30 * i, 4)).astype(np.float32))
             for i in range(4)]
    scans[1][1][7, 2] = np.nan  # masks out, coords kept
    cap = 256  # scan 3 has 290 points -> capacity truncation path

    for comp in ("none", "bz2", "lz4"):
        bag = tmp_path / f"scans_{comp}.bag"
        rosbag.write_bag(bag, scans, compression=comp)
        blob = bag.read_bytes()
        assert native.bag_count_scans(blob, "/velodyne_points") == len(scans)
        nat = native.bag_pack_scans(blob, "/velodyne_points",
                                    len(scans), cap)
        assert nat is not None
        x_n, m_n, t_n, c_n, n = nat
        assert n == len(scans)

        import unittest.mock as mock
        with mock.patch.object(native, "bag_pack_scans",
                               lambda *a, **k: None):
            x_p, m_p, t_p, c_p = rosbag.pack_bag_scans(bag, capacity=cap)

        np.testing.assert_array_equal(m_n[:n], m_p)
        np.testing.assert_array_equal(np.nan_to_num(x_n[:n], nan=7.0),
                                      np.nan_to_num(x_p, nan=7.0))
        np.testing.assert_allclose(t_n[:n], t_p, atol=1e-7)
        np.testing.assert_array_equal(c_n[:n], c_p)
        assert c_n[3] == cap  # truncated to capacity
        assert not m_n[1, 7]  # NaN point masked

    # Off-topic messages must be skipped by connection filtering.
    bag2 = tmp_path / "other.bag"
    rosbag.write_bag(bag2, scans[:2], topic="/other_points")
    nat = native.bag_pack_scans(bag2.read_bytes(), "/velodyne_points",
                                4, cap)
    assert nat is not None and nat[4] == 0

    # Malformed framing must be rejected, not read out of bounds.
    good = (tmp_path / "scans_none.bag").read_bytes()
    for blob in (good[:40], good[:-10],
                 good[:20] + b"\xff\xff\xff\xff" + good[24:]):
        with pytest.raises(ValueError):
            native.bag_pack_scans(blob, "/velodyne_points", 4, cap)
