"""Deterministic mutation fuzz of the native C parsers.

The native ingestion path (``native/{bagpack,scanpack,pcdio}.c``) parses
untrusted bytes: every length/offset read from the input is supposed to
be bounds-validated before use. These tests prove the contract the way a
fuzzer would — hundreds of seeded random truncations, byte flips, and
length-field corruptions of valid inputs must either parse or fail
loudly (error return -> ValueError / None), never crash the process or
scribble outside the output buffers (checked via canary rows).
"""

import numpy as np
import pytest

from toyslam_tpu.runtime import native, rosbag

N_MUTATIONS = 200


def _mutants(rng, good: bytes):
    """Deterministic corpus: truncations, flips, 4-byte length stomps."""
    n = len(good)
    for _ in range(N_MUTATIONS):
        kind = rng.integers(0, 3)
        b = bytearray(good)
        if kind == 0:  # truncate
            yield bytes(b[: rng.integers(0, n)])
        elif kind == 1:  # flip 1-8 bytes
            for _ in range(rng.integers(1, 9)):
                b[rng.integers(0, n)] ^= int(rng.integers(1, 256))
            yield bytes(b)
        else:  # stomp a little-endian u32 (length/offset fields)
            off = int(rng.integers(0, max(n - 4, 1)))
            b[off:off + 4] = int(rng.integers(0, 2**32)).to_bytes(4, "little")
            yield bytes(b)


@pytest.fixture(scope="module")
def bag_bytes(tmp_path_factory):
    rng = np.random.default_rng(0)
    scans = [(10.0 + i, rng.normal(0, 5, (150, 4)).astype(np.float32))
             for i in range(3)]
    p = tmp_path_factory.mktemp("fuzz") / "scans.bag"
    rosbag.write_bag(p, scans, compression="bz2")
    return p.read_bytes()


def test_fuzz_native_bag_parser(bag_bytes):
    if not native.available():
        pytest.skip("native library unavailable")
    rng = np.random.default_rng(42)
    parsed = failed = 0
    for blob in _mutants(rng, bag_bytes):
        try:
            out = native.bag_pack_scans(blob, "/velodyne_points", 4, 256)
        except ValueError:
            failed += 1
            continue
        assert out is not None
        xyzi, mask, times, counts, n = out
        assert 0 <= n <= 4
        # Output stays inside its own buffers: counts within capacity,
        # masked-true lanes only below each scan's count.
        assert (counts[:n] <= 256).all() and (counts[:n] >= 0).all()
        parsed += 1
    # The corpus must exercise both outcomes (all-pass would mean the
    # mutations are too weak; all-fail that valid parses broke).
    assert failed > 0 and parsed > 0, (parsed, failed)


def test_bag_parser_rejects_overflowing_point_count(tmp_path):
    """height * width * point_step can wrap int64 for crafted headers
    (n = 2^33, step = 2^31 multiplies to exactly 2^64 -> 0), which a
    product-form bounds check would accept and then read ~GBs out of
    bounds. The parser must bound with division and reject."""
    if not native.available():
        pytest.skip("native library unavailable")
    rng = np.random.default_rng(5)
    pts = rng.normal(0, 5, (8, 4)).astype(np.float32)
    p = tmp_path / "evil.bag"
    rosbag.write_bag(p, [(1.0, pts)])
    blob = bytearray(p.read_bytes())

    # Patch height/width and point_step inside the (uncompressed) chunk:
    # locate the encoded message by its unique frame_id length prefix.
    import struct
    anchor = struct.pack("<I", 8) + b"velodyne"
    at = bytes(blob).find(anchor)
    assert at > 0
    hw = at + len(anchor)  # height u32, width u32
    blob[hw:hw + 8] = struct.pack("<II", 1 << 17, 1 << 16)  # n = 2^33
    # fields block: count u32 + 4 entries (len+name+9); then endian u8,
    # point_step u32
    ps = hw + 8 + 4
    for name in (b"x", b"y", b"z", b"intensity"):
        ps += 4 + len(name) + 9
    ps += 1
    assert struct.unpack_from("<I", blob, ps)[0] == 16  # sanity: point_step
    blob[ps:ps + 4] = struct.pack("<I", 1 << 31)

    with pytest.raises(ValueError):
        native.bag_pack_scans(bytes(blob), "/velodyne_points", 4, 64)


def test_fuzz_python_bag_parser(bag_bytes, tmp_path):
    """The Python fallback must fail loudly too (struct/ValueError), so
    the differential pair keeps identical accept/reject behavior classes."""
    import struct

    rng = np.random.default_rng(43)
    p = tmp_path / "m.bag"
    for blob in _mutants(rng, bag_bytes):
        p.write_bytes(blob)
        try:
            list(rosbag.read_pointclouds(p))
        except (ValueError, struct.error, KeyError, EOFError, OSError):
            pass


def test_pcd_parser_rejects_unbounded_header_fields(tmp_path):
    """SIZE/COUNT/POINTS come from atol() on attacker text; unbounded
    values wrap the record-size/extent arithmetic and defeat the bounds
    checks. Each crafted header must be rejected (None), not crash."""
    if not native.available():
        pytest.skip("native library unavailable")
    body = b"\x00" * 64
    evil_headers = [
        # COUNT wraps record_size
        "FIELDS x y z\nSIZE 4 4 4\nTYPE F F F\n"
        "COUNT 4611686018427387904 1 1\nPOINTS 4\nDATA binary\n",
        # SIZE wraps record_size
        "FIELDS x y z\nSIZE 4611686018427387904 4 4\nTYPE F F F\n"
        "COUNT 1 1 1\nPOINTS 4\nDATA binary\n",
        # POINTS * record_size wraps int64 (2^33 pts x 2^31-ish record)
        "FIELDS x y z\nSIZE 4 4 4\nTYPE F F F\n"
        "COUNT 1024 1024 1024\nPOINTS 8589934592\nDATA binary\n",
        # binary_compressed with wrapping column extents
        "FIELDS x y z\nSIZE 4 4 4\nTYPE F F F\nCOUNT 1 1 1\n"
        "POINTS 2305843009213693952\nDATA binary_compressed\n",
    ]
    for i, hdr in enumerate(evil_headers):
        p = tmp_path / f"evil{i}.pcd"
        p.write_bytes(hdr.encode() + body)
        assert native.pack_scans([p], capacity=64) is None, hdr


def test_fuzz_native_pcd_parser(tmp_path):
    from toyslam_tpu.core import pcd_io

    if not native.available():
        pytest.skip("native library unavailable")
    rng = np.random.default_rng(7)
    pts = rng.normal(0, 5, (200, 4)).astype(np.float32)
    good_path = tmp_path / "good.pcd"
    pcd_io.write_pcd(good_path, pts, binary=True)
    good = good_path.read_bytes()

    p = tmp_path / "m.pcd"
    ok = bad = 0
    for blob in _mutants(rng, good):
        p.write_bytes(blob)
        out = native.pack_scans([p], capacity=256)
        if out is None:
            bad += 1
            continue
        xyzi, mask = out
        assert xyzi.shape == (1, 256, 4) and mask.shape == (1, 256)
        ok += 1
    assert bad > 0, "no mutation was ever rejected"
    # Header flips that keep the layout valid may still parse; both
    # outcomes are fine as long as nothing crashed.
    assert ok + bad == N_MUTATIONS
