"""LZ4 frame codec tests: roundtrip, spec-feature decode, Python-vs-C
differential, malformed-input rejection, and lz4 bag replay.

The reference replays arbitrary rosbags through the rosbag API
(``ndt_rosbag_mapping_node.cpp:36-47``), which links roslz4 — real ROS
bags (including public UrbanNav releases) commonly use lz4-compressed
chunks. ``runtime/lz4f.py`` (pure Python) and ``native/bagpack.c``
``lz4f_decompress`` (C) implement the standard LZ4 Frame format; these
tests pin them against each other and against hand-built frames
exercising the format features our greedy encoder never emits.
"""

import struct

import numpy as np
import pytest

from toyslam_tpu.runtime import lz4f, native, rosbag


def _payloads(rng):
    return [
        b"",
        b"a",
        b"abcabcabcabcabcabcabcabc" * 40,          # periodic, overlap matches
        bytes(rng.integers(0, 256, 5000, dtype=np.uint8)),   # incompressible
        bytes(rng.integers(0, 4, 200000, dtype=np.uint8)),   # multi-block
        (b"\x00" * 70000) + b"tail",               # long runs, block boundary
        b"The quick brown fox jumps over the lazy dog. " * 1000,
    ]


def test_roundtrip_python(rng):
    for data in _payloads(rng):
        frame = lz4f.compress(data)
        assert lz4f.decompress(frame) == data


def test_roundtrip_native_decoder(rng):
    if not native.available():
        pytest.skip("native library unavailable")
    for data in _payloads(rng):
        frame = lz4f.compress(data)
        out = native.lz4f_decompress(frame, len(data))
        assert out == data


def _frame(body_blocks, flg=0x60, bd=0x40, content_size=None,
           content_checksum=False):
    """Hand-assemble a frame so decode-side features our encoder never
    emits (content size, block checksums, stored blocks) get coverage."""
    out = struct.pack("<I", 0x184D2204)
    desc = bytearray([flg, bd])
    if content_size is not None:
        desc += struct.pack("<Q", content_size)
    out += bytes(desc)
    out += bytes([(lz4f._xxh32(bytes(desc)) >> 8) & 0xFF])
    for comp, raw in body_blocks:
        if comp is None:  # stored
            out += struct.pack("<I", len(raw) | 0x80000000) + raw
        else:
            out += struct.pack("<I", len(comp)) + comp
        if (flg >> 4) & 1:  # block checksum present
            blob = raw if comp is None else comp
            out += struct.pack("<I", lz4f._xxh32(blob))
    out += struct.pack("<I", 0)
    if content_checksum:
        total = b"".join(r for _, r in body_blocks)
        out += struct.pack("<I", lz4f._xxh32(total))
    return out


def test_decode_format_features(rng):
    data = bytes(rng.integers(0, 8, 3000, dtype=np.uint8))
    comp = lz4f._compress_block(data)
    cases = [
        # stored block
        _frame([(None, data)]),
        # compressed block + content size flag
        _frame([(comp, data)], flg=0x68, content_size=len(data)),
        # block checksums present (skipped by both decoders)
        _frame([(comp, data)], flg=0x70),
        # content checksum trailer
        _frame([(comp, data)], flg=0x64, content_checksum=True),
        # skippable frame before the real one
        struct.pack("<II", 0x184D2A53, 7) + b"1234567"
        + _frame([(None, data)]),
        # two frames back to back
        _frame([(None, data)]) + _frame([(comp, data)]),
    ]
    expected = [data, data, data, data, data, data + data]
    for frame, want in zip(cases, expected):
        assert lz4f.decompress(frame) == want
        if native.available():
            assert native.lz4f_decompress(frame, len(want)) == want


def test_malformed_frames_rejected(rng):
    data = bytes(rng.integers(0, 8, 500, dtype=np.uint8))
    good = lz4f.compress(data)
    bad_magic = b"\x00\x00\x00\x00" + good[4:]
    bad_hc = good[:6] + bytes([good[6] ^ 0xFF]) + good[7:]
    truncated = good[: len(good) // 2]
    oob_match = _frame([(b"\x10aa\x05\x00\x00", b"")])  # offset 5 > output
    for blob in (bad_magic, bad_hc, truncated, oob_match):
        with pytest.raises(lz4f.LZ4Error):
            lz4f.decompress(blob)
        if native.available():
            with pytest.raises(ValueError):
                native.lz4f_decompress(blob, 4096)
    if native.available():
        # Output capacity overflow must error, not truncate.
        with pytest.raises(ValueError):
            native.lz4f_decompress(good, len(data) - 1)


def test_lz4_bag_roundtrip(tmp_path, rng):
    """write_bag(compression='lz4') -> Python reader replay (the native
    path is covered by test_runtime.test_native_bag_pack_matches_python)."""
    scans = [(10.0 + 0.1 * i,
              rng.normal(0, 5, (150, 4)).astype(np.float32))
             for i in range(3)]
    bag = tmp_path / "scans_lz4.bag"
    rosbag.write_bag(bag, scans, compression="lz4")
    got = list(rosbag.read_pointclouds(bag))
    assert len(got) == 3
    for (t0, pts0), (t1, pts1) in zip(scans, got):
        assert abs(t0 - t1) < 1e-6
        np.testing.assert_array_equal(pts0, pts1)
