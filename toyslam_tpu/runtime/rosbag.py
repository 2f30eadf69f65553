"""Minimal ROS1 bag (format 2.0) reader + PointCloud2 decoder, pure Python.

Capability port of the reference's bag replay
(``ndt_rosbag_mapping_node.cpp:27-78``: ``rosbag::View`` over
``/velodyne_points`` + ``pcl::fromROSMsg``) without ROS: parses the bag
record structure (op 0x03 bag header, 0x07 connection, 0x05 chunk with
none/bz2 compression, 0x02 message data, 0x04/0x06 index/chunk-info
skipped), and decodes ``sensor_msgs/PointCloud2`` payloads to float32
[n, 4] xyzi arrays.

A matching minimal writer exists for tests (uncompressed, one connection).
"""

from __future__ import annotations

import bz2
import struct
from pathlib import Path

import numpy as np

_MAGIC = b"#ROSBAG V2.0\n"


def _parse_header(data: bytes) -> dict:
    fields = {}
    pos = 0
    while pos < len(data):
        (flen,) = struct.unpack_from("<I", data, pos)
        pos += 4
        entry = data[pos:pos + flen]
        pos += flen
        key, _, value = entry.partition(b"=")
        fields[key.decode()] = value
    return fields


def _read_record(buf: bytes, pos: int):
    (hlen,) = struct.unpack_from("<I", buf, pos)
    header = _parse_header(buf[pos + 4: pos + 4 + hlen])
    pos += 4 + hlen
    (dlen,) = struct.unpack_from("<I", buf, pos)
    data = buf[pos + 4: pos + 4 + dlen]
    return header, data, pos + 4 + dlen


def read_messages(path: str | Path, topics=None):
    """Yield (topic, time_sec, datatype, raw_message_bytes) from a bag."""
    buf = Path(path).read_bytes()
    if not buf.startswith(_MAGIC):
        raise ValueError("not a ROS bag v2.0 file")
    pos = len(_MAGIC)
    connections = {}

    def handle_stream(stream: bytes):
        p = 0
        while p < len(stream):
            h, d, p = _read_record(stream, p)
            op = h.get("op", b"")[0] if h.get("op") else None
            if op == 0x07:  # connection
                (conn,) = struct.unpack("<I", h["conn"])
                conn_fields = _parse_header(d)
                connections[conn] = {
                    "topic": h["topic"].decode(),
                    "type": conn_fields.get("type", b"").decode(),
                }
            elif op == 0x02:  # message data
                (conn,) = struct.unpack("<I", h["conn"])
                # bag 2.0 `time` field is secs (u32 LE) then nsecs (u32 LE),
                # so secs land in the LOW 32 bits of the little-endian u64.
                sec, nsec = struct.unpack("<II", h["time"])
                info = connections.get(conn, {"topic": "?", "type": "?"})
                t_sec = sec + nsec * 1e-9
                yield info["topic"], t_sec, info["type"], d

    while pos < len(buf):
        header, data, pos = _read_record(buf, pos)
        op = header.get("op", b"")[0] if header.get("op") else None
        if op == 0x05:  # chunk
            compression = header.get("compression", b"none").decode()
            if compression == "bz2":
                payload = bz2.decompress(data)
            elif compression == "none":
                payload = data
            else:
                raise ValueError(f"unsupported chunk compression: {compression}")
            for item in handle_stream(payload):
                topic = item[0]
                if topics is None or topic in topics:
                    yield item
        elif op in (0x03, 0x04, 0x06, 0x07, 0x02):
            # bag header / index / chunk info / stray records outside chunks
            if op == 0x07:
                (conn,) = struct.unpack("<I", header["conn"])
                conn_fields = _parse_header(data)
                connections[conn] = {
                    "topic": header["topic"].decode(),
                    "type": conn_fields.get("type", b"").decode(),
                }


def decode_pointcloud2(raw: bytes) -> np.ndarray:
    """sensor_msgs/PointCloud2 -> float32 [n, 4] xyzi.

    Serialized layout: std_msgs/Header (seq u32, stamp 2xu32, frame_id
    string), height u32, width u32, fields[], is_bigendian u8, point_step
    u32, row_step u32, data[], is_dense u8.
    """
    pos = 0
    pos += 4 + 8  # seq + stamp
    (flen,) = struct.unpack_from("<I", raw, pos)
    pos += 4 + flen  # frame_id
    height, width = struct.unpack_from("<II", raw, pos)
    pos += 8
    (n_fields,) = struct.unpack_from("<I", raw, pos)
    pos += 4
    fields = {}
    for _ in range(n_fields):
        (nlen,) = struct.unpack_from("<I", raw, pos)
        pos += 4
        name = raw[pos:pos + nlen].decode()
        pos += nlen
        offset, datatype, count = struct.unpack_from("<IBI", raw, pos)
        pos += 9
        fields[name] = (offset, datatype, count)
    is_bigendian = raw[pos]
    pos += 1
    (point_step,) = struct.unpack_from("<I", raw, pos)
    pos += 4
    (row_step,) = struct.unpack_from("<I", raw, pos)
    pos += 4
    (dlen,) = struct.unpack_from("<I", raw, pos)
    pos += 4
    data = raw[pos:pos + dlen]

    n = height * width
    if is_bigendian:
        raise ValueError("big-endian PointCloud2 not supported")

    def col(name):
        if name not in fields:
            return None
        offset, datatype, _ = fields[name]
        if datatype != 7:  # FLOAT32
            raise ValueError(f"field {name}: only FLOAT32 supported")
        return np.ndarray((n,), np.float32, data, offset, (point_step,)).copy()

    x, y, z = col("x"), col("y"), col("z")
    i = col("intensity")
    if i is None:
        i = np.zeros_like(x)
    return np.stack([x, y, z, i], 1).astype(np.float32)


def read_pointclouds(path: str | Path, topic: str = "/velodyne_points"):
    """Yield (time_sec, xyzi [n, 4]) for every PointCloud2 on a topic
    (the reference's rosbag::View loop, ``ndt_rosbag_mapping_node.cpp:
    42-50``)."""
    for tpc, t, typ, raw in read_messages(path, topics={topic}):
        if "PointCloud2" in typ or typ == "?":
            yield t, decode_pointcloud2(raw)


def pack_bag_scans(path: str | Path, topic: str = "/velodyne_points",
                   capacity: int = 131072, max_scans: int | None = None):
    """One-pass bag -> packed device layout.

    Parses every PointCloud2 on `topic` straight into the fixed-capacity
    [S, capacity, 4] float32 xyzi + [S, capacity] mask stack the device
    pipelines consume, plus [S] timestamps and raw point counts — the
    native equivalent of the reference's rosbag::View + pcl::fromROSMsg
    ingestion (``ndt_rosbag_mapping_node.cpp:27-78``). Uses the C reader
    (native/bagpack.c, threadable ctypes ABI) when available; the pure
    Python fallback below is differential-tested byte-identical.

    With ``max_scans=None`` the buffers are sized by a count-only native
    pre-pass (framing + connection filtering, no cloud decode, no Python
    per-message objects); pass ``max_scans`` explicitly to make the
    ingestion a single pass over the (already in-memory) bytes.
    """
    from toyslam_tpu.runtime import loader, native

    buf = Path(path).read_bytes() if native.available() else None
    if max_scans is None:
        # Count-only pre-pass to size the packed buffers: native when
        # available (framing-only, no decode, no Python per-message
        # objects), else the Python reader's metadata iteration.
        counted = native.bag_count_scans(buf, topic) if buf is not None \
            else None
        max_scans = counted if counted is not None else sum(
            1 for _, _, typ, _ in read_messages(path, topics={topic})
            if "PointCloud2" in typ or typ == "?")
    packed = native.bag_pack_scans(buf, topic, max_scans, capacity) \
        if buf is not None else None
    if packed is not None:
        xyzi, mask, times, counts, n = packed
        return (xyzi[:n], mask[:n], times[:n], counts[:n])
    xyzi = np.full((max_scans, capacity, 4), 1.0e9, np.float32)
    xyzi[..., 3] = 0.0
    mask = np.zeros((max_scans, capacity), bool)
    times = np.zeros((max_scans,), np.float64)
    counts = np.zeros((max_scans,), np.int64)
    n = 0
    for t, pts in read_pointclouds(path, topic):
        if n >= max_scans:
            break
        xyzi[n], mask[n] = loader.pack_scan(pts, capacity)
        times[n] = t
        counts[n] = min(len(pts), capacity)
        n += 1
    return xyzi[:n], mask[:n], times[:n], counts[:n]


# ---------------------------------------------------------------------------
# Minimal writer (tests / dataset repacking)
# ---------------------------------------------------------------------------


def _header_bytes(fields: dict) -> bytes:
    out = b""
    for k, v in fields.items():
        entry = k.encode() + b"=" + v
        out += struct.pack("<I", len(entry)) + entry
    return out


def _record(fields: dict, data: bytes) -> bytes:
    h = _header_bytes(fields)
    return struct.pack("<I", len(h)) + h + struct.pack("<I", len(data)) + data


def encode_pointcloud2(xyzi: np.ndarray, stamp_sec: float = 0.0,
                       frame_id: str = "velodyne") -> bytes:
    xyzi = np.ascontiguousarray(xyzi, np.float32)
    n = len(xyzi)
    out = b""
    sec = int(stamp_sec)
    nsec = int((stamp_sec - sec) * 1e9)
    out += struct.pack("<III", 0, sec, nsec)
    fid = frame_id.encode()
    out += struct.pack("<I", len(fid)) + fid
    out += struct.pack("<II", 1, n)  # height, width
    names = ["x", "y", "z", "intensity"]
    out += struct.pack("<I", len(names))
    for k, name in enumerate(names):
        nb = name.encode()
        out += struct.pack("<I", len(nb)) + nb
        out += struct.pack("<IBI", 4 * k, 7, 1)
    out += struct.pack("<B", 0)  # little endian
    out += struct.pack("<I", 16)  # point_step
    out += struct.pack("<I", 16 * n)  # row_step
    body = xyzi.tobytes()
    out += struct.pack("<I", len(body)) + body
    out += struct.pack("<B", 1)  # is_dense
    return out


def write_bag(path: str | Path, messages, topic: str = "/velodyne_points",
              datatype: str = "sensor_msgs/PointCloud2",
              compression: str = "none") -> None:
    """Write (time_sec, xyzi) pairs as a minimal bag (none/bz2 chunks)."""
    chunks = b""
    conn_fields = _header_bytes({
        "topic": topic.encode(), "type": datatype.encode(),
        "md5sum": b"0" * 32, "message_definition": b"",
    })
    conn_rec = _record({"op": b"\x07", "conn": struct.pack("<I", 0),
                        "topic": topic.encode()}, conn_fields)
    msg_recs = b""
    for t_sec, xyzi in messages:
        sec = int(t_sec)
        nsec = int((t_sec - sec) * 1e9)
        t_field = struct.pack("<II", sec, nsec)  # secs low, nsecs high
        msg_recs += _record(
            {"op": b"\x02", "conn": struct.pack("<I", 0), "time": t_field},
            encode_pointcloud2(xyzi, t_sec),
        )
    chunk_payload = conn_rec + msg_recs
    if compression == "bz2":
        chunk_data = bz2.compress(chunk_payload)
    elif compression == "none":
        chunk_data = chunk_payload
    else:
        raise ValueError(f"unsupported compression: {compression}")
    chunk = _record({"op": b"\x05", "compression": compression.encode(),
                     "size": struct.pack("<I", len(chunk_payload))},
                    chunk_data)
    bag_header = _record(
        {"op": b"\x03", "index_pos": struct.pack("<Q", 0),
         "conn_count": struct.pack("<I", 1),
         "chunk_count": struct.pack("<I", 1)},
        b" " * 4096,  # reference tools pad the header record
    )
    Path(path).write_bytes(_MAGIC + bag_header + chunk)
