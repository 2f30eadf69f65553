"""Smoke tests for the standalone demo apps that run fully on CPU.

Each app is the headless user story of a reference node (see the app
docstrings); these tests drive them exactly as a user would — as a
subprocess CLI — at small sizes, and assert the artifacts + the app's
own success criterion (exit code 0).
"""

import csv
import json
import subprocess
import sys
from pathlib import Path

_REPO = Path(__file__).resolve().parents[1]


def _run(script, *cli):
    proc = subprocess.run(
        [sys.executable, str(_REPO / "apps" / script), *map(str, cli)],
        capture_output=True, text=True, timeout=600)
    assert proc.returncode == 0, (
        f"{script} exited {proc.returncode}\n"
        f"stdout:\n{proc.stdout}\nstderr:\n{proc.stderr}")
    return proc.stdout


def test_raim_demo_detects_and_excludes(tmp_path):
    out = _run("raim_demo.py", tmp_path, "--epochs", 24, "--fault-every", 6)
    assert "detection rate on faulted epochs: 100.00%" in out

    rows = list(csv.DictReader(open(tmp_path / "raim.csv")))
    assert len(rows) == 24
    faulted = [r for r in rows if int(r["fault_sat"]) >= 0]
    assert len(faulted) == 4
    # Exclusion must repair the fault-epoch position solution.
    for r in faulted:
        assert int(r["detected"]) == 1
        assert float(r["err_after_excl_m"]) < float(r["err_m"])

    lines = [json.loads(l) for l in open(tmp_path / "ellipse.jsonl")]
    assert len(lines) == 24
    assert all(l["semi_major_m"] >= l["semi_minor_m"] > 0 for l in lines)
    assert all(l["hpl_m"] > 0 and l["vpl_m"] > 0 for l in lines)


def test_urban_demo_raim_flags_nlos(tmp_path):
    out = _run("urban_demo.py", tmp_path, "--epochs", 16)
    assert "RAIM flags" in out

    lines = [json.loads(l) for l in open(tmp_path / "skyplot.jsonl")]
    assert len(lines) == 16
    classes = {s["class"] for l in lines for s in l["sats"]}
    assert classes == {"los", "blocked", "multipath"}
    assert all("pdop" in l and "hdop" in l for l in lines)

    rows = list(csv.DictReader(open(tmp_path / "pseudoranges.csv")))
    assert len(rows) == 16 * 24
    # Atmosphere is on by default: usable satellites carry real budgets.
    used = [r for r in rows if r["usable"] == "1"]
    assert used and all(float(r["tropo_m"]) > 0 for r in used)


def test_uwb_demo_fused_beats_raw(tmp_path):
    out = _run("uwb_demo.py", tmp_path, "--duration", 20,
               "--device", "cpu", "--seed", 1)
    # Both EvaPos solutions written, ESKF ATE printed and under the gate.
    assert (tmp_path / "solution_uwb.csv").exists()
    assert (tmp_path / "solution_eskf.csv").exists()
    anchors = json.load(open(tmp_path / "anchors.json"))["anchors"]
    assert len(anchors) == 8
    tri_ate = float(out.split("ATE ")[1].split(" m")[0])
    fused_ate = float(out.split("ATE ")[2].split(" m")[0])
    assert fused_ate < tri_ate, (tri_ate, fused_ate)
    assert fused_ate < 0.5


def test_mapping_demo_stream_matches_batch(tmp_path):
    """mapping_demo CLI: --stream (online mapping_step loop w/ checkpoints)
    must produce the same trajectory as the one-dispatch batch path, and a
    --resume rerun from the on-disk snapshot must reproduce it."""
    import numpy as np

    from toyslam_tpu.core import pcd_io

    rng = np.random.default_rng(7)
    n = 400
    base = np.stack([
        rng.uniform(-6, 6, n), rng.uniform(-6, 6, n),
        0.05 * rng.normal(size=n)], 1)
    wall = np.stack([
        rng.uniform(-6, 6, n // 2), np.full(n // 2, 3.0),
        rng.uniform(0, 2, n // 2)], 1)
    scene = np.concatenate([base, wall])
    scans = tmp_path / "scans"
    scans.mkdir()
    for i in range(4):
        pts = scene + np.array([0.1 * i, 0.02 * i, 0.0])
        pts = pts + 0.01 * rng.normal(size=pts.shape)
        xyzi = np.concatenate([pts, np.zeros((len(pts), 1))], 1)
        pcd_io.write_pcd(scans / f"cloud_{i}.pcd", xyzi.astype(np.float32))

    common = ("--device", "cpu", "--leaf", "0.4", "--capacity", "1024",
              "--map-capacity", "4096")
    _run("mapping_demo.py", scans, tmp_path / "batch", *common)
    _run("mapping_demo.py", scans, tmp_path / "stream", "--stream",
         "--checkpoint-every", "2", *common)

    t_batch = (tmp_path / "batch" / "trajectory.txt").read_text()
    t_stream = (tmp_path / "stream" / "trajectory.txt").read_text()
    assert t_batch == t_stream
    assert (tmp_path / "stream" / "mapping_state.npz").exists()

    out = _run("mapping_demo.py", scans, tmp_path / "stream", "--stream",
               "--resume", "--checkpoint-every", "2", *common)
    assert "resumed from" in out
    assert (tmp_path / "stream" / "trajectory.txt").read_text() == t_stream


def test_gnss_demo_bag_roundtrip_bit_identical(tmp_path):
    """Simulated epochs written as real-format gnss_comm/GnssMeasMsg
    records (lz4 bag) and replayed through --bag must solve to the SAME
    positions — the measurement round trip is exact (f64 in the bag)."""
    bag = tmp_path / "meas.bag"
    _run("gnss_demo.py", tmp_path / "sim", "--epochs", 8,
         "--write-bag", bag)
    out = _run("gnss_demo.py", tmp_path / "replay", "--epochs", 8,
               "--bag", bag)
    assert "8 GnssMeas epochs" in out

    def enu(p):
        rows = list(csv.DictReader(open(p / "gnss_position.csv")))
        return [(r["enu_e"], r["enu_n"], r["enu_u"]) for r in rows]

    assert enu(tmp_path / "sim") == enu(tmp_path / "replay")


def test_fusion_demo_bag_roundtrip(tmp_path):
    """Simulated IMU + fixes written as sensor_msgs/Imu + INSPVAX (lz4
    bag) replay through the smoother end-to-end (the reference's
    imuCallback/gpsCallback graph, uwb_imu_batch_node.cpp:3027,2284)."""
    bag = tmp_path / "sensors.bag"
    _run("fusion_demo.py", tmp_path / "sim", "--device", "cpu",
         "--duration", 5, "--write-bag", bag)
    out = _run("fusion_demo.py", tmp_path / "replay", "--device", "cpu",
               "--bag", bag)
    assert "GPS keyframes" in out
    # The replayed smoother must track the (identical) fixes closely.
    import re
    m = re.search(r"smoothed vs raw-fix RMSE:\s+([0-9.]+) m", out)
    assert m and float(m.group(1)) < 0.5, out
    assert (tmp_path / "replay" / "trajectory.txt").exists()
    assert (tmp_path / "replay" / "solution.csv").exists()
