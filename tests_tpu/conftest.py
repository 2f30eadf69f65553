"""On-hardware test lane (VERDICT r2 item 3).

Unlike ``tests/conftest.py`` (which forces an 8-virtual-device CPU mesh so
the suite runs anywhere), this lane runs on the REAL backend the
environment provides — the axon TPU chip in production. Every test here
is skipped unless ``jax.default_backend() == "tpu"``, so

    python -m pytest tests_tpu/ -q

is a no-op on CI CPU boxes and the on-chip validation pass on a TPU host.
x64 stays OFF: this lane validates the production f32 surface; f64 oracles
(tests/golden_ndt.py) are NumPy and run host-side regardless.

First-compile latency on the axon chip is 20-40 s per program; the lane is
deliberately small — roughly one test per hardware claim. The claim list
lives in ``test_on_tpu.py``'s module docstring (the single source of
truth; this file stopped enumerating it after the two drifted, ADVICE r4).
"""

import os
import subprocess
import sys

import pytest
import numpy as np

# Make tests/ importable for the shared f64 golden oracle.
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))

import jax  # noqa: E402


def _probe_backend(timeout_s: float = 180.0) -> str:
    """Resolve the default backend in a SUBPROCESS with a deadline.

    ``jax.default_backend()`` in this process would block forever when the
    axon relay is down (the PJRT client retries the pool connection
    indefinitely — observed r3); probing out-of-process turns a dead
    tunnel into a clean skip instead of a hung pytest."""
    try:
        out = subprocess.run(
            [sys.executable, "-c",
             "import jax; print(jax.default_backend())"],
            capture_output=True, text=True, timeout=timeout_s)
    except subprocess.TimeoutExpired:
        return "unreachable"
    if out.returncode != 0 or not out.stdout.strip():
        return "error"
    return out.stdout.strip().splitlines()[-1]


def pytest_collection_modifyitems(config, items):
    # Collection hooks fire session-wide, not per-directory: in a combined
    # `pytest tests tests_tpu` run this conftest sees the CPU suite's
    # items too and must only mark its own.
    here = os.path.dirname(os.path.abspath(__file__))
    ours = [it for it in items
            if str(getattr(it, "path", "")).startswith(here)]
    if not ours:
        return
    backend = _probe_backend()
    if backend == "tpu":
        return
    skip = pytest.mark.skip(
        reason=f"tests_tpu/ requires a real TPU backend (probe: {backend})")
    for item in ours:
        item.add_marker(skip)


REF_DATA = "/root/reference/ndt_omp/data"


@pytest.fixture(scope="session")
def sample_pcds():
    from toyslam_tpu.core import pcd_io

    target = pcd_io.read_pcd(f"{REF_DATA}/251370668.pcd")
    source = pcd_io.read_pcd(f"{REF_DATA}/251371071.pcd")
    return target, source


@pytest.fixture()
def rng():
    return np.random.default_rng(42)
