"""Test configuration: run on a virtual 8-device CPU mesh.

The environment's sitecustomize registers the axon TPU plugin and forces
``jax_platforms="axon,cpu"`` via jax.config (which overrides the
JAX_PLATFORMS env var), so we must reset the config value here — before any
backend is initialized — and request 8 virtual CPU devices for sharding
tests.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["XLA_FLAGS"] = flags

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
try:
    from jax._src import xla_bridge as _xb

    if _xb.backends_are_initialized():
        from jax.extend.backend import clear_backends

        clear_backends()
except Exception:
    pass

import pytest  # noqa: E402
import numpy as np  # noqa: E402

REF_DATA = "/root/reference/ndt_omp/data"


@pytest.fixture(scope="session")
def sample_pcds():
    from toyslam_tpu.core import pcd_io

    target = pcd_io.read_pcd(f"{REF_DATA}/251370668.pcd")
    source = pcd_io.read_pcd(f"{REF_DATA}/251371071.pcd")
    return target, source


@pytest.fixture(autouse=True, scope="module")
def _bound_jit_accumulation():
    """XLA CPU 0.9.0 segfaults inside ``backend_compile_and_load`` once a
    single process has accumulated the full suite's compiled executables
    (4/4 full-suite runs crashed at the same late-suite compile — eager
    ``lax.scan`` in preintegrate — while the same tests pass in a fresh
    process; serializing codegen did not help). Most tests build fresh
    ``jax.jit`` wrappers, so executables pile up monotonically; dropping
    the caches at each module boundary keeps the JIT arena bounded at
    roughly one file's worth."""
    yield
    import gc

    jax.clear_caches()
    gc.collect()


@pytest.fixture()
def rng():
    # Function-scoped on purpose: a shared session RNG makes every test's
    # data depend on which tests ran before it (adding a test elsewhere
    # silently changes another test's random inputs).
    return np.random.default_rng(42)
