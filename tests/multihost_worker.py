"""Worker process for the 2-process multihost CPU smoke test.

Launched by tests/test_multihost.py as:

    python multihost_worker.py <coordinator_addr> <process_id>

Each process contributes 2 virtual CPU devices (4 global). Exercises the
framework's DCN story end to end: ``initialize_multihost`` (DCN
coordination), global device enumeration, a cross-process collective (the
global sum runs over Gloo), and a data-parallel ``sharded_odometry`` fleet
whose per-process shards form one global batch.
"""

import os
import sys

import numpy as np

os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=2"
                           ).strip()

import jax

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from toyslam_tpu.parallel import batch as pbatch  # noqa: E402


def main():
    addr, pid = sys.argv[1], int(sys.argv[2])
    pbatch.initialize_multihost(coordinator_address=addr, num_processes=2,
                                process_id=pid)
    assert jax.process_count() == 2, jax.process_count()
    assert len(jax.devices()) == 4, jax.devices()
    # idempotent: a second call must be a no-op, not a crash
    pbatch.initialize_multihost(coordinator_address=addr, num_processes=2,
                                process_id=pid)

    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    mesh = pbatch.make_mesh()

    # Cross-process collective over DCN (Gloo CPU backend)
    local = np.full((2,), float(pid + 1), np.float32)
    arr = jax.make_array_from_process_local_data(
        NamedSharding(mesh, P("data")), local)
    total = float(jax.jit(jnp.sum)(arr))
    assert abs(total - 6.0) < 1e-6, total  # 1+1+2+2

    # Data-parallel odometry fleet: each process feeds its 2 local
    # sequences of a 4-sequence global batch.
    from toyslam_tpu.pipelines import odometry as odo
    from toyslam_tpu.registration import ndt

    graft = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "graft_entry", os.path.join(graft, "__graft_entry__.py"))
    ge = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ge)

    S, N = 3, 256
    local_xyzi = np.stack([
        ge._synthetic_scans(S, N, seed=2 * pid + b)[0] for b in range(2)])
    local_mask = np.ones((2, S, N), bool)
    sharding = NamedSharding(mesh, P("data"))
    g_xyzi = jax.make_array_from_process_local_data(sharding, local_xyzi)
    g_mask = jax.make_array_from_process_local_data(sharding, local_mask)

    cfg = odo.OdometryConfig(
        ndt=ndt.NDTConfig(resolution=1.0, max_iterations=5), scan_leaf=0.5)
    out = pbatch.sharded_odometry(mesh, g_xyzi, g_mask, cfg)
    jax.block_until_ready(out)
    for shard in out.poses.addressable_shards:
        assert np.isfinite(np.asarray(shard.data)).all()
    print(f"proc {pid}: {jax.process_count()} processes, "
          f"{len(jax.devices())} devices, sum {total}, odometry OK")


if __name__ == "__main__":
    main()
