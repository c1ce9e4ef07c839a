"""Worker for the 2-process jax.distributed CPU test (test_multihost.py).

Run as: python _multihost_worker.py <process_id> <num_processes> <port>
Each process gets 2 virtual CPU devices; the pair forms a 4-device global
mesh across a real process boundary, exercising host_batch_to_global and
line_totals the way a multi-host line would.
"""

import os
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]

flags = os.environ.get("XLA_FLAGS", "")
os.environ["XLA_FLAGS"] = (
    flags + " --xla_force_host_platform_device_count=2").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.sharding import NamedSharding, PartitionSpec as P  # noqa: E402

from heimdall_tpu.parallel import multihost  # noqa: E402


def main():
    multihost.initialize(coordinator_address=f"localhost:{port}",
                         num_processes=nproc, process_id=pid)
    assert jax.process_count() == nproc, jax.process_count()
    assert jax.device_count() == 2 * nproc, jax.device_count()

    mesh = multihost.global_mesh()

    # -- host_batch_to_global: each "host" contributes distinct frames ----
    local = np.full((4, 8, 16, 3), 10 * (pid + 1), np.uint8)
    arr = multihost.host_batch_to_global(mesh, local)
    assert arr.shape == (4 * nproc, 8, 16, 3), arr.shape

    # the global mean sees every host's block: (10 + 20) / 2 = 15
    mean = jax.jit(lambda x: jnp.mean(x.astype(jnp.float32)),
                   out_shardings=NamedSharding(mesh, P()))(arr)
    got = float(mean)
    want = sum(10 * (p + 1) for p in range(nproc)) / nproc
    assert abs(got - want) < 1e-5, (got, want)

    # per-host shard content round-trips: local shards hold this host's rows
    for s in arr.addressable_shards:
        np.testing.assert_array_equal(np.asarray(s.data),
                                      local[:s.data.shape[0]])

    # -- line_totals: all-reduce of host-side counters --------------------
    counts = {"frames": 100.0 * (pid + 1), "defects": float(pid + 1)}
    totals = multihost.line_totals(counts)
    want_frames = sum(100.0 * (p + 1) for p in range(nproc))
    want_defects = sum(float(p + 1) for p in range(nproc))
    assert abs(totals["frames"] - want_frames) < 1e-6, totals
    assert abs(totals["defects"] - want_defects) < 1e-6, totals

    print(f"WORKER {pid} OK", flush=True)


if __name__ == "__main__":
    main()
