"""Multi-host inspection lines: per-host feeders → one global mesh.

SURVEY.md §2.3's distributed story: the reference stubs its IPC transport
(rust/heimdall-ipc) and has no multi-node design; the TPU-native answer is
one host per set of camera NICs, each feeding its local chips, with the
global frame batch assembled as a jax.Array over the full (multi-host)
mesh — control-plane coordination over DCN happens inside JAX's runtime,
not in framework code.

Single-host processes degrade gracefully (the helpers become plain
device_put), so the same line code runs on a laptop, one TPU host, or a
multi-host slice.
"""

import logging
from typing import Optional

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

logger = logging.getLogger("heimdall.multihost")


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
    """Initialize JAX distributed (no-op for single-process lines)."""
    if num_processes is None or num_processes <= 1:
        logger.info("single-process line; skipping distributed init")
        return
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)


def global_mesh(data: int = -1, spatial: int = 1) -> Mesh:
    """A mesh over ALL devices in the (possibly multi-host) job."""
    from heimdall_tpu.parallel.mesh import make_mesh
    return make_mesh(data=data, spatial=spatial, devices=jax.devices())


def host_batch_to_global(mesh: Mesh, local_frames: np.ndarray,
                         spatial: bool = False):
    """Assemble each host's locally-acquired frames into one global array.

    Every host passes the [N_local, H, W, C] block its own cameras
    produced; the result is a global [N_local * n_hosts, H, W, C]
    jax.Array sharded over the mesh — the multi-host generalization of
    FrameSet.to_batch() + shard_batch().
    """
    sharding = NamedSharding(mesh, P(("data",) if not spatial
                                     else ("data", "spatial")))
    if jax.process_count() == 1:
        return jax.device_put(local_frames, sharding)
    return jax.make_array_from_process_local_data(sharding, local_frames)


def line_totals(per_host_counts: dict) -> dict:
    """All-reduce host-side counters across the job (frames/defects/...).

    Each host tiles its counter vector onto its local devices; a jitted
    global sum with a replicated out_sharding reduces over every device
    (XLA inserts the cross-host collective), and dividing by the local
    tile factor recovers the per-host sum.  Assumes homogeneous hosts
    (equal local_device_count — true for TPU slices).  The result is
    identical on every host; single-process jobs return the input
    unchanged.  Verified across a real process boundary by
    tests/test_multihost.py (a plain in-jit psum fails there: unbound
    axis name — shard_map-only).
    """
    if jax.process_count() == 1:
        return dict(per_host_counts)
    import jax.numpy as jnp

    keys = sorted(per_host_counts)
    vec = np.asarray([per_host_counts[k] for k in keys], np.float32)
    mesh = Mesh(np.asarray(jax.devices()).reshape(-1), ("d",))
    arr = jax.make_array_from_process_local_data(
        NamedSharding(mesh, P("d")),
        np.tile(vec[None], (jax.local_device_count(), 1)))
    summed = jax.jit(lambda x: jnp.sum(x, axis=0),
                     out_shardings=NamedSharding(mesh, P()))(arr)
    out = np.asarray(summed) / jax.local_device_count()
    return {k: float(v) for k, v in zip(keys, out)}
