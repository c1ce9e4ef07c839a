"""Device-mesh construction for multi-chip inspection lines.

The reference scales with one thread per station on a single host
(heimdall/core/system.py:78-83) and stubs out its distributed transport
(rust/heimdall-ipc — manifest only).  The TPU-native scaling model
(SURVEY.md §2.3) is a 2-D ``jax.sharding.Mesh``:

  * ``data``    — frames (stations x bottles) sharded across chips; the
                  batched replacement for thread-per-station.
  * ``spatial`` — the image H axis sharded across chips for the stencil
                  phase (the structural analog of context parallelism for
                  frames that exceed one chip's comfort).

Collectives ride ICI inside a slice; multi-host lines extend the same mesh
over DCN with each host feeding its local chips (runtime/feeder.py).
"""

from typing import Optional, Sequence

import numpy as np
import jax
from jax.sharding import Mesh


def make_mesh(data: int = -1, spatial: int = 1,
              devices: Optional[Sequence] = None) -> Mesh:
    """Build a ("data", "spatial") mesh.

    data=-1 uses all remaining devices after the spatial split.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if spatial <= 0:
        spatial = 1
    if data == -1:
        if n % spatial:
            raise ValueError(f"{n} devices not divisible by spatial={spatial}")
        data = n // spatial
    if data * spatial > n:
        raise ValueError(
            f"mesh {data}x{spatial} needs {data*spatial} devices, have {n}")
    grid = np.asarray(devices[:data * spatial]).reshape(data, spatial)
    return Mesh(grid, axis_names=("data", "spatial"))


def mesh_info(mesh: Mesh) -> dict:
    return {
        "axis_names": list(mesh.axis_names),
        "shape": dict(mesh.shape),
        "n_devices": int(np.prod(list(mesh.shape.values()))),
        "devices": [str(d) for d in mesh.devices.flat],
    }
