#!/usr/bin/env python3
"""Per-stage timing of the 2MP band-tiled detection path on the real TPU.

Times each stage of the current stack — banded preprocess kernel, banded
OR-flood fill, fixpoint band CCL (+roots/slots), incidence-bounded stats —
plus the full fused program.  Dispatches are queued then forced once
(jax.block_until_ready does not block on the axon platform; every early
force pays the ~24 ms tunnel ack).

Run: python scripts/profile_2mp.py [batch]
For op-level attribution use jax.profiler.trace and aggregate the xplane
(see ROADMAP's perf notes); this script is the quick per-stage view.
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def force(x):
    if isinstance(x, (tuple, list)):
        return [force(v) for v in x]
    if hasattr(x, "_fields"):
        return [force(getattr(x, f)) for f in x._fields]
    return np.asarray(x.ravel()[0])


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    from bench import make_frames
    from heimdall_tpu.ops.preprocess_tiled import (
        contamination_preprocess_tiled)
    from heimdall_tpu.ops.ccl_tiled import (fill_holes_tiled,
                                            connected_components_tiled)
    from heimdall_tpu.ops.stats_tiled import blob_stats_tiled
    from heimdall_tpu.detectors.contamination_detector import (
        contamination_program)

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    band = int(sys.argv[2]) if len(sys.argv) > 2 else 128
    frames = make_frames(B, 1080, 1920, seed=2)
    x = jax.device_put(frames, jax.devices()[0])
    ct = jnp.int32(15)

    def timeit(name, fn, *a, iters=24):
        out = fn(*a)
        force(out)
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*a)
        force(out)
        dt = (time.perf_counter() - t0) / iters
        print(f"{name:36s} {dt*1000:8.2f} ms/batch "
              f"{dt/B*1000:6.3f} ms/frame", flush=True)
        return out

    # band=band everywhere: what the detector actually runs
    # (contamination_detector.py clamps tiled_band=256 to 128)
    binary, gray = timeit(
        "banded preprocess kernel",
        lambda x_: contamination_preprocess_tiled(x_, ct, band=band), x)
    mask = timeit("banded OR-flood fill",
                  lambda b: fill_holes_tiled(b > 0, band=band,
                                             adaptive=True), binary)
    lab, rl, nb, sl, sc = timeit(
        "fixpoint band CCL +roots+slots",
        lambda m: connected_components_tiled(
            m, connectivity=8, band=band, adaptive=True, return_roots=64,
            band_slots=True), mask)
    timeit("incidence-bounded stats",
           lambda: blob_stats_tiled(lab, mask, gray, x, band=band,
                                    max_blobs=64, root_table=rl,
                                    root_count=nb, slot_list=sl,
                                    slot_count=sc))

    # the shipped r5 path: table-global fill+CCL on padded planes
    from heimdall_tpu.ops.runtable_tiled import fill_label_runtable_tiled
    H = x.shape[1]
    binp, _grayp = contamination_preprocess_tiled(x, ct, band=band,
                                                  padded_out=True)
    force((binp,))
    timeit("table-global fill+CCL+roots (ship)",
           lambda b: fill_label_runtable_tiled(
               b, band=band, frame_h=H, max_blobs=64, r_bg=10, r_fg=8),
           binp)

    args = (ct, jnp.float32(3.0), jnp.float32(3000.0), jnp.float32(0.25))
    timeit("FULL program (table-global, ship)",
           lambda x_: contamination_program(x_, *args, tiled_band=256)[2],
           x)
    timeit("FULL program (banded fallback)",
           lambda x_: contamination_program(x_, *args, tiled_band=256,
                                            tiled_runtable=False)[2], x)


if __name__ == "__main__":
    main()
