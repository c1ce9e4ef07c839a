#!/usr/bin/env python3
"""Compile + run the spatially-sharded band-tiled kernels on the REAL TPU.

VERDICT r4 weak #7: every execution of parallel/tiled_sp.py had been
interpret-mode CPU (virtual meshes); the sp wrappers change grid/BlockSpec
shapes (e.g. band 90) that Mosaic had never lowered on hardware.  A
1-device ("data", "spatial") mesh makes every collective an identity but
still lowers and runs the exact sp kernel code on the chip:

  * band request 128 -> pick_band gives 120 (the 1-chip layout),
  * band request 90  -> 72 x 15 bands (pick_band now refuses 8-unaligned
    bands: the first run of this check caught Mosaic REJECTING the old
    (1, 90, W) BlockSpec that CPU interpret runs had always accepted —
    4-chip Hl = 270 shards now run as one full-height 270-row band).

Asserts the sp results equal the single-chip tiled detector output at the
2 MP ship shape.  Run standalone; cache entries it writes should be
committed (CLAUDE.md policy).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(
                          os.path.dirname(os.path.abspath(__file__))),
                          ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    from jax.sharding import Mesh

    from bench import scene_params, synth_frames_device
    from heimdall_tpu.parallel.tiled_sp import (make_tiled_spatial_step,
                                                pick_band)
    from heimdall_tpu.detectors.contamination_detector import (
        contamination_program)

    dev = jax.devices()[0]
    print(f"device: {dev}", flush=True)
    assert jax.default_backend() != "cpu", "this check needs the real TPU"

    B, H, W = 2, 1080, 1920
    frames = synth_frames_device(scene_params(B, H, W, seed=2), H, W)
    np.asarray(frames[0, 0, 0])

    # single-chip tiled reference (the shipping detector route)
    ref = contamination_program(frames, jnp.int32(15), jnp.float32(3.0),
                                jnp.float32(3000.0), jnp.float32(0.25),
                                ccl_sweeps=6, tiled_band=256)
    ref_t, ref_conf, ref_acc = ref
    ref_acc = np.asarray(ref_acc)

    mesh = Mesh(np.asarray(jax.devices()[:1]).reshape(1, 1),
                ("data", "spatial"))
    for req in (128, 90):
        b = pick_band(H, req)
        t0 = time.perf_counter()
        step = make_tiled_spatial_step(mesh, band=req, max_blobs=64,
                                       interpret=False)
        table, conf, acc = step(frames, 15, 3.0, 3000.0, 0.25)
        acc = np.asarray(acc)
        dt = time.perf_counter() - t0
        ok = np.array_equal(acc, ref_acc)
        for f in ("valid", "area_px", "cx", "cy", "x", "y", "w", "h"):
            ok &= np.array_equal(np.asarray(getattr(table, f)),
                                 np.asarray(getattr(ref_t, f)))
        print(f"sp band request {req} (band {b} x {H // b} bands) on "
              f"{dev.platform}: compiled+ran in {dt:.1f}s, results "
              f"{'EQUAL single-chip tiled' if ok else 'DIFFER!'}",
              flush=True)
        if not ok:
            sys.exit(1)

    # the exact per-shard shape a 4-chip spatial mesh produces for 1080
    # rows: Hl = 270 -> ONE full-height 270-row band (270 = 2*3^3*5 has
    # no 8-aligned divisor; Mosaic only accepts the band == Hl block).
    # Lower + run the banded flood/CCL kernels at that shape on the chip.
    from heimdall_tpu.ops import ccl_tiled
    Hs = 270
    mask_s = (np.asarray(frames[:, :Hs, :, 0]) < 100)
    t0 = time.perf_counter()
    filled = ccl_tiled.fill_holes_tiled(jnp.asarray(mask_s), band=Hs)
    lab, rl_s, nb_s = ccl_tiled.connected_components_tiled(
        filled, connectivity=8, band=Hs, adaptive=True, return_roots=32)
    np.asarray(lab[0, 0, 0])
    print(f"shard-shape kernels (band {Hs} == Hl, [2, {Hs}, 1920]) "
          f"compiled+ran on {dev.platform} in "
          f"{time.perf_counter() - t0:.1f}s; blobs {np.asarray(nb_s)}",
          flush=True)
    print("SP-ON-TPU: ALL OK", flush=True)


if __name__ == "__main__":
    main()
