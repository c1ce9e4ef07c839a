#!/usr/bin/env python3
"""Reduction harness for the TPU XLA associative-scan CCL miscompile.

The whole-frame scan CCL (ops/ccl.py) produces wrong labels on TPU once
the label image is large — observed at [16,1080,1920] and [32,480,640]
(~9.8M elements): a few foreground pixels drop from their component, so
one blob's area comes out a few pixels short (ROADMAP.md).  CPU XLA, the
band-tiled Pallas path, and cv2 all agree with each other.

This script runs a ladder of progressively simpler programs on the
current default JAX device and checks each against an independent
reference (numpy doubling scans for the primitives; the cv2-parity-tested
band-tiled Pallas path for full programs):

  1. one segmented min-scan along the last axis,
  2. one segmented min-scan along rows (axis -2),
  3. one full CCL sweep (neighbor-min + 4 directional scans),
  4. the fixpoint CCL alone,
  5. the fixpoint CCL alone on the bench-scene mask,
  6. fill_holes + CCL fused in ONE jit,
  7. the full detector program.

Measured on v5e at [32,480,640] (2026-08-17): rungs 1-5 PASS, rung 6
FAILS (118 wrong label elements, first at (3,127,239)), rung 7 FAILS.
So neither the scans nor the CCL while_loop alone miscompile — the bug
appears when the hole-fill flood's while_loop and the CCL's while_loop
are composed into one XLA program (fill output feeding CCL without
materialization).  Everything PASSES on CPU at every size, and the
detector sidesteps the bug by routing big workloads to the tiled path.

Run: python -u scripts/repro_xla_ccl_miscompile.py [B H W]
"""

import sys

import numpy as np

sys.path.insert(0, ".")


def np_seg_min_scan(values, is_reset, axis, reverse):
    """Segmented running min, numpy Hillis-Steele doubling (independent of
    XLA's associative_scan codegen; int64 so no overflow games)."""
    v = np.moveaxis(values.astype(np.int64).copy(), axis, -1)
    blocked = np.moveaxis(is_reset.copy(), axis, -1)
    if reverse:
        v = v[..., ::-1]
        blocked = blocked[..., ::-1]
    n = v.shape[-1]
    big = np.int64(1) << 60

    def shift(x, d, fill):
        out = np.empty_like(x)
        out[..., :d] = fill
        out[..., d:] = x[..., :-d]
        return out

    d = 1
    while d < n:
        vs = shift(v, d, big)
        bs = shift(blocked, d, True)
        v = np.where(blocked, v, np.minimum(v, vs))
        blocked = blocked | bs
        d *= 2
    if reverse:
        v = v[..., ::-1]
    return np.moveaxis(v, -1, axis).astype(values.dtype)


def main():
    import jax
    import jax.numpy as jnp
    from heimdall_tpu.ops import ccl

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    H = int(sys.argv[2]) if len(sys.argv) > 2 else 480
    W = int(sys.argv[3]) if len(sys.argv) > 3 else 640
    print(f"device={jax.devices()[0]}  shape=[{B},{H},{W}]", flush=True)

    rng = np.random.RandomState(0)
    mask = rng.rand(B, H, W) < 0.55          # percolating
    sentinel = H * W
    lin = (np.arange(H, dtype=np.int32)[:, None] * W
           + np.arange(W, dtype=np.int32)[None, :])
    labels0 = np.where(mask, lin, sentinel).astype(np.int32)
    is_bg = ~mask

    jl = jnp.asarray(labels0)
    jbg = jnp.asarray(is_bg)
    jmask = jnp.asarray(mask)

    def check(name, got, want):
        got = np.asarray(got)
        bad = got != want
        status = "PASS" if not bad.any() else (
            f"FAIL ({bad.sum()} wrong elements, "
            f"first at {tuple(int(i) for i in np.argwhere(bad)[0])})")
        print(f"{name:44s} {status}", flush=True)
        return not bad.any()

    # rung 1: one segmented min scan along the last axis
    got = jax.jit(lambda v, r: ccl._segmented_min_scan(v, r, -1, False))(
        jl, jbg)
    check("segmented min scan axis=-1", got,
          np_seg_min_scan(labels0, is_bg, -1, False))

    # rung 2: along rows
    got = jax.jit(lambda v, r: ccl._segmented_min_scan(v, r, -2, False))(
        jl, jbg)
    check("segmented min scan axis=-2", got,
          np_seg_min_scan(labels0, is_bg, -2, False))

    # rung 3: one full sweep
    def one_sweep(lab, m, bg):
        lab = ccl._neighbor_min(lab, sentinel, 8)
        lab = jnp.where(m, lab, sentinel)
        for axis, reverse in ((-1, False), (-1, True), (-2, False),
                              (-2, True)):
            lab = ccl._segmented_min_scan(lab, bg, axis, reverse)
            lab = jnp.where(m, lab, sentinel)
        return lab

    def np_one_sweep(lab):
        padded = np.pad(lab, ((0, 0), (1, 1), (1, 1)),
                        constant_values=sentinel)
        nm = lab.copy()
        for di in (-1, 0, 1):
            for dj in (-1, 0, 1):
                if di == 0 and dj == 0:
                    continue
                nm = np.minimum(nm, padded[:, 1 + di:1 + di + H,
                                           1 + dj:1 + dj + W])
        nm = np.where(mask, nm, sentinel)
        for axis, reverse in ((-1, False), (-1, True), (-2, False),
                              (-2, True)):
            nm = np_seg_min_scan(nm, is_bg, axis, reverse)
            nm = np.where(mask, nm, sentinel)
        return nm

    got = jax.jit(one_sweep)(jl, jmask, jbg)
    want = np_one_sweep(labels0)
    check("one full CCL sweep", got, want)

    # rung 4: fixpoint CCL vs the band-tiled Pallas path (itself parity-
    # tested against cv2 and CPU XLA)
    from heimdall_tpu.ops.ccl_tiled import connected_components_tiled
    got = ccl.connected_components(jmask, connectivity=8)
    want = np.asarray(connected_components_tiled(
        jmask, connectivity=8, band=256, sweeps=2, adaptive=True))
    check("fixpoint connected_components (vs tiled)", got, want)

    # rungs 5-7: the production composition.  Standalone rungs 1-4 PASS
    # at [32,480,640]; rung 7 (the whole detector program in one jitted
    # XLA program) FAILS there — a blob's area comes out a few px short —
    # so the miscompile needs the fused program context, not the scan
    # shapes alone.  Rungs 5/6 bisect which sub-composition trips it.
    import jax.numpy as jnp2
    from bench import make_frames
    from heimdall_tpu.ops.preprocess_tiled import (
        contamination_preprocess_tiled)
    from heimdall_tpu.ops.ccl_tiled import fill_holes_tiled
    from heimdall_tpu.detectors.contamination_detector import (
        contamination_program)
    frames = jax.device_put(make_frames(B, H, W), jax.devices()[0])
    binary, _ = contamination_preprocess_tiled(frames, jnp2.int32(15))
    scene_mask = jnp2.asarray(fill_holes_tiled(binary > 0))

    got = ccl.connected_components(scene_mask, connectivity=8)
    want = np.asarray(connected_components_tiled(
        scene_mask, connectivity=8, band=256, sweeps=2, adaptive=True))
    check("CCL alone on the bench-scene mask", got, want)

    @jax.jit
    def fill_then_ccl(m):
        filled = ccl.fill_holes(m, sweeps=0)
        return ccl.connected_components(filled, connectivity=8, sweeps=0)

    got = fill_then_ccl(binary > 0)
    filled_t = fill_holes_tiled(binary > 0)
    want = np.asarray(connected_components_tiled(
        filled_t, connectivity=8, band=256, sweeps=2, adaptive=True))
    check("fill_holes + CCL fused in one jit", got, want)

    args = (jnp2.int32(15), jnp2.float32(0.0), jnp2.float32(1e9),
            jnp2.float32(0.0))
    t_x, _, _ = contamination_program(frames, *args, max_blobs=64,
                                      ccl_sweeps=0, tiled_band=0)
    t_t, _, _ = contamination_program(frames, *args, max_blobs=64,
                                      ccl_sweeps=0, tiled_band=256)
    check("full detector program, whole-frame XLA vs tiled",
          np.asarray(t_x.area_px), np.asarray(t_t.area_px))


if __name__ == "__main__":
    main()
