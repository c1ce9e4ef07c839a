#!/usr/bin/env python3
"""A/B: classic fill->CCL composition vs the joint dual-class fixpoint
(_label_flood_joint) on the real TPU, with ladder-parameter sweeps.

Variants are label-kernel-only (preprocess + labeling, no stats) so the
comparison isolates the propagation machinery; the full fused detect is
timed for both at the end.  Protocol: deep pipeline, force only the last
result, one untimed burner loop first (the first pipelined loop in a
fresh process absorbs a ~0.25 ms/frame one-off — r4 finding).

Usage: python scripts/profile_joint_variants.py [batch] [iters]
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
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from bench import make_frames
    from heimdall_tpu.ops import pallas_kernels as pk
    from heimdall_tpu.ops.filters import gaussian_kernel_1d, _q8_taps

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    frames = make_frames(batch)
    H, W = frames.shape[1], frames.shape[2]
    dev = jax.devices()[0]
    print(f"device: {dev}  batch={batch} iters={iters}", flush=True)

    cm = jnp.transpose(jnp.asarray(frames), (0, 3, 1, 2))
    cm = jax.device_put(cm, dev)
    ct = jnp.asarray(15, jnp.int32).reshape(1)

    sentinel = H * W
    taps5 = _q8_taps(gaussian_kernel_1d(5, 0.0))
    k11 = [float(t) for t in gaussian_kernel_1d(11, 0.0)]

    def preprocess_body(ct_ref, frame_ref):
        b = frame_ref[0, 0].astype(jnp.int32)
        g = frame_ref[0, 1].astype(jnp.int32)
        r = frame_ref[0, 2].astype(jnp.int32)
        gray = (b * 3735 + g * 19235 + r * 9798 + (1 << 14)) >> 15
        acc = pk._conv_axis_pair_int(
            pk._conv_axis_pair_int(gray, taps5, 1, "reflect101"),
            taps5, 0, "reflect101")
        blurred = jnp.clip((acc + (1 << 15)) >> 16, 0, 255)
        mf = pk._conv_axis(pk._conv_axis(blurred.astype(jnp.float32), k11,
                                         1, "replicate"), k11, 0,
                           "replicate")
        mean = jnp.rint(mf).astype(jnp.int32)
        binary = jnp.where(blurred <= mean - ct_ref[0], 255, 0)
        binary = pk._minmax3(pk._minmax3(binary, True), False)
        binary = pk._minmax3(pk._minmax3(binary, False), True)
        return (binary > 0).astype(jnp.int32)

    def make_labels(mode, **kw):
        def kernel(ct_ref, frame_ref, out_ref):
            row_idx = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)
            col_idx = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
            fg0 = preprocess_body(ct_ref, frame_ref)
            border = ((row_idx == 0) | (row_idx == H - 1)
                      | (col_idx == 0)
                      | (col_idx == W - 1)).astype(jnp.int32)
            if mode == "classic":
                fg = pk._fill_holes_sweeps(fg0, border, 2, adaptive=True)
                lin = row_idx * W + col_idx
                lab = pk._ccl_sweeps(jnp.where(fg > 0, lin, sentinel), fg,
                                     sentinel, 2, adaptive=True,
                                     scan_steps=5)
            else:
                lab, _ = pk._label_flood_joint(fg0, border, sentinel, **kw)
            out_ref[0] = lab

        gs = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=(batch,),
            in_specs=[pl.BlockSpec((1, 3, H, W), lambda i, c: (i, 0, 0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=[pl.BlockSpec((1, H, W), lambda i, c: (i, 0, 0),
                                    memory_space=pltpu.VMEM)])

        @jax.jit
        def run(x):
            return pl.pallas_call(
                kernel, grid_spec=gs,
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=100 * 1024 * 1024),
                out_shape=(jax.ShapeDtypeStruct((batch, H, W), jnp.int32),),
            )(ct, x)[0]
        return run

    def bench_fn(name, fn, *args, slice_=(0, 0, 0), burn=False):
        t0 = time.perf_counter()
        out = fn(*args)
        np.asarray(out[slice_] if isinstance(slice_, tuple) else out)
        tc = time.perf_counter() - t0
        if burn:
            infl = [fn(*args) for _ in range(iters)]
            np.asarray(infl[-1][slice_])
            del infl
        infl = []
        t0 = time.perf_counter()
        for _ in range(iters):
            infl.append(fn(*args))
        np.asarray(infl[-1][slice_])
        dt = time.perf_counter() - t0
        del infl
        us = dt / iters / batch * 1e6
        print(f"{name:36s} {us:9.1f} us/frame   "
              f"({batch*iters/dt:8.1f} fps)  [compile/load {tc:.1f}s]",
              flush=True)
        return us

    # burner on the first variant only (absorbs the fresh-process one-off)
    classic = make_labels("classic")
    bench_fn("labels classic (burner)", classic, cm, burn=True)
    t_classic = bench_fn("labels classic", classic, cm)
    ref = np.asarray(classic(cm))

    variants = [
        ("joint rowFull col5", dict(ss_row=None, ss_col=5)),
        ("joint rowFull col4", dict(ss_row=None, ss_col=4)),
        ("joint rowFull col6", dict(ss_row=None, ss_col=6)),
        ("joint row7 col5", dict(ss_row=7, ss_col=5)),
    ]
    for name, kw in variants:
        fn = make_labels("joint", **kw)
        got = np.asarray(fn(cm))
        eq = "labels==" if np.array_equal(got, ref) else "LABELS DIFFER!"
        t = bench_fn(f"{name} [{eq}]", fn, cm)
        print(f"    vs classic: {t - t_classic:+.1f} us/frame", flush=True)

    # full fused detect, classic vs joint
    from heimdall_tpu.ops.pallas_kernels import contamination_pallas_detect

    def full(joint):
        @jax.jit
        def run(x):
            t, c, a = contamination_pallas_detect(
                x, 15, 10.0, 3000.0, 0.25, max_blobs=64, adaptive=True,
                sweeps=2, scan_steps=5, channel_major=True, joint=joint)
            return a
        return run
    fa = full(False)
    fb = full(True)
    ra = fa(cm)
    rb = fb(cm)
    eq = ("accepted==" if np.array_equal(np.asarray(ra), np.asarray(rb))
          else "ACCEPTED DIFFER!")
    t_fa = bench_fn("full detect classic", fa, cm, slice_=(0, 0))
    t_fb = bench_fn(f"full detect joint [{eq}]", fb, cm, slice_=(0, 0))
    print(f"\nfull detect: classic {t_fa:.1f} vs joint {t_fb:.1f} us/frame "
          f"({t_fb - t_fa:+.1f})", flush=True)


if __name__ == "__main__":
    main()
