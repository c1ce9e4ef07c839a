#!/usr/bin/env python3
"""Stage-by-stage timing of the fused whole-frame Pallas detection path.

Builds truncated variants of ops/pallas_kernels.py's label kernel
(preprocess only / +hole-fill / +CCL) plus the stats kernel, and times
each on the real TPU with the bench protocol (device-resident, deep
pipeline, force once at the end).  Used to target kernel optimization —
run before and after kernel changes.

Usage: python scripts/profile_fused.py [batch] [iters]
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

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    frames = make_frames(batch)
    H, W = frames.shape[1], frames.shape[2]
    K = 64
    dev = jax.devices()[0]
    print(f"device: {dev}  batch={batch} iters={iters}", flush=True)

    cm = jnp.transpose(jnp.asarray(frames), (0, 3, 1, 2))
    cm = jax.device_put(cm, dev)
    ct = jnp.asarray(15, jnp.int32).reshape(1)

    sentinel = H * W
    from heimdall_tpu.ops.filters import gaussian_kernel_1d, _q8_taps
    taps5 = _q8_taps(gaussian_kernel_1d(5, 0.0))
    k11 = [float(t) for t in gaussian_kernel_1d(11, 0.0)]

    def preprocess_body(ct_ref, frame_ref):
        b = frame_ref[0, 0].astype(jnp.int32)
        g = frame_ref[0, 1].astype(jnp.int32)
        r = frame_ref[0, 2].astype(jnp.int32)
        gray = (b * 3735 + g * 19235 + r * 9798 + (1 << 14)) >> 15
        acc = pk._conv_axis(pk._conv_axis(gray, taps5, 1, "reflect101"),
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

    def make_variant(stage):
        # stages mirror the SHIPPED detector config (r5: run-table fill
        # rt_fill=12 and run-table CCL rt_ccl=8; plane-sweep comparisons
        # live in scripts/profile_{fill,ccl}_variants.py)
        def kernel(ct_ref, frame_ref, out_ref):
            row_idx = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)
            col_idx = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
            fg0 = preprocess_body(ct_ref, frame_ref)
            if stage == "pre":
                out_ref[0] = fg0
                return
            border = ((row_idx == 0) | (row_idx == H - 1)
                      | (col_idx == 0)
                      | (col_idx == W - 1)).astype(jnp.int32)
            fg = pk._fill_runtable(fg0, border, Rmax=12)
            if stage == "fill":
                out_ref[0] = fg
                return
            lin = row_idx * W + col_idx
            lab = pk._ccl_runtable(jnp.where(fg > 0, lin, sentinel), fg,
                                   sentinel, Rmax=8)
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

    def bench_fn(name, fn, *args, slice_=(0, 0, 0)):
        out = fn(*args)
        np.asarray(out[slice_] if isinstance(slice_, tuple) else out)
        # launch all, force only the last (in-order execution): one ~30 ms
        # fetch RTT in the whole window instead of one per iteration
        infl = []
        t0 = time.perf_counter()
        for _ in range(iters):
            infl.append(fn(*args))
        np.asarray(infl[-1][slice_])
        dt = time.perf_counter() - t0
        del infl
        us = dt / iters / batch * 1e6
        print(f"{name:28s} {us:9.1f} us/frame   "
              f"({batch*iters/dt:8.1f} fps)", flush=True)
        return us

    t_pre = bench_fn("preprocess only", make_variant("pre"), cm)
    t_fill = bench_fn("pre+fill(adaptive)", make_variant("fill"), cm)
    t_ccl = bench_fn("pre+fill+ccl (=kernel A)", make_variant("ccl"), cm)

    # stats kernel B on real labels
    lab = make_variant("ccl")(cm)
    lab = jax.device_put(jax.block_until_ready(lab), dev)

    stats_kernel = pk._make_stats_kernel(H, W, K)
    gs_b = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=(batch,),
        in_specs=[
            pl.BlockSpec((1, 3, H, W), lambda i, c: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H, W), lambda i, c: (i, 0, 0),
                         memory_space=pltpu.VMEM)],
        out_specs=[
            pl.BlockSpec((1, pk.N_SUMS, K), lambda i, c: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4, K), lambda i, c: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4, K), lambda i, c: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1), lambda i, c: (i, 0, 0),
                         memory_space=pltpu.VMEM)])

    @jax.jit
    def run_stats(x, l):
        return pl.pallas_call(
            stats_kernel, grid_spec=gs_b,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
            out_shape=(
                jax.ShapeDtypeStruct((batch, pk.N_SUMS, K), jnp.int32),
                jax.ShapeDtypeStruct((batch, 4, K), jnp.int32),
                jax.ShapeDtypeStruct((batch, 4, K), jnp.int32),
                jax.ShapeDtypeStruct((batch, 1, 1), jnp.int32)),
        )(ct, x, l)[0]

    t_stats = bench_fn("stats (kernel B)", run_stats, cm, lab)

    from heimdall_tpu.ops.pallas_kernels import contamination_pallas_detect

    @jax.jit
    def full(x):
        t, c, a = contamination_pallas_detect(
            x, 15, 10.0, 3000.0, 0.25, max_blobs=K, adaptive=True,
            sweeps=2, scan_steps=5, channel_major=True,
            rt_ccl=8, rt_fill=12)
        return a
    t_full = bench_fn("full detect (A+B+gates)", full, cm, slice_=(0, 0))

    print(f"\nbreakdown: pre={t_pre:.0f}  fill={t_fill-t_pre:.0f}  "
          f"ccl={t_ccl-t_fill:.0f}  stats={t_stats:.0f}  "
          f"glue={t_full-t_ccl-t_stats:.0f}  (us/frame)", flush=True)


if __name__ == "__main__":
    main()
