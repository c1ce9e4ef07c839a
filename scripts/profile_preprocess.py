#!/usr/bin/env python3
"""Micro-profile of the fused preprocess stages on TPU.

Isolates where the ~150 us/frame preprocess cost lives: the Q8 int blur5,
the f32 mean11, morphology, and concat-based vs roll-based shifts —
variants with deliberately wrong borders exist ONLY for timing.

Usage: python scripts/profile_preprocess.py [batch] [iters]
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

    cm = jax.device_put(
        jnp.transpose(jnp.asarray(frames), (0, 3, 1, 2)), dev)
    ct = jnp.asarray(15, jnp.int32).reshape(1)

    taps5 = _q8_taps(gaussian_kernel_1d(5, 0.0))
    k11 = [float(t) for t in gaussian_kernel_1d(11, 0.0)]

    def conv_roll(x, taps, axis):
        # WRONG borders (wraparound) — timing only
        r = len(taps) // 2
        out = None
        for i, t in enumerate(taps):
            term = t * pltpu.roll(x, (r - i) % x.shape[axis], axis)
            out = term if out is None else out + term
        return out

    def gray_of(frame_ref):
        b = frame_ref[0, 0].astype(jnp.int32)
        g = frame_ref[0, 1].astype(jnp.int32)
        r = frame_ref[0, 2].astype(jnp.int32)
        return (b * 3735 + g * 19235 + r * 9798 + (1 << 14)) >> 15

    def make(stage):
        def kernel(ct_ref, frame_ref, out_ref):
            gray = gray_of(frame_ref)
            if stage == "gray":
                out_ref[0] = gray
                return
            if stage.endswith("_roll"):
                ca = lambda x, t, ax, m: conv_roll(x, t, ax)  # noqa: E731
            else:
                ca = pk._conv_axis
            acc = ca(ca(gray, taps5, 1, "reflect101"), taps5, 0,
                     "reflect101")
            blurred = jnp.clip((acc + (1 << 15)) >> 16, 0, 255)
            if stage.startswith("blur5"):
                out_ref[0] = blurred
                return
            mf = ca(ca(blurred.astype(jnp.float32), k11, 1, "replicate"),
                    k11, 0, "replicate")
            mean = jnp.rint(mf).astype(jnp.int32)
            binary = jnp.where(blurred <= mean - ct_ref[0], 255, 0)
            if stage.startswith("mean11"):
                out_ref[0] = binary
                return
            binary = pk._minmax3(pk._minmax3(binary, True), False)
            binary = pk._minmax3(pk._minmax3(binary, False), True)
            out_ref[0] = binary

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

    def bench_fn(name, fn, *args):
        out = fn(*args)
        np.asarray(out[0, 0, 0])
        infl = []
        t0 = time.perf_counter()
        for _ in range(iters):
            infl.append(fn(*args))
        for o in infl:
            np.asarray(o[0, 0, 0])
        dt = time.perf_counter() - t0
        us = dt / iters / batch * 1e6
        print(f"{name:24s} {us:9.1f} us/frame", flush=True)
        return us

    results = {}
    for stage in ("gray", "blur5", "blur5_roll", "mean11", "mean11_roll",
                  "full", "full_roll"):
        results[stage] = bench_fn(stage, make(stage), cm)

    g = results["gray"]
    print(f"\nincrements (us/frame): gray={g:.0f}  "
          f"blur5={results['blur5']-g:.0f} "
          f"(roll {results['blur5_roll']-g:.0f})  "
          f"mean11={results['mean11']-results['blur5']:.0f} "
          f"(roll {results['mean11_roll']-results['blur5_roll']:.0f})  "
          f"morph={results['full']-results['mean11']:.0f}", flush=True)


if __name__ == "__main__":
    main()
