#!/usr/bin/env python3
"""Bisect the CCL stage cost (r4: 65 us/frame of the 132 us total):
time preprocess+fill+CCL kernels with one CCL ingredient swapped at a
time on the real TPU.  Subtract the known pre+fill cost (~60 us/frame,
scripts/profile_fill_variants.py) for the CCL-only figure.

Variants:
  cur        shipped _ccl_sweeps (guards + masked scans, MXU pack, ss5,
             nb-based certificate)
  ss4        scan ladders truncated to 4 steps (reach 15; certificate
             covers correctness)
  ss6        scan ladders at 6 steps (reach 63)
  cheapcert  certificate = "labels unchanged across the unit" (monotone
             phases: unchanged total => every step unchanged) — drops the
             nb+select cert for a compare+reduce, carries prev labels
  noguard    no guard rows: sublane rolls via iota-where fills (r3 form)
  fixed2     fixed 2 units, no certificate (TIMING PROBE ONLY — tail
             frames may be under-converged, equality not asserted)

Usage: python scripts/profile_ccl_variants.py [batch] [iters] [only...]
"""

import math
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
    only = set(sys.argv[3:])
    frames = make_frames(batch)
    H, W = frames.shape[1], frames.shape[2]
    dev = jax.devices()[0]
    print(f"device: {dev}  batch={batch} iters={iters}", flush=True)

    cm = jax.device_put(
        jnp.transpose(jnp.asarray(frames), (0, 3, 1, 2)), dev)
    ct = jnp.asarray(15, jnp.int32).reshape(1)
    taps5 = _q8_taps(gaussian_kernel_1d(5, 0.0))
    k11 = [float(t) for t in gaussian_kernel_1d(11, 0.0)]
    sentinel = H * W

    def front_body(ct_ref, frame_ref):
        row_idx = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)
        col_idx = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
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
        fg0 = (binary > 0).astype(jnp.int32)
        border = ((row_idx == 0) | (row_idx == H - 1)
                  | (col_idx == 0)
                  | (col_idx == W - 1)).astype(jnp.int32)
        fg = pk._fill_holes_sweeps(fg0, border, 2, adaptive=True)
        lab0 = jnp.where(fg > 0, row_idx * W + col_idx, sentinel)
        return lab0, fg

    def ccl_param(lab, fg, ss, cert, guard, fixed=None):
        Hc, Wc = lab.shape
        G = 8 if guard else 0
        Hg = Hc + 2 * G
        if guard:
            srow = jnp.full((G, Wc), sentinel, lab.dtype)
            zrow = jnp.zeros((G, Wc), fg.dtype)
            labx = jnp.concatenate([srow, lab, srow], axis=0)
            fgx = jnp.concatenate([zrow, fg, zrow], axis=0)
        else:
            labx, fgx = lab, fg
        big = 1 << max(1, math.ceil(math.log2(sentinel + 2)))
        mk_r = pk._EdgeMasks(Wc)
        mk_t = pk._EdgeMasks(Hg)
        rb_r = pk._run_pack(fgx, big, mk_r)
        fg_t = jnp.transpose(fgx)
        rb_t = pk._run_pack(fg_t, big, mk_t)

        def nb(l):
            row = jnp.minimum(l, jnp.minimum(
                pk._roll_lane(l, 1) + mk_r.pen_f[0],
                pk._roll_lane(l, -1) + mk_r.pen_b[0]))
            if guard:
                return jnp.minimum(row, jnp.minimum(
                    pltpu.roll(row, 1, 0), pltpu.roll(row, Hg - 1, 0)))
            return jnp.minimum(row, jnp.minimum(
                pk._shift_const(row, 1, 0, sentinel),
                pk._shift_const(row, -1, 0, sentinel)))

        def phase_r(l):
            l = jnp.where(fgx > 0, nb(l), sentinel)
            return jnp.where(fgx > 0,
                             pk._run_min_packed(l, rb_r, mk_r,
                                                max_steps=ss), sentinel)

        def phase_c(l):
            l = jnp.where(fgx > 0, nb(l), sentinel)
            lt = jnp.transpose(l)
            lt = jnp.where(fg_t > 0,
                           pk._run_min_packed(lt, rb_t, mk_t,
                                              max_steps=ss), sentinel)
            return jnp.transpose(lt)

        def unit3(l):
            return phase_r(phase_c(phase_r(l)))

        def strip(l):
            if guard:
                return jax.lax.slice_in_dim(l, G, G + Hc, axis=0)
            return l

        if fixed is not None:
            l = labx
            for _ in range(fixed):
                l = unit3(l)
            return strip(l)

        if cert == "cheap":
            def cond(c):
                return c[2] > 0

            def body(c):
                old = c[0]
                new = unit3(old)
                return new, old, jnp.max(jnp.where(new < old, 1, 0))

            out = jax.lax.while_loop(
                cond, body, (labx, labx, jnp.int32(1)))[0]
            # one extra unit runs after convergence is reached (the
            # cert observes the PREVIOUS unit) — cheaper per-iteration,
            # one more unit in total
            return strip(out)

        def cond(c):
            return c[1] > 0

        def body(c):
            l = unit3(c[0])
            nm = jnp.where(fgx > 0, nb(l), sentinel)
            return l, jnp.max(jnp.where(nm < l, 1, 0))

        return strip(jax.lax.while_loop(cond, body,
                                        (labx, jnp.int32(1)))[0])

    VARIANTS = {
        "warm": None,                    # absorbs the first-timing artifact
        "cur": None,
        "ss4": dict(ss=4, cert="nb", guard=True),
        "ss6": dict(ss=6, cert="nb", guard=True),
        "cheapcert": dict(ss=5, cert="cheap", guard=True),
        "noguard": dict(ss=5, cert="nb", guard=False),
        "fixed2": dict(ss=5, cert="nb", guard=True, fixed=2),
    }

    def make_run(name, cfg):
        def kernel(ct_ref, frame_ref, out_ref):
            lab0, fg = front_body(ct_ref, frame_ref)
            if cfg is None:
                lab = pk._ccl_sweeps(lab0, fg, sentinel, 2, adaptive=True,
                                     scan_steps=5)
            else:
                lab = ccl_param(lab0, fg, **cfg)
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

    ref = None
    for name, cfg in VARIANTS.items():
        if only and name not in only and name != "warm":
            continue
        fn = make_run("cur" if name == "warm" else name, cfg)
        try:
            out = fn(cm)
            got = np.asarray(out)
        except Exception as e:  # noqa: BLE001
            print(f"{name:12s} FAILED: {type(e).__name__}: {str(e)[:160]}",
                  flush=True)
            continue
        if name == "warm":
            # the first pipelined timing loop of a process absorbs a
            # large one-off cost (~0.25 ms/frame at batch 256) — burn it
            # on an untimed loop so every variant below is comparable
            ref = got
            infl = [fn(cm) for _ in range(iters)]
            np.asarray(infl[-1][0, 0])
            del infl
            continue
        if ref is None:
            ref = got
        elif name != "fixed2":
            assert (got == ref).all(), f"{name} labels differ!"
        infl = []
        t0 = time.perf_counter()
        for _ in range(iters):
            infl.append(fn(cm))
        np.asarray(infl[-1][0, 0])
        dt = time.perf_counter() - t0
        del infl
        print(f"{name:12s} {dt / iters / batch * 1e6:9.1f} us/frame",
              flush=True)


if __name__ == "__main__":
    main()
