#!/usr/bin/env python3
"""Bisect the r4 fill-stage regression: time preprocess+fill kernels with
one fill ingredient swapped at a time (r4 found fill 32 -> 57 us/frame
after the masked-roll rewrite while CCL improved 80 -> 74 — this isolates
which ingredient hurts).

Variants:
  new        current _fill_holes_sweeps (guards + masked scans + ladder pack)
  mxu_pack   new, but run-id pack via the old MXU triangular matmul
  iota_scan  new, but or-scans via the old per-step iota-where fills
  old_grow   new, but grow4 via the old shift_const | chain
  r3         the full r3 fill (no guards, iota scans, MXU pack)

Usage: python scripts/profile_fill_variants.py [batch] [iters] [only...]
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

    def mxu_cumsum(x):
        Hx, Wx = x.shape
        i = jax.lax.broadcasted_iota(jnp.int32, (Wx, Wx), 0)
        j = jax.lax.broadcasted_iota(jnp.int32, (Wx, Wx), 1)
        tri = (i <= j).astype(jnp.bfloat16)
        out = jax.lax.dot_general(x.astype(jnp.bfloat16), tri,
                                  (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32)
        return out.astype(jnp.int32)

    def pack(fg, big, mk, mode):
        if mode == "mxu":
            start = fg & (1 - pk._shift_const(fg, 1, 1, 0))
            return mxu_cumsum(start) * big
        return pk._run_pack(fg, big, mk)

    def scan_max_iota(v, axis_size, reverse, fill, max_steps):
        steps = max(1, math.ceil(math.log2(axis_size)))
        if max_steps is not None:
            steps = min(steps, max_steps)
        d = 1
        sgn = 1 if not reverse else -1
        for _ in range(steps):
            v = jnp.maximum(v, pk._shift_const(v, sgn * d, 1, fill))
            d *= 2
        return v

    def run_or(f, rb, mk, mode, ms=None):
        if mode == "iota":
            n = f.shape[1]
            f = scan_max_iota(f + rb, n, False, -(1 << 30), ms) - rb
            return scan_max_iota(f - rb, n, True, -(1 << 30), ms) + rb
        return pk._run_or_packed(f, rb, mk, max_steps=ms)

    def fill_param(fg, border, pack_mode, scan_mode, grow_mode, guard):
        Hf, Wf = fg.shape
        G = 8 if guard else 0
        Hg = Hf + 2 * G
        if guard:
            zrow = jnp.zeros((G, Wf), fg.dtype)
            orow = jnp.ones((G, Wf), fg.dtype)
            fgx = jnp.concatenate([zrow, fg, zrow], axis=0)
            borderx = jnp.concatenate([orow, border, orow], axis=0)
        else:
            fgx, borderx = fg, border
        bg = 1 - fgx
        bg_t = jnp.transpose(bg)
        mk_r = pk._EdgeMasks(Wf)
        mk_t = pk._EdgeMasks(Hg)
        rb_r = pack(bg, 2, mk_r, pack_mode)
        rb_t = pack(bg_t, 2, mk_t, pack_mode)

        def grow4(e):
            if grow_mode == "old":
                g = e
                for s, axis in ((1, 0), (-1, 0), (1, 1), (-1, 1)):
                    g = g | pk._shift_const(e, s, axis, 0)
                return g & bg
            row = jnp.maximum(
                jnp.maximum(e, pk._roll_lane(e, 1) - mk_r.pen_f[0]),
                pk._roll_lane(e, -1) - mk_r.pen_b[0])
            if guard:
                up = pltpu.roll(e, 1, 0)
                dn = pltpu.roll(e, Hg - 1, 0)
            else:
                up = pk._shift_const(e, 1, 0, 0)
                dn = pk._shift_const(e, -1, 0, 0)
            return jnp.maximum(row, jnp.maximum(up, dn)) & bg

        def phase_r(e):
            return run_or(grow4(e), rb_r, mk_r, scan_mode) & bg

        def phase_c(e, ms):
            g = grow4(e)
            gt = jnp.transpose(g)
            et = run_or(gt, rb_t, mk_t, scan_mode, ms=ms) & bg_t
            return jnp.transpose(et)

        def sweep1(e):
            return phase_c(phase_r(e), ms=5)

        def cond(c):
            return c[1] > 0

        def body(c):
            ext = sweep1(c[0])
            return ext, jnp.max(grow4(ext) & (1 - ext))

        ext = jax.lax.while_loop(cond, body,
                                 (bg * borderx, jnp.int32(1)))[0]
        filled = 1 - ext
        if guard:
            filled = jax.lax.slice_in_dim(filled, G, G + Hf, axis=0)
        return filled

    VARIANTS = {
        "new": None,
        "mxu_pack": dict(pack_mode="mxu", scan_mode="masked",
                         grow_mode="new", guard=True),
        "iota_scan": dict(pack_mode="ladder", scan_mode="iota",
                          grow_mode="new", guard=True),
        "old_grow": dict(pack_mode="ladder", scan_mode="masked",
                         grow_mode="old", guard=True),
        "r3": dict(pack_mode="mxu", scan_mode="iota", grow_mode="old",
                   guard=False),
        "masked_only": dict(pack_mode="mxu", scan_mode="masked",
                            grow_mode="old", guard=False),
        "guards_only": dict(pack_mode="mxu", scan_mode="iota",
                            grow_mode="old", guard=True),
        "ladder_only": dict(pack_mode="ladder", scan_mode="iota",
                            grow_mode="old", guard=False),
        "new2": dict(pack_mode="ladder", scan_mode="masked",
                     grow_mode="new", guard=True),
    }

    def make_run(name, cfg):
        def kernel(ct_ref, frame_ref, out_ref):
            row_idx = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)
            col_idx = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
            fg0 = preprocess_body(ct_ref, frame_ref)
            border = ((row_idx == 0) | (row_idx == H - 1)
                      | (col_idx == 0)
                      | (col_idx == W - 1)).astype(jnp.int32)
            if cfg is None:
                fg = pk._fill_holes_sweeps(fg0, border, 2, adaptive=True)
            else:
                fg = fill_param(fg0, border, **cfg)
            out_ref[0] = fg

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
        if only and name not in only:
            continue
        fn = make_run(name, cfg)
        try:
            out = fn(cm)
            got = np.asarray(out)
        except Exception as e:  # noqa: BLE001
            print(f"{name:12s} FAILED: {type(e).__name__}: {str(e)[:160]}",
                  flush=True)
            continue
        if ref is None:
            ref = got
        else:
            assert (got == ref).all(), f"{name} output differs!"
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
