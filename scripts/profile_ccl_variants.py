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


def ccl_runtable(pk, jnp, jax, pltpu, lab, fg, sentinel, Rmax=12):
    """VERDICT r4 candidate (a): CCL over the compacted RUN TABLE.

    A run = maximal fg stretch along a row; the bench scene has <= ~6
    runs/row, so the label fixpoint iterates over an [Rmax, H] table
    (thousands of elements) instead of [H, W] pixel planes (307k).

    Structure (Mosaic-feasible form — pointer-doubling over runs needs
    gathers or an [N, N] one-hot match matrix, N = H*Rmax = 5760: 132 MB
    of VMEM at i32, rejected by the documented no-rank-1/no-cross-lane-
    reshape/16 MB-scoped constraints, so propagation is scan+exchange):
      1. extraction: runid = MXU cumsum of run starts; per-slot start
         cols / fg lengths from monotone-count row reductions
         (S_j = #(runid < j), len_j = #(fg & runid < j+1) - #(... < j)),
      2. iterate on the [Rmax, H] transposed table:
         - segmented min-scan along rows within maximal vertical chains
           of SAME-SLOT overlapping runs (the packed-scan machinery on
           tiny planes — covers deep chains like box edges in one pass),
         - cross-slot exchange: for each slot k, candidates from rows
           r+-1 where intervals 8-conn-overlap ([S-1, E+1] vs [S', E']),
         - certified fixpoint (a unit that changes nothing proves
           labels constant per connected run-graph component — only
           +-1-row pairs are ever adjacent, all covered by the unit),
      3. write labels back: runid is monotone per row, so
         lab = L_0 + sum_j (L_j - L_{j-1}) * [runid > j] — R compares,
         no gather.
    Exact when every row has <= Rmax runs; a per-frame lax.cond falls
    back to the classic sweeps otherwise (morphology-opened masks come
    nowhere near W/2 runs, but exactness cannot hinge on that).
    """
    H, W = lab.shape
    i32 = jnp.int32
    BIGC = 1 << 20

    start = fg & (1 - pk._shift_const(fg, 1, 1, 0))
    runid = pk._lane_cumsum_mxu(start)               # [H, W], 1-based
    nrun = jax.lax.slice_in_dim(runid, W - 1, W, axis=1)   # [H, 1]
    fits = jnp.max(nrun) <= Rmax

    def table_path(lab):
        row_col = jax.lax.broadcasted_iota(i32, (H, 1), 0)
        Scols, Gcols = [], []
        for j in range(1, Rmax + 1):
            cj = (runid < j).astype(i32)
            Scols.append(jnp.sum(cj, axis=1, keepdims=True))
            Gcols.append(jnp.sum(fg * cj, axis=1, keepdims=True))
        Gcols.append(jnp.sum(fg, axis=1, keepdims=True))
        S = jnp.concatenate(Scols, axis=1)           # [H, R]
        G = jnp.concatenate(Gcols, axis=1)           # [H, R+1]
        LEN = (jax.lax.slice_in_dim(G, 1, Rmax + 1, axis=1)
               - jax.lax.slice_in_dim(G, 0, Rmax, axis=1))
        E = S + LEN - 1
        slot = jax.lax.broadcasted_iota(i32, (H, Rmax), 1)
        valid = slot < nrun
        L0 = jnp.where(valid, row_col * W + S, sentinel)
        S = jnp.where(valid, S, BIGC)
        E = jnp.where(valid, E, -BIGC)

        St = jnp.transpose(S)                        # [R, H]
        Et = jnp.transpose(E)
        Lt = jnp.transpose(L0)
        mkH = pk._EdgeMasks(H)

        def lroll(x, d, fill):
            return pk._shift_const(x, d, 1, fill)

        # same-slot vertical chain segments (lane 0 always a start)
        ov_same = ((St - 1 <= lroll(Et, 1, -BIGC))
                   & (Et + 1 >= lroll(St, 1, BIGC)))
        seg_start = 1 - ov_same.astype(i32)
        big = 1 << max(1, math.ceil(math.log2(sentinel + 2)))
        pack = pk._lane_cumsum_mxu(seg_start) * big
        assert (H + 2) * big + sentinel < (1 << 30), (H, W)

        def exchange(L):
            acc = L
            for k in range(Rmax):
                Lk = jax.lax.slice_in_dim(L, k, k + 1, axis=0)
                Sk = jax.lax.slice_in_dim(St, k, k + 1, axis=0)
                Ek = jax.lax.slice_in_dim(Et, k, k + 1, axis=0)
                for d in (1, -1):
                    ov = ((St - 1 <= lroll(Ek, d, -BIGC))
                          & (Et + 1 >= lroll(Sk, d, BIGC)))
                    acc = jnp.minimum(
                        acc, jnp.where(ov, lroll(Lk, d, sentinel),
                                       sentinel))
            return acc

        def unit(L):
            return pk._run_min_packed(exchange(L), pack, mkH)

        def cond(c):
            return c[1] > 0

        def body(c):
            L = unit(c[0])
            return L, jnp.max(jnp.where(L < c[0], 1, 0))

        Lt = jax.lax.while_loop(cond, body, (Lt, i32(1)))[0]
        Lfin = jnp.transpose(Lt)                     # [H, R]

        # monotone-step write-back (no gather): runid is non-decreasing
        # along each row, so L[runid] telescopes over [runid > j] steps
        out = jnp.broadcast_to(
            jax.lax.slice_in_dim(Lfin, 0, 1, axis=1), (H, W))
        for j in range(1, Rmax):
            Lj = jax.lax.slice_in_dim(Lfin, j, j + 1, axis=1)
            Lp = jax.lax.slice_in_dim(Lfin, j - 1, j, axis=1)
            out = out + jnp.where(runid > j, Lj - Lp, 0)
        return jnp.where(fg > 0, out, sentinel)

    def classic_path(lab):
        return pk._ccl_sweeps(lab, fg, sentinel, 2, adaptive=True,
                              scan_steps=5)

    return jax.lax.cond(fits, table_path, classic_path, lab)


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

    def ccl_param(lab, fg, ss, cert, guard, fixed=None, unit=3,
                  presweep=False, ss_r=None):
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

        def phase_r(l, ms):
            l = jnp.where(fgx > 0, nb(l), sentinel)
            return jnp.where(fgx > 0,
                             pk._run_min_packed(l, rb_r, mk_r,
                                                max_steps=ms), sentinel)

        def phase_c(l, ms):
            l = jnp.where(fgx > 0, nb(l), sentinel)
            lt = jnp.transpose(l)
            lt = jnp.where(fg_t > 0,
                           pk._run_min_packed(lt, rb_t, mk_t,
                                              max_steps=ms), sentinel)
            return jnp.transpose(lt)

        # ss_r: row-phase ladder override; "full" = untruncated
        sr = ss if ss_r is None else (None if ss_r == "full" else ss_r)

        def unit3(l):
            if unit == 2:
                return phase_c(phase_r(l, sr), ss)
            return phase_r(phase_c(phase_r(l, sr), ss), sr)

        def strip(l):
            if guard:
                return jax.lax.slice_in_dim(l, G, G + Hc, axis=0)
            return l

        if presweep:
            # one full-ladder unit before the truncated adaptive loop:
            # the bench scene's 204x240 rect outline needs ~7 reach-31
            # phases, so a single full-reach unit may replace 1-2 loop
            # units on every frame
            labx = phase_r(phase_c(phase_r(labx, None), None), None)

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
        # r5 structural knobs
        "presweep": dict(ss=5, cert="nb", guard=True, presweep=True),
        "unit2": dict(ss=5, cert="nb", guard=True, unit=2),
        "pre_unit2": dict(ss=5, cert="nb", guard=True, unit=2,
                          presweep=True),
        "asym_r10": dict(ss=5, cert="nb", guard=True, ss_r="full"),
        "pre_ss4": dict(ss=4, cert="nb", guard=True, presweep=True),
        "runtable": "runtable",
        "runtable8": "runtable8",
        "runtable6": "runtable6",
        "runtable10": "runtable10",
    }

    def make_run(name, cfg):
        def kernel(ct_ref, frame_ref, out_ref):
            lab0, fg = front_body(ct_ref, frame_ref)
            if cfg is None:
                lab = pk._ccl_sweeps(lab0, fg, sentinel, 2, adaptive=True,
                                     scan_steps=5)
            elif cfg == "runtable":
                lab = ccl_runtable(pk, jnp, jax, pltpu, lab0, fg, sentinel)
            elif isinstance(cfg, str) and cfg.startswith("runtable"):
                lab = ccl_runtable(pk, jnp, jax, pltpu, lab0, fg, sentinel,
                                   Rmax=int(cfg[len("runtable"):]))
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
