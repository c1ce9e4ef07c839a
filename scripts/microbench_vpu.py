"""Per-primitive VPU cost measurement on the real TPU (v5e).

Measures the marginal cost of the scan/fill/CCL building blocks the fused
label kernel (ops/pallas_kernels.py) is made of, at the headline shape
[480, 640], across dtypes (int32 / int16 / int8) — the data behind the
PERF.md roofline table and the int16-narrowing decision (ROADMAP "int16
band-local labels"; VERDICT r3 next #1/#7).

Protocol: each variant is a Pallas kernel whose body runs the primitive
N times in a fori_loop with a data-dependent carry (nothing can be elided
or overlapped); the same kernel is compiled at N_LO and N_HI iterations
and the per-op cost is (t_hi - t_lo) / (N_HI - N_LO) / B — input load,
output store, and launch overhead cancel in the difference.  Dispatches
are pipelined (submit all, force the last) like bench.py's windows.

Run: python scripts/microbench_vpu.py [quick]
"""

import functools
import json
import math
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

H, W = 480, 640
B = 256
N_LO, N_HI = 4, 36
REPS = 6            # timed dispatches per point (pipelined)


def _roll_fill(x, s, axis, value):
    n = x.shape[axis]
    rolled = pltpu.roll(x, s % n, axis)
    idx = jax.lax.broadcasted_iota(jnp.int32, x.shape, axis)
    if s > 0:
        return jnp.where(idx < s, value, rolled)
    return jnp.where(idx >= n + s, value, rolled)


# --- primitive bodies: (carry_plane, i) -> carry_plane --------------------

def body_min_scan_step(v, _i):
    # one doubling-ladder step of a min scan (roll + iota-mask + min)
    return jnp.minimum(v, _roll_fill(v, 1, 1, jnp.asarray(63, v.dtype)))


def body_max_scan_step(v, _i):
    return jnp.maximum(v, _roll_fill(v, 1, 1, jnp.asarray(-1, v.dtype)))


def body_or_roll(v, _i):
    # flag-based OR propagation step (no compare): roll + or
    n = v.shape[1]
    return v | pltpu.roll(v, 1, 1)


def body_nbmin8(v, _i):
    s = jnp.asarray(63, v.dtype)
    row = jnp.minimum(v, jnp.minimum(_roll_fill(v, 1, 1, s),
                                     _roll_fill(v, -1, 1, s)))
    return jnp.minimum(row, jnp.minimum(_roll_fill(row, 1, 0, s),
                                        _roll_fill(row, -1, 0, s)))


def body_add(v, _i):
    return v + jnp.asarray(1, v.dtype)


def body_select(v, _i):
    return jnp.where(v > jnp.asarray(0, v.dtype), v,
                     v + jnp.asarray(1, v.dtype))


def body_transpose_pair(v, _i):
    # transpose round trip + a min so the pair can't cancel
    vt = jnp.transpose(v)
    vt = jnp.minimum(vt, jnp.asarray(63, v.dtype))
    return jnp.transpose(vt)


def body_seg_min_step(carry, _i):
    # blocked-flag segmented min-scan step: carry packs (v, f) stacked on
    # sublanes [2H, W]; v' = f ? v : min(v, roll v); f' = f | roll f
    v = carry[:H]
    f = carry[H:]
    vr = _roll_fill(v, 1, 1, jnp.asarray(63, v.dtype))
    fr = _roll_fill(f, 1, 1, jnp.asarray(1, f.dtype))
    v2 = jnp.where(f > 0, v, jnp.minimum(v, vr))
    f2 = f | fr
    return jnp.concatenate([v2, f2], axis=0)


def body_packed_min_step(v, _i):
    # run-id-packed plain scan step — identical op count to
    # body_min_scan_step (the packing add/sub happens once per phase,
    # not per step); kept for direct comparison
    return jnp.minimum(v, _roll_fill(v, 1, 1, jnp.asarray(63, v.dtype)))


def body_mxu_cumsum(v, _i):
    # the run-pack matmul: [H, W] x [W, W] triangular bf16 matmul
    i = jax.lax.broadcasted_iota(jnp.int32, (W, W), 0)
    j = jax.lax.broadcasted_iota(jnp.int32, (W, W), 1)
    tri = (i <= j).astype(jnp.bfloat16)
    out = jax.lax.dot_general((v & 1).astype(jnp.bfloat16), tri,
                              (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    return out.astype(v.dtype) & jnp.asarray(63, v.dtype)


# --- setup-once variants: factory builds per-kernel constants (masks) ---
# The r4 scan-step redesign candidates: the measured 0.387 us/op of the
# iota-masked roll step is ~80% iota+where (or_roll with no fill is
# 0.062), so these replace the per-step fill with constants computed ONCE
# per kernel and reused by every step (loop-invariant captures).

def factory_masked_min_step(shape, dtype):
    # fwd min-scan step: roll + add(precomputed [1, W] edge mask) + min
    W_ = shape[1]
    idx = jax.lax.broadcasted_iota(jnp.int32, (1, W_), 1)
    mask = jnp.where(idx < 1, jnp.asarray(1 << 30, dtype), 0)

    def step(v):
        return jnp.minimum(v, pltpu.roll(v, 1, 1) + mask)
    return step


def factory_masked_ladder5(shape, dtype):
    # a full 5-step doubling ladder (distances 1..16), masks precomputed
    W_ = shape[1]
    idx = jax.lax.broadcasted_iota(jnp.int32, (1, W_), 1)
    masks = [jnp.where(idx < (1 << k), jnp.asarray(1 << 30, dtype), 0)
             for k in range(5)]

    def step(v):
        for k, m in enumerate(masks):
            v = jnp.minimum(v, pltpu.roll(v, 1 << k, 1) + m)
        return v
    return step


def factory_nbmin_guard(shape, dtype):
    # 8-neighbour min with guard-row scheme: lane rolls masked by
    # precomputed [1, W] adds, sublane rolls UNFILLED (guard rows absorb
    # the wrap) — cost model only, correctness needs the guard rows
    H_, W_ = shape
    idx = jax.lax.broadcasted_iota(jnp.int32, (1, W_), 1)
    m_l = jnp.where(idx < 1, jnp.asarray(1 << 24, dtype), 0)
    m_r = jnp.where(idx >= W_ - 1, jnp.asarray(1 << 24, dtype), 0)

    def step(v):
        row = jnp.minimum(v, jnp.minimum(pltpu.roll(v, 1, 1) + m_l,
                                         pltpu.roll(v, W_ - 1, 1) + m_r))
        return jnp.minimum(row, jnp.minimum(pltpu.roll(row, 1, 0),
                                            pltpu.roll(row, H_ - 1, 0)))
    return step


def factory_nbmin_masked_sub(shape, dtype):
    # the shipped r4 nbmin: masked-add lane rolls + iota-where sublanes
    H_, W_ = shape
    idx = jax.lax.broadcasted_iota(jnp.int32, (1, W_), 1)
    m_l = jnp.where(idx < 1, jnp.asarray(1 << 24, dtype), 0)
    m_r = jnp.where(idx >= W_ - 1, jnp.asarray(1 << 24, dtype), 0)
    s = jnp.asarray(63, dtype)

    def sub_shift(x, sh):
        rolled = pltpu.roll(x, sh % H_, 0)
        ri = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
        if sh > 0:
            return jnp.where(ri < sh, s, rolled)
        return jnp.where(ri >= H_ + sh, s, rolled)

    def step(v):
        row = jnp.minimum(v, jnp.minimum(pltpu.roll(v, 1, 1) + m_l,
                                         pltpu.roll(v, W_ - 1, 1) + m_r))
        return jnp.minimum(row, jnp.minimum(sub_shift(row, 1),
                                            sub_shift(row, -1)))
    return step


def factory_or_and_mask(shape, dtype):
    # flood grow lane step: roll + and(precomputed keep mask) + or
    W_ = shape[1]
    idx = jax.lax.broadcasted_iota(jnp.int32, (1, W_), 1)
    keep = jnp.where(idx < 1, 0, -1).astype(dtype)

    def step(v):
        return v | (pltpu.roll(v, 1, 1) & keep)
    return step


def factory_max_ladder_full(shape, dtype):
    # full-width 10-step max ladder (the flood's row phase), masked adds
    W_ = shape[1]
    idx = jax.lax.broadcasted_iota(jnp.int32, (1, W_), 1)
    masks = [jnp.where(idx < (1 << k), jnp.asarray(-(1 << 22), dtype), 0)
             for k in range(10)]

    def step(v):
        for k, m in enumerate(masks):
            v = jnp.maximum(v, pltpu.roll(v, 1 << k, 1) + m)
        return v
    return step


def factory_sublane_mask_add(shape, dtype):
    # does a [H, 1] -> [H, W] lane-broadcast add lower?  (CLAUDE.md notes
    # 3-D minor-dim broadcasts crash Mosaic; probe the 2-D case)
    H_ = shape[0]
    ridx = jax.lax.broadcasted_iota(jnp.int32, (H_, 1), 0)
    mask = jnp.where(ridx < 1, jnp.asarray(1 << 24, dtype), 0)

    def step(v):
        return jnp.minimum(v, pltpu.roll(v, 1, 0) + mask)
    return step


def factory_cumsum_ladder(shape, dtype):
    # 10-step doubling prefix sum with and-masked rolls — candidate
    # replacement for the 2.44 us mxu_cumsum run-pack matmul
    W_ = shape[1]
    idx = jax.lax.broadcasted_iota(jnp.int32, (1, W_), 1)
    keeps = [jnp.where(idx < (1 << k), 0, -1).astype(dtype)
             for k in range(10)]

    def step(v):
        v = v & 1                      # keep the carry bounded
        for k, m in enumerate(keeps):
            v = v + (pltpu.roll(v, 1 << k, 1) & m)
        return v
    return step


FACTORY_VARIANTS = [
    ("cumsum_ladder", factory_cumsum_ladder, jnp.int32, H),
    ("masked_min_step", factory_masked_min_step, jnp.int32, H),
    ("masked_ladder5", factory_masked_ladder5, jnp.int32, H),
    ("nbmin_guard", factory_nbmin_guard, jnp.int32, H),
    ("nbmin_masked_sub", factory_nbmin_masked_sub, jnp.int32, H),
    ("or_and_mask", factory_or_and_mask, jnp.int32, H),
    ("max_ladder_full", factory_max_ladder_full, jnp.int32, H),
    ("sublane_mask_add", factory_sublane_mask_add, jnp.int32, H),
]


VARIANTS = [
    # (name, body, dtype, plane_sublanes)
    ("min_scan_step", body_min_scan_step, jnp.int32, H),
    ("min_scan_step", body_min_scan_step, jnp.int16, H),
    ("min_scan_step", body_min_scan_step, jnp.int8, H),
    ("max_scan_step", body_max_scan_step, jnp.int16, H),
    ("or_roll", body_or_roll, jnp.int32, H),
    ("or_roll", body_or_roll, jnp.int16, H),
    ("or_roll", body_or_roll, jnp.int8, H),
    ("nbmin8", body_nbmin8, jnp.int32, H),
    ("nbmin8", body_nbmin8, jnp.int16, H),
    ("nbmin8", body_nbmin8, jnp.int8, H),
    ("add", body_add, jnp.int32, H),
    ("add", body_add, jnp.int16, H),
    ("select", body_select, jnp.int32, H),
    ("select", body_select, jnp.int16, H),
    ("transpose_pair", body_transpose_pair, jnp.int32, H),
    ("transpose_pair", body_transpose_pair, jnp.int16, H),
    ("seg_min_step", body_seg_min_step, jnp.int32, 2 * H),
    ("seg_min_step", body_seg_min_step, jnp.int16, 2 * H),
    ("mxu_cumsum", body_mxu_cumsum, jnp.int32, H),
]


def make_call(body, dtype, sub, iters, factory=False):
    def kernel(x_ref, o_ref):
        v = x_ref[0]
        if factory:
            step = body(v.shape, v.dtype)   # masks built ONCE per kernel

            def loop(i, c):
                return step(c)
        else:
            def loop(i, c):
                return body(c, i)

        v = jax.lax.fori_loop(0, iters, loop, v)
        # tiny output: one lane row so the store is negligible either way
        o_ref[0] = jax.lax.slice_in_dim(v, 0, 1, axis=0).astype(jnp.int32)

    return pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[pl.BlockSpec((1, sub, W), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 1, W), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, 1, W), jnp.int32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )


def time_call(fn, x):
    out = fn(x)
    np.asarray(out[0, 0])                     # warm/compile
    t0 = time.perf_counter()
    res = [fn(x) for _ in range(REPS)]
    np.asarray(res[-1][0, 0])
    return (time.perf_counter() - t0) / REPS


def main():
    args = sys.argv[1:]
    quick = "quick" in args
    only = None
    if "only" in args:
        only = set(args[args.index("only") + 1].split(","))
    dev = jax.devices()[0]
    print(f"device: {dev.device_kind}", file=sys.stderr)
    rng = np.random.RandomState(0)
    results = []
    todo = ([(n, b, d, s, False) for n, b, d, s in VARIANTS]
            + [(n, b, d, s, True) for n, b, d, s in FACTORY_VARIANTS])
    for name, body, dtype, sub, fac in todo:
        if only is not None and name not in only:
            continue
        if quick and dtype not in (jnp.int32, jnp.int16):
            continue
        dt_name = np.dtype(dtype).name
        lim = min(60, np.iinfo(dtype).max)
        x = jax.device_put(
            rng.randint(0, lim, (B, sub, W)).astype(dtype), dev)
        try:
            f_lo = jax.jit(make_call(body, dtype, sub, N_LO, factory=fac))
            f_hi = jax.jit(make_call(body, dtype, sub, N_HI, factory=fac))
            t_lo = time_call(f_lo, x)
            t_hi = time_call(f_hi, x)
        except Exception as e:  # lowering rejection is a finding, not a bug
            print(f"{name:18s} {dt_name:6s}  FAILED: "
                  f"{type(e).__name__}: {str(e)[:160]}", file=sys.stderr)
            results.append(dict(op=name, dtype=dt_name, status="rejected"))
            continue
        per_op_us = (t_hi - t_lo) / (N_HI - N_LO) / B * 1e6
        print(f"{name:18s} {dt_name:6s}  {per_op_us:8.3f} us/op/frame   "
              f"(lo {t_lo*1e3:7.2f} ms, hi {t_hi*1e3:7.2f} ms)",
              file=sys.stderr)
        results.append(dict(op=name, dtype=dt_name, us_per_op=per_op_us))
        del x
    print(json.dumps(results))


if __name__ == "__main__":
    main()
