"""Fused Pallas TPU kernel for the contamination hot path.

One kernel invocation per frame (grid over the batch) runs the ENTIRE
detection pipeline in VMEM — grayscale, Gaussian blur, adaptive threshold,
morphological open/close, hole filling, connected-component labeling,
compact-id assignment, and all per-blob statistics — so HBM traffic per
frame is one uint8 frame in (~0.9 MB) and a few KB of blob tables out.
The XLA composition of the same ops (ops/*.py) materializes every
intermediate to HBM and pays ~30 while-loop dispatches; this kernel is the
speed-of-light version.  Numerics are identical to the XLA ops (same Q8
fixed-point blur, float32+rint adaptive mean, Pick's-theorem areas), which
are themselves OpenCV-parity — verified in tests/test_pallas_kernels.py.

Building blocks chosen for Mosaic's TPU lowering (no rev/pad/cumsum/
associative_scan primitives):
  * border-aware shifts: jnp.concatenate of slices (replicate / reflect-101
    / constant fills built from broadcast or stacked single rows),
  * per-run min/or broadcasts: PLAIN Hillis-Steele doubling scans over
    run-id-packed keys (one MXU matmul builds the run ids per row),
  * per-blob statistics: a fori_loop over table slots doing 2-D masked
    reductions (Mosaic's 3-D layouts proved too fragile for one-hot
    matmuls), accumulating into [.,K] carries via one-hot lane masks,
  * frames enter channel-major ([B, 3, H, W]) so the VMEM layout keeps
    (H, W) as the tiled minor dims.
"""

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from heimdall_tpu.ops.filters import gaussian_kernel_1d, _q8_taps

# Stats row layout in the kernel's sums output [S, K].
S_ONES, S_BND, S_X, S_Y, S_GRAY, S_B, S_G, S_R = range(8)
N_SUMS = 8


# ---------------------------------------------------------------------------
# shifts with border semantics (pure concat/broadcast — Mosaic-friendly)
# ---------------------------------------------------------------------------

def _fill_block(x, s, axis, mode, value, top):
    """The s rows/cols a border mode synthesizes outside the array."""
    size = x.shape[axis]
    if mode == "constant":
        shape = list(x.shape)
        shape[axis] = s
        return jnp.full(shape, value, x.dtype)
    if mode == "replicate":
        sl = (jax.lax.slice_in_dim(x, 0, 1, axis=axis) if top
              else jax.lax.slice_in_dim(x, size - 1, size, axis=axis))
        reps = [1] * x.ndim
        reps[axis] = s
        return jnp.tile(sl, reps)
    if mode == "reflect101":
        # top: rows x[s], x[s-1], ..., x[1]; bottom: x[-2], ..., x[-s-1]
        rows = []
        for i in range(s):
            j = (s - i) if top else (size - 2 - i)
            rows.append(jax.lax.slice_in_dim(x, j, j + 1, axis=axis))
        return jnp.concatenate(rows, axis=axis)
    raise ValueError(mode)


def _shift(x, s, axis, mode="constant", value=0):
    """out[i] = x[i - s] along ``axis`` with border fill (s may be <0)."""
    if s == 0:
        return x
    size = x.shape[axis]
    a = abs(s)
    if s > 0:
        fill = _fill_block(x, a, axis, mode, value, top=True)
        body = jax.lax.slice_in_dim(x, 0, size - a, axis=axis)
        return jnp.concatenate([fill, body], axis=axis)
    fill = _fill_block(x, a, axis, mode, value, top=False)
    body = jax.lax.slice_in_dim(x, a, size, axis=axis)
    return jnp.concatenate([body, fill], axis=axis)


def _shift_const(x, s, axis, value):
    """out[i] = x[i-s] with constant fill — lane/sublane rolls + iota mask
    (much cheaper than concat on the VPU; scans/morphology use this)."""
    if s == 0:
        return x
    n = x.shape[axis]
    rolled = pltpu.roll(x, s % n, axis)
    idx = jax.lax.broadcasted_iota(jnp.int32, x.shape, axis)
    if s > 0:
        return jnp.where(idx < s, value, rolled)
    return jnp.where(idx >= n + s, value, rolled)


# Additive edge penalty for masked rolls.  Legit scan keys satisfy
# |key| + span < 2^30 (asserted per kernel), so key + _PEN can never win a
# min (it exceeds every legit key), key - _PEN can never win a max, and
# neither overflows int32 (|key| < 2^30 -> |key +- _PEN| < 2^31).
_PEN = 1 << 30


class _EdgeMasks:
    """Per-kernel-orientation lane-edge masks for roll-based shifts.

    A measured v5e microbench (scripts/microbench_vpu.py) puts a bare
    roll+or at 0.062 us/frame but the iota-masked roll step at 0.387 —
    the per-step `broadcasted_iota` + compare + select IS the cost of
    every scan step.  These masks are built ONCE per kernel body (they
    close over loop bodies, so fixpoint iterations reuse them) and each
    shift becomes roll + one add (min/max scans: penalty masks) or
    roll + one and (OR grows: keep masks).

    pen_f[k] / pen_b[k]: [1, W] int32, _PEN on the lanes a roll by
    +-2^k wraps, 0 elsewhere.  All fills are expressed arithmetically
    (add/sub the penalty, clamp with min/max) — broadcast bitwise masks
    (& with [1, W]) measured pathologically slow in-kernel."""

    def __init__(self, W, steps=None):
        self.W = W
        if steps is None:
            steps = max(1, math.ceil(math.log2(W)))
        idx = jax.lax.broadcasted_iota(jnp.int32, (1, W), 1)
        self.pen_f = [jnp.where(idx < (1 << k), _PEN, 0)
                      for k in range(steps)]
        self.pen_b = [jnp.where(idx >= W - (1 << k), _PEN, 0)
                      for k in range(steps)]


def _roll_lane(v, d):
    """Pure lane roll by d (may be negative)."""
    return pltpu.roll(v, d % v.shape[1], 1)


def _min_scan_masked(v, mk: _EdgeMasks, reverse, max_steps=None):
    """Running-min doubling scan along lanes with additive edge masks.

    Equivalent to _min_scan_plain(..., fill=2^30) whenever legit values
    stay within (-2^30 + span, 2^30 - span): the penalized wrapped value
    key + _PEN exceeds every legit key, so it can never win a min and is
    never stored (see _PEN)."""
    steps = len(mk.pen_f)
    if max_steps is not None:
        steps = min(steps, max_steps)
    if not reverse:
        for k in range(steps):
            v = jnp.minimum(v, _roll_lane(v, 1 << k) + mk.pen_f[k])
    else:
        for k in range(steps):
            v = jnp.minimum(v, _roll_lane(v, -(1 << k)) + mk.pen_b[k])
    return v


def _max_scan_masked(v, mk: _EdgeMasks, reverse, max_steps=None):
    steps = len(mk.pen_f)
    if max_steps is not None:
        steps = min(steps, max_steps)
    if not reverse:
        for k in range(steps):
            v = jnp.maximum(v, _roll_lane(v, 1 << k) - mk.pen_f[k])
    else:
        for k in range(steps):
            v = jnp.maximum(v, _roll_lane(v, -(1 << k)) - mk.pen_b[k])
    return v


def _conv_axis(x, taps, axis, mode):
    """Correlation along one axis with border handling (integer or float)."""
    r = len(taps) // 2
    out = None
    for i, t in enumerate(taps):
        term = t * _shift(x, r - i, axis, mode)
        out = term if out is None else out + term
    return out


def _conv_axis_pair_int(x, taps, axis, mode):
    """Integer correlation with symmetric taps: t*(a+b) pairing halves
    the multiplies.  EXACT for integers (distributivity holds; int adds
    commute) — measured -1.4 us/frame on the fused preprocess (r4
    scripts/profile_pre_variants.py).  NOT for floats: (a+b)*t rounds
    differently than a*t + b*t, which would break XLA-path bit parity."""
    r = len(taps) // 2
    assert all(taps[i] == taps[-1 - i] for i in range(r)), taps
    acc = taps[r] * x
    for d in range(1, r + 1):
        acc = acc + taps[r - d] * (_shift(x, d, axis, mode)
                                   + _shift(x, -d, axis, mode))
    return acc


def _minmax3(x, is_min):
    """3x3 erode/dilate with OpenCV constant border (255 / 0).

    Separable (rect kernel): min/max over rows then columns — 4 shifts
    instead of 12.  (A masked-roll variant of the column shifts was
    bisected in r4 and regressed — scripts/profile_fill_variants.py.)"""
    value = 255 if is_min else 0
    op = jnp.minimum if is_min else jnp.maximum
    r = op(op(x, _shift_const(x, 1, 0, value)), _shift_const(x, -1, 0, value))
    return op(op(r, _shift_const(r, 1, 1, value)),
              _shift_const(r, -1, 1, value))


# ---------------------------------------------------------------------------
# run-id-packed scans (per-run min / or via plain doubling scans)
# ---------------------------------------------------------------------------


def _lane_cumsum_mxu(x):
    """Inclusive prefix sum along lanes via one MXU matmul.

    x: [H, W] 0/1 int32 (start flags).  Exact: bf16 inputs are 0/1,
    products exact, f32 accumulation of <= W ones < 2^24.  A 10-step
    masked-roll doubling ladder microbenches 10x cheaper in isolation
    but measured +23 us/frame in the fill kernel (r4 bisection,
    scripts/profile_fill_variants.py) — the matmul rides otherwise-idle
    MXU cycles and keeps the VPU free; keep it."""
    H, W = x.shape
    i = jax.lax.broadcasted_iota(jnp.int32, (W, W), 0)
    j = jax.lax.broadcasted_iota(jnp.int32, (W, W), 1)
    tri = (i <= j).astype(jnp.bfloat16)          # cumsum[c] = sum_{k<=c}
    out = jax.lax.dot_general(x.astype(jnp.bfloat16), tri,
                              (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    return out.astype(jnp.int32)


def _run_pack(fg, big, mk=None):
    """Run-id key plane for the packed segmented scans: runid * big.

    A run is a maximal contiguous stretch of fg along lanes.  Subtracting
    (resp. adding) the plane to the scanned values makes every *earlier*
    (resp. *later*) run's keys larger by >= big, so a PLAIN min-scan can
    never leak values across run boundaries — no constant offset needed,
    since shifting every key equally never changes which min wins.  Bg
    positions inherit the previous run's id — harmless, results are
    re-masked with fg after each phase.
    """
    if mk is not None:
        # roll with 0 fill via the penalty clamp (one add + one max)
        shifted = jnp.maximum(_roll_lane(fg, 1) - mk.pen_f[0], 0)
        start = fg * (1 - shifted)
    else:
        start = fg & (1 - _shift_const(fg, 1, 1, 0))
    return _lane_cumsum_mxu(start) * big


def _min_scan_plain(v, axis, reverse, fill, max_steps=None):
    """Plain (unsegmented) running-min doubling scan along lanes.

    max_steps truncates the ladder: the running min then only reaches
    2^max_steps - 1 positions back, NOT the whole row.  Only valid when
    a fixpoint loop certifies convergence around it (propagation stays
    monotone, just shorter-range per phase)."""
    size = v.shape[axis]
    steps = max(1, math.ceil(math.log2(size)))
    if max_steps is not None:
        steps = min(steps, max_steps)
    d = 1
    sgn = 1 if not reverse else -1
    for _ in range(steps):
        v = jnp.minimum(v, _shift_const(v, sgn * d, axis, fill))
        d *= 2
    return v


def _max_scan_plain(v, axis, reverse, fill, max_steps=None):
    size = v.shape[axis]
    steps = max(1, math.ceil(math.log2(size)))
    if max_steps is not None:
        steps = min(steps, max_steps)
    d = 1
    sgn = 1 if not reverse else -1
    for _ in range(steps):
        v = jnp.maximum(v, _shift_const(v, sgn * d, axis, fill))
        d *= 2
    return v


def _run_min_packed(v, rb, mk=None, max_steps=None):
    """Per-run min broadcast to the whole run: fwd then bwd min-scans
    over run-id-packed keys (see _run_pack).  ~2x cheaper than the
    blocked-flag segmented scan (no flag plane to carry).  With ``mk``
    each step is a masked roll (roll + add + min, see _EdgeMasks);
    without, the iota-where fill form.

    max_steps truncates the ladder: the running min then only reaches
    2^max_steps - 1 positions, NOT the whole row.  Only valid when a
    fixpoint loop certifies convergence around it (propagation stays
    monotone, just shorter-range per phase)."""
    if mk is not None:
        v = _min_scan_masked(v - rb, mk, False, max_steps) + rb
        return _min_scan_masked(v + rb, mk, True, max_steps) - rb
    v = _min_scan_plain(v - rb, 1, False, 1 << 30, max_steps) + rb
    return _min_scan_plain(v + rb, 1, True, 1 << 30, max_steps) - rb


def _run_or_packed(f, rb, mk=None, max_steps=None):
    """Per-run OR broadcast to the whole run (f in {0,1}): max-scans over
    packed keys (earlier runs' keys must be smaller forward, larger
    backward).  max_steps truncates reach (certificate-protected callers
    only)."""
    if mk is not None:
        f = _max_scan_masked(f + rb, mk, False, max_steps) - rb
        return _max_scan_masked(f - rb, mk, True, max_steps) + rb
    f = _max_scan_plain(f + rb, 1, False, -(1 << 30), max_steps) - rb
    return _max_scan_plain(f - rb, 1, True, -(1 << 30), max_steps) + rb


def _neighbor_min8(lab, sentinel):
    """3x3 min (separable, includes self) — the 8-neighbourhood min used
    by the sweeps, which always re-min with self anyway."""
    row = jnp.minimum(lab, jnp.minimum(_shift_const(lab, 1, 1, sentinel),
                                       _shift_const(lab, -1, 1, sentinel)))
    return jnp.minimum(row, jnp.minimum(_shift_const(row, 1, 0, sentinel),
                                        _shift_const(row, -1, 0, sentinel)))


# ---------------------------------------------------------------------------
# in-kernel CCL machinery (mask/labels are [H, W] int32 in VMEM)
# ---------------------------------------------------------------------------

def _ccl_sweeps(lab, fg, sentinel, sweeps, adaptive=False, scan_steps=None):
    """Label propagation via run-id-packed PLAIN min-scans.

    Each phase broadcasts the per-run min along one orientation; run-id
    packing (see _run_planes) replaces the blocked-flag segmented scan
    (~2x fewer vector ops per step).  One "sweep2" does row, col, col,
    row phases with a single transpose round-trip — half the relayouts
    of two row+col sweeps — and a neighbor-min before every phase for
    diagonal (8-conn) propagation.  Converges to the identical fixpoint
    (min linear index per component) as the segmented formulation.

    scan_steps (adaptive mode only) truncates each phase's doubling
    ladder to that many steps — labels then propagate <= 2^scan_steps
    per phase instead of run-wide, trading more (certified) sweeps for
    cheaper phases on scenes whose components are small.
    """
    assert scan_steps is None or adaptive, \
        "truncated scans need the adaptive fixpoint certificate"
    H, W = lab.shape
    # Guard rows: G sentinel rows above and below the frame make every
    # SUBLANE roll fill-free — the wrapped rows land in (or come from)
    # guards, whose values are sentinel (labels) because every phase
    # re-masks with fgx (guards are background there).  The 8-neighbour
    # min is orientation-independent, so it ALWAYS runs in row space
    # where the guards live; only the lane scans transpose.  Net: the
    # two sublane shifts per neighbor-min drop from iota+cmp+select
    # fills (~0.39 us each, r4 microbench) to bare rolls (~0.06).
    G = 8
    Hg = H + 2 * G
    srow = jnp.full((G, W), sentinel, lab.dtype)
    zrow = jnp.zeros((G, W), fg.dtype)
    labx = jnp.concatenate([srow, lab, srow], axis=0)
    fgx = jnp.concatenate([zrow, fg, zrow], axis=0)
    big = 1 << max(1, math.ceil(math.log2(sentinel + 2)))
    # key bound: c_max * big + sentinel must stay clear of the _PEN edge
    # penalty (masked rolls add/subtract 2^30; legit keys must never
    # reach it, see _EdgeMasks)
    assert (max(W, Hg) // 2 + 2) * big + sentinel < (1 << 30), (H, W)
    mk_r = _EdgeMasks(W)
    mk_t = _EdgeMasks(Hg)
    rb_r = _run_pack(fgx, big, mk_r)
    fg_t = jnp.transpose(fgx)
    rb_t = _run_pack(fg_t, big, mk_t)

    def nb(l):
        # masked lane rolls + bare sublane rolls (guards absorb the wrap)
        row = jnp.minimum(l, jnp.minimum(_roll_lane(l, 1) + mk_r.pen_f[0],
                                         _roll_lane(l, -1) + mk_r.pen_b[0]))
        return jnp.minimum(row, jnp.minimum(pltpu.roll(row, 1, 0),
                                            pltpu.roll(row, Hg - 1, 0)))

    def phase_r(l):
        l = jnp.where(fgx > 0, nb(l), sentinel)
        return jnp.where(fgx > 0,
                         _run_min_packed(l, rb_r, mk_r,
                                         max_steps=scan_steps),
                         sentinel)

    def phase_c(l):
        l = jnp.where(fgx > 0, nb(l), sentinel)
        lt = jnp.transpose(l)
        lt = jnp.where(fg_t > 0,
                       _run_min_packed(lt, rb_t, mk_t,
                                       max_steps=scan_steps),
                       sentinel)
        return jnp.transpose(lt)

    def sweep2(l):
        return phase_r(phase_c(phase_c(phase_r(l))))

    def strip(l):
        return jax.lax.slice_in_dim(l, G, G + H, axis=0)

    if not adaptive:
        n2 = -(-sweeps // 2)          # sweep2 covers two classic sweeps
        return strip(jax.lax.fori_loop(0, n2, lambda _, l: sweep2(l),
                                       labx))

    # Adaptive: sweep until a neighbor-min fixpoint.  At such a fixpoint
    # every adjacent fg pair satisfies lab[a] <= lab[b] AND lab[b] <= lab[a]
    # (min-with-self never increases) — i.e. labels are constant per
    # component, so the check certifies FULL convergence for ~4 shifts,
    # a rounding error next to a sweep's ~40.  Exact for any geometry.
    #
    # The adaptive unit is 3 phases (row, col, row), not sweep2's 4: the
    # certificate makes the unit a pure speed knob, and the r3 variant
    # sweep on v5e measured (labels identical on the bench scene):
    #   4ph ss6 150.9 | 3ph ss6 142.4 | 4ph ss5 158.9 | 3ph ss5 135.0
    # us/frame for the whole label kernel — small convex blobs converge
    # in row,col,row (the col run covering the topmost row's min spans
    # the blob), so the second col phase is pure overhead for the
    # typical frame and the tail pays one more (cheaper) unit.
    def unit3(l):
        return phase_r(phase_c(phase_r(l)))

    def cond(carry):
        return carry[1] > 0

    def body(carry):
        lab = unit3(carry[0])
        nm = jnp.where(fgx > 0, nb(lab), sentinel)
        changed = jnp.max(jnp.where(nm < lab, 1, 0))
        return lab, changed

    return strip(jax.lax.while_loop(cond, body, (labx, jnp.int32(1)))[0])


def _fill_holes_sweeps(fg, border, sweeps, adaptive=False):
    """Returns filled foreground (int32 0/1).

    Exterior flood over background runs, with the same run-id-packed
    plain-scan machinery as _ccl_sweeps (OR == max over {0,1}) and the
    transpose-halved sweep2 structure.
    """
    H, W = fg.shape
    # r4 bisection note (scripts/profile_fill_variants.py, v5e): every
    # "new" ingredient REGRESSED this kernel — guard rows +13 us/frame,
    # ladder run-pack +23, masked scans +3 — while the same ingredients
    # (minus the ladder) IMPROVED the CCL sweeps.  The flood's planes are
    # 0/1 with cheap constant fills and its phases are few; the r3 form
    # below is the measured optimum (60 vs 85 us/frame pre+fill).
    bg = 1 - fg
    bg_t = jnp.transpose(bg)
    rb_r = _run_pack(bg, 2)
    rb_t = _run_pack(bg_t, 2)

    def grow4(ext, b):
        grown = ext
        for dy, dx in ((-1, 0), (1, 0), (0, -1), (0, 1)):
            grown = grown | _shift_const(_shift_const(ext, dy, 0, 0),
                                         dx, 1, 0)
        return grown & b

    def phase(e, rb, b, ms=None):
        return _run_or_packed(grow4(e, b), rb, max_steps=ms) & b

    # One row + one col phase per sweep (2 transposes): the exterior
    # flood usually completes within 2-3 phases, so a FINER adaptive
    # check beats the transpose-halved double sweep the CCL uses —
    # measured on v5e (the double-sweep variant over-ran the fixpoint by
    # ~4 phases per frame).  Ladders are ASYMMETRIC in adaptive mode: the
    # row phase stays full-width (border seeds must broadcast across
    # full-width background runs — truncating it measured catastrophic,
    # 169 vs 134 us/frame), while the col phase truncates to 2^5 = 32
    # reach (vertical gaps needing flooding are blob-height-deep; the
    # certificate adds sweeps on the rare deeper geometry).  r3 v5e A/B
    # on the whole label path: full/full 134.2, col-5 120.0, col-7 139.4
    # us/frame — labels identical.
    def sweep1(e):
        e = phase(e, rb_r, bg)
        et = jnp.transpose(e)
        et = phase(et, rb_t, bg_t, ms=5 if adaptive else None)
        return jnp.transpose(et)

    if not adaptive:
        ext = jax.lax.fori_loop(0, sweeps, lambda _, e: sweep1(e),
                                bg * border)
        return 1 - ext

    # Adaptive: grow to the exterior-flood fixpoint.  Growth is a monotone
    # OR-propagation, so "one 4-neighbour dilation adds nothing" certifies
    # the flood is complete — 4 shifts per check versus ~40 per sweep.
    def cond(carry):
        return carry[1] > 0

    def body(carry):
        ext = sweep1(carry[0])
        changed = jnp.max(grow4(ext, bg) & (1 - ext))
        return ext, changed

    ext = jax.lax.while_loop(cond, body, (bg * border, jnp.int32(1)))[0]
    return 1 - ext


# ---------------------------------------------------------------------------
# run-table propagation (VERDICT r4 candidate (a) — measured winner)
#
# A run = maximal same-class stretch along a row.  Production masks have
# a handful of runs per row, so the label/flood fixpoints can iterate
# over [Rmax, H] tables (thousands of elements) instead of [H, W] pixel
# planes (307k): v5e measured pre+fill+ccl 124.6 -> 93.5 us/frame when
# the CCL moved to the run table (scripts/profile_ccl_variants.py
# runtable8).  Pointer-doubling over runs is NOT Mosaic-feasible (it
# needs gathers or an [N, N] one-hot match matrix, N = H*Rmax — 132 MB
# at i32, plus rank-1/cross-lane-reshape constraints), so propagation is
# a segmented min-scan along vertical chains of same-slot overlapping
# runs plus a cross-slot +-1-row exchange, run to a certified fixpoint.
# Exactness never hinges on the run-density assumption: a per-frame
# lax.cond falls back to the plane sweeps when any row exceeds Rmax.
# ---------------------------------------------------------------------------

def _mxu_rowsum(cols):
    """Lane-reduce a list of 0/1 int32 [H, W] planes via ONE MXU matmul:
    stack as bf16 [H, W] x ones... each plane contracts with a ones
    vector — exact (0/1 in bf16, f32 accumulation of <= W ones < 2^24)
    and rides otherwise-idle MXU cycles instead of VPU reduce trees."""
    H, W = cols[0].shape
    ones = jnp.ones((W, 1), jnp.bfloat16)
    return [jax.lax.dot_general(c.astype(jnp.bfloat16), ones,
                                (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32
                                ).astype(jnp.int32) for c in cols]


def _run_extract(sel, Rmax, packed=False):
    """Per-row run tables for ``sel`` (0/1 int32 [H, W], runs along
    lanes).  Returns (runid 1-based [H, W], nrun [H, 1], S [H, R],
    E [H, R], valid [H, R]) — start/end cols, inclusive.

    Monotone-count extraction: runid counts run starts <= c, so
    S_j = #(runid < j) and len_j = #(sel & runid <= j) - #(sel &
    runid < j).  Three forms, all exact, chosen per call site by
    MEASUREMENT (v5e): the plain form (two compares + two
    lane-reductions per slot) wins at 640x480 (full detect 105.5 vs
    113.4 us/frame), the ``packed`` form — ONE reduction per slot of
    (runid < j) * (1 + (sel << 12)), decoding S + 4096*G exactly since
    S <= W < 4096 — wins at 2 MP (table path 823.8 vs 842.9 us/frame,
    reductions dominate at W = 1920); ``packed="mxu"`` moves the
    reductions to MXU matvecs (exact: 0/1 bf16 x ones, f32 accum) —
    measured SLOWER at 2 MP (913.0 vs 812.6 us/frame at rt(10,8): the
    per-slot bf16 casts and many small matmuls cost more than the VPU
    reduce trees; kept for the record)."""
    H, W = sel.shape
    start = sel & (1 - _shift_const(sel, 1, 1, 0))
    runid = _lane_cumsum_mxu(start)
    nrun = jax.lax.slice_in_dim(runid, W - 1, W, axis=1)
    if packed == "mxu":
        Scols, Gcols = [], []
        for j in range(1, Rmax + 1):
            cj = (runid < j).astype(jnp.int32)
            Scols.append(cj)
            Gcols.append(sel * cj)
        Gcols.append(sel)
        red = _mxu_rowsum(Scols + Gcols)
        S = jnp.concatenate(red[:Rmax], axis=1)            # [H, R]
        G = jnp.concatenate(red[Rmax:], axis=1)            # [H, R+1]
    elif packed:
        assert W < 4096, W             # S/G bit-packing precondition
        wsel = 1 + (sel << 12)
        SGcols = []
        for j in range(1, Rmax + 1):
            t = jnp.where(runid < j, wsel, 0)
            SGcols.append(jnp.sum(t, axis=1, keepdims=True))
        # final entry: only its G part (total sel count) is consumed
        SGcols.append(jnp.sum(sel, axis=1, keepdims=True) << 12)
        SG = jnp.concatenate(SGcols, axis=1)               # [H, R+1]
        S = jax.lax.slice_in_dim(SG, 0, Rmax, axis=1) & 4095
        G = SG >> 12                                       # [H, R+1]
    else:
        Scols, Gcols = [], []
        for j in range(1, Rmax + 1):
            cj = (runid < j).astype(jnp.int32)
            Scols.append(jnp.sum(cj, axis=1, keepdims=True))
            Gcols.append(jnp.sum(sel * cj, axis=1, keepdims=True))
        Gcols.append(jnp.sum(sel, axis=1, keepdims=True))
        S = jnp.concatenate(Scols, axis=1)                 # [H, R]
        G = jnp.concatenate(Gcols, axis=1)                 # [H, R+1]
    LEN = (jax.lax.slice_in_dim(G, 1, Rmax + 1, axis=1)
           - jax.lax.slice_in_dim(G, 0, Rmax, axis=1))
    E = S + LEN - 1
    slot = jax.lax.broadcasted_iota(jnp.int32, (H, Rmax), 1)
    valid = slot < nrun
    return runid, nrun, S, E, valid


def _table_lookup_monotone(cols, runid, Rmax, W):
    """out[r, c] = cols[r, runid[r, c] - 1] without a gather: runid is
    non-decreasing along each row, so the lookup telescopes over
    [runid > j] steps (one compare + add per slot).  Positions with
    runid == 0 read cols[:, 0] — callers mask them."""
    H = cols.shape[0]
    out = jnp.broadcast_to(jax.lax.slice_in_dim(cols, 0, 1, axis=1),
                           (H, W))
    for j in range(1, Rmax):
        Lj = jax.lax.slice_in_dim(cols, j, j + 1, axis=1)
        Lp = jax.lax.slice_in_dim(cols, j - 1, j, axis=1)
        out = out + jnp.where(runid > j, Lj - Lp, 0)
    return out


def _table_fixpoint(Lt, St, Et, mkH, pack, dilate, sentinel, Rmax):
    """Min-propagation fixpoint over a transposed [Rmax, H] run table.

    Per unit: (1) cross-slot exchange — every slot k contributes its
    lane-rolled (+-1 row) values to slots whose intervals overlap
    ([S - dilate, E + dilate] vs [S', E']; dilate=1 for 8-conn labels,
    0 for the 4-conn flood), (2) segmented min-scan along rows within
    maximal vertical chains of same-slot overlapping runs (``pack``).
    A unit that changes nothing certifies the fixpoint: runs are only
    ever adjacent at +-1 rows, and all such pairs are covered."""
    BIGC = 1 << 20

    def lroll(x, d, fill):
        return _shift_const(x, d, 1, fill)

    def exchange(L):
        acc = L
        for k in range(Rmax):
            Lk = jax.lax.slice_in_dim(L, k, k + 1, axis=0)
            Sk = jax.lax.slice_in_dim(St, k, k + 1, axis=0)
            Ek = jax.lax.slice_in_dim(Et, k, k + 1, axis=0)
            for d in (1, -1):
                ov = ((St - dilate <= lroll(Ek, d, -BIGC))
                      & (Et + dilate >= lroll(Sk, d, BIGC)))
                acc = jnp.minimum(
                    acc, jnp.where(ov, lroll(Lk, d, sentinel), sentinel))
        return acc

    def cond(c):
        return c[1] > 0

    def body(c):
        L = _run_min_packed(exchange(c[0]), pack, mkH)
        return L, jnp.max(jnp.where(L < c[0], 1, 0))

    return jax.lax.while_loop(cond, body, (Lt, jnp.int32(1)))[0]


def _ccl_runtable(lab, fg, sentinel, Rmax=8):
    """CCL labels via the run table; bit-equal to _ccl_sweeps (falls
    back to it per-frame when a row has more than Rmax runs).  ``fg``
    must be the FILLED mask (as in the classic order) and ``lab`` the
    usual lin-or-sentinel init plane."""
    H, W = lab.shape
    BIGC = 1 << 20
    runid, nrun, S, E, valid = _run_extract(fg, Rmax)
    fits = jnp.max(nrun) <= Rmax

    def table_path(lab):
        row_col = jax.lax.broadcasted_iota(jnp.int32, (H, 1), 0)
        L0 = jnp.where(valid, row_col * W + S, sentinel)
        Sv = jnp.where(valid, S, BIGC)
        Ev = jnp.where(valid, E, -BIGC)
        St = jnp.transpose(Sv)
        Et = jnp.transpose(Ev)
        Lt = jnp.transpose(L0)
        mkH = _EdgeMasks(H)

        ov_same = ((St - 1 <= _shift_const(Et, 1, 1, -BIGC))
                   & (Et + 1 >= _shift_const(St, 1, 1, BIGC)))
        seg_start = 1 - ov_same.astype(jnp.int32)
        big = 1 << max(1, math.ceil(math.log2(sentinel + 2)))
        pack = _lane_cumsum_mxu(seg_start) * big
        assert (H + 2) * big + sentinel < (1 << 30), (H, W)

        Lt2 = _table_fixpoint(Lt, St, Et, mkH, pack, 1, sentinel, Rmax)
        Lfin = jnp.transpose(Lt2)
        out = _table_lookup_monotone(Lfin, runid, Rmax, W)
        return jnp.where(fg > 0, out, sentinel)

    def classic_path(lab):
        return _ccl_sweeps(lab, fg, sentinel, 2, adaptive=True,
                           scan_steps=5)

    return jax.lax.cond(fits, table_path, classic_path, lab)


def _fill_runtable(fg0, border, Rmax=12):
    """Hole filling via the BACKGROUND run table: the exterior flood is
    a min-propagation of a reached-flag (0 = border-reachable) over bg
    runs with 4-conn overlap — same [Rmax, H] machinery as the labels.
    A bg run is seeded when its row is a frame edge or it touches
    column 0 / W-1.  Returns the filled mask (int32 0/1); bit-equal to
    _fill_holes_sweeps (per-frame fallback on run overflow — note bg
    runs of the UNFILLED mask are the densest tables in the pipeline:
    hollow rims contribute two runs each)."""
    H, W = fg0.shape
    BIGC = 1 << 20
    bg = 1 - fg0
    runid, nrun, S, E, valid = _run_extract(bg, Rmax)
    fits = jnp.max(nrun) <= Rmax

    def table_path(fg0):
        row_col = jax.lax.broadcasted_iota(jnp.int32, (H, 1), 0)
        seeded = valid & ((row_col == 0) | (row_col == H - 1)
                          | (S == 0) | (E == W - 1))
        F0 = jnp.where(seeded, 0, 1)                  # min target: 0
        Sv = jnp.where(valid, S, BIGC)
        Ev = jnp.where(valid, E, -BIGC)
        St = jnp.transpose(Sv)
        Et = jnp.transpose(Ev)
        Ft = jnp.transpose(F0)
        mkH = _EdgeMasks(H)

        ov_same = ((St <= _shift_const(Et, 1, 1, -BIGC))
                   & (Et >= _shift_const(St, 1, 1, BIGC)))
        seg_start = 1 - ov_same.astype(jnp.int32)
        pack = _lane_cumsum_mxu(seg_start) * 4        # values in {0, 1}
        Ft2 = _table_fixpoint(Ft, St, Et, mkH, pack, 0, 1, Rmax)
        Ffin = jnp.transpose(Ft2)
        hole = _table_lookup_monotone(Ffin, runid, Rmax, W)
        return jnp.where(bg > 0, hole, 0) | fg0       # unreached bg = 1

    def classic_path(fg0):
        return _fill_holes_sweeps(fg0, border, 2, adaptive=True)

    return jax.lax.cond(fits, table_path, classic_path, fg0)


def _run_pack_cls(cls, big):
    """Run-id key plane over CLASS runs: a run is a maximal same-class
    (fg or bg) stretch along lanes, so fg runs and bg runs interleave and
    ONE packed scan serves both classes' propagation (see
    _label_flood_joint).  Lane 0 is always a start (shift fill -1 differs
    from both classes)."""
    start = (cls != _shift_const(cls, 1, 1, -1)).astype(jnp.int32)
    return _lane_cumsum_mxu(start) * big


def _label_flood_joint(fg, border, sentinel, ss_row=None, ss_col=5):
    """Joint hole-fill + CCL: ONE dual-class propagation fixpoint.

    The classic pipeline runs TWO independent min/or-propagations over
    the same frame — the exterior flood over background and the CCL over
    (filled) foreground — each paying its own run-packs, scans and
    sweeps.  But fg runs and bg runs interleave along every row, so a
    single class-run packing (_run_pack_cls) lets ONE packed min-scan
    broadcast per-run minima for BOTH classes at once.  The combined
    value plane v:

      fg pixel:  its CCL label (min linear index, in [0, sentinel)),
      bg pixel:  0 if border-reachable (the exterior flood flag,
                 seeded at the frame border), else
                 OFFSET + L where L is the min label adjacent to its
                 bg-component (so at fixpoint every HOLE pixel already
                 carries its enclosing component's label — hole FILLING
                 comes out of the same loop for free), else
                 INF0 (= OFFSET + sentinel) when nothing reached it yet.

    Per-class neighbour rules (the "exchange", always in row space where
    the guard rows live):
      fg: min over fg 8-neighbours (class-crossing blocked by +_PEN),
      bg: min over bg 4-neighbours and over fg 4-neighbours + OFFSET.
    Lane neighbours inside a run are subsumed by the packed scans; the
    exchange only carries information across run/class boundaries.

    Since exterior bg converges to 0 < OFFSET and every hole converges
    to OFFSET + L < INF0, the final plane decodes directly:
      labels = fg ? v : (v >= OFFSET ? v - OFFSET : sentinel)
      filled = fg | (bg & v >= OFFSET)
    which matches fill_holes + connected_components exactly: the raster
    -min pixel of a filled component is always an original-fg pixel of
    the same component (a hole pixel on the filled top row would be
    4-adjacent to exterior above it, contradiction), so labels agree.

    LOOP 2 (feedback): an fg island nested inside another component's
    hole must MERGE with it (the classic fill-then-label order fills the
    hole first, so CCL sees one blob).  Loop 1 cannot let fg read
    bg-carried labels — mid-flood an EXTERIOR bg pixel between two
    distinct blobs briefly carries (min label)+OFFSET and would bridge
    them — so a second fixpoint runs after the flood has converged
    (exterior is then stably 0, rejected by the >= OFFSET guard): fg
    additionally accepts hole-carried labels (v - OFFSET from bg
    8-neighbours with v >= OFFSET), which propagates the enclosing
    label into islands (and their own holes) to any nesting depth.
    Frames without nesting pay one no-op exchange (the loop-2 entry
    check) and exit immediately.

    Key bounds: values <= INF0 < 2^20, so big = 2^20; class runs can be
    as dense as one per lane, so |key| <= max(W, Hg) * big + INF0 —
    asserted < 2^30 (the masked-roll _PEN precondition).

    Rebuilds the semantics of the reference's flood-fill + labeling
    stage (heimdall/core/pipeline.py contamination path) — verified
    bit-equal to _fill_holes_sweeps + _ccl_sweeps in
    tests/test_pallas_kernels.py.

    Returns (lab, filled): int32 [H, W], background = sentinel.
    """
    H, W = fg.shape
    OFFSET = 1 << 19
    assert sentinel < OFFSET, (H, W)
    INF0 = OFFSET + sentinel
    big = 1 << max(1, math.ceil(math.log2(INF0 + 2)))
    G = 8
    Hg = H + 2 * G
    assert max(W, Hg) * big + INF0 < (1 << 30), (H, W)

    zrow = jnp.zeros((G, W), fg.dtype)
    cls = jnp.concatenate([zrow, fg, zrow], axis=0)          # guards = bg
    row_idx = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)
    col_idx = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
    lin = row_idx * W + col_idx
    v0_f = jnp.where(border > 0, 0, INF0)                    # bg init
    v0 = jnp.where(fg > 0, lin, v0_f)
    irow = jnp.full((G, W), INF0, jnp.int32)                 # guards inert
    v0 = jnp.concatenate([irow, v0, irow], axis=0)

    mk_r = _EdgeMasks(W)
    mk_t = _EdgeMasks(Hg)
    # Class penalty: must dominate every legit value (<= INF0 < 2^20) but
    # stay clear of int32 overflow when an edge-masked roll adds _PEN
    # (2^30) ON TOP of it: 2^26 + 2^30 < 2^31.  (_PEN itself would wrap
    # negative there and win mins.)  Penalized candidates never reach the
    # stored plane: exchange returns min(v, cand) <= v <= INF0.
    CPEN = 1 << 26
    assert INF0 < CPEN
    pen_fg = (1 - cls) * CPEN          # add: non-fg neighbours lose mins
    pen_bg = cls * CPEN                # add: non-bg neighbours lose mins
    rb_r = _run_pack_cls(cls, big)
    rb_t = _run_pack_cls(jnp.transpose(cls), big)
    LARGE = CPEN                       # feedback no-candidate sentinel

    def vroll(x, d):
        return pltpu.roll(x, d % Hg, 0)

    def lane_min3(x):
        return jnp.minimum(x, jnp.minimum(_roll_lane(x, 1) + mk_r.pen_f[0],
                                          _roll_lane(x, -1) + mk_r.pen_b[0]))

    def exchange(v, feedback):
        vf = v + pen_fg
        lm = lane_min3(vf)
        # fg: 8-neighbourhood of fg values (self included — harmless)
        c_fg = jnp.minimum(lm, jnp.minimum(vroll(lm, 1), vroll(lm, -1)))
        # bg from fg 4-neighbours: lanes via lm (self term is +PEN at
        # bg), verticals direct
        c_bgf = jnp.minimum(lm, jnp.minimum(vroll(vf, 1),
                                            vroll(vf, -1))) + OFFSET
        # bg from bg: verticals only (lanes ride the packed scans)
        vb = v + pen_bg
        c_bg = jnp.minimum(c_bgf, jnp.minimum(vroll(vb, 1), vroll(vb, -1)))
        if feedback:
            # fg additionally reads hole-carried labels: bg 8-neighbours
            # with v >= OFFSET (exterior 0 is stably converged by loop-2
            # entry, so the guard filters it exactly)
            vh = jnp.where((cls == 0) & (v >= OFFSET), v, LARGE)
            lh = lane_min3(vh)
            c_h = jnp.minimum(lh, jnp.minimum(vroll(lh, 1), vroll(lh, -1)))
            c_fg = jnp.minimum(c_fg, c_h - OFFSET)
        return jnp.where(cls > 0, jnp.minimum(v, c_fg),
                         jnp.minimum(v, c_bg))

    def phase_r(v, feedback, ms):
        return _run_min_packed(exchange(v, feedback), rb_r, mk_r,
                               max_steps=ms)

    def phase_c(v, feedback):
        vt = jnp.transpose(exchange(v, feedback))
        vt = _run_min_packed(vt, rb_t, mk_t, max_steps=ss_col)
        return jnp.transpose(vt)

    def unit3(v, feedback):
        return phase_r(phase_c(phase_r(v, feedback, ss_row), feedback),
                       feedback, ss_row)

    def make_loop(feedback):
        def cond(c):
            return c[1] > 0

        def body(c):
            v = unit3(c[0], feedback)
            e = exchange(v, feedback)
            return v, jnp.max(jnp.where(e < v, 1, 0))

        return cond, body

    cond1, body1 = make_loop(False)
    v = jax.lax.while_loop(cond1, body1, (v0, jnp.int32(1)))[0]
    # loop 2: entry check is one feedback exchange; no nesting -> no work
    cond2, body2 = make_loop(True)
    e = exchange(v, True)
    changed = jnp.max(jnp.where(e < v, 1, 0))
    v = jax.lax.while_loop(cond2, body2, (v, changed))[0]

    v = jax.lax.slice_in_dim(v, G, G + H, axis=0)
    is_hole = (fg == 0) & (v >= OFFSET)
    lab = jnp.where(fg > 0, v, jnp.where(is_hole, v - OFFSET, sentinel))
    filled = jnp.where(is_hole, 1, fg)
    return lab, filled


# ---------------------------------------------------------------------------
# the fused kernel
# ---------------------------------------------------------------------------

def _make_label_kernel(H, W, K, sweeps, adaptive=False, scan_steps=None,
                       joint=False, rt_ccl=0, rt_fill=0):
    """Kernel A: frame → CCL labels (int32; background = H*W).

    Runs preprocess (gray → Q8 blur5 → float adaptive-11 threshold → open →
    close), hole filling and CCL entirely in VMEM.  Split from the stats
    kernel to fit the ~16 MB VMEM budget at 480x640.  Compact ids are NOT
    propagated — the stats kernel recovers slot k's membership by looking
    up the k-th root's label value (two cheap reductions per slot), which
    removes a third of this kernel's sweep cost.

    adaptive=True replaces the fixed sweep counts with in-VMEM fixpoint
    loops (exact for any geometry, and fewer sweeps on typical scenes).
    joint=True runs hole-fill + CCL as ONE dual-class fixpoint
    (_label_flood_joint; implies adaptive, ignores sweeps).
    """
    sentinel = H * W
    taps5 = _q8_taps(gaussian_kernel_1d(5, 0.0))
    k11 = [float(t) for t in gaussian_kernel_1d(11, 0.0)]

    def kernel(ct_ref, frame_ref, lab_ref):
        row_idx = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)
        col_idx = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
        b = frame_ref[0, 0].astype(jnp.int32)
        g = frame_ref[0, 1].astype(jnp.int32)
        r = frame_ref[0, 2].astype(jnp.int32)

        gray = (b * 3735 + g * 19235 + r * 9798 + (1 << 14)) >> 15
        acc = _conv_axis_pair_int(
            _conv_axis_pair_int(gray, taps5, 1, "reflect101"),
            taps5, 0, "reflect101")
        blurred = jnp.clip((acc + (1 << 15)) >> 16, 0, 255)
        mf = _conv_axis(_conv_axis(blurred.astype(jnp.float32), k11, 1,
                                   "replicate"), k11, 0, "replicate")
        mean = jnp.rint(mf).astype(jnp.int32)
        binary = jnp.where(blurred <= mean - ct_ref[0], 255, 0)
        binary = _minmax3(_minmax3(binary, True), False)    # open
        binary = _minmax3(_minmax3(binary, False), True)    # close
        fg0 = (binary > 0).astype(jnp.int32)

        border = ((row_idx == 0) | (row_idx == H - 1)
                  | (col_idx == 0) | (col_idx == W - 1)).astype(jnp.int32)
        if joint:
            lab, _ = _label_flood_joint(fg0, border, sentinel,
                                        ss_col=scan_steps)
        else:
            if rt_fill:
                fg = _fill_runtable(fg0, border, Rmax=rt_fill)
            else:
                fg = _fill_holes_sweeps(fg0, border, sweeps,
                                        adaptive=adaptive)
            lin = row_idx * W + col_idx
            lab0 = jnp.where(fg > 0, lin, sentinel)
            if rt_ccl:
                lab = _ccl_runtable(lab0, fg, sentinel, Rmax=rt_ccl)
            else:
                lab = _ccl_sweeps(lab0, fg, sentinel, sweeps,
                                  adaptive=adaptive,
                                  scan_steps=scan_steps)
        lab_ref[0] = lab

    return kernel


def _make_stats_kernel(H, W, K):
    """Kernel B: frame + CCL labels → per-blob statistic tables.

    Slot k's pixel membership: recover the k-th root's label (the raster
    rank of roots gives compact ids without any propagation) with two
    reductions, then compare the label image against that scalar.

    Reductions per slot are minimized: int32 sums (also exact past f32's
    2^24), y0 comes free from the root's row, and x0/x1/y1 come from TWO
    packed planes (lexicographic min/max carry the leading coordinate)."""
    sentinel = H * W
    ph = 1 << math.ceil(math.log2(max(H, 2)))      # pow2 > any row index
    pw = 1 << math.ceil(math.log2(max(W, 2)))

    def kernel(ct_ref, frame_ref, lab_ref, sums_ref, bbox_ref, bgsum_ref,
               meta_ref):
        row_idx = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)
        col_idx = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
        b = frame_ref[0, 0].astype(jnp.int32)
        g = frame_ref[0, 1].astype(jnp.int32)
        r = frame_ref[0, 2].astype(jnp.int32)
        gray = (b * 3735 + g * 19235 + r * 9798 + (1 << 14)) >> 15
        lab = lab_ref[0]
        lin = row_idx * W + col_idx
        fg = (lab != sentinel).astype(jnp.int32)
        is_root = (fg > 0) & (lab == lin)
        root_lin = jnp.where(is_root, lin, sentinel)
        n_blobs = jnp.sum(is_root.astype(jnp.int32))

        nb4 = (_shift(fg, 1, 0) + _shift(fg, -1, 0)
               + _shift(fg, 1, 1) + _shift(fg, -1, 1))
        boundary = ((fg > 0) & (nb4 < 4)).astype(jnp.int32)

        xpack = col_idx * ph + row_idx       # lex (col, row): min/max -> x0/x1
        ypack = row_idx * pw + col_idx       # lex (row, col): max -> y1
        lane8 = jax.lax.broadcasted_iota(jnp.int32, (N_SUMS, K), 1)
        lane4 = jax.lax.broadcasted_iota(jnp.int32, (4, K), 1)

        def slot_body(k, carry):
            sums, bboxes, bgsums, prev = carry
            # successive minima = raster-ordered roots; one reduction per
            # slot instead of two full-frame prefix-sum stacks
            root_label = jnp.min(jnp.where(root_lin > prev, root_lin,
                                           sentinel))
            m = (lab == root_label) & (root_label < sentinel)
            mi = m.astype(jnp.int32)
            stat_col = jnp.concatenate([
                jnp.sum(mi).reshape(1, 1),
                jnp.sum(mi * boundary).reshape(1, 1),
                jnp.sum(mi * col_idx).reshape(1, 1),
                jnp.sum(mi * row_idx).reshape(1, 1),
                jnp.sum(mi * gray).reshape(1, 1),
                jnp.sum(mi * b).reshape(1, 1),
                jnp.sum(mi * g).reshape(1, 1),
                jnp.sum(mi * r).reshape(1, 1),
            ], axis=0)                                       # [8, 1]
            sums = sums + jnp.where(lane8 == k, stat_col, 0)

            xp_min = jnp.min(jnp.where(m, xpack, jnp.int32(1 << 30)))
            xp_max = jnp.max(jnp.where(m, xpack, -1))
            yp_max = jnp.max(jnp.where(m, ypack, -1))
            x0 = xp_min // ph
            x1 = xp_max // ph
            y0 = root_label // W             # root = first raster pixel
            y1 = yp_max // pw
            bbox_col = jnp.concatenate(
                [x0.reshape(1, 1), y0.reshape(1, 1),
                 x1.reshape(1, 1), y1.reshape(1, 1)], axis=0)
            bboxes = jnp.where(lane4 == k, bbox_col, bboxes)

            # full-plane masked sums for the bbox window (a [H, 1]
            # rank-1 row/col split measured 3x SLOWER on v5e — partial
            # lane reductions inside the slot loop lower poorly)
            in_box = ((row_idx >= y0) & (row_idx <= y1)
                      & (col_idx >= x0) & (col_idx <= x1)).astype(jnp.int32)
            bg_col = jnp.concatenate(
                [jnp.sum(in_box * gray).reshape(1, 1),
                 jnp.sum(in_box * b).reshape(1, 1),
                 jnp.sum(in_box * g).reshape(1, 1),
                 jnp.sum(in_box * r).reshape(1, 1)], axis=0)
            bgsums = bgsums + jnp.where(lane4 == k, bg_col, 0)
            return sums, bboxes, bgsums, root_label

        sums, bboxes, bgsums, _ = jax.lax.fori_loop(
            0, jnp.minimum(n_blobs, K), slot_body,
            (jnp.zeros((N_SUMS, K), jnp.int32),
             jnp.zeros((4, K), jnp.int32),
             jnp.zeros((4, K), jnp.int32),
             jnp.int32(-1)))
        sums_ref[0] = sums
        bbox_ref[0] = bboxes
        bgsum_ref[0] = bgsums
        meta_ref[0] = jnp.full((1, 1), n_blobs, jnp.int32)

    return kernel


# Stats band height for the fused kernel's per-slot banded reductions.
# 128 rows (a multiple of the uint8 sublane tile, 32) bounds every
# per-slot reduction to a [128, W] window positioned at the blob:
# components are row-contiguous (any 4/8-connected path changes row by
# <= 1), so walking bands downward from the root's row until a band's
# last row holds no member pixels provably covers the blob.
_STATS_BAND = 128


def _use_banded_stats(H):
    """True when the fused kernel's per-slot stats take the banded path
    (and thus need the VMEM scratch plane): tall enough to band, and
    32-aligned so the clamped dynamic band loads stay on the u8 sublane
    tile.  Single predicate shared by _make_fused_kernel and the
    pallas_call scratch gating so a tall-but-unaligned frame never
    allocates an unused H*W scratch plane."""
    return H >= 2 * _STATS_BAND and H % 32 == 0


def _make_fused_kernel(H, W, K, C, sweeps, adaptive=False,
                       scan_steps=None, joint=False, rt_ccl=0, rt_fill=0):
    """Single fused kernel: preprocess + fill + CCL + per-blob stats in
    ONE invocation per frame — no label plane ever touches HBM (saves
    the int32 [B, H, W] round-trip of the two-kernel split and, at large
    batches, its 1.2 MB/frame of HBM residency).

    C = 3 (BGR channel-major) or 1 (Mono8): grayscale frames skip the
    BT.601 mix AND the per-slot b/g/r sums (5 instead of 8 stat
    reductions, 1 instead of 4 bbox-window sums — the reference scores
    color 0.5 on gray input, detectors/contamination_detector.py:157).

    For H >= 2 * _STATS_BAND the per-slot statistics run on dynamic
    [_STATS_BAND, W] row bands loaded from a VMEM scratch plane (labels
    packed with the boundary flag) and from frame_ref — each slot touches
    only the band(s) its blob occupies instead of the full plane, which
    cuts the dominant per-slot reduction cost by ~H/_STATS_BAND for the
    typical small blob.  Smaller frames keep the full-plane loop (the
    banded machinery cannot pay for itself there).
    """
    sentinel = H * W
    taps5 = _q8_taps(gaussian_kernel_1d(5, 0.0))
    k11 = [float(t) for t in gaussian_kernel_1d(11, 0.0)]
    ph = 1 << math.ceil(math.log2(max(H, 2)))
    pw = 1 << math.ceil(math.log2(max(W, 2)))
    with_color = C == 3
    banded_stats = _use_banded_stats(H)

    def kernel(ct_ref, frame_ref, sums_ref, bbox_ref, bgsum_ref, meta_ref,
               *scratch):
        row_idx = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)
        col_idx = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
        if with_color:
            b = frame_ref[0, 0].astype(jnp.int32)
            g = frame_ref[0, 1].astype(jnp.int32)
            r = frame_ref[0, 2].astype(jnp.int32)
            gray = (b * 3735 + g * 19235 + r * 9798 + (1 << 14)) >> 15
        else:
            gray = frame_ref[0, 0].astype(jnp.int32)
            b = g = r = gray
        acc = _conv_axis_pair_int(
            _conv_axis_pair_int(gray, taps5, 1, "reflect101"),
            taps5, 0, "reflect101")
        blurred = jnp.clip((acc + (1 << 15)) >> 16, 0, 255)
        mf = _conv_axis(_conv_axis(blurred.astype(jnp.float32), k11, 1,
                                   "replicate"), k11, 0, "replicate")
        mean = jnp.rint(mf).astype(jnp.int32)
        binary = jnp.where(blurred <= mean - ct_ref[0], 255, 0)
        binary = _minmax3(_minmax3(binary, True), False)    # open
        binary = _minmax3(_minmax3(binary, False), True)    # close
        fg0 = (binary > 0).astype(jnp.int32)

        border = ((row_idx == 0) | (row_idx == H - 1)
                  | (col_idx == 0) | (col_idx == W - 1)).astype(jnp.int32)
        lin = row_idx * W + col_idx
        if joint:
            lab, fg = _label_flood_joint(fg0, border, sentinel,
                                         ss_col=scan_steps)
        else:
            if rt_fill:
                fg = _fill_runtable(fg0, border, Rmax=rt_fill)
            else:
                fg = _fill_holes_sweeps(fg0, border, sweeps,
                                        adaptive=adaptive)
            if rt_ccl:
                lab = _ccl_runtable(jnp.where(fg > 0, lin, sentinel), fg,
                                    sentinel, Rmax=rt_ccl)
            else:
                lab = _ccl_sweeps(jnp.where(fg > 0, lin, sentinel), fg,
                                  sentinel, sweeps, adaptive=adaptive,
                                  scan_steps=scan_steps)

        # ---- per-blob stats (lab/fg still in VMEM registers) ----
        is_root = (fg > 0) & (lab == lin)
        root_lin = jnp.where(is_root, lin, sentinel)
        n_blobs = jnp.sum(is_root.astype(jnp.int32))

        nb4 = (_shift(fg, 1, 0) + _shift(fg, -1, 0)
               + _shift(fg, 1, 1) + _shift(fg, -1, 1))
        boundary = ((fg > 0) & (nb4 < 4)).astype(jnp.int32)

        xpack = col_idx * ph + row_idx
        ypack = row_idx * pw + col_idx
        lane8 = jax.lax.broadcasted_iota(jnp.int32, (N_SUMS, K), 1)
        lane4 = jax.lax.broadcasted_iota(jnp.int32, (4, K), 1)

        if banded_stats:
            aux_ref, = scratch
            # one scratch plane carries labels AND the boundary flag:
            # lab < sentinel = H*W < 2^30 for every VMEM-resident frame
            aux_ref[:, :] = lab + (boundary << 30)
            HB = _STATS_BAND
            lane_w = jax.lax.broadcasted_iota(jnp.int32, (1, W), 1)
            CF = 4 if with_color else 1

            def load_feats(r0):
                if with_color:
                    bb = frame_ref[0, 0, pl.ds(r0, HB), :].astype(jnp.int32)
                    gb = frame_ref[0, 1, pl.ds(r0, HB), :].astype(jnp.int32)
                    rb = frame_ref[0, 2, pl.ds(r0, HB), :].astype(jnp.int32)
                    grayb = (bb * 3735 + gb * 19235 + rb * 9798
                             + (1 << 14)) >> 15
                    return grayb, bb, gb, rb
                grayb = frame_ref[0, 0, pl.ds(r0, HB), :].astype(jnp.int32)
                return (grayb,)

            def slot_body(k, carry):
                sums, bboxes, bgsums, prev = carry
                root_label = jnp.min(jnp.where(root_lin > prev, root_lin,
                                               sentinel))
                valid = root_label < sentinel
                y0 = root_label // W
                # first band: align down to the u8 sublane tile (32) so
                # every dynamic load is tile-aligned; clamp into range
                r0_0 = jnp.minimum((y0 >> 5) << 5, H - HB)

                def bcond(c):
                    return c[0] > 0

                def bbody(c):
                    (_, r0, low, acc8, xmn, xmx, ymx, cs) = c
                    r0 = pl.multiple_of(r0, 32)
                    v = aux_ref[pl.ds(r0, HB), :]
                    lab_b = v & ((1 << 30) - 1)
                    bnd_b = v >> 30
                    row_b = r0 + jax.lax.broadcasted_iota(
                        jnp.int32, (HB, W), 0)
                    # `low` excludes rows a previous (clamped) band
                    # already accumulated
                    m = (lab_b == root_label) & valid & (row_b >= low)
                    mi = m.astype(jnp.int32)
                    feats = load_feats(r0)
                    # column/row marginals: col depends only on the lane
                    # and row only on the sublane, so ONE col-reduce +
                    # ONE row-reduce give the pixel count, both moment
                    # sums AND all four bbox extrema
                    csum = jnp.sum(mi, axis=0, keepdims=True)   # [1, W]
                    rsum = jnp.sum(mi, axis=1, keepdims=True)   # [HB, 1]
                    rpos = r0 + jax.lax.broadcasted_iota(
                        jnp.int32, (HB, 1), 0)
                    stat_col = jnp.concatenate(
                        [jnp.sum(csum).reshape(1, 1),
                         jnp.sum(mi * bnd_b).reshape(1, 1),
                         jnp.sum(csum * lane_w).reshape(1, 1),
                         jnp.sum(rsum * rpos).reshape(1, 1)]
                        + [jnp.sum(mi * f).reshape(1, 1) for f in feats],
                        axis=0)                          # [4 + CF, 1]
                    acc8 = acc8 + stat_col
                    xmn = jnp.minimum(
                        xmn, jnp.min(jnp.where(csum > 0, lane_w, W)))
                    xmx = jnp.maximum(
                        xmx, jnp.max(jnp.where(csum > 0, lane_w, -1)))
                    y1b = jnp.max(jnp.where(rsum > 0, rpos, -1))
                    ymx = jnp.maximum(ymx, y1b)
                    # rows of the bbox window inside THIS band: every row
                    # in [y0, y1] holds a member pixel (row-contiguous
                    # component), so the in-box rows here are exactly
                    # [max(y0, low), this band's last member row]
                    inrow = ((row_b >= jnp.maximum(y0, low))
                             & (row_b <= y1b)).astype(jnp.int32)
                    cs = cs + jnp.concatenate(
                        [jnp.sum(inrow * f, axis=0, keepdims=True)
                         for f in feats], axis=0)        # [CF, W]
                    # blob continues iff its pixels reach the band's last
                    # row AND the frame continues below
                    last = jax.lax.slice_in_dim(rsum, HB - 1, HB, axis=0)
                    go = (jnp.max(last) > 0) & (r0 + HB < H)
                    return (go.astype(jnp.int32),
                            jnp.minimum(r0 + HB, H - HB), r0 + HB,
                            acc8, xmn, xmx, ymx, cs)

                init = (jnp.int32(1), r0_0, jnp.int32(0),
                        jnp.zeros((4 + CF, 1), jnp.int32),
                        jnp.int32(W), jnp.int32(-1), jnp.int32(-1),
                        jnp.zeros((CF, W), jnp.int32))
                (_, _, _, acc8, x0, x1, y1,
                 cs) = jax.lax.while_loop(bcond, bbody, init)

                zero = jnp.zeros((1, 1), jnp.int32)
                stat_col = (jnp.concatenate([acc8, zero, zero, zero],
                                            axis=0)
                            if not with_color else acc8)  # [8, 1]
                sums = sums + jnp.where(lane8 == k, stat_col, 0)
                bbox_col = jnp.concatenate(
                    [x0.reshape(1, 1), y0.reshape(1, 1),
                     x1.reshape(1, 1), y1.reshape(1, 1)], axis=0)
                bboxes = jnp.where(lane4 == k, bbox_col, bboxes)

                colmask = ((lane_w >= x0) & (lane_w <= x1)).astype(
                    jnp.int32)
                bg4 = jnp.sum(cs * colmask, axis=1, keepdims=True)
                bg_col = (jnp.concatenate([bg4, zero, zero, zero], axis=0)
                          if not with_color else bg4)     # [4, 1]
                bgsums = bgsums + jnp.where(lane4 == k, bg_col, 0)
                return sums, bboxes, bgsums, root_label

            sums, bboxes, bgsums, _ = jax.lax.fori_loop(
                0, jnp.minimum(n_blobs, K), slot_body,
                (jnp.zeros((N_SUMS, K), jnp.int32),
                 jnp.zeros((4, K), jnp.int32),
                 jnp.zeros((4, K), jnp.int32),
                 jnp.int32(-1)))
            sums_ref[0] = sums
            bbox_ref[0] = bboxes
            bgsum_ref[0] = bgsums
            meta_ref[0] = jnp.full((1, 1), n_blobs, jnp.int32)
            return

        def slot_body(k, carry):
            sums, bboxes, bgsums, prev = carry
            root_label = jnp.min(jnp.where(root_lin > prev, root_lin,
                                           sentinel))
            m = (lab == root_label) & (root_label < sentinel)
            mi = m.astype(jnp.int32)
            zero = jnp.zeros((1, 1), jnp.int32)
            stat_col = jnp.concatenate([
                jnp.sum(mi).reshape(1, 1),
                jnp.sum(mi * boundary).reshape(1, 1),
                jnp.sum(mi * col_idx).reshape(1, 1),
                jnp.sum(mi * row_idx).reshape(1, 1),
                jnp.sum(mi * gray).reshape(1, 1),
            ] + ([jnp.sum(mi * b).reshape(1, 1),
                  jnp.sum(mi * g).reshape(1, 1),
                  jnp.sum(mi * r).reshape(1, 1)] if with_color
                 else [zero, zero, zero]), axis=0)           # [8, 1]
            sums = sums + jnp.where(lane8 == k, stat_col, 0)

            xp_min = jnp.min(jnp.where(m, xpack, jnp.int32(1 << 30)))
            xp_max = jnp.max(jnp.where(m, xpack, -1))
            yp_max = jnp.max(jnp.where(m, ypack, -1))
            x0 = xp_min // ph
            x1 = xp_max // ph
            y0 = root_label // W             # root = first raster pixel
            y1 = yp_max // pw
            bbox_col = jnp.concatenate(
                [x0.reshape(1, 1), y0.reshape(1, 1),
                 x1.reshape(1, 1), y1.reshape(1, 1)], axis=0)
            bboxes = jnp.where(lane4 == k, bbox_col, bboxes)

            in_box = ((row_idx >= y0) & (row_idx <= y1)
                      & (col_idx >= x0) & (col_idx <= x1)).astype(jnp.int32)
            bg_col = jnp.concatenate(
                [jnp.sum(in_box * gray).reshape(1, 1)]
                + ([jnp.sum(in_box * b).reshape(1, 1),
                    jnp.sum(in_box * g).reshape(1, 1),
                    jnp.sum(in_box * r).reshape(1, 1)] if with_color
                   else [zero, zero, zero]), axis=0)
            bgsums = bgsums + jnp.where(lane4 == k, bg_col, 0)
            return sums, bboxes, bgsums, root_label

        sums, bboxes, bgsums, _ = jax.lax.fori_loop(
            0, jnp.minimum(n_blobs, K), slot_body,
            (jnp.zeros((N_SUMS, K), jnp.int32),
             jnp.zeros((4, K), jnp.int32),
             jnp.zeros((4, K), jnp.int32),
             jnp.int32(-1)))
        sums_ref[0] = sums
        bbox_ref[0] = bboxes
        bgsum_ref[0] = bgsums
        meta_ref[0] = jnp.full((1, 1), n_blobs, jnp.int32)

    return kernel


@functools.partial(jax.jit, static_argnames=("max_blobs", "sweeps",
                                             "interpret", "adaptive",
                                             "scan_steps", "channel_major",
                                             "joint", "rt_ccl", "rt_fill"))
def contamination_pallas(frames: jnp.ndarray, contrast_threshold,
                         max_blobs: int = 64, sweeps: int = 6,
                         interpret: bool = False, adaptive: bool = False,
                         scan_steps=None, channel_major: bool = False,
                         joint: bool = False, rt_ccl: int = 0,
                         rt_fill: int = 0):
    """Run the fused single-kernel pipeline over a uint8 batch.

    Accepted input forms:
      [B, H, W, 3]  BGR (transposed to channel-major internally — costs a
                    ~0.9 MB/frame relayout per call),
      [B, 3, H, W]  BGR with channel_major=True (the production feeder
                    layout: camera stacks deliver planes, so channel-major
                    assembly is free host-side and no relayout is paid),
      [B, H, W]     Mono8 grayscale (no relayout either; color sums are
                    skipped in-kernel, color_score is 0.5 downstream as in
                    the reference).

    Returns raw per-frame outputs:
      sums   i32 [B, 8, K]  (ones, boundary, x, y, gray, b, g, r)
      bbox   i32 [B, 4, K]  (x0, y0, x1, y1 — inclusive; invalid slots 0)
      bgsum  i32 [B, 4, K]  (bbox-sums of gray, b, g, r)
      n      i32 [B]        true blob count
    """
    if frames.ndim == 3:                       # Mono8 [B, H, W]
        B, H, W = frames.shape
        C = 1
        cm = frames[:, None]
    elif channel_major:                        # [B, 3, H, W]
        B, C, H, W = frames.shape
        cm = frames
    else:                                      # [B, H, W, 3]
        B, H, W, C = frames.shape
        cm = jnp.transpose(frames, (0, 3, 1, 2))
    K = max_blobs
    ct = jnp.asarray(contrast_threshold, jnp.int32).reshape(1)

    kernel = _make_fused_kernel(H, W, K, C, sweeps, adaptive=adaptive,
                                scan_steps=scan_steps, joint=joint,
                                rt_ccl=rt_ccl, rt_fill=rt_fill)
    gs = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B,),
        in_specs=[pl.BlockSpec((1, C, H, W), lambda i, c: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=[
            pl.BlockSpec((1, N_SUMS, K), lambda i, c: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4, K), lambda i, c: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4, K), lambda i, c: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1), lambda i, c: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        # banded-stats scratch: labels + boundary packed in one plane
        # (see _make_fused_kernel) — only when the banded path is taken
        scratch_shapes=([pltpu.VMEM((H, W), jnp.int32)]
                        if _use_banded_stats(H) else []),
    )
    sums, bbox, bgsum, meta = pl.pallas_call(
        kernel,
        grid_spec=gs,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        out_shape=(
            jax.ShapeDtypeStruct((B, N_SUMS, K), jnp.int32),
            jax.ShapeDtypeStruct((B, 4, K), jnp.int32),
            jax.ShapeDtypeStruct((B, 4, K), jnp.int32),
            jax.ShapeDtypeStruct((B, 1, 1), jnp.int32),
        ),
        interpret=interpret,
    )(ct, cm)
    return sums, bbox, bgsum, meta[:, 0, 0]


def pallas_blob_table(frames, contrast_threshold, max_blobs: int = 64,
                      use_color: bool = True, sweeps: int = 6,
                      interpret: bool = False, adaptive: bool = False,
                      scan_steps=None, channel_major: bool = False,
                      joint: bool = False, rt_ccl: int = 0,
                      rt_fill: int = 0):
    """Fused-kernel equivalent of ops.blobs.blob_stats for the
    contamination pipeline: runs the kernel and assembles a BlobTable
    (same field semantics as the XLA path — tests/test_pallas_kernels.py
    asserts equality)."""
    import jax.numpy as jnp
    from heimdall_tpu.ops.blobs import BlobTable

    is_gray = frames.ndim == 3 or (channel_major and frames.shape[1] == 1)
    if is_gray:
        # grayscale input: the kernel skips color sums; the reference
        # scores color 0.5 on gray frames
        use_color = False
    sums, bbox, bgsum, n_blobs = contamination_pallas(
        frames, contrast_threshold, max_blobs=max_blobs, sweeps=sweeps,
        interpret=interpret, adaptive=adaptive, scan_steps=scan_steps,
        channel_major=channel_major, joint=joint, rt_ccl=rt_ccl,
        rt_fill=rt_fill)

    area_px = sums[:, S_ONES]
    valid = area_px > 0
    safe_px = jnp.maximum(area_px, 1)
    area = (area_px.astype(jnp.float32)
            - 0.5 * sums[:, S_BND].astype(jnp.float32) - 1.0)

    cx = sums[:, S_X] // safe_px
    cy = sums[:, S_Y] // safe_px

    x0 = jnp.where(valid, bbox[:, 0], 0)
    y0 = jnp.where(valid, bbox[:, 1], 0)
    w = jnp.where(valid, bbox[:, 2] - bbox[:, 0] + 1, 0)
    h = jnp.where(valid, bbox[:, 3] - bbox[:, 1] + 1, 0)

    bg_px = w * h - area_px
    fg_mean = jnp.where(valid, sums[:, S_GRAY] / safe_px, 127.0)
    bg_mean = jnp.where(bg_px > 0,
                        (bgsum[:, 0] - sums[:, S_GRAY]).astype(jnp.float32)
                        / jnp.maximum(bg_px, 1), 127.0)
    intensity_diff = jnp.abs(bg_mean - fg_mean)
    intensity_score = jnp.minimum(1.0, intensity_diff / 30.0)

    rect_area = (w * h).astype(jnp.float32)
    shape_score = jnp.where(rect_area > 0, 1.0 - area / rect_area, 1.0)

    if use_color:
        diffs = []
        for ch, srow in ((1, S_B), (2, S_G), (3, S_R)):
            c_fg = jnp.where(valid, sums[:, srow] / safe_px, 127.0)
            c_bg = jnp.where(bg_px > 0,
                             (bgsum[:, ch] - sums[:, srow])
                             / jnp.maximum(bg_px, 1), 127.0)
            diffs.append(jnp.abs(c_fg - c_bg))
        color_diff = jnp.maximum(jnp.maximum(diffs[0], diffs[1]), diffs[2])
        color_score = jnp.minimum(1.0, color_diff / 30.0)
    else:
        color_score = jnp.full_like(intensity_score, 0.5)

    return BlobTable(
        valid=valid, area=area, area_px=area_px, cx=cx, cy=cy,
        x=x0, y=y0, w=w, h=h,
        intensity_diff=intensity_diff, intensity_score=intensity_score,
        shape_score=shape_score, color_score=color_score, n_blobs=n_blobs)


@functools.partial(jax.jit, static_argnames=("max_blobs", "use_color",
                                             "formula", "sweeps",
                                             "interpret", "adaptive",
                                             "scan_steps", "channel_major",
                                             "joint", "rt_ccl", "rt_fill"))
def contamination_pallas_detect(frames, contrast_threshold, min_size,
                                max_size, min_confidence,
                                max_blobs: int = 64, use_color: bool = True,
                                formula: str = "python", sweeps: int = 6,
                                interpret: bool = False,
                                adaptive: bool = False,
                                scan_steps=None,
                                channel_major: bool = False,
                                joint: bool = False, rt_ccl: int = 0,
                                rt_fill: int = 0):
    """One-dispatch detection: fused kernels + confidence + gating.

    Returns (BlobTable, confidence [B,K], accepted [B,K]) — the same
    contract as detectors.contamination_detector.contamination_program,
    with everything in a single XLA program so a pipelined driver pays one
    dispatch per batch.
    """
    from heimdall_tpu.ops import blobs as blobs_mod

    table = pallas_blob_table(frames, contrast_threshold,
                              max_blobs=max_blobs, use_color=use_color,
                              sweeps=sweeps, interpret=interpret,
                              adaptive=adaptive, scan_steps=scan_steps,
                              channel_major=channel_major, joint=joint,
                              rt_ccl=rt_ccl, rt_fill=rt_fill)
    conf = (blobs_mod.confidence_native(table) if formula == "native"
            else blobs_mod.confidence_python(table))
    accepted = (table.valid
                & (table.area >= jnp.float32(min_size))
                & (table.area <= jnp.float32(max_size))
                & (conf >= jnp.float32(min_confidence)))
    return table, conf, accepted
