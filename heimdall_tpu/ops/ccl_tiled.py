"""Tiled connected-component labeling for frames too large for one VMEM pass.

The fused kernels in ops/pallas_kernels.py keep the whole frame resident in
VMEM, which caps them at ~0.4 MP; the reference's design point is 4x 2 MP
cameras (rust/heimdall-gige/src/camera.rs:48-68: Basler acA1920-50gm,
1920x1080).  This module makes those frames Pallas-fast with the classic
coarse-to-fine decomposition (the parallel-CCL literature's block-local +
boundary-merge scheme, PAPERS.md):

  1. **Band-local CCL (Pallas)**: the frame is split into horizontal bands
     of `band` rows; one kernel invocation per (frame, band) labels its band
     with *global* linear indices using the same segmented min-scan sweeps
     as the whole-frame kernel.  Bands are independent -> any frame height
     fits in VMEM.
  2. **Interface merge (XLA)**: components crossing a band boundary are
     unified with a union-find over the labels observed on the 2(R-1)
     interface rows.  Hook-to-min + pointer-jumping run on that small
     domain (<= 2(R-1)W values); the only full-image work is ONE gather
     through the resolved old-label -> root map.

Labels keep the whole-frame contract of ops/ccl.py: every foreground pixel
holds the linear index (y*W + x) of its component's minimal pixel,
background holds H*W — the min over a merged component is attained at one
of its pixels, so band-local minima merge into exactly the whole-frame
label.  tests/test_ccl_tiled.py asserts equality with ops.ccl on random,
snake, and spiral masks (including band-crossing geometry).

Hole filling does NOT label at all: a banded OR-flood grows the exterior
background (4-connected, the complementary connectivity) from the frame
border on u8 planes, re-seeding bands with their neighbours' boundary
rows until a whole round changes nothing; unreached background is hole.
"""

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from heimdall_tpu.ops.pallas_kernels import (_run_pack, _run_min_packed,
                                             _run_or_packed, _shift_const,
                                             _EdgeMasks, _roll_lane)


# ---------------------------------------------------------------------------
# band-local CCL kernel
# ---------------------------------------------------------------------------

def _neighbor_min(lab, sentinel, connectivity, mk=None):
    if mk is not None:
        l_shift = _roll_lane(lab, 1) + mk.pen_f[0]
        r_shift = _roll_lane(lab, -1) + mk.pen_b[0]
    else:
        l_shift = _shift_const(lab, 1, 1, sentinel)
        r_shift = _shift_const(lab, -1, 1, sentinel)
    if connectivity == 8:
        row = jnp.minimum(lab, jnp.minimum(l_shift, r_shift))
        return jnp.minimum(row, jnp.minimum(_shift_const(row, 1, 0, sentinel),
                                            _shift_const(row, -1, 0, sentinel)))
    out = jnp.minimum(lab, l_shift)
    out = jnp.minimum(out, r_shift)
    out = jnp.minimum(out, _shift_const(lab, 1, 0, sentinel))
    return jnp.minimum(out, _shift_const(lab, -1, 0, sentinel))


def _make_band_ccl_kernel(Th, W, sentinel, connectivity, sweeps,
                          roots_cap=0, n_bands=1, emit_edges=False,
                          to_fixpoint=False):
    """Label one [Th, W] band with global linear indices (band-local
    connectivity only; the merge step joins bands).

    With roots_cap > 0 the kernel also emits the band's first roots_cap
    component roots in raster order plus the exact root count — recovered
    in VMEM by successive masked minima, so callers never need a top_k
    over the full label image to build blob tables.

    With to_fixpoint=True the sweep loop is an in-kernel while_loop that
    exits at a certified neighbor-min fixpoint (adjacent labels can no
    longer decrease each other => constant per component): ONE launch
    labels every band exactly for any geometry, with no continuation
    kernels or convergence-flag round trips.  ``sweeps`` is then ignored.

    With emit_edges=True the kernel also writes its first and last label
    rows to a [B, R, 2, W] table, so the interface merge reads boundary
    rows from a small contiguous array instead of strided-slicing the
    full label image (which costs a relayout copy of the whole image).
    """

    def kernel(mask_ref, lab_ref, *extra_refs):
        if emit_edges:
            edge_ref, *extra_refs = extra_refs
        root_refs = extra_refs
        r = pl.program_id(1)
        # load as int32 before any compare — Mosaic rejects unsigned i8 cmp
        fg = mask_ref[0].astype(jnp.int32)  # 0/1 plane
        row = jax.lax.broadcasted_iota(jnp.int32, (Th, W), 0) + r * Th
        col = jax.lax.broadcasted_iota(jnp.int32, (Th, W), 1)
        lin = row * W + col

        fg_t = jnp.transpose(fg)

        # Sweeps run on BAND-LOCAL values (global lin minus the band base)
        # so the run-id-packed keys (see pallas_kernels._run_planes) fit
        # int32 even at 2 MP: local sentinel Th*W (e.g. 2^18 at 128x1920)
        # packs with run ids <= W/2+2 well under 2^30.
        ls = Th * W
        li = jax.lax.broadcasted_iota(jnp.int32, (Th, W), 0) * W + col
        v0 = jnp.where(fg > 0, li, ls)
        big = 1 << max(1, math.ceil(math.log2(ls + 2)))
        assert (max(W, Th) // 2 + 2) * big + ls < (1 << 30), (Th, W)
        mk_r = _EdgeMasks(W)
        mk_t = _EdgeMasks(Th)

        def phase(v, rb, f, mk, ss=None):
            v = jnp.where(f > 0, _neighbor_min(v, ls, connectivity, mk), ls)
            return jnp.where(f > 0,
                             _run_min_packed(v, rb, mk, max_steps=ss),
                             ls)

        if to_fixpoint:
            # 3-phase adaptive unit (row, col, row): the certificate makes
            # the unit a pure speed knob, and the r3 variant sweep on v5e
            # measured the 3-phase unit ~6-11% faster end-to-end than
            # sweep2's 4 phases (labels identical) — small convex blobs
            # converge in row,col,row, so sweep2's second col phase is
            # overhead for the typical band.  Scan ladders truncate to
            # 2^5 = 32 reach (the full row ladder is 11 doubling steps at
            # W=1920): same certificate-protected trade as the whole-frame
            # kernel, which measured ss5 ~5% faster than ss6 end-to-end.
            def unit3(v):
                # scan setup (the run-pack ladders) lives INSIDE the loop
                # body, like the flood kernel's: bands already at the
                # fixpoint never pay it.
                rb_r = _run_pack(fg, big, mk_r)
                rb_t = _run_pack(fg_t, big, mk_t)
                v = phase(v, rb_r, fg, mk_r, ss=5)
                vt = jnp.transpose(v)
                vt = phase(vt, rb_t, fg_t, mk_t, ss=5)
                v = jnp.transpose(vt)
                return phase(v, rb_r, fg, mk_r, ss=5)

            def cond(c):
                return c[1] > 0

            def bodyw(c):
                v = unit3(c[0])
                nm = jnp.where(fg > 0,
                               _neighbor_min(v, ls, connectivity, mk_r),
                               ls)
                return v, jnp.max(jnp.where(nm < v, 1, 0))

            # The certificate holds at v0 exactly as it does after a unit
            # (neighbor-min stationarity => adjacent values equal => labels
            # constant per component, and the raster-min holder pins the
            # constant to the component minimum), so check BEFORE the
            # first unit: converged-at-entry bands — empty or isolated-
            # pixel bands, the MAJORITY of bands on production 2MP scenes
            # — skip the sweep machinery entirely.
            nm0 = jnp.where(fg > 0,
                            _neighbor_min(v0, ls, connectivity, mk_r),
                            ls)
            c0 = jnp.max(jnp.where(nm0 < v0, 1, 0))
            v, _ = jax.lax.while_loop(cond, bodyw, (v0, c0))
        else:
            rb_r = _run_pack(fg, big, mk_r)
            rb_t = _run_pack(fg_t, big, mk_t)

            def sweep2(v):
                v = phase(v, rb_r, fg, mk_r)
                vt = jnp.transpose(v)
                vt = phase(vt, rb_t, fg_t, mk_t)
                vt = phase(vt, rb_t, fg_t, mk_t)
                v = jnp.transpose(vt)
                return phase(v, rb_r, fg, mk_r)

            n2 = -(-sweeps // 2)      # sweep2 covers two classic sweeps
            v = jax.lax.fori_loop(0, n2, lambda _, x: sweep2(x), v0)
        base = r * Th * W
        lab = jnp.where(v < ls, v + base, sentinel)
        lab_ref[0] = lab

        if emit_edges:
            edge_ref[0, 0] = jnp.concatenate(
                [jax.lax.slice_in_dim(lab, 0, 1, axis=0),
                 jax.lax.slice_in_dim(lab, Th - 1, Th, axis=0)], axis=0)

        if roots_cap:
            # [1, R, cap] / [1, R, 1] blocks stay VMEM-resident across the
            # r grid steps (same out block per frame); row r is filled via
            # a one-hot sublane mask — Mosaic rejects (1,1,cap) blocks
            # (middle dim must divide 8 or equal the array dim).
            roots_ref, count_ref = root_refs
            is_root = (fg > 0) & (lab == lin)
            root_lin = jnp.where(is_root, lin, sentinel)
            count = jnp.sum(is_root.astype(jnp.int32))
            lane = jax.lax.broadcasted_iota(jnp.int32, (1, roots_cap), 1)

            # successive minima give the raster-ordered roots with ONE
            # masked reduction per occupied slot — replacing two full-band
            # prefix-sum stacks (a sweep's worth of shifts) per invocation
            def slot(k, carry):
                tbl, prev = carry
                v = jnp.min(jnp.where(root_lin > prev, root_lin, sentinel))
                return jnp.where(lane == k, v, tbl), v

            tbl, _ = jax.lax.fori_loop(
                0, jnp.minimum(count, roots_cap), slot,
                (jnp.full((1, roots_cap), sentinel, jnp.int32),
                 jnp.int32(-1)))

            band_row = jax.lax.broadcasted_iota(
                jnp.int32, (n_bands, roots_cap), 0)

            @pl.when(r == 0)
            def _():
                roots_ref[0] = jnp.full((n_bands, roots_cap), sentinel,
                                        jnp.int32)
                count_ref[0] = jnp.zeros((n_bands, 1), jnp.int32)

            roots_ref[0] = jnp.where(band_row == r,
                                     jnp.broadcast_to(tbl,
                                                      (n_bands, roots_cap)),
                                     roots_ref[0])
            count_ref[0] = jnp.where(
                jax.lax.broadcasted_iota(jnp.int32, (n_bands, 1), 0) == r,
                jnp.full((n_bands, 1), count, jnp.int32), count_ref[0])

    return kernel


def _band_ccl_call(m, connectivity, band, sweeps, interpret, roots_cap,
                   sentinel, emit_edges=False, to_fixpoint=False):
    """One band-CCL pallas_call over padded inputs.

    ``m`` is uint8 [B, Hp, W] (Hp a multiple of ``band``).
    Returns [labels] (+ [edges [B, R, 2, W] with emit_edges]) (+
    [band_roots, counts] with roots_cap) — all padded shapes.
    """
    B, Hp, W = m.shape
    R = Hp // band
    kernel = _make_band_ccl_kernel(band, W, sentinel, connectivity, sweeps,
                                   roots_cap, n_bands=R,
                                   emit_edges=emit_edges,
                                   to_fixpoint=to_fixpoint)
    band_spec = pl.BlockSpec((1, band, W), lambda b, r: (b, r, 0),
                             memory_space=pltpu.VMEM)
    out_specs = [band_spec]
    out_shape = [jax.ShapeDtypeStruct((B, Hp, W), jnp.int32)]
    if emit_edges:
        out_specs.append(pl.BlockSpec((1, 1, 2, W),
                                      lambda b, r: (b, r, 0, 0),
                                      memory_space=pltpu.VMEM))
        out_shape.append(jax.ShapeDtypeStruct((B, R, 2, W), jnp.int32))
    if roots_cap:
        # whole-frame-resident [1, R, cap] blocks (same block across the r
        # steps; the kernel fills row r) — a (1, 1, cap) block would break
        # Mosaic's middle-dim tiling rule
        out_specs += [
            pl.BlockSpec((1, R, roots_cap), lambda b, r: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, R, 1), lambda b, r: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ]
        out_shape += [jax.ShapeDtypeStruct((B, R, roots_cap), jnp.int32),
                      jax.ShapeDtypeStruct((B, R, 1), jnp.int32)]
    return pl.pallas_call(
        kernel,
        grid=(B, R),
        in_specs=[band_spec],
        out_specs=out_specs,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(m)


def _band_ccl(mask, connectivity, band, sweeps, interpret, roots_cap=0,
              adaptive=False, emit_edges=False, frame_h=None):
    """Band-local labels for a [B, H, W] bool mask (padded to full bands).

    Returns (labels[, edge_rows [B, R, 2, W]][, band_roots [B, R, cap],
    counts [B, R]]) — extras in that order per the flags.

    With adaptive=True the kernels run their sweep loops to an in-VMEM
    certified fixpoint (``sweeps`` is ignored): one launch, exact for any
    geometry.

    ``frame_h``: padded-IO mode — mask is already [B, Hp, W] (pad rows
    False), true height frame_h; labels come back PADDED (pad rows hold
    the sentinel frame_h*W, since pad pixels are background).
    """
    B, H, W = mask.shape
    if frame_h is not None:
        Hp, H = H, frame_h
        R = Hp // band
        assert Hp == R * band and H <= Hp, (H, Hp, band)
        m = mask.astype(jnp.uint8)
    else:
        R = -(-H // band)
        Hp = R * band
        m = mask.astype(jnp.uint8)
        if Hp != H:
            m = jnp.pad(m, ((0, 0), (0, Hp - H), (0, 0)))
    sentinel = H * W  # real pixels never exceed this; pad rows are bg

    out = _band_ccl_call(m, connectivity, band, sweeps, interpret,
                         roots_cap, sentinel, emit_edges=emit_edges,
                         to_fixpoint=adaptive)

    res = [out[0] if frame_h is not None else out[0][:, :H]]
    idx = 1
    if emit_edges:
        res.append(out[idx])
        idx += 1
    if roots_cap:
        res += [out[idx], out[idx + 1][..., 0]]
    return res[0] if len(res) == 1 else tuple(res)


# ---------------------------------------------------------------------------
# interface merge (XLA, compressed union-find)
# ---------------------------------------------------------------------------

def _interface_edges(labels, band, connectivity, sentinel, edge_rows=None):
    """Label pairs (a, b) adjacent across band boundaries. [B, E] each.

    With ``edge_rows`` [B, R, 2, W] (first/last label rows, emitted by the
    band kernels) the boundary rows come from that small table; otherwise
    they are sliced from the full label image (a relayout copy of the
    whole image on TPU)."""
    B, H, W = labels.shape
    # With edge_rows the band count comes from the table itself: the
    # spatially-sharded path (parallel/tiled_sp.py) passes LOCAL labels
    # with the GLOBALLY gathered edge table, so labels.shape only covers
    # this shard's bands.
    R = edge_rows.shape[1] if edge_rows is not None else -(-H // band)
    if edge_rows is not None:
        top = edge_rows[:, :R - 1, 1]                 # last row of band r
        bot = edge_rows[:, 1:, 0]                     # first row of band r+1
    else:
        # contiguous reshape + static index (strided slicing lowers to a
        # slow gather on TPU); pad to full bands first
        lp = (labels if H == R * band else
              jnp.pad(labels, ((0, 0), (0, R * band - H), (0, 0)),
                      constant_values=sentinel))
        banded = lp.reshape(B, R, band, W)
        top = banded[:, :R - 1, band - 1]             # [B, R-1, W]
        bot = banded[:, 1:, 0]                        # [B, R-1, W]
    shifts = (-1, 0, 1) if connectivity == 8 else (0,)
    a_parts, b_parts = [], []
    for s in shifts:
        # pair (top[j+s], bot[j])
        if s == 0:
            a = top
        elif s > 0:
            a = jnp.concatenate(
                [top[..., s:], jnp.full((B, R - 1, s), sentinel,
                                        labels.dtype)], axis=-1)
        else:
            a = jnp.concatenate(
                [jnp.full((B, R - 1, -s), sentinel, labels.dtype),
                 top[..., :s]], axis=-1)
        a_parts.append(a.reshape(B, -1))
        b_parts.append(bot.reshape(B, -1))
    a = jnp.concatenate(a_parts, axis=-1)
    b = jnp.concatenate(b_parts, axis=-1)
    valid = (a < sentinel) & (b < sentinel)
    return (jnp.where(valid, a, sentinel).astype(jnp.int32),
            jnp.where(valid, b, sentinel).astype(jnp.int32))


def _ranks(u, v):
    """Batched first-occurrence rank of each v in the sorted rows of u."""
    return jax.vmap(functools.partial(jnp.searchsorted, side="left",
                                      method="scan_unrolled"))(u, v)


def _resolve_roots(u, a, b, iters):
    """Union-find over the sorted interface-label domain ``u`` [B, E0].

    Operates on dense ids (positions in the sorted domain) so the hot loop
    is pure small gathers/scatter-min — u is sorted, so min-by-value equals
    min-by-id and pointer jumping is ``parent[parent]`` with no searches.
    Returns per-position root *values* (min label of the merged component),
    canonicalized so duplicate positions agree.
    """
    B, E0 = u.shape
    # three binary searches total, all outside the loop
    aid = _ranks(u, a)
    bid = _ranks(u, b)
    first = _ranks(u, u)                 # first-occurrence rank per position
    parent = jnp.broadcast_to(jnp.arange(E0, dtype=jnp.int32), (B, E0))
    bidx = jnp.arange(B)[:, None]

    def body(_, parent):
        pa = jnp.take_along_axis(parent, aid, axis=-1)
        pb = jnp.take_along_axis(parent, bid, axis=-1)
        lo = jnp.minimum(pa, pb)
        hi = jnp.maximum(pa, pb)
        parent = parent.at[bidx, hi].min(lo)
        for _ in range(2):               # pointer jumping
            parent = jnp.take_along_axis(parent, parent, axis=-1)
        return parent

    parent = jax.lax.fori_loop(0, iters, body, parent)
    canon = jnp.take_along_axis(parent, first, axis=-1)
    return jnp.take_along_axis(u, canon, axis=-1)


# changed-pair capacity for the compare-select remap; runtime cost scales
# with the ACTUAL number of changed labels (fori_loop with a traced bound),
# so the cap costs nothing — it only bounds the prepared pair table.
_MAX_CHANGED = 1024

# distinct-edge budget for the small merge tier.  Production frames have a
# handful of distinct cross-band pairs; on that domain the union-find runs
# as broadcast compares ([B, 2C, C] masks) with NO gathers or searches —
# TPU gathers stream at ~70M elem/s, so the 1024-wide gather/searchsorted
# machinery of the general tier costs ~1.5 ms/frame while this tier is
# effectively free.
_SMALL_CAP = 128


def _resolve_small(u, a, b):
    """Gather-free union-find over a tiny sorted domain ``u`` [B, U].

    Edge endpoints a/b [B, E] (big-padded).  Min-propagation with value
    jumping, every step expressed as masked broadcast reductions; loops to
    the exact fixpoint (monotone decreasing on a finite lattice).
    Returns per-position root values, canonical across duplicates.
    """
    big = jnp.int32(2**30)
    am = u[:, :, None] == a[:, None, :]          # [B, U, E]
    bm = u[:, :, None] == b[:, None, :]
    abm = am | bm

    def step(r):
        ra = jnp.min(jnp.where(am, r[:, :, None], big), axis=1)   # [B, E]
        rb = jnp.min(jnp.where(bm, r[:, :, None], big), axis=1)
        m = jnp.minimum(ra, rb)
        upd = jnp.min(jnp.where(abm, m[:, None, :], big), axis=2)
        r = jnp.minimum(r, upd)
        for _ in range(2):        # value jump: r_i <- min r over holders of r_i
            jm = u[:, :, None] == r[:, None, :]                   # [B, U, U]
            r = jnp.min(jnp.where(jm, r[:, :, None], big), axis=1)
        return r

    r1 = step(u)
    carry = (r1, jnp.all(r1 == u))

    def body(c):
        r, _ = c
        r2 = step(r)
        return r2, jnp.all(r2 == r)

    r, _ = jax.lax.while_loop(lambda c: ~c[1], body, carry)
    return r


def _changed_pairs(u, roots, cap):
    """Compact (old, new) pairs where the merge changed a label. [B, cap]."""
    E0 = u.shape[-1]
    is_first = jnp.concatenate(
        [jnp.ones_like(u[:, :1], bool), u[:, 1:] != u[:, :-1]], axis=-1)
    changed = is_first & (roots != u)
    n_changed = jnp.sum(changed, axis=-1)              # [B]
    big = jnp.int32(2**30)
    keys = jnp.where(changed, u, big)
    order = jnp.argsort(keys, axis=-1)[:, :cap]
    old = jnp.take_along_axis(keys, order, axis=-1)
    new = jnp.take_along_axis(roots, order, axis=-1)
    new = jnp.where(old < big, new, big)
    return old, new, n_changed


def _apply_pairs(labels, old, new, n_changed, chunk=8):
    """labels with old[m] -> new[m] applied; O(n_changed / chunk)
    full-image passes — ``chunk`` selects fuse into one pass, and the
    while-loop dispatch overhead (not the compares) dominated at one pair
    per pass.  Typical frames change <= 8 labels -> a single pass.

    Invalid slots hold 2**30 which no label equals (labels <= H*W)."""
    B, H, W = labels.shape
    flat = labels.reshape(B, H * W)

    def body(m, acc):
        o = jax.lax.dynamic_slice_in_dim(old, m * chunk, chunk, axis=-1)
        n = jax.lax.dynamic_slice_in_dim(new, m * chunk, chunk, axis=-1)
        for j in range(chunk):
            acc = jnp.where(flat == o[:, j:j + 1], n[:, j:j + 1], acc)
        return acc

    n_pairs = jnp.minimum(jnp.max(n_changed), old.shape[-1])
    # over-read into the big-padded tail is harmless: nothing matches 2^30
    n_iter = (n_pairs + chunk - 1) // chunk
    out = jax.lax.fori_loop(0, n_iter, body, flat)
    return out.reshape(B, H, W)


def _pad_pairs(x, fill):
    """Pad a changed-pair table out to the _MAX_CHANGED capacity so the
    merge tiers produce identical shapes for lax.cond."""
    pad = _MAX_CHANGED - x.shape[-1]
    if pad <= 0:
        return x
    return jnp.pad(x, ((0, 0), (0, pad)), constant_values=fill)


def _merge_prep(labels, band, connectivity, sentinel, iters,
                edge_rows=None):
    """Shared merge machinery: dedup/compact the interface edges, resolve
    the union-find, extract changed pairs.  Returns everything both the
    fast compare-select path and the adversarial fallback need.

    Dedup matters: a large component (e.g. the scene background during
    hole filling) produces an edge per interface pixel but only ONE
    distinct root pair per band crossing, so distinct pairs stay tiny for
    any realistic mask.  Two tiers exploit that:

    * **small** (run-start marks <= _SMALL_CAP, the production case):
      adjacent duplicate pairs along each boundary collapse via one
      shift-compare — no full-domain value sort — and the union-find runs
      gather-free on the tiny compacted domain (_resolve_small).
      Duplicate pairs that survive run dedup are harmless (same union).
    * **general** (<= _MAX_CHANGED distinct): full sort-based dedup +
      the positional union-find.  Beyond that, callers fall back to the
      dense-gather remap — exact at every tier.
    """
    a, b = _interface_edges(labels, band, connectivity, sentinel,
                            edge_rows)
    cap = _MAX_CHANGED
    big = jnp.int32(2**30)
    trivial = (a >= sentinel) | (b >= sentinel) | (a == b)
    lo0 = jnp.where(trivial, big, jnp.minimum(a, b))
    hi0 = jnp.where(trivial, big, jnp.maximum(a, b))

    # run-start marks: cheap upper bound on the distinct pair count
    prev_lo = jnp.concatenate([jnp.full_like(lo0[:, :1], big),
                               lo0[:, :-1]], axis=-1)
    prev_hi = jnp.concatenate([jnp.full_like(hi0[:, :1], big),
                               hi0[:, :-1]], axis=-1)
    mark = (lo0 < big) & ((lo0 != prev_lo) | (hi0 != prev_hi))
    n_marks = jnp.sum(mark, axis=-1)

    def small_branch(_):
        # Compact the <= _SMALL_CAP marked edges by successive index
        # minima: C iterations of three [B, E] reductions instead of a
        # stable argsort over the full edge table (XLA sorts on [B, ~15K]
        # rows cost ~10x the reductions on TPU; same reason the roots
        # kernels use successive minima over prefix-sum ranking).
        C = _SMALL_CAP
        E = lo0.shape[-1]
        Bn = lo0.shape[0]
        idx = jax.lax.broadcasted_iota(jnp.int32, (Bn, E), 1)
        key = jnp.where(mark, idx, big)
        lane = jax.lax.broadcasted_iota(jnp.int32, (Bn, C), 1)

        def slot(k, carry):
            at, bt, prev = carry
            kidx = jnp.min(jnp.where(key > prev[:, None], key, big),
                           axis=-1)                             # [B]
            hit = idx == kidx[:, None]
            av = jnp.min(jnp.where(hit, lo0, big), axis=-1)
            bv = jnp.min(jnp.where(hit, hi0, big), axis=-1)
            at = jnp.where(lane == k, av[:, None], at)
            bt = jnp.where(lane == k, bv[:, None], bt)
            return at, bt, kidx

        a_c, b_c, _ = jax.lax.fori_loop(
            0, jnp.minimum(jnp.max(n_marks), C), slot,
            (jnp.full((Bn, C), big, jnp.int32),
             jnp.full((Bn, C), big, jnp.int32),
             jnp.full((Bn,), -1, jnp.int32)))
        u = jnp.sort(jnp.concatenate([a_c, b_c], axis=-1), axis=-1)
        roots = _resolve_small(u, a_c, b_c)
        roots = jnp.where(u < big, roots, u)
        old, new, n_changed = _changed_pairs(u, roots, cap)
        return _pad_pairs(old, big), _pad_pairs(new, big), n_changed, n_marks

    def general_branch(_):
        lo, hi = jax.lax.sort((lo0, hi0), dimension=-1, num_keys=2)
        distinct = ((lo < big)
                    & jnp.concatenate(
                        [jnp.ones_like(lo[:, :1], bool),
                         (lo[:, 1:] != lo[:, :-1])
                         | (hi[:, 1:] != hi[:, :-1])],
                        axis=-1))
        n_edges = jnp.sum(distinct, axis=-1)
        order = jnp.argsort(~distinct, axis=-1, stable=True)[:, :cap]
        keep = jnp.take_along_axis(distinct, order, axis=-1)
        a_c = jnp.where(keep, jnp.take_along_axis(lo, order, axis=-1), big)
        b_c = jnp.where(keep, jnp.take_along_axis(hi, order, axis=-1), big)

        u = jnp.sort(jnp.concatenate([a_c, b_c], axis=-1), axis=-1)
        roots = _resolve_roots(u, a_c, b_c, iters)
        roots = jnp.where(u < big, roots, u)     # padding stays itself
        old, new, n_changed = _changed_pairs(u, roots, cap)
        return _pad_pairs(old, big), _pad_pairs(new, big), n_changed, n_edges

    old, new, n_changed, n_edges = jax.lax.cond(
        jnp.max(n_marks) <= _SMALL_CAP, small_branch, general_branch,
        operand=None)
    return dict(a=a, b=b, trivial=trivial, n_edges=n_edges, cap=cap,
                old=old, new=new, n_changed=n_changed, iters=iters)


def _slow_remap(labels, prep, sentinel):
    """Adversarial fallback: full edge list, dense map, one image gather."""
    B, H, W = labels.shape
    am = jnp.where(prep["trivial"], sentinel, prep["a"])
    bm = jnp.where(prep["trivial"], sentinel, prep["b"])
    uf = jnp.sort(jnp.concatenate([am, bm], axis=-1), axis=-1)
    rf = _resolve_roots(uf, am, bm, prep["iters"])
    bidx = jnp.arange(B)[:, None]
    dense = jnp.broadcast_to(jnp.arange(sentinel + 1, dtype=jnp.int32),
                             (B, sentinel + 1))
    dense = dense.at[bidx, uf].set(jnp.minimum(rf, sentinel))
    flat = labels.reshape(B, H * W)
    return jnp.take_along_axis(dense, flat, axis=-1).reshape(B, H, W)


def _merge_band_labels(labels, band, connectivity, sentinel, iters=0,
                       edge_rows=None):
    """Unify components across band boundaries.

    The union-find runs on the small interface domain; applying it back is
    a compare-select pass per changed label (production frames change a
    handful).  If more than _MAX_CHANGED distinct edges appear
    (adversarial masks), a dense old->root map plus one full-image gather
    takes over — exact either way, TPU gathers are just ~10x slower than
    the compare passes.
    """
    B, H, W = labels.shape
    R = -(-H // band)
    if R <= 1:
        return labels
    if iters <= 0:
        iters = max(1, math.ceil(math.log2(R))) + 2
    prep = _merge_prep(labels, band, connectivity, sentinel, iters,
                       edge_rows)

    return jax.lax.cond(
        jnp.max(prep["n_edges"]) <= prep["cap"],
        lambda _: _apply_pairs(labels, prep["old"], prep["new"],
                               prep["n_changed"]),
        lambda _: _slow_remap(labels, prep, sentinel),
        operand=None)


def _merge_with_roots(labels, band_roots, counts, band, connectivity,
                      sentinel, K, iters=0, want_incidence=False,
                      edge_rows=None):
    """Merge + global root table from the band kernels' per-band tables.

    Returns (merged labels, root_table [B, K] of the first K merged roots
    in raster order padded with sentinel, n_blobs [B]).  The root table
    comes from the per-band tables minus the labels the merge remapped
    away — no full-image top_k.  Labels and root table fall back
    independently: an over-capacity band table only costs a top_k, not
    the dense-remap slow path.

    With want_incidence=True also returns (slot_list [B, R, K] i32,
    slot_count [B, R] i32): for each band, the table slots whose component
    has at least one pixel in that band (slot ids ascending, then padding).
    Exact on the table path — every pixel's pre-merge label is in its
    band's root table, so mapping the band tables through the merge pairs
    and intersecting with the slot table gives per-band membership on tiny
    [B, R, cap] tensors.  Fallback paths conservatively mark every slot
    present in every band.  The banded stats kernel uses this to visit
    only (slot, band) pairs that actually intersect.
    """
    B, H, W = labels.shape
    R = -(-H // band)
    cap_b = band_roots.shape[-1]
    flat_roots = band_roots.reshape(B, -1)             # ascending per band

    def dense_incidence(rl):
        pres = jnp.broadcast_to((rl < sentinel)[:, None, :], (B, R, K))
        return pres

    if R <= 1:
        rl = flat_roots[:, :K]
        n_blobs = counts.sum(axis=-1)
        if want_incidence:
            return (labels, rl, n_blobs,
                    *_compact_incidence(dense_incidence(rl)))
        return labels, rl, n_blobs
    if iters <= 0:
        iters = max(1, math.ceil(math.log2(R))) + 2
    prep = _merge_prep(labels, band, connectivity, sentinel, iters,
                       edge_rows)
    old = prep["old"]
    new = prep["new"]
    edges_ok = jnp.max(prep["n_edges"]) <= prep["cap"]

    merged = jax.lax.cond(
        edges_ok,
        lambda _: _apply_pairs(labels, prep["old"], prep["new"],
                               prep["n_changed"]),
        lambda _: _slow_remap(labels, prep, sentinel),
        operand=None)

    def table_roots(_):
        gone = jnp.any(flat_roots[:, :, None] == old[:, None, :], axis=-1)
        survivors = jnp.where(gone, sentinel, flat_roots)
        rl = jnp.sort(survivors, axis=-1)[:, :K]
        n_blobs = counts.sum(axis=-1) - prep["n_changed"]
        if not want_incidence:
            return rl, n_blobs
        # F(band root) through the changed pairs, then intersect with rl
        big = jnp.int32(2**30)
        hit = flat_roots[:, :, None] == old[:, None, :]   # [B, R*cap, P]
        mapped = jnp.where(
            jnp.any(hit, axis=-1),
            jnp.min(jnp.where(hit, new[:, None, :], big), axis=-1),
            flat_roots).reshape(B, R, cap_b)
        presence = jnp.any(
            (mapped[..., None] == rl[:, None, None, :])
            & (mapped[..., None] < sentinel), axis=2)     # [B, R, K]
        return rl, n_blobs, presence

    def topk_roots(_):
        lin = (jnp.arange(H, dtype=jnp.int32)[:, None] * W
               + jnp.arange(W, dtype=jnp.int32)[None, :])
        is_root = (merged == lin) & (merged != sentinel)
        keys = jnp.where(is_root, merged, sentinel).reshape(B, H * W)
        rl = -jax.lax.top_k(-keys, K)[0]
        n_blobs = jnp.sum(is_root.astype(jnp.int32), axis=(-2, -1))
        if not want_incidence:
            return rl, n_blobs
        return rl, n_blobs, dense_incidence(rl)

    # the table path requires un-truncated band tables: with > cap_b roots
    # in one band, merge removals could promote a truncated root into the
    # global first-K
    out = jax.lax.cond(
        edges_ok & (jnp.max(counts) <= cap_b), table_roots, topk_roots,
        operand=None)
    if want_incidence:
        rl, n_blobs, presence = out
        return merged, rl, n_blobs, *_compact_incidence(presence)
    rl, n_blobs = out
    return merged, rl, n_blobs


def _compact_incidence(presence):
    """[B, R, K] bool -> (slot_list [B, R, K] i32 ascending-present-first,
    slot_count [B, R] i32)."""
    order = jnp.argsort(~presence, axis=-1, stable=True)
    return order.astype(jnp.int32), jnp.sum(presence, axis=-1,
                                            dtype=jnp.int32)


# ---------------------------------------------------------------------------
# public API (contract-compatible with ops/ccl.py)
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("connectivity", "band",
                                             "sweeps", "merge_iters",
                                             "interpret", "return_roots",
                                             "adaptive", "band_slots",
                                             "frame_h"))
def connected_components_tiled(mask, connectivity: int = 8, band: int = 256,
                               sweeps: int = 6, merge_iters: int = 0,
                               interpret: bool = False,
                               return_roots: int = 0,
                               adaptive: bool = False,
                               band_slots: bool = False,
                               frame_h: int | None = None):
    """Drop-in for ops.ccl.connected_components on [B, H, W] bool masks.

    Identical output contract (labels = linear index of the component's
    minimal pixel; background = H*W); any H (bands pad internally).

    With return_roots = K > 0, also returns (root_table [B, K] — the first
    K component root indices in raster order, padded with H*W — and
    n_blobs [B]), recovered from the band kernels' per-band root tables so
    blob_stats skips its full-image top_k.

    With adaptive=True, ``sweeps`` is ignored: the band kernels run an
    in-kernel ``lax.while_loop`` to a certified neighbor-min fixpoint,
    exact for any geometry.  (With adaptive=False, ``sweeps`` is the fixed
    per-band budget — a correctness hazard for snaky geometry; prefer
    adaptive.)

    With band_slots=True (requires return_roots > 0), additionally returns
    (slot_list [B, R, K] i32, slot_count [B, R] i32) — per band, which
    table slots have pixels there (see _merge_with_roots) — for
    blob_stats_tiled to skip empty (slot, band) pairs.

    ``frame_h``: padded-IO mode (see fill_holes_tiled) — mask already
    [B, Hp, W], labels returned PADDED with sentinel frame_h*W pad rows.
    """
    if band_slots and not return_roots:
        raise ValueError("band_slots=True requires return_roots > 0 "
                         "(slot tables are recovered from the root table)")
    squeeze = mask.ndim == 2
    if squeeze:
        mask = mask[None]
    B, H, W = mask.shape
    sentinel = (frame_h if frame_h is not None else H) * W
    if not return_roots:
        lab, edges = _band_ccl(mask, connectivity, band, sweeps, interpret,
                               adaptive=adaptive, emit_edges=True,
                               frame_h=frame_h)
        lab = _merge_band_labels(lab, band, connectivity, sentinel,
                                 merge_iters, edge_rows=edges)
        return lab[0] if squeeze else lab

    K = return_roots
    # the in-kernel tables are wider than K so blob-heavy bands (kernel
    # loop cost stays O(actual roots)) keep the cheap table path; only
    # > cap_b roots in one band falls back to a top_k
    lab, edges, band_roots, counts = _band_ccl(mask, connectivity, band,
                                               sweeps, interpret,
                                               roots_cap=max(K, 128),
                                               adaptive=adaptive,
                                               emit_edges=True,
                                               frame_h=frame_h)
    out = _merge_with_roots(lab, band_roots, counts, band,
                            connectivity, sentinel, K, merge_iters,
                            want_incidence=band_slots, edge_rows=edges)
    if band_slots:
        lab, rl, n_blobs, slot_list, slot_count = out
        if squeeze:
            return lab[0], rl[0], n_blobs[0], slot_list[0], slot_count[0]
        return lab, rl, n_blobs, slot_list, slot_count
    lab, rl, n_blobs = out
    if squeeze:
        return lab[0], rl[0], n_blobs[0]
    return lab, rl, n_blobs


def _make_flood_kernel(Th, W, n_bands, from_binary=False):
    """OR-flood one band to its local fixpoint (4-connected exterior).

    Inputs: bg band u8 (1 = background), ext band u8 (current exterior
    flood, subset of bg), halo [1, 2, W] u8 (the exterior state of the
    rows just outside the band, zero at frame edges).  Outputs the grown
    ext band, its first/last rows (so the driver builds the next round's
    halos from a small [B, R, 2, W] table instead of strided-slicing the
    full plane), and a per-band flag (1 iff this invocation changed
    nothing) — the XLA driver loop stops as soon as a whole round is a
    no-op, which certifies the GLOBAL flood fixpoint, because each round
    seeds every band with its neighbours' boundary rows.

    ``from_binary``: the first input is the preprocess kernel's binary
    plane (u8, fg = nonzero) instead of a precomputed bg plane — the
    inversion happens here (one vector compare) so the seeded path
    (fill_holes_tiled(seed=...)) never materializes bg in HBM.
    """

    def kernel(bg_ref, ext_ref, halo_ref, out_ref, edge_ref, flag_ref):
        r = pl.program_id(1)
        if from_binary:
            bg = (bg_ref[0].astype(jnp.int32) == 0).astype(jnp.int32)
        else:
            bg = bg_ref[0].astype(jnp.int32)
        fg = 1 - bg
        ext0 = ext_ref[0].astype(jnp.int32)
        halo = halo_ref[0, 0].astype(jnp.int32)          # [2, W]
        top = jax.lax.slice_in_dim(halo, 0, 1, axis=0)   # [1, W]
        bot = jax.lax.slice_in_dim(halo, 1, 2, axis=0)
        row_i = jax.lax.broadcasted_iota(jnp.int32, (Th, W), 0)
        seed = ext0 | (jnp.where(row_i == 0, jnp.tile(top, (Th, 1)), 0)
                       | jnp.where(row_i == Th - 1,
                                   jnp.tile(bot, (Th, 1)), 0)) & bg

        # plain iota-fill shifts throughout: the r4 bisection rejected the
        # masked-roll ingredients for the flood (scripts/
        # profile_fill_variants.py) — the 0/1 planes' constant fills are
        # cheap and the phases are few
        def grow4(e, b):
            g = e
            for sft, axis in ((1, 0), (-1, 0), (1, 1), (-1, 1)):
                g = g | _shift_const(e, sft, axis, 0)
            return g & b

        def phase(e, rb, b, ms=None):
            return _run_or_packed(grow4(e, b), rb, max_steps=ms) & b

        # finer adaptive granularity than the CCL's double sweep: the
        # flood usually completes in 2-3 phases (see pallas_kernels
        # _fill_holes_sweeps).  The run-pack matmuls and the bg transpose
        # live INSIDE the loop body: on certify rounds (the driver re-runs
        # every band until a whole round is a no-op, and the no-op round
        # starts with pending == 0) the loop never executes, so those
        # rounds pay only the loads, the pending check, and the edge/flag
        # writes — not the scan setup.
        #
        # Ladders are ASYMMETRIC like the whole-frame fill: the row phase
        # stays full-width (border seeds broadcast across full-W background
        # runs), the band-direction phase truncates to 2^4 = 16 reach —
        # the local-fixpoint loop plus the global round certificate keep
        # the result exact on deeper geometry.  r3 v5e A/B on 2MP masks
        # (flood only, us/frame): full 318.8 | col5 302.7 | col4 292.3,
        # outputs identical.
        def sweep1(e):
            bg_t = jnp.transpose(bg)
            rb_r = _run_pack(bg, 2)
            rb_t = _run_pack(bg_t, 2)
            e = phase(e, rb_r, bg)
            et = jnp.transpose(e)
            et = phase(et, rb_t, bg_t, ms=4)
            return jnp.transpose(et)

        def cond(c):
            return c[1] > 0

        def body(c):
            e = sweep1(c[0])
            return e, jnp.max(grow4(e, bg) & (1 - e))

        pending = jnp.max(grow4(seed, bg) & (1 - seed))
        ext, _ = jax.lax.while_loop(cond, body, (seed, pending))
        out_ref[0] = ext.astype(jnp.uint8)
        edge_ref[0, 0] = jnp.concatenate(
            [jax.lax.slice_in_dim(ext, 0, 1, axis=0),
             jax.lax.slice_in_dim(ext, Th - 1, Th, axis=0)],
            axis=0).astype(jnp.uint8)

        # flood is monotone, so "changed vs the input ext" = any new bit
        changed = jnp.max(ext & (1 - ext0))
        row_sel = (jax.lax.broadcasted_iota(jnp.int32, (n_bands, 1), 0)
                   == r)

        @pl.when(r == 0)
        def _():
            flag_ref[0] = jnp.zeros((n_bands, 1), jnp.int32)

        flag_ref[0] = jnp.where(
            row_sel, jnp.full((n_bands, 1), 1 - changed, jnp.int32),
            flag_ref[0])

    return kernel


@functools.partial(jax.jit, static_argnames=("band", "sweeps",
                                             "merge_iters", "interpret",
                                             "adaptive", "frame_h"))
def fill_holes_tiled(mask, band: int = 256, sweeps: int = 6,
                     merge_iters: int = 0, interpret: bool = False,
                     adaptive: bool = False, frame_h: int | None = None,
                     seed=None):
    """Drop-in for ops.ccl.fill_holes on [B, H, W] bool masks.

    Background 4-connected-reachable from the frame border (the
    complementary connectivity of the 8-connected foreground) is exterior;
    every other background pixel is hole.  Implemented as a banded
    OR-flood: each Pallas invocation floods its band to a local fixpoint
    on u8 planes, and an XLA while_loop re-seeds bands with their
    neighbours' boundary rows until a whole round changes nothing — the
    global fixpoint.  This replaced a background CCL + interface merge +
    border-root reach test that profiled 4x slower (int32 label planes,
    sort/argsort interface dedup, per-root full-image compares).

    ``sweeps``/``merge_iters``/``adaptive`` are accepted for API
    compatibility; the flood always runs to the exact fixpoint.

    ``frame_h``: when set, ``mask`` is ALREADY padded to full bands
    ([B, Hp, W], pad rows False) with true frame height ``frame_h``, and
    the PADDED filled plane is returned — the zero-copy contract the
    detector's 2MP path uses to share one padded layout across all tiled
    stages (each pad/unpad of a 2MP plane costs 30-60 us/frame of pure
    HBM relayout, measured r3).

    ``seed`` (VERDICT r4 #4, requires frame_h): (ext0 [B, Hp, W] u8,
    edges0 [B, R, 2, W] u8) as emitted by
    contamination_preprocess_tiled(flood_seed=True); ``mask`` is then the
    preprocess kernel's PADDED binary u8 plane (fg = nonzero) consumed
    directly — no bool cast, no bg plane, no border/ext0/edge-slice XLA
    prologue ever touches HBM.
    """
    del sweeps, merge_iters, adaptive
    squeeze = mask.ndim == 2
    if squeeze:
        mask = mask[None]
    padded_io = frame_h is not None
    B, H, W = mask.shape
    if seed is not None:
        assert padded_io, "seed requires the padded frame_h contract"
        Hp, H = H, frame_h
        R = Hp // band
        assert Hp == R * band and H <= Hp, (H, Hp, band)
        ext0, edges0 = seed
        kernel = _make_flood_kernel(band, W, R, from_binary=True)
        bg = mask                      # binary u8 plane, inverted in-kernel
    else:
        if padded_io:
            Hp, H = H, frame_h
            R = Hp // band
            assert Hp == R * band and H <= Hp, (H, Hp, band)
            bg = (~mask).astype(jnp.uint8)
        else:
            R = -(-H // band)
            Hp = R * band
            bg = (~mask).astype(jnp.uint8)
            if Hp != H:
                # pad rows are exterior-seeded background: they sit
                # outside the frame and the real bottom border row is a
                # seed anyway
                bg = jnp.pad(bg, ((0, 0), (0, Hp - H), (0, 0)),
                             constant_values=1)
        row = jnp.arange(Hp, dtype=jnp.int32)[None, :, None]
        col = jnp.arange(W, dtype=jnp.int32)[None, None, :]
        border = ((row == 0) | (row >= H - 1) | (col == 0)
                  | (col == W - 1)).astype(jnp.uint8)
        ext0 = bg * border
        kernel = _make_flood_kernel(band, W, R)
    band_spec = pl.BlockSpec((1, band, W), lambda b, r: (b, r, 0),
                             memory_space=pltpu.VMEM)
    call = pl.pallas_call(
        kernel,
        grid=(B, R),
        in_specs=[band_spec, band_spec,
                  pl.BlockSpec((1, 1, 2, W), lambda b, r: (b, r, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=[band_spec,
                   pl.BlockSpec((1, 1, 2, W), lambda b, r: (b, r, 0, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((1, R, 1), lambda b, r: (b, 0, 0),
                                memory_space=pltpu.VMEM)],
        out_shape=[jax.ShapeDtypeStruct((B, Hp, W), jnp.uint8),
                   jax.ShapeDtypeStruct((B, R, 2, W), jnp.uint8),
                   jax.ShapeDtypeStruct((B, R, 1), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret)

    def halos(edge_rows):
        # edge_rows [B, R, 2, W]: [.., 0] = first row, [.., 1] = last row
        last = edge_rows[:, :, 1]
        first = edge_rows[:, :, 0]
        top = jnp.concatenate([jnp.zeros_like(last[:, :1]),
                               last[:, :-1]], axis=1)
        bot = jnp.concatenate([first[:, 1:],
                               jnp.zeros_like(first[:, :1])], axis=1)
        return jnp.stack([top, bot], axis=2)           # [B, R, 2, W]

    if seed is None:
        v0 = ext0.reshape(B, R, band, W)
        edges0 = jnp.stack([v0[:, :, 0], v0[:, :, band - 1]], axis=2)
    ext, edges, flags = call(bg, ext0, halos(edges0))

    def cond(c):
        return jnp.min(c[2]) < 1

    def body(c):
        return tuple(call(bg, c[0], halos(c[1])))

    ext, _, _ = jax.lax.while_loop(cond, body, (ext, edges, flags))
    if seed is not None:
        # filled = fg | (bg & ~ext) = fg | ~ext; pad rows have ext = 1
        return (mask > 0) | (ext == 0)
    hole = (bg & (1 - ext)) > 0
    filled = mask | (hole if padded_io else hole[:, :H])
    return filled[0] if squeeze else filled
