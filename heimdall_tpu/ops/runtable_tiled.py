"""Table-global hole-fill + CCL for 2 MP frames: run tables across bands.

The r5 run-table propagation (ops/pallas_kernels.py: fixpoints over
per-row RUN tables instead of pixel planes — measured 124.6 -> 90.5
us/frame at 640x480) applied to the band-tiled 2 MP path, where it
eliminates MORE than the plane sweeps: the run tables are indexed by
GLOBAL row, so one whole-frame table fixpoint replaces

  * the banded OR-flood's global driver rounds (an XLA while_loop
    re-launching every band until nothing changes),
  * the band CCL's in-band sweeps AND the cross-band interface merge
    (edge-row tables, union-find resolve, changed-pairs remap)

with: banded extraction kernels (per-row monotone-count extraction is
band-local by construction), two tiny [Rmax, Hp]-table fixpoint kernels
(the validated _table_fixpoint machinery), and one banded write-back.

Exactness: bit-equal to fill_holes_tiled + connected_components_tiled
(tests/test_runtable_tiled.py).  Every density assumption is guarded
with a batch-level fallback to the banded path:
  * more than Rmax runs in any row (bg of the UNFILLED mask, or fg of
    the filled mask), or
  * more than 510 vertical chain segments in one slot column — the
    masked-roll scan key bound: lin labels < 2^21, so
    seg * big + lin < 2^30 requires seg <= 510 (640x480 never hits
    this: its assert covers the whole range).

Reference rebuilt: the fill+label stage of
heimdall/detectors/contamination_detector.py:66-113 at the 4x 2 MP
camera design point (rust/heimdall-gige/src/camera.rs:48-68).
"""

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from heimdall_tpu.ops.pallas_kernels import (_run_extract,
                                             _table_lookup_monotone,
                                             _table_fixpoint,
                                             _lane_cumsum_mxu,
                                             _shift_const, _EdgeMasks)

_BIGC = 1 << 20
_SEG_CAP = 510          # masked-roll key bound at lin < 2^21 (see above)


def _vmem(shape, index_map):
    return pl.BlockSpec(shape, index_map, memory_space=pltpu.VMEM)


# ---------------------------------------------------------------------------
# banded kernels
# ---------------------------------------------------------------------------

def _make_extract_kernel(Th, W, Rmax, invert, mode=True):
    """binary band -> (runid u8, S/E i32 tables, nrun i32).

    S/E are already invalid-encoded (+-_BIGC) so the fixpoint kernels
    consume them directly; nrun stays exact int32 (the u8 runid may wrap
    on adversarial rows, but it is only read when the batch-level fits
    predicate — computed from nrun — holds)."""

    def kernel(bin_ref, runid_ref, s_ref, e_ref, n_ref):
        v = bin_ref[0].astype(jnp.int32)
        sel = (v == 0).astype(jnp.int32) if invert else (
            v != 0).astype(jnp.int32)
        runid, nrun, S, E, valid = _run_extract(sel, Rmax, packed=mode)
        runid_ref[0] = runid.astype(jnp.uint8)
        s_ref[0] = jnp.where(valid, S, _BIGC)
        e_ref[0] = jnp.where(valid, E, -_BIGC)
        n_ref[0] = nrun

    return kernel


def _make_fill_extract_kernel(Th, W, Rbg, Rfg, mode=True):
    """(binary, runid_bg, flood flags F) -> (filled u8, runid_fg u8,
    S/E fg tables, nrun_fg).  hole = bg pixel whose run's flag stayed 1
    (monotone-step lookup — runid is non-decreasing per row)."""

    def kernel(bin_ref, runid_ref, f_ref, fill_ref, runid2_ref, s_ref,
               e_ref, n_ref):
        v = bin_ref[0].astype(jnp.int32)
        fg = (v != 0).astype(jnp.int32)
        runid_bg = runid_ref[0].astype(jnp.int32)
        F = f_ref[0]                                   # [Th, Rbg]
        flag = _table_lookup_monotone(F, runid_bg, Rbg, W)
        filled = fg | ((1 - fg) & flag)                # unreached bg = 1
        runid, nrun, S, E, valid = _run_extract(filled, Rfg, packed=mode)
        fill_ref[0] = filled.astype(jnp.uint8)
        runid2_ref[0] = runid.astype(jnp.uint8)
        s_ref[0] = jnp.where(valid, S, _BIGC)
        e_ref[0] = jnp.where(valid, E, -_BIGC)
        n_ref[0] = nrun

    return kernel


def _make_writeback_kernel(Th, W, Rfg, sentinel):
    """(filled, runid_fg, label table rows) -> labels i32 band."""

    def kernel(fill_ref, runid_ref, l_ref, lab_ref):
        filled = fill_ref[0].astype(jnp.int32)
        runid = runid_ref[0].astype(jnp.int32)
        L = l_ref[0]
        lab = _table_lookup_monotone(L, runid, Rfg, W)
        lab_ref[0] = jnp.where(filled != 0, lab, sentinel)

    return kernel


# ---------------------------------------------------------------------------
# whole-frame table fixpoint kernels (grid over the batch)
# ---------------------------------------------------------------------------

def _make_flood_fix_kernel(Hp, W, H, Rbg):
    """bg S/E tables -> reached flags (0 = border-4-reachable exterior).

    Seeds: any bg run on frame rows 0 / H-1 (pad rows >= H-1 included —
    they are all-background exterior, matching fill_holes_tiled), or
    touching column 0 / W-1.  4-connected overlap (dilate=0)."""

    def kernel(s_ref, e_ref, f_ref):
        S = s_ref[0]
        E = e_ref[0]
        valid = S < _BIGC
        row = jax.lax.broadcasted_iota(jnp.int32, (Hp, Rbg), 0)
        seeded = valid & ((row == 0) | (row >= H - 1)
                          | (S == 0) | (E == W - 1))
        F0 = jnp.where(seeded, 0, 1)
        St = jnp.transpose(S)
        Et = jnp.transpose(E)
        Ft = jnp.transpose(F0)
        mkH = _EdgeMasks(Hp)
        ov = ((St <= _shift_const(Et, 1, 1, -_BIGC))
              & (Et >= _shift_const(St, 1, 1, _BIGC)))
        pack = _lane_cumsum_mxu(1 - ov.astype(jnp.int32)) * 4
        Ft = _table_fixpoint(Ft, St, Et, mkH, pack, 0, 1, Rbg)
        f_ref[0] = jnp.transpose(Ft)

    return kernel


def _make_label_fix_kernel(Hp, W, Rfg, sentinel, band, K):
    """filled-fg S/E tables -> per-run labels (min lin over component,
    8-connected: dilate=1), PLUS the root table, blob count and per-band
    slot incidence — all from the [Rfg, Hp] tables still in VMEM (the
    XLA formulation of roots+slots measured 0.103 ms/frame at 2 MP,
    dominated by 64 sequential tiny host-program ops; here the
    successive-minima loop is bounded by the actual blob count).

    Labels are real LIN values (row*W + S), so the masked-roll key bound
    needs the <= _SEG_CAP segment guard the DRIVER enforces before
    taking this path."""
    big = 1 << max(1, math.ceil(math.log2(sentinel + 2)))
    Rb = Hp // band

    def kernel(s_ref, e_ref, l_ref, rl_ref, nb_ref, pres_ref):
        S = s_ref[0]
        E = e_ref[0]
        St = jnp.transpose(S)
        Et = jnp.transpose(E)
        valid_t = St < _BIGC
        rowt = jax.lax.broadcasted_iota(jnp.int32, (Rfg, Hp), 1)
        lin0_t = rowt * W + St
        Lt0 = jnp.where(valid_t, lin0_t, sentinel)
        mkH = _EdgeMasks(Hp)
        ov = ((St - 1 <= _shift_const(Et, 1, 1, -_BIGC))
              & (Et + 1 >= _shift_const(St, 1, 1, _BIGC)))
        pack = _lane_cumsum_mxu(1 - ov.astype(jnp.int32)) * big
        Lt = _table_fixpoint(Lt0, St, Et, mkH, pack, 1, sentinel, Rfg)
        l_ref[0] = jnp.transpose(Lt)

        # roots + per-band slot incidence (everything still in VMEM)
        is_root = valid_t & (Lt == lin0_t)
        root_lin = jnp.where(is_root, lin0_t, sentinel)
        n_blobs = jnp.sum(is_root.astype(jnp.int32))
        Lv = jnp.where(valid_t, Lt, sentinel)
        # band membership of each table lane (= global row)
        bandof = rowt // band                          # [Rfg, Hp]
        laneK = jax.lax.broadcasted_iota(jnp.int32, (1, K), 1)
        ik = jax.lax.broadcasted_iota(jnp.int32, (Rb, K), 1)

        def slot(k, carry):
            rl, pres, prev = carry
            nxt = jnp.min(jnp.where(root_lin > prev, root_lin, sentinel))
            rl = rl + jnp.where(laneK == k, nxt - sentinel, 0)
            eq = (Lv == nxt) & (nxt < sentinel)        # [Rfg, Hp]
            # per-band any: one masked count per band via a fori over
            # Rb would be Rb reductions; instead reduce bandof masked to
            # present bands:  a row is present in band b iff any eq lane
            # has bandof == b — accumulate counts with a one-hot compare
            col = jnp.zeros((Rb, 1), jnp.int32)
            ib = jax.lax.broadcasted_iota(jnp.int32, (Rb, 1), 0)
            for b in range(Rb):
                cnt = jnp.sum(jnp.where(eq & (bandof == b), 1, 0))
                col = col + jnp.where(ib == b, cnt.reshape(1, 1), 0)
            pres = pres + jnp.where(ik == k,
                                    jnp.where(col > 0, 1, 0), 0)
            return rl, pres, nxt

        rl0 = jnp.full((1, K), sentinel, jnp.int32)
        pres0 = jnp.zeros((Rb, K), jnp.int32)
        rl, pres, _ = jax.lax.fori_loop(
            0, jnp.minimum(n_blobs, K), slot, (rl0, pres0, jnp.int32(-1)))
        rl_ref[0] = rl
        nb_ref[0] = jnp.full((1, 1), n_blobs, jnp.int32)
        pres_ref[0] = pres

    return kernel


# ---------------------------------------------------------------------------
# driver
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("band", "frame_h",
                                             "max_blobs", "r_bg", "r_fg",
                                             "interpret", "extract_mode"))
def fill_label_runtable_tiled(binary, band: int, frame_h: int,
                              max_blobs: int, r_bg: int = 12,
                              r_fg: int = 10, interpret: bool = False,
                              extract_mode=True, pre_extracted=None):
    """binary u8 [B, Hp, W] (padded, fg = nonzero), true height frame_h
    -> (filled bool, labels i32, root_table [B, K], n_blobs [B],
        slot_list [B, Rb, K], slot_count [B, Rb])

    Drop-in for fill_holes_tiled + connected_components_tiled(
    return_roots=K, band_slots=True, frame_h=...) on the detector's
    padded-IO contract; falls back to exactly those (whole batch) when a
    density guard trips."""
    B, Hp, W = binary.shape
    H = frame_h
    Rb = Hp // band
    assert Hp == Rb * band and H <= Hp, (H, Hp, band)
    K = max_blobs
    sentinel = H * W
    assert sentinel < _BIGC * 2, (H, W)    # lin labels must fit 2^21

    def bspec(shape):
        return _vmem((1,) + shape, lambda b, r: (b, r, 0))

    if pre_extracted is not None:
        # bg tables already emitted by the preprocess kernel
        # (contamination_preprocess_tiled(bg_tables=r_bg)) — binary was
        # never reloaded for extraction
        runid_bg, S_bg, E_bg, nrun_bg = pre_extracted
        assert S_bg.shape == (B, Hp, r_bg), (S_bg.shape, r_bg)
    else:
        ext_call = pl.pallas_call(
            _make_extract_kernel(band, W, r_bg, invert=True,
                                 mode=extract_mode),
            grid=(B, Rb),
            in_specs=[bspec((band, W))],
            out_specs=[bspec((band, W)), bspec((band, r_bg)),
                       bspec((band, r_bg)), bspec((band, 1))],
            out_shape=[jax.ShapeDtypeStruct((B, Hp, W), jnp.uint8),
                       jax.ShapeDtypeStruct((B, Hp, r_bg), jnp.int32),
                       jax.ShapeDtypeStruct((B, Hp, r_bg), jnp.int32),
                       jax.ShapeDtypeStruct((B, Hp, 1), jnp.int32)],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
            interpret=interpret)
        runid_bg, S_bg, E_bg, nrun_bg = ext_call(binary)
    fits_bg = jnp.max(nrun_bg) <= r_bg

    def table_fill(_):
        fspec = _vmem((1, Hp, r_bg), lambda b: (b, 0, 0))
        flood_call = pl.pallas_call(
            _make_flood_fix_kernel(Hp, W, H, r_bg),
            grid=(B,),
            in_specs=[fspec, fspec],
            out_specs=[fspec],
            out_shape=[jax.ShapeDtypeStruct((B, Hp, r_bg), jnp.int32)],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
            interpret=interpret)
        F, = flood_call(S_bg, E_bg)
        fe_call = pl.pallas_call(
            _make_fill_extract_kernel(band, W, r_bg, r_fg,
                                      mode=extract_mode),
            grid=(B, Rb),
            in_specs=[bspec((band, W)), bspec((band, W)),
                      bspec((band, r_bg))],
            out_specs=[bspec((band, W)), bspec((band, W)),
                       bspec((band, r_fg)), bspec((band, r_fg)),
                       bspec((band, 1))],
            out_shape=[jax.ShapeDtypeStruct((B, Hp, W), jnp.uint8),
                       jax.ShapeDtypeStruct((B, Hp, W), jnp.uint8),
                       jax.ShapeDtypeStruct((B, Hp, r_fg), jnp.int32),
                       jax.ShapeDtypeStruct((B, Hp, r_fg), jnp.int32),
                       jax.ShapeDtypeStruct((B, Hp, 1), jnp.int32)],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
            interpret=interpret)
        return fe_call(binary, runid_bg, F)

    def fallback_fill(_):
        from heimdall_tpu.ops.ccl_tiled import fill_holes_tiled
        filled = fill_holes_tiled(binary > 0, band=band,
                                  interpret=interpret, frame_h=H)
        z_t = jnp.zeros((B, Hp, r_fg), jnp.int32)
        return (filled.astype(jnp.uint8), jnp.zeros_like(binary),
                z_t, z_t, jnp.full((B, Hp, 1), r_fg + 1, jnp.int32))

    filled_u8, runid_fg, S_fg, E_fg, nrun_fg = jax.lax.cond(
        fits_bg, table_fill, fallback_fill, operand=None)

    # fg density + segment-count guards (XLA mirrors of the in-kernel
    # chain structure; tiny [B, Hp, Rfg] tables)
    ov = ((S_fg[:, 1:] - 1 <= E_fg[:, :-1])
          & (E_fg[:, 1:] + 1 >= S_fg[:, :-1]))
    segs = 1 + jnp.sum(~ov, axis=1)                 # per (b, slot)
    fits = (fits_bg & (jnp.max(nrun_fg) <= r_fg)
            & (jnp.max(segs) <= _SEG_CAP))

    def table_label(_):
        lspec = _vmem((1, Hp, r_fg), lambda b: (b, 0, 0))
        lab_fix = pl.pallas_call(
            _make_label_fix_kernel(Hp, W, r_fg, sentinel, band, K),
            grid=(B,),
            in_specs=[lspec, lspec],
            out_specs=[lspec,
                       _vmem((1, 1, K), lambda b: (b, 0, 0)),
                       _vmem((1, 1, 1), lambda b: (b, 0, 0)),
                       _vmem((1, Rb, K), lambda b: (b, 0, 0))],
            out_shape=[jax.ShapeDtypeStruct((B, Hp, r_fg), jnp.int32),
                       jax.ShapeDtypeStruct((B, 1, K), jnp.int32),
                       jax.ShapeDtypeStruct((B, 1, 1), jnp.int32),
                       jax.ShapeDtypeStruct((B, Rb, K), jnp.int32)],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
            interpret=interpret)
        L, rl, nb, pres = lab_fix(S_fg, E_fg)
        wb_call = pl.pallas_call(
            _make_writeback_kernel(band, W, r_fg, sentinel),
            grid=(B, Rb),
            in_specs=[bspec((band, W)), bspec((band, W)),
                      bspec((band, r_fg))],
            out_specs=[bspec((band, W))],
            out_shape=[jax.ShapeDtypeStruct((B, Hp, W), jnp.int32)],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
            interpret=interpret)
        labels, = wb_call(filled_u8, runid_fg, L)

        present = pres > 0
        slot_count = present.sum(axis=-1).astype(jnp.int32)
        slot_list = jnp.argsort(~present, axis=-1,
                                stable=True).astype(jnp.int32)
        return labels, rl[:, 0], nb[:, 0, 0], slot_list, slot_count

    def fallback_label(_):
        from heimdall_tpu.ops.ccl_tiled import connected_components_tiled
        return connected_components_tiled(
            filled_u8 > 0, connectivity=8, band=band, sweeps=2,
            adaptive=True, interpret=interpret, return_roots=K,
            band_slots=True, frame_h=H)

    labels, rl, n_blobs, slot_list, slot_count = jax.lax.cond(
        fits, table_label, fallback_label, operand=None)
    return filled_u8 > 0, labels, rl, n_blobs, slot_list, slot_count
