"""Banded Pallas preprocess for frames beyond the whole-frame VMEM cap.

Fuses the contamination front-end — BGR grayscale, Q8 Gaussian blur 5,
float adaptive-Gaussian-11 threshold, morphological open then close — into
one banded kernel, replacing the XLA op composition that materializes
every intermediate ([B, H, W] f32 planes) to HBM (~0.4 ms/frame of fused
XLA passes at 2 MP).  Numerics are identical to ops/filters.py +
ops/threshold.py + ops/morphology.py (OpenCV-parity): the same fixed-point
blur, float mean + rint, and border semantics.

Reference rebuilt: heimdall/detectors/contamination_detector.py:66-87
(gray -> GaussianBlur(5,5) -> adaptiveThreshold(GAUSSIAN_C, BINARY_INV,
11, C) -> morph OPEN -> CLOSE) at the 2 MP camera design point.

Band decomposition: each grid step processes ``band`` output rows plus a
16-row halo of real neighbour rows on each side (total stencil radius:
blur 2 + mean 5 + morphology 4 = 11).  Border semantics at the frame's
top and bottom edges are reproduced in-kernel with global-row-indexed
fixups applied to each stage's INPUT, mirroring what the whole-frame ops
synthesize outside the array:

  * gray (for blur5, reflect101): rows -1, -2 mirror rows 1, 2 (top) and
    H, H+1 mirror H-2, H-3 (bottom) — only the blur's radius-2 reads care.
  * blurred (for mean11, replicate): rows [-9, -1] copy row 0; rows
    [H, H+8] copy row H-1 (9 = mean radius 5 + morphology radius 4).
  * binary (for each morphology step, constant border): out-of-frame rows
    are forced to the step's pad value (erode 255, dilate 0) before every
    step — exactly cv2's BORDER_CONSTANT behaviour.

Column borders need no fixups: bands span the full width, so the tile's
lane edges ARE the frame's left/right edges and the standard bordered
shifts apply (reflect101 / replicate / constant as per op).
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from heimdall_tpu.ops.filters import gaussian_kernel_1d, _q8_taps
from heimdall_tpu.ops.pallas_kernels import (_conv_axis,
                                             _conv_axis_pair_int,
                                             _shift, _shift_const)

HALO = 16          # >= total stencil radius 11, sublane-aligned


def _row_fix(x, tile_pos, src_pos, gate):
    """x with row ``tile_pos`` replaced by row ``src_pos`` when ``gate``
    (a traced scalar) holds.  Static positions -> plain slice + select."""
    E, W = x.shape
    row_i = jax.lax.broadcasted_iota(jnp.int32, (E, W), 0)
    src = jnp.tile(jax.lax.slice_in_dim(x, src_pos, src_pos + 1, axis=0),
                   (E, 1))
    return jnp.where((row_i == tile_pos) & gate, src, x)


def _row_fix_range(x, lo, hi, src_pos, gate):
    """Rows [lo, hi) replaced by row ``src_pos`` when ``gate`` holds."""
    E, W = x.shape
    row_i = jax.lax.broadcasted_iota(jnp.int32, (E, W), 0)
    src = jnp.tile(jax.lax.slice_in_dim(x, src_pos, src_pos + 1, axis=0),
                   (E, 1))
    return jnp.where((row_i >= lo) & (row_i < hi) & gate, src, x)


def _minmax3_banded(x, is_min, oof):
    """3x3 erode/dilate with cv2 constant border: columns via bordered
    lane shifts, rows via the out-of-frame mask ``oof`` (True beyond the
    frame's top/bottom), forced to the pad value first."""
    value = 255 if is_min else 0
    op = jnp.minimum if is_min else jnp.maximum
    x = jnp.where(oof, value, x)
    # separable rect kernel: rows then columns, 4 shifts instead of 12
    r = op(op(x, _shift_const(x, 1, 0, value)), _shift_const(x, -1, 0, value))
    return op(op(r, _shift_const(r, 1, 1, value)),
              _shift_const(r, -1, 1, value))


def _make_preprocess_kernel(band, W, H, R, flood_seed=False, bg_tables=0):
    E = band + 2 * HALO
    taps5 = _q8_taps(gaussian_kernel_1d(5, 0.0))
    k11 = [float(t) for t in gaussian_kernel_1d(11, 0.0)]
    # Every band whose halo-extended window contains the bottom frame edge
    # needs the bottom fixups — when H % band <= 6 that includes band R-2,
    # whose last output rows have stencils reaching past row H-1.  The tile
    # row of global row H-1 is static per band id, so precompute (id, pos)
    # pairs and gate each fixup on r == id.
    bot_bands = [(rr, (H - 1) - (rr * band - HALO)) for rr in range(R)]
    bot_bands = [(rr, p) for rr, p in bot_bands if 0 <= p < E]

    def kernel(ct_ref, ext_ref, bin_ref, gray_ref, *seed_refs):
        r = pl.program_id(1)
        is_top = r == 0
        bv = ext_ref[0, 0, 0].astype(jnp.int32)
        gv = ext_ref[0, 1, 0].astype(jnp.int32)
        rv = ext_ref[0, 2, 0].astype(jnp.int32)
        gray = (bv * 3735 + gv * 19235 + rv * 9798 + (1 << 14)) >> 15

        row_i = jax.lax.broadcasted_iota(jnp.int32, (E, W), 0)
        grow = row_i + r * band - HALO          # global row per tile row
        oof = (grow < 0) | (grow > H - 1)

        # -- blur5, reflect101 rows at the frame edges ----------------------
        g = gray
        for i in (1, 2):
            g = _row_fix(g, HALO - i, HALO + i, is_top)
            for rr, p in bot_bands:
                if 0 <= p + i < E and 0 <= p - i:
                    g = _row_fix(g, p + i, p - i, r == rr)
        acc = _conv_axis_pair_int(g, taps5, 1, "reflect101")  # cols: edges
        acc = _conv_axis_pair_int(acc, taps5, 0, "constant")   # rows: halo
        blurred = jnp.clip((acc + (1 << 15)) >> 16, 0, 255)

        # -- adaptive threshold: float mean11 with replicate borders --------
        bl = blurred
        bl = _row_fix_range(bl, HALO - 9, HALO, HALO, is_top)
        for rr, p in bot_bands:
            if p + 1 < E:
                bl = _row_fix_range(bl, p + 1, min(p + 10, E), p, r == rr)
        mf = _conv_axis(bl.astype(jnp.float32), k11, 1, "replicate")
        mf = _conv_axis(mf, k11, 0, "constant")
        mean = jnp.rint(mf).astype(jnp.int32)
        binary = jnp.where(bl <= mean - ct_ref[0], 255, 0)

        # -- morphology: open (erode, dilate) then close (dilate, erode) ----
        binary = _minmax3_banded(binary, True, oof)
        binary = _minmax3_banded(binary, False, oof)
        binary = _minmax3_banded(binary, False, oof)
        binary = _minmax3_banded(binary, True, oof)

        # pad rows (>= H) emit background
        binary = jnp.where(grow > H - 1, 0, binary)

        body = lambda x: jax.lax.slice_in_dim(x, HALO, HALO + band, axis=0)
        bin_b = body(binary).astype(jnp.uint8)
        bin_ref[0] = bin_b
        gray_ref[0] = body(gray).astype(jnp.uint8)

        if flood_seed:
            # emit the OR-flood's initial state here (VERDICT r4 #4:
            # "fuse fill seeding into the banded preprocess"): the XLA
            # prologue of fill_holes_tiled — bg plane, border build,
            # ext0 product, and the strided edge-row slices (each a full
            # relayout copy of a 2 MP plane) — all disappear; binary is
            # still in VMEM, so seeding costs a few vector ops
            ext_seed_ref, edge_ref = seed_refs
            grow_b = (jax.lax.broadcasted_iota(jnp.int32, (band, W), 0)
                      + r * band)
            col_b = jax.lax.broadcasted_iota(jnp.int32, (band, W), 1)
            # frame border (pad rows count: they sit past row H-1, all
            # exterior-seeded background, matching fill_holes_tiled)
            is_border = ((grow_b == 0) | (grow_b >= H - 1)
                         | (col_b == 0) | (col_b == W - 1))
            # all int32 until the final store — Mosaic rejects u8 vector
            # compares (and u8 selects are fragile); binary is still the
            # int plane here
            ext0_i = jnp.where(is_border & (body(binary) == 0), 1, 0)
            ext_seed_ref[0] = ext0_i.astype(jnp.uint8)
            edge_ref[0, 0] = jnp.concatenate(
                [jax.lax.slice_in_dim(ext0_i, 0, 1, axis=0),
                 jax.lax.slice_in_dim(ext0_i, band - 1, band, axis=0)],
                axis=0).astype(jnp.uint8)

        if bg_tables:
            # r5 table-global path: extract the BACKGROUND run tables
            # right here (binary is still the int plane in VMEM), so the
            # separate extraction kernel — and its reload of binary —
            # disappears.  Per-row extraction is banding-independent:
            # the [Hp, R] tables work for any downstream band size.
            from heimdall_tpu.ops.pallas_kernels import _run_extract
            runid_ref, s_ref, e_ref, n_ref = seed_refs
            BIGC = 1 << 20
            sel = (body(binary) == 0).astype(jnp.int32)
            # NB: names must not shadow the closure's E (= band + 2*HALO)
            runid, nrun, Sb, Eb, valid = _run_extract(sel, bg_tables,
                                                      packed=True)
            runid_ref[0] = runid.astype(jnp.uint8)
            s_ref[0] = jnp.where(valid, Sb, BIGC)
            e_ref[0] = jnp.where(valid, Eb, -BIGC)
            n_ref[0] = nrun

    return kernel


@functools.partial(jax.jit, static_argnames=("band", "interpret",
                                             "channel_major", "padded_out",
                                             "flood_seed", "bg_tables"))
def contamination_preprocess_tiled(images, contrast_threshold,
                                   band: int = 256,
                                   interpret: bool = False,
                                   channel_major: bool = False,
                                   padded_out: bool = False,
                                   flood_seed: bool = False,
                                   bg_tables: int = 0):
    """[B, H, W, 3] uint8 BGR -> (binary u8 [B, H, W] in {0, 255},
    gray u8 [B, H, W]) — bit-identical to the XLA op composition
    gray -> gaussian_blur(5) -> adaptive_threshold(gaussian, inv, 11, C)
    -> open(3x3) -> close(3x3)  (tests/test_preprocess_tiled.py).

    ``channel_major``: images is [B, 3, H, W] (the production feeder
    layout) — skips the NHWC relayout.  ``padded_out``: return the full
    [B, Hp, W] band-padded planes (binary pad rows are background; gray
    pad rows replicate the last frame row) so the caller can share one
    padded layout across every tiled stage without re-pad/SLICE copies.
    ``flood_seed`` (implies padded_out): additionally return the banded
    OR-flood's initial state (ext0 [B, Hp, W] u8, edges0 [B, R, 2, W] u8)
    computed in-kernel, for fill_holes_tiled(seed=...) — the flood's XLA
    seeding prologue (bg/border/ext0 planes + strided edge slices, each
    a full 2 MP relayout) disappears.

    ``bg_tables`` = Rbg > 0 (implies padded_out, excludes flood_seed):
    additionally return the background RUN TABLES for the table-global
    path (runid u8 [B, Hp, W], S/E i32 [B, Hp, Rbg] invalid-encoded,
    nrun i32 [B, Hp, 1]) — fill_label_runtable_tiled(pre_extracted=...)
    then skips its separate extraction kernel.
    """
    assert not (flood_seed or bg_tables) or padded_out
    assert not (flood_seed and bg_tables)
    if channel_major:
        B, _, H, W = images.shape
        cm = images
    else:
        B, H, W, _ = images.shape
        cm = jnp.transpose(images, (0, 3, 1, 2))         # [B, 3, H, W]
    R = -(-H // band)
    E = band + 2 * HALO
    # halo-extended banded view: edge-pad rows then one contiguous slice
    # per band (placeholder rows beyond the frame are overwritten by the
    # in-kernel border fixups before any stencil reads them)
    padded = jnp.concatenate(
        [jnp.repeat(cm[:, :, :1], HALO, axis=2), cm,
         jnp.repeat(cm[:, :, -1:], HALO + (R * band - H), axis=2)], axis=2)
    tiles = jnp.stack([
        jax.lax.slice_in_dim(padded, r * band, r * band + E, axis=2)
        for r in range(R)], axis=2)                      # [B, 3, R, E, W]

    ct = jnp.asarray(contrast_threshold, jnp.int32).reshape(1)
    kernel = _make_preprocess_kernel(band, W, H, R, flood_seed=flood_seed,
                                     bg_tables=bg_tables)
    out_specs = [pl.BlockSpec((1, band, W), lambda b, r, *_: (b, r, 0),
                              memory_space=pltpu.VMEM),
                 pl.BlockSpec((1, band, W), lambda b, r, *_: (b, r, 0),
                              memory_space=pltpu.VMEM)]
    Hp = R * band
    out_shape = [jax.ShapeDtypeStruct((B, Hp, W), jnp.uint8),
                 jax.ShapeDtypeStruct((B, Hp, W), jnp.uint8)]
    if flood_seed:
        out_specs += [
            pl.BlockSpec((1, band, W), lambda b, r, *_: (b, r, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 2, W), lambda b, r, *_: (b, r, 0, 0),
                         memory_space=pltpu.VMEM)]
        out_shape += [jax.ShapeDtypeStruct((B, Hp, W), jnp.uint8),
                      jax.ShapeDtypeStruct((B, R, 2, W), jnp.uint8)]
    if bg_tables:
        out_specs += [
            pl.BlockSpec((1, band, W), lambda b, r, *_: (b, r, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, band, bg_tables),
                         lambda b, r, *_: (b, r, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, band, bg_tables),
                         lambda b, r, *_: (b, r, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, band, 1), lambda b, r, *_: (b, r, 0),
                         memory_space=pltpu.VMEM)]
        out_shape += [jax.ShapeDtypeStruct((B, Hp, W), jnp.uint8),
                      jax.ShapeDtypeStruct((B, Hp, bg_tables), jnp.int32),
                      jax.ShapeDtypeStruct((B, Hp, bg_tables), jnp.int32),
                      jax.ShapeDtypeStruct((B, Hp, 1), jnp.int32)]
    gs = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, R),
        in_specs=[pl.BlockSpec((1, 3, 1, E, W),
                               lambda b, r, *_: (b, 0, r, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=out_specs,
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=gs,
        out_shape=tuple(out_shape),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(ct, tiles)
    if flood_seed or bg_tables:
        return out       # (binary, gray, ext0, edges0 | runid, S, E, nrun)
    binary, gray = out
    if padded_out:
        return binary, gray
    return binary[:, :H], gray[:, :H]
