"""Band-tiled per-blob statistics kernel for frames beyond VMEM.

Replaces ops.blobs.blob_stats for the large-frame (band-tiled CCL) path.
The XLA blob_stats materializes rank/one-hot tensors of shape [B, H*W, K]
— at 2 MP that is gigabytes of HBM traffic per batch (~2.7 ms/frame
measured on a v5e).  Here a Pallas kernel walks the frame in bands and,
for each occupied table slot, does masked VPU reductions over the
VMEM-resident band: per-pixel data is read from HBM exactly once.

Slot membership needs no rank computation at all: the tiled CCL already
returns the first-K component roots in raster order (``root_table``), and
a pixel belongs to slot k iff its label equals ``root_table[k]`` — one
compare per pixel per occupied slot, with the slot loop bounded by the
frame's true blob count (prefetched scalar), so sparse production frames
pay almost nothing.

The bbox-masked background sums reuse the XLA integral-image trick from
ops/blobs.py (one cumsum per channel + 4 tiny gathers per blob) — that
part was never the bottleneck.

Parity: byte-identical BlobTable to ops.blobs.blob_stats
(tests/test_stats_tiled.py), which is itself OpenCV-parity.

Reference rebuilt: heimdall/detectors/contamination_detector.py:95-177
(the per-contour stats loop) at 1920x1080 scale
(rust/heimdall-gige/src/camera.rs:48-68 — the 2 MP Basler design point).
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from heimdall_tpu.ops.blobs import BlobTable, _integral, _bbox_sum

# stats rows in the sums output [S, K]
S_ONES, S_BND, S_X, S_Y, S_GRAY, S_B, S_G, S_R = range(8)


# SMEM chunk anchor: at the default operating point (K=64, band 128 →
# R=9) the stats kernel measures ~9.0 KB of SMEM per batch item (1.13 MB
# needed at B=128, ~290 KB at chunk 32) against 2.6 KB analytic —
# Mosaic's scalar layout pads by ~3.5x.  Chunk 32 is proven safe for
# both banded kernels; the heavier one (bbox sums, 841 words/item)
# bounds the anchor product, and the cap scales DOWN in proportion when
# K or R inflate a kernel's scalar footprint so larger blob tables or
# finer bands can never blow the 1 MB SMEM again.
_SAFE_CHUNK = 32
_SAFE_WORDS = 841            # 4K + R*K + R at K=64, R=9 (bbox kernel)


def _batch_chunk(B: int, scalar_words: int = _SAFE_WORDS) -> int:
    """Batch-chunk size bounded by the scalar-prefetch SMEM footprint.

    scalar_words: per-batch-item int32 words across ALL scalar-prefetch
    operands of the kernel.  Never exceeds the measured-safe chunk 32;
    shrinks proportionally past the anchor footprint so default shapes
    keep their proven (and cache-warmed) chunk."""
    cap = max(1, min(_SAFE_CHUNK,
                     (_SAFE_CHUNK * _SAFE_WORDS) // max(scalar_words, 1)))
    return min(B, cap)


def _chunked_call(call, B, BC, operands, n_out):
    """Run ``call`` (a pallas_call closure over batch-BC operands) across
    the whole batch via lax.map; reshapes outputs back to [B, ...].

    B need not divide by BC: operands are zero-padded along the batch
    axis (safe — every kernel gates its slot loop on a per-item count,
    and padded counts are 0, so padded rows do no work) and outputs are
    sliced back to B."""
    if BC >= B:
        return call(*operands)
    NC = -(-B // BC)
    Bp = NC * BC
    if Bp != B:
        operands = tuple(
            jnp.pad(x, [(0, Bp - B)] + [(0, 0)] * (x.ndim - 1))
            for x in operands)
    resh = tuple(x.reshape((NC, BC) + x.shape[1:]) for x in operands)
    outs = jax.lax.map(lambda a: call(*a), resh)
    if n_out == 1:
        return outs.reshape((Bp,) + outs.shape[2:])[:B]
    return tuple(o.reshape((Bp,) + o.shape[2:])[:B] for o in outs)


def _make_banded_stats_kernel(band, W, K, n_bands, sentinel, with_color,
                              with_slots=False):
    """Grid (B, R).  Accumulates per-slot sums and bboxes across bands.

    Scalar-prefetch args: root_table [B, K] (ascending root linear
    indices, sentinel-padded) and n_blobs [B]; with_slots adds
    slot_list [B, R, K] and slot_count [B, R] (per-band incidence from
    connected_components_tiled(band_slots=True)), and the slot loop then
    visits ONLY the slots whose component intersects the band — on
    production frames most blobs live in one band, so this cuts the
    dominant per-slot reduction cost by ~R/1.2x.
    VMEM inputs per step: labels band [1, band, W] i32, gray band
    [1, band, W] u8, boundary band [1, band, W] u8, (optional) color
    bands [1, 3, band, W] u8.
    Outputs (same block across the r steps): sums [1, S, K] i32 and
    bbox [1, 4, K] i32 (x0, y0, x1, y1; neutral W, H, -1, -1).

    Accumulation is int32 for exactness (f32 loses integer precision past
    2^24, reachable for large blobs at 2 MP).  Magnitude bound: the worst
    case is a whole-frame blob — sum of col indexes H*W*(W-1)/2 ≈ 2.0e9 at
    1920x1080 — so anything up to the 2 MP design point fits int32;
    beyond ~2.2 MP the X-sum could wrap (contract limit, asserted below).
    """
    S = 8 if with_color else 5
    H = n_bands * band  # only used as the bbox neutral; callers re-mask

    def kernel(*refs):
        if with_slots:
            rl_ref, nb_ref, sl_ref, sc_ref, lab_ref, gray_ref, bnd_ref, \
                *rest = refs
        else:
            rl_ref, nb_ref, lab_ref, gray_ref, bnd_ref, *rest = refs
            sl_ref = sc_ref = None
        if with_color:
            color_ref, sums_ref, bbox_ref = rest
        else:
            sums_ref, bbox_ref = rest
        b = pl.program_id(0)
        r = pl.program_id(1)
        lab = lab_ref[0]
        grayi = gray_ref[0].astype(jnp.int32)
        bndi = bnd_ref[0].astype(jnp.int32)
        if with_color:
            bi = color_ref[0, 0].astype(jnp.int32)
            gi = color_ref[0, 1].astype(jnp.int32)
            ri = color_ref[0, 2].astype(jnp.int32)

        laneS = jax.lax.broadcasted_iota(jnp.int32, (S, K), 1)
        lane4 = jax.lax.broadcasted_iota(jnp.int32, (4, K), 1)
        sub4 = jax.lax.broadcasted_iota(jnp.int32, (4, K), 0)

        @pl.when(r == 0)
        def _():
            sums_ref[0] = jnp.zeros((S, K), jnp.int32)
            neutral = jnp.where(sub4 == 0, W,
                                jnp.where(sub4 == 1, H, -1))
            bbox_ref[0] = neutral.astype(jnp.int32)

        lane_w = jax.lax.broadcasted_iota(jnp.int32, (1, W), 1)
        sub_h = jax.lax.broadcasted_iota(jnp.int32, (band, 1), 0)

        def slot_body(t, carry):
            sums, bboxes = carry
            k = sl_ref[b, r, t] if with_slots else t
            root = rl_ref[b, k]
            m = lab == root
            mi = m.astype(jnp.int32)
            # column/row marginals: col depends only on the lane and row
            # only on the sublane, so ONE col-reduce + ONE row-reduce
            # replace the x/y moment mul-reduces, the pixel count AND all
            # four bbox extrema (full-band passes -> [1,W]/[band,1] ops)
            csum = jnp.sum(mi, axis=0, keepdims=True)          # [1, W]
            rsum = jnp.sum(mi, axis=1, keepdims=True)          # [band, 1]
            cols = [
                jnp.sum(csum).reshape(1, 1),
                jnp.sum(mi * bndi).reshape(1, 1),
                jnp.sum(csum * lane_w).reshape(1, 1),
                jnp.sum(rsum * (sub_h + r * band)).reshape(1, 1),
                jnp.sum(mi * grayi).reshape(1, 1),
            ]
            if with_color:
                cols += [jnp.sum(mi * bi).reshape(1, 1),
                         jnp.sum(mi * gi).reshape(1, 1),
                         jnp.sum(mi * ri).reshape(1, 1)]
            stat_col = jnp.concatenate(cols, axis=0)          # [S, 1]
            sums = sums + jnp.where(laneS == k, stat_col, 0)

            x0 = jnp.min(jnp.where(csum > 0, lane_w, W))
            x1 = jnp.max(jnp.where(csum > 0, lane_w, -1))
            y0 = jnp.min(jnp.where(rsum > 0, sub_h + r * band, H))
            y1 = jnp.max(jnp.where(rsum > 0, sub_h + r * band, -1))
            new_col = jnp.concatenate(
                [x0.reshape(1, 1), y0.reshape(1, 1),
                 x1.reshape(1, 1), y1.reshape(1, 1)], axis=0)  # [4, 1]
            upd = jnp.where(sub4 < 2, jnp.minimum(bboxes, new_col),
                            jnp.maximum(bboxes, new_col))
            bboxes = jnp.where(lane4 == k, upd, bboxes)
            return sums, bboxes

        if with_slots:
            n = jnp.minimum(sc_ref[b, r], K)
        else:
            n = jnp.minimum(nb_ref[b], K)
        sums, bboxes = jax.lax.fori_loop(
            0, n, slot_body, (sums_ref[0], bbox_ref[0]))
        sums_ref[0] = sums
        bbox_ref[0] = bboxes

    return kernel


def _make_bbox_sum_kernel(band, W, K, n_bands, with_color):
    """Grid (B, R): per-slot bbox-window sums of gray (and b, g, r).

    Replaces the XLA integral images, which profiled at ~1 ms/frame at 2 MP
    (four dense [B, H*W] prefix-sum loops + relayouts).  A blob's row
    support is contiguous (any 4/8-connected path changes row by <= 1), so
    its bbox rows intersect exactly the bands in the slot-incidence table —
    the same slot_list bounds this loop.  Accumulation is int32 for bit
    parity with the integer integral-image path (255 * 2 MP < 2^31).

    Scalar-prefetch: bbox [B, 4, K] (x0, y0, x1, y1 inclusive, from the
    stats kernel), slot_list [B, R, K], slot_count [B, R].
    """
    C = 4 if with_color else 1

    def kernel(bbox_ref, sl_ref, sc_ref, gray_ref, *rest):
        if with_color:
            color_ref, out_ref = rest
        else:
            (out_ref,) = rest
        b = pl.program_id(0)
        r = pl.program_id(1)
        row = jax.lax.broadcasted_iota(jnp.int32, (band, W), 0) + r * band
        col = jax.lax.broadcasted_iota(jnp.int32, (band, W), 1)
        grayi = gray_ref[0].astype(jnp.int32)
        if with_color:
            bi = color_ref[0, 0].astype(jnp.int32)
            gi = color_ref[0, 1].astype(jnp.int32)
            ri = color_ref[0, 2].astype(jnp.int32)
        laneC = jax.lax.broadcasted_iota(jnp.int32, (C, K), 1)

        @pl.when(r == 0)
        def _():
            out_ref[0] = jnp.zeros((C, K), jnp.int32)

        def slot_body(t, acc):
            k = sl_ref[b, r, t]
            x0 = bbox_ref[b, 0, k]
            y0 = bbox_ref[b, 1, k]
            x1 = bbox_ref[b, 2, k]
            y1 = bbox_ref[b, 3, k]
            box = ((row >= y0) & (row <= y1)
                   & (col >= x0) & (col <= x1)).astype(jnp.int32)
            cols = [jnp.sum(box * grayi).reshape(1, 1)]
            if with_color:
                cols += [jnp.sum(box * bi).reshape(1, 1),
                         jnp.sum(box * gi).reshape(1, 1),
                         jnp.sum(box * ri).reshape(1, 1)]
            col_v = jnp.concatenate(cols, axis=0)            # [C, 1]
            return acc + jnp.where(laneC == k, col_v, 0)

        n = jnp.minimum(sc_ref[b, r], K)
        out_ref[0] = jax.lax.fori_loop(0, n, slot_body, out_ref[0])

    return kernel


def _bbox_sums_banded(bbox, slot_list, slot_count, gray_p, cm, band, W, K,
                      R, with_color, interpret):
    """Run the bbox-sum kernel; returns [B, C, K] i32 (C = 1 or 4)."""
    B = gray_p.shape[0]
    C = 4 if with_color else 1
    kernel = _make_bbox_sum_kernel(band, W, K, R, with_color)
    in_specs = [pl.BlockSpec((1, band, W), lambda b, r, *_: (b, r, 0),
                             memory_space=pltpu.VMEM)]
    args = [gray_p]
    if with_color:
        in_specs.append(pl.BlockSpec((1, 3, band, W),
                                     lambda b, r, *_: (b, 0, r, 0),
                                     memory_space=pltpu.VMEM))
        args.append(cm)
    BC = _batch_chunk(B, 4 * K + R * K + R)
    gs = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(BC, R),
        in_specs=in_specs,
        out_specs=[pl.BlockSpec((1, C, K), lambda b, r, *_: (b, 0, 0),
                                memory_space=pltpu.VMEM)],
    )

    def bbox_call(*ops_):
        return pl.pallas_call(
            kernel,
            grid_spec=gs,
            out_shape=(jax.ShapeDtypeStruct((BC, C, K), jnp.int32),),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
            interpret=interpret,
        )(*ops_)[0]

    return _chunked_call(bbox_call, B, BC,
                         (bbox, slot_list, slot_count, *args), 1)


@functools.partial(jax.jit, static_argnames=("band", "max_blobs",
                                             "use_color", "interpret",
                                             "frame_h", "channel_major",
                                             "stats_band"))
def blob_stats_tiled(labels, mask, gray, color=None, band: int = 256,
                     max_blobs: int = 64, use_color: bool = True,
                     root_table=None, root_count=None,
                     slot_list=None, slot_count=None,
                     interpret: bool = False,
                     frame_h: int | None = None,
                     channel_major: bool = False,
                     stats_band: int | None = None) -> BlobTable:
    """Banded-kernel equivalent of ops.blobs.blob_stats.

    labels/mask/gray: [B, H, W] (labels int32, background = H*W);
    color: optional [B, H, W, 3] uint8; root_table [B, >=K] ascending
    root linear indices (sentinel-padded) and root_count [B] — both as
    produced by ccl_tiled.connected_components_tiled(return_roots=K).
    Optional slot_list [B, R, K] / slot_count [B, R] (from
    connected_components_tiled(band_slots=True)) restrict each band's
    slot loop to components actually present in that band.

    ``frame_h``: padded-IO mode — labels/mask/gray already [B, Hp, W]
    (pad rows: sentinel / False / anything), true height frame_h; skips
    every per-plane pad here.  ``channel_major``: color is [B, 3, H(p), W]
    (the shared transposed layout) — skips the NHWC relayout.

    ``stats_band``: run the STATS kernels on coarser bands than the CCL
    produced incidence for (measured v5e: flood/CCL want 128-row bands
    but the stats kernels' per-band fixed cost favors larger — over the
    128-band 2MP layout the stats kernel standalone measured 0.476
    ms/frame at stats_band=128, ~21% cheaper at 256, and 0.348 at 384;
    the detector ships 3*band = 384, the r4 measured optimum —
    detectors/contamination_detector.py).  Used when it is a multiple of
    ``band`` that also divides the padded height (so the shared layout
    survives); incidence lists are coarsened to band groups with cheap
    XLA glue.
    """
    B, H, W = labels.shape
    padded_io = frame_h is not None
    if padded_io:
        Hp, H = H, frame_h
        R = Hp // band
        assert Hp == R * band and H <= Hp, (H, Hp, band)
    else:
        R = -(-H // band)
        Hp = R * band
    if (stats_band and stats_band > band and stats_band % band == 0
            and Hp % stats_band == 0
            and slot_list is not None and slot_count is not None):
        F = stats_band // band
        Rc = Hp // stats_band
        K_ = slot_list.shape[2]
        # coarsen per-band incidence to band GROUPS: presence bitmap via
        # one-hot over slot ids, OR across each group, then compact the
        # set bits back to a list (argsort of ~present is stable, so
        # True positions come first in ascending slot order)
        t_i = jnp.arange(K_)[None, None, :]
        occupied = t_i < slot_count.astype(jnp.int32)[:, :, None]
        oh = (jax.nn.one_hot(slot_list.astype(jnp.int32), K_,
                             dtype=jnp.bool_)
              & occupied[..., None])                       # [B, R, K, K]
        present = oh.any(axis=2)                           # [B, R, K]
        present = present.reshape(B, Rc, F, K_).any(axis=2)
        slot_count = present.sum(axis=-1).astype(jnp.int32)
        slot_list = jnp.argsort(~present, axis=-1,
                                stable=True).astype(jnp.int32)
        band, R = stats_band, Rc
    # int32 accumulator bound (see _make_banded_stats_kernel): the X-sum of
    # a whole-frame blob is H * W*(W-1)/2; must fit int32.  Holds through
    # the 2 MP design point (1920x1080 -> 2.0e9); ~2.2 MP is the limit.
    assert H * (W * (W - 1) // 2) < 2**31, (
        f"frame {H}x{W} exceeds blob_stats_tiled's int32 sum bound")
    K = max_blobs
    sentinel = H * W
    with_color = use_color and color is not None
    with_slots = slot_list is not None and slot_count is not None

    rl = root_table[:, :K].astype(jnp.int32)
    n_blobs = root_count.astype(jnp.int32)

    # boundary plane (image border counts as background) — elementwise XLA.
    # On padded input the pad rows are False, reproducing the zero pad
    # below row H-1 exactly.
    mpad = jnp.pad(mask, [(0, 0), (1, 1), (1, 1)])
    nb4 = (mpad[:, :-2, 1:-1].astype(jnp.int32) + mpad[:, 2:, 1:-1]
           + mpad[:, 1:-1, :-2] + mpad[:, 1:-1, 2:])
    boundary = (mask & (nb4 < 4)).astype(jnp.uint8)

    def padrows(x, value=0):
        if Hp == x.shape[1]:
            return x
        return jnp.pad(x, [(0, 0), (0, Hp - x.shape[1]), (0, 0)],
                       constant_values=value)

    lab_p = padrows(labels, sentinel)      # pad labels never match a root
    gray_p = padrows(gray.astype(jnp.uint8))
    bnd_p = padrows(boundary)

    kernel = _make_banded_stats_kernel(band, W, K, R, sentinel, with_color,
                                       with_slots=with_slots)
    band_spec = lambda: pl.BlockSpec((1, band, W),
                                     lambda b, r, *_: (b, r, 0),
                                     memory_space=pltpu.VMEM)
    in_specs = [band_spec(), band_spec(), band_spec()]
    args = [lab_p, gray_p, bnd_p]
    if with_color:
        if channel_major:
            cm = color if color.shape[2] == Hp else (
                padrows(color.reshape(B * 3, color.shape[2], W))
                .reshape(B, 3, Hp, W))
        else:
            cm = padrows(jnp.transpose(color, (0, 3, 1, 2)).reshape(
                B * 3, H, W)).reshape(B, 3, Hp, W)
        in_specs.append(pl.BlockSpec((1, 3, band, W),
                                     lambda b, r, *_: (b, 0, r, 0),
                                     memory_space=pltpu.VMEM))
        args.append(cm)
    S = 8 if with_color else 5
    scalars = [rl, n_blobs]
    if with_slots:
        scalars += [slot_list.astype(jnp.int32),
                    slot_count.astype(jnp.int32)]
    BC = _batch_chunk(B, K + 1 + (R * K + R if with_slots else 0))
    gs = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=len(scalars),
        grid=(BC, R),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((1, S, K), lambda b, r, *_: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4, K), lambda b, r, *_: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
    )

    def stats_call(*ops_):
        return pl.pallas_call(
            kernel,
            grid_spec=gs,
            out_shape=(jax.ShapeDtypeStruct((BC, S, K), jnp.int32),
                       jax.ShapeDtypeStruct((BC, 4, K), jnp.int32)),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
            interpret=interpret,
        )(*ops_)

    sums, bbox = _chunked_call(stats_call, B, BC, (*scalars, *args), 2)

    if with_slots:
        # banded bbox sums — a second kernel pass over the incidence
        # bands; kills the 4 dense integral images (~1 ms/frame at 2 MP)
        box_sums = _bbox_sums_banded(bbox, slot_list.astype(jnp.int32),
                                     slot_count.astype(jnp.int32),
                                     gray_p, cm if with_color else None,
                                     band, W, K, R, with_color, interpret)
    else:
        valid0 = sums[:, S_ONES] > 0
        x0 = jnp.where(valid0, bbox[:, 0], 0)
        y0 = jnp.where(valid0, bbox[:, 1], 0)
        x1 = jnp.where(valid0, bbox[:, 2] + 1, 0)
        y1 = jnp.where(valid0, bbox[:, 3] + 1, 0)
        planes = [gray]
        if with_color:
            planes += [(color[:, ch] if channel_major else color[..., ch])
                       for ch in range(3)]
        box_sums = jnp.stack(
            [_bbox_sum(_integral(p.astype(jnp.int32)), x0, y0, x1, y1)
             for p in planes], axis=1)
    return _assemble_table(sums, bbox, n_blobs, box_sums, with_color)


def _assemble_table(sums, bbox, n_blobs, box_sums, with_color):
    """Raw kernel outputs -> BlobTable (same math as ops/blobs.py).

    sums [B, S, K] i32 per-slot pixel sums, bbox [B, 4, K] i32 inclusive
    (x0, y0, x1, y1; invalid slots hold the min/max neutrals), box_sums
    [B, C, K] i32 bbox-window sums of gray(, b, g, r), n_blobs [B].
    Shared by the single-chip tiled path and the spatially-sharded path
    (parallel/tiled_sp.py), whose sums/bboxes arrive psum/pmin-combined."""
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

    fg_sum = sums[:, S_GRAY]
    bbox_sum = box_sums[:, 0]
    bg_px = w * h - area_px
    fg_mean = jnp.where(valid, fg_sum.astype(jnp.float32) / safe_px, 127.0)
    bg_mean = jnp.where(bg_px > 0,
                        (bbox_sum - fg_sum).astype(jnp.float32)
                        / jnp.maximum(bg_px, 1), 127.0)
    intensity_diff = jnp.abs(bg_mean - fg_mean)
    intensity_score = jnp.minimum(1.0, intensity_diff / 30.0)

    rect_area = (w * h).astype(jnp.float32)
    shape_score = jnp.where(rect_area > 0, 1.0 - area / rect_area, 1.0)

    if with_color:
        diffs = []
        for ch, srow in ((0, S_B), (1, S_G), (2, S_R)):
            c_fg = sums[:, srow]
            c_bbox = box_sums[:, 1 + ch]
            c_fg_mean = jnp.where(valid,
                                  c_fg.astype(jnp.float32) / safe_px, 127.0)
            c_bg_mean = jnp.where(bg_px > 0,
                                  (c_bbox - c_fg).astype(jnp.float32)
                                  / jnp.maximum(bg_px, 1), 127.0)
            diffs.append(jnp.abs(c_fg_mean - c_bg_mean))
        color_diff = jnp.maximum(jnp.maximum(diffs[0], diffs[1]), diffs[2])
        color_score = jnp.minimum(1.0, color_diff / 30.0)
    else:
        color_score = jnp.full_like(intensity_score, 0.5)

    return BlobTable(
        valid=valid, area=area, area_px=area_px, cx=cx, cy=cy,
        x=x0, y=y0, w=w, h=h,
        intensity_diff=intensity_diff, intensity_score=intensity_score,
        shape_score=shape_score, color_score=color_score, n_blobs=n_blobs)
