"""Spatially-sharded band-tiled detection: the Pallas kernels across chips.

VERDICT r3 #4: the halo-exchange spatial sharding (parallel/inspect_step.py)
composes the XLA op chain, so multi-chip single-frame latency never touched
the fast band-tiled kernels (ops/ccl_tiled.py, ops/stats_tiled.py).  Here
the BANDS themselves are the unit of distribution: each chip runs the
banded Pallas flood / CCL / stats kernels on its H-shard, and the
boundary-row exchange that the single-chip path does between bands happens
across chips over ICI (``ppermute`` of single rows) feeding the SAME
interface-merge machinery — gathered edge tables are tiny ([R, 2, W] i32
per frame), so the merge runs replicated on every spatial member and each
chip remaps only its local label shard.

Exactness: identical to the single-chip tiled path by construction —
  * the flood runs to the GLOBAL fixpoint (a round seeds every band with
    its neighbours' boundary rows, including cross-chip ones; a round that
    changes nothing anywhere certifies completion, `psum`-reduced),
  * band CCL labels are globalized local linear indices, and the union-find
    fixpoint (min root per component) is band- and shard-structure-free,
  * per-blob statistics are linear reductions, combined with `psum` /
    `pmin` / `pmax` across the spatial axis.
tests/test_tiled_sp.py asserts bit-equality against the single-chip tiled
path, including at the 2 MP ship shape ([4, 1080, 1920] over a 2x4 mesh).

Design point: 4x 2 MP cameras (reference
rust/heimdall-gige/src/camera.rs:48-68) — one frame's bands spread over
the spatial axis for single-frame latency, batch over "data" for
throughput.  The stencil preprocess stays on the halo-exchange XLA path
(bit-exact, tested, and a small share of frame cost); the label phases —
87% of single-chip frame time (PERF.md r3) — run on the banded kernels.
"""

import functools
import math

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from heimdall_tpu.ops import blobs as blobs_mod
from heimdall_tpu.ops.ccl_tiled import (_band_ccl_call, _make_flood_kernel,
                                        _merge_prep, _apply_pairs,
                                        _slow_remap, _compact_incidence)
from heimdall_tpu.ops.stats_tiled import (_make_banded_stats_kernel,
                                          _bbox_sums_banded, _batch_chunk,
                                          _chunked_call, _assemble_table,
                                          S_ONES, S_Y)
from heimdall_tpu.parallel.inspect_step import (sp_contamination_preprocess,
                                                _blob_table_structure)


def pick_band(h_local: int, request: int = 128) -> int:
    """Band size for an Hl-row shard: the largest divisor of Hl <= the
    request that Mosaic can BLOCK on — band % 8 == 0 (the TPU lowering
    requires block sublane dims divisible by 8) or band == Hl (a block
    equal to the array dimension is always legal).

    The r5 1-device hardware check caught the old form: 1080 over 4
    chips gives Hl = 270, whose only divisors <= 128 are 8-unaligned
    (90, 54, ...) — Mosaic REJECTED the (1, 90, W) BlockSpec that every
    CPU interpret run had happily executed.  270 = 2 * 3^3 * 5 has no
    8-aligned divisor at all, so such shards run as one full-height
    band (R = 1), which the flood/CCL kernels handle exactly (their
    cross-band machinery just sees nothing to exchange locally)."""
    for b in range(min(request, h_local), 0, -1):
        if h_local % b == 0 and b % 8 == 0:
            return b
    return h_local


def _ppermute_fwd(x, axis_name, n):
    """x from the previous spatial member (zeros at the global top)."""
    if n == 1:
        return jnp.zeros_like(x)
    return jax.lax.ppermute(x, axis_name, [(i, i + 1) for i in range(n - 1)])


def _ppermute_bwd(x, axis_name, n):
    """x from the next spatial member (zeros at the global bottom)."""
    if n == 1:
        return jnp.zeros_like(x)
    return jax.lax.ppermute(x, axis_name, [(i, i - 1) for i in range(1, n)])


# ---------------------------------------------------------------------------
# flood fill across chips
# ---------------------------------------------------------------------------

def fill_holes_tiled_sp(mask_l, band: int, H: int, axis_name: str,
                        interpret: bool = False, sync_axes=None):
    """Sharded ops.ccl_tiled.fill_holes_tiled on a [B, Hl, W] H-shard.

    Same banded OR-flood kernel; each global round re-seeds every band
    with its neighbours' boundary rows — cross-chip neighbours arrive by
    ppermute of the [B, W] edge rows — until a whole round changes
    nothing ANYWHERE (psum-certified global fixpoint).  Exact: the flood
    is monotone and the certificate is the same one the single-chip
    driver uses, extended over the mesh.

    ``sync_axes`` (default: just ``axis_name``): axes the round counter
    reduces over.  Pass ALL mesh axes when other mesh dimensions exist:
    the loop contains ppermutes, and XLA:CPU's collective rendezvous
    requires every device to join each executed instance — data groups
    running different round counts deadlock there.  Extra no-op rounds
    are nearly free (converged bands skip the scan machinery)."""
    if sync_axes is None:
        sync_axes = axis_name
    B, Hl, W = mask_l.shape
    assert Hl % band == 0, (Hl, band)
    R = Hl // band
    n = jax.lax.axis_size(axis_name)
    row_off = jax.lax.axis_index(axis_name) * Hl

    bg = (~mask_l).astype(jnp.uint8)
    grow = row_off + jnp.arange(Hl, dtype=jnp.int32)[None, :, None]
    col = jnp.arange(W, dtype=jnp.int32)[None, None, :]
    border = ((grow == 0) | (grow == H - 1) | (col == 0)
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
        out_shape=[jax.ShapeDtypeStruct((B, Hl, W), jnp.uint8),
                   jax.ShapeDtypeStruct((B, R, 2, W), jnp.uint8),
                   jax.ShapeDtypeStruct((B, R, 1), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret)

    def halos(edge_rows):
        # [B, R, 2, W]: [.., 0] first row, [.., 1] last row.  Band r's top
        # halo = band r-1's last row; band 0's comes from the previous
        # SHARD's last band (ppermute), zeros at the global frame edges.
        first = edge_rows[:, :, 0]
        last = edge_rows[:, :, 1]
        top_in = _ppermute_fwd(last[:, -1], axis_name, n)
        bot_in = _ppermute_bwd(first[:, 0], axis_name, n)
        top = jnp.concatenate([top_in[:, None], last[:, :-1]], axis=1)
        bot = jnp.concatenate([first[:, 1:], bot_in[:, None]], axis=1)
        return jnp.stack([top, bot], axis=2)

    v0 = ext0.reshape(B, R, band, W)
    edges0 = jnp.stack([v0[:, :, 0], v0[:, :, band - 1]], axis=2)
    ext, edges, flags = call(bg, ext0, halos(edges0))

    def gdone(flags):
        return jax.lax.pmin(jnp.min(flags), sync_axes)

    def cond(c):
        return c[2] < 1

    def body(c):
        ext, edges, _ = c
        ext, edges, flags = call(bg, ext, halos(edges))
        return ext, edges, gdone(flags)

    ext, _, _ = jax.lax.while_loop(cond, body, (ext, edges, gdone(flags)))
    hole = (bg & (1 - ext)) > 0
    return mask_l | hole


# ---------------------------------------------------------------------------
# band CCL across chips
# ---------------------------------------------------------------------------

def connected_components_tiled_sp(mask_l, band: int, H: int, axis_name: str,
                                  max_blobs: int, connectivity: int = 8,
                                  interpret: bool = False, sync_axes=None):
    """Sharded connected_components_tiled(return_roots=K, band_slots=True).

    Each chip labels its bands with the in-kernel fixpoint CCL (global
    linear indices via the shard's row offset), then the gathered edge
    tables drive ONE replicated interface merge whose changed-pairs remap
    each chip applies locally.  Returns (labels_l, root_table [B, K],
    n_blobs [B], slot_list [B, R_local, K], slot_count [B, R_local]) —
    root table and counts replicated across the spatial axis.

    ``sync_axes``: see fill_holes_tiled_sp — here it synchronizes the
    table-vs-topk branch choice (the topk fallback contains collectives,
    so every device must take the same branch; forcing the fallback for
    all data groups when any needs it is exact either way)."""
    if sync_axes is None:
        sync_axes = axis_name
    B, Hl, W = mask_l.shape
    assert Hl % band == 0, (Hl, band)
    R = Hl // band
    n = jax.lax.axis_size(axis_name)
    # a degenerate mesh (1 device x 1 band) would build zero-width [B, 0]
    # edge tables in the merge below; the single-chip path guards R <= 1
    # explicitly — use it instead of a spatial mesh with < 2 global bands
    assert n * R >= 2, ("connected_components_tiled_sp needs >= 2 global "
                        "bands (n_devices * bands_per_shard)", n, R)
    idx = jax.lax.axis_index(axis_name)
    off = idx * (Hl * W)
    K = max_blobs
    cap_b = max(K, 128)
    sentinel = H * W

    lab, edges, band_roots, counts = _band_ccl_call(
        mask_l.astype(jnp.uint8), connectivity, band, 2, interpret,
        cap_b, sentinel, emit_edges=True, to_fixpoint=True)
    counts = counts[..., 0]
    # globalize: band kernels label in shard-local linear indices
    lab = jnp.where(lab < sentinel, lab + off, sentinel)
    edges = jnp.where(edges < sentinel, edges + off, sentinel)
    band_roots = jnp.where(band_roots < sentinel, band_roots + off,
                           sentinel)

    # gather the small per-band tables; Hl % band == 0 makes the global
    # band structure uniform, so gathered tables ARE the single-chip ones
    edges_g = jax.lax.all_gather(edges, axis_name, axis=1, tiled=True)
    roots_g = jax.lax.all_gather(band_roots, axis_name, axis=1, tiled=True)
    counts_g = jax.lax.all_gather(counts, axis_name, axis=1, tiled=True)
    Rt = n * R

    iters = max(1, math.ceil(math.log2(max(Rt, 2)))) + 2
    prep = _merge_prep(lab, band, connectivity, sentinel, iters,
                       edge_rows=edges_g)
    edges_ok = jnp.max(prep["n_edges"]) <= prep["cap"]

    merged = jax.lax.cond(
        edges_ok,
        lambda _: _apply_pairs(lab, prep["old"], prep["new"],
                               prep["n_changed"]),
        lambda _: _slow_remap(lab, prep, sentinel),
        operand=None)

    flat_roots = roots_g.reshape(B, -1)
    old, new = prep["old"], prep["new"]

    def table_roots(_):
        gone = jnp.any(flat_roots[:, :, None] == old[:, None, :], axis=-1)
        survivors = jnp.where(gone, sentinel, flat_roots)
        rl = jnp.sort(survivors, axis=-1)[:, :K]
        n_blobs = counts_g.sum(axis=-1) - prep["n_changed"]
        big = jnp.int32(2**30)
        hit = flat_roots[:, :, None] == old[:, None, :]
        mapped = jnp.where(
            jnp.any(hit, axis=-1),
            jnp.min(jnp.where(hit, new[:, None, :], big), axis=-1),
            flat_roots).reshape(B, Rt, cap_b)
        presence = jnp.any(
            (mapped[..., None] == rl[:, None, None, :])
            & (mapped[..., None] < sentinel), axis=2)      # [B, Rt, K]
        return rl, n_blobs, presence

    lin_glob = ((idx * Hl + jnp.arange(Hl, dtype=jnp.int32))[None, :, None]
                * W + jnp.arange(W, dtype=jnp.int32)[None, None, :])

    def topk_roots(_):
        # adversarial fallback (> cap_b roots in one band, or the merge
        # overflowed to the dense remap): local top-K roots, gathered and
        # re-sorted — exact, with conservative all-bands incidence
        is_root = (merged == lin_glob) & (merged != sentinel)
        keys = jnp.where(is_root, merged, sentinel).reshape(B, Hl * W)
        rl_loc = -jax.lax.top_k(-keys, K)[0]
        rl_all = jax.lax.all_gather(rl_loc, axis_name, axis=-1, tiled=True)
        rl = jnp.sort(rl_all, axis=-1)[:, :K]
        n_blobs = jax.lax.psum(
            jnp.sum(is_root.astype(jnp.int32), axis=(-2, -1)), axis_name)
        presence = jnp.broadcast_to((rl < sentinel)[:, None, :],
                                    (B, Rt, K))
        return rl, n_blobs, presence

    table_ok = jax.lax.pmin(
        (edges_ok & (jnp.max(counts_g) <= cap_b)).astype(jnp.int32),
        sync_axes) > 0
    rl, n_blobs, presence = jax.lax.cond(
        table_ok, table_roots, topk_roots, operand=None)

    pres_l = jax.lax.dynamic_slice_in_dim(presence, idx * R, R, axis=1)
    slot_list, slot_count = _compact_incidence(pres_l)
    return merged, rl, n_blobs, slot_list, slot_count


# ---------------------------------------------------------------------------
# per-blob statistics across chips
# ---------------------------------------------------------------------------

def blob_stats_tiled_sp(labels_l, mask_l, gray_l, color_l, band: int,
                        H: int, axis_name: str, rl, n_blobs,
                        slot_list, slot_count, use_color: bool,
                        interpret: bool = False):
    """Sharded blob_stats_tiled: banded stats kernels per chip, linear
    reductions combined with psum / pmin / pmax over the spatial axis.

    labels_l hold GLOBAL labels for the local H-shard; rl / n_blobs are
    the replicated global root table; slot_list / slot_count are the
    LOCAL bands' incidence rows.  color_l is [B, 3, Hl, W] channel-major
    (or None).  Returns a replicated BlobTable."""
    B, Hl, W = labels_l.shape
    R = Hl // band
    n = jax.lax.axis_size(axis_name)
    row_off = jax.lax.axis_index(axis_name) * Hl
    K = rl.shape[-1]
    with_color = use_color and color_l is not None

    # boundary plane with cross-chip 1-row halos (zeros at frame edges,
    # matching the single-chip zero pad)
    up = _ppermute_fwd(mask_l[:, -1], axis_name, n)
    down = _ppermute_bwd(mask_l[:, 0], axis_name, n)
    mrows = jnp.concatenate([up[:, None], mask_l, down[:, None]], axis=1)
    mpad = jnp.pad(mrows, [(0, 0), (0, 0), (1, 1)])
    nb4 = (mpad[:, :-2, 1:-1].astype(jnp.int32) + mpad[:, 2:, 1:-1]
           + mpad[:, 1:-1, :-2] + mpad[:, 1:-1, 2:])
    boundary = (mask_l & (nb4 < 4)).astype(jnp.uint8)

    kernel = _make_banded_stats_kernel(band, W, K, R, H * W, with_color,
                                       with_slots=True)
    band_spec = lambda: pl.BlockSpec((1, band, W),
                                     lambda b, r, *_: (b, r, 0),
                                     memory_space=pltpu.VMEM)
    in_specs = [band_spec(), band_spec(), band_spec()]
    args = [labels_l, gray_l.astype(jnp.uint8), boundary]
    if with_color:
        in_specs.append(pl.BlockSpec((1, 3, band, W),
                                     lambda b, r, *_: (b, 0, r, 0),
                                     memory_space=pltpu.VMEM))
        args.append(color_l)
    S = 8 if with_color else 5
    scalars = [rl.astype(jnp.int32), n_blobs.astype(jnp.int32),
               slot_list.astype(jnp.int32), slot_count.astype(jnp.int32)]
    BC = _batch_chunk(B, K + 1 + R * K + R)
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

    sums_l, bbox_l = _chunked_call(stats_call, B, BC,
                                   (*scalars, *args), 2)

    # globalize the row-dependent pieces BEFORE the cross-chip reduction:
    # sum(global row) = sum(local row) + row_off * count, bbox y += offset
    # (kernel neutrals: y0 = Hl, y1 = -1)
    sums_l = sums_l.at[:, S_Y].add(row_off * sums_l[:, S_ONES])
    sums = jax.lax.psum(sums_l, axis_name)
    y0g = jnp.where(bbox_l[:, 1] >= Hl, H, bbox_l[:, 1] + row_off)
    y1g = jnp.where(bbox_l[:, 3] < 0, -1, bbox_l[:, 3] + row_off)
    bbox = jnp.stack([
        jax.lax.pmin(bbox_l[:, 0], axis_name),
        jax.lax.pmin(y0g, axis_name),
        jax.lax.pmax(bbox_l[:, 2], axis_name),
        jax.lax.pmax(y1g, axis_name)], axis=1)

    # bbox-window sums need the FINAL bbox; pass it back in local row
    # coordinates (rows outside the shard simply never match)
    bbox_loc = jnp.stack([bbox[:, 0], bbox[:, 1] - row_off,
                          bbox[:, 2], bbox[:, 3] - row_off], axis=1)
    box_sums_l = _bbox_sums_banded(
        bbox_loc, slot_list.astype(jnp.int32), slot_count.astype(jnp.int32),
        gray_l.astype(jnp.uint8), color_l if with_color else None,
        band, W, K, R, with_color, interpret)
    box_sums = jax.lax.psum(box_sums_l, axis_name)

    return _assemble_table(sums, bbox, n_blobs, box_sums, with_color)


# ---------------------------------------------------------------------------
# the full sharded step
# ---------------------------------------------------------------------------

def make_tiled_spatial_step(mesh: Mesh, band: int = 128,
                            max_blobs: int = 64, use_color: bool = True,
                            formula: str = "python",
                            interpret: bool = None):
    """Multi-chip single-frame-latency step over the band-tiled kernels.

    Input frames [N, H, W, 3] uint8 sharded P("data", "spatial") — N over
    data, H over spatial; H must divide by the spatial axis.  The stencil
    preprocess runs on the halo-exchange XLA path (bit-exact); flood,
    CCL, and stats run on the banded Pallas kernels, bands distributed
    across the spatial axis (see module docstring).

    Returns (BlobTable, confidence [N, K], accepted [N, K]) sharded
    P("data") — identical to contamination_program(tiled_band=...) on the
    unsharded batch (tests/test_tiled_sp.py)."""
    n_sp = mesh.shape["spatial"]

    def local_step(frames, ct, mins, maxs, minc):
        interp = (jax.default_backend() == "cpu" if interpret is None
                  else interpret)
        Hl = frames.shape[1]
        H = Hl * n_sp
        b = pick_band(Hl, band)
        axes = ("data", "spatial")
        gray_l, binary_l = sp_contamination_preprocess(frames, ct,
                                                       "spatial")
        mask_l = fill_holes_tiled_sp(binary_l > 0, b, H, "spatial",
                                     interpret=interp, sync_axes=axes)
        labels_l, rl, n_blobs, slot_list, slot_count = (
            connected_components_tiled_sp(mask_l, b, H, "spatial",
                                          max_blobs, interpret=interp,
                                          sync_axes=axes))
        color_l = (jnp.transpose(frames, (0, 3, 1, 2)) if use_color
                   else None)
        table = blob_stats_tiled_sp(
            labels_l, mask_l, gray_l, color_l, b, H, "spatial", rl,
            n_blobs, slot_list, slot_count, use_color, interpret=interp)
        conf = (blobs_mod.confidence_native(table) if formula == "native"
                else blobs_mod.confidence_python(table))
        size_ok = ((table.area >= mins) & (table.area <= maxs)
                   & table.valid & (table.area_px > 0))
        accepted = size_ok & (conf >= minc)
        return table, conf, accepted

    sharded = shard_map(
        local_step, mesh=mesh,
        in_specs=(P("data", "spatial"), P(), P(), P(), P()),
        out_specs=(jax.tree.map(lambda _: P("data"),
                                _blob_table_structure(max_blobs)),
                   P("data"), P("data")),
        check_vma=False)

    @jax.jit
    def step(frames, contrast, min_size, max_size, min_conf):
        return sharded(frames, jnp.int32(contrast), jnp.float32(min_size),
                       jnp.float32(max_size), jnp.float32(min_conf))

    return step
