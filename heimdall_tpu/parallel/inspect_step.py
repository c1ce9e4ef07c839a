"""Multi-chip inspection steps: shard_map + halo exchange + collectives.

Scaling design (SURVEY.md §2.3): the frame batch shards over the "data"
axis (stations x bottles — the replacement for thread-per-station), and the
image H axis shards over "spatial" for the stencil phase (grayscale → blur
→ adaptive threshold → morphology), the structural analog of context
parallelism for images.

The stencil phase runs under ``shard_map`` with **one halo exchange per
stencil op** via ``jax.lax.ppermute`` of boundary rows over ICI; true image
borders replicate each op's exact OpenCV border semantics (reflect-101 for
the blur, replicate for the adaptive mean, +inf/-inf constants for
morphology), so spatially-sharded output is bit-identical to single-chip.

The labeling phase (CCL + blob stats) is not a stencil — its gathers span
the frame — so after the stencil phase the mask/gray/color shards
``all_gather`` along "spatial" and the *batch* re-splits across the spatial
members (every chip labels whole frames, N/(d*s) each), followed by an
``all_gather`` of the small blob tables.  Net collective traffic per frame:
2*halo rows + one mask gather + one table gather — all intra-slice ICI.

``make_line_step`` adds the line-level statistics reduction (psum of
defect/frame counts across the whole mesh) — the TPU-native replacement for
the reference's per-station host EMA (system.py:130-134).
"""

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from heimdall_tpu import ops
from heimdall_tpu.ops import blobs as blobs_mod
from heimdall_tpu.ops.filters import gaussian_kernel_1d, _q8_taps


# ---------------------------------------------------------------------------
# Halo-exchanged stencil helpers (operate on [..., Hl, W] local shards)
# ---------------------------------------------------------------------------

def _exchange_halo(x: jnp.ndarray, r: int, axis_name: str):
    """Fetch r boundary rows from each spatial neighbour.

    Returns (top_halo, bottom_halo) of shape [..., r, W]; edge shards
    receive zeros (overwritten by the border fill)."""
    n = jax.lax.axis_size(axis_name)
    if n == 1:
        z = jnp.zeros(x.shape[:-2] + (r, x.shape[-1]), x.dtype)
        return z, z
    # my bottom rows -> next shard's top halo
    fwd = [(i, (i + 1) % n) for i in range(n)]
    bwd = [(i, (i - 1) % n) for i in range(n)]
    bottom_rows = jax.lax.slice_in_dim(x, x.shape[-2] - r, x.shape[-2], axis=-2)
    top_rows = jax.lax.slice_in_dim(x, 0, r, axis=-2)
    top_halo = jax.lax.ppermute(bottom_rows, axis_name, fwd)
    bottom_halo = jax.lax.ppermute(top_rows, axis_name, bwd)
    return top_halo, bottom_halo


def _border_rows(x: jnp.ndarray, r: int, mode: str, top: bool, value=0):
    """The r rows OpenCV's border mode would synthesize outside the image."""
    H = x.shape[-2]
    if mode == "reflect101":
        rows = (jax.lax.slice_in_dim(x, 1, r + 1, axis=-2)[..., ::-1, :]
                if top else
                jax.lax.slice_in_dim(x, H - r - 1, H - 1, axis=-2)[..., ::-1, :])
    elif mode == "replicate":
        row = (jax.lax.slice_in_dim(x, 0, 1, axis=-2) if top
               else jax.lax.slice_in_dim(x, H - 1, H, axis=-2))
        rows = jnp.broadcast_to(row, row.shape[:-2] + (r,) + row.shape[-1:])
    elif mode == "constant":
        rows = jnp.full(x.shape[:-2] + (r, x.shape[-1]), value, x.dtype)
    else:
        raise ValueError(mode)
    return rows


def _pad_rows_sp(x: jnp.ndarray, r: int, mode: str, axis_name: str, value=0):
    """Extend a local H-shard by r rows on each side: neighbour halos at
    interior seams, the op's true border semantics at the global edges."""
    idx = jax.lax.axis_index(axis_name)
    n = jax.lax.axis_size(axis_name)
    top_halo, bottom_halo = _exchange_halo(x, r, axis_name)
    top_fill = _border_rows(x, r, mode, top=True, value=value)
    bot_fill = _border_rows(x, r, mode, top=False, value=value)
    is_top = (idx == 0)
    is_bot = (idx == n - 1)
    top = jnp.where(is_top, top_fill, top_halo)
    bot = jnp.where(is_bot, bot_fill, bottom_halo)
    return jnp.concatenate([top, x, bot], axis=-2)


def _sep_conv_rows_valid(x, taps):
    """Row-axis (H) valid convolution: [..., H, W] -> [..., H-2r, W]."""
    r = len(taps) // 2
    Hv = x.shape[-2] - 2 * r
    out = taps[0] * jax.lax.slice_in_dim(x, 0, Hv, axis=-2)
    for i in range(1, len(taps)):
        out = out + taps[i] * jax.lax.slice_in_dim(x, i, i + Hv, axis=-2)
    return out


def _conv_cols_padded(x, taps, mode):
    """Column-axis (W) convolution with the op's own border padding."""
    r = len(taps) // 2
    W = x.shape[-1]
    pad_mode = {"reflect101": "reflect", "replicate": "edge"}[mode]
    xp = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(r, r)], mode=pad_mode)
    out = taps[0] * jax.lax.slice_in_dim(xp, 0, W, axis=-1)
    for i in range(1, len(taps)):
        out = out + taps[i] * jax.lax.slice_in_dim(xp, i, i + W, axis=-1)
    return out


def _sp_gaussian_blur_u8(x_u8, ksize, axis_name):
    """Sharded cv2.GaussianBlur (Q8 fixed-point path, reflect-101)."""
    taps = _q8_taps(gaussian_kernel_1d(ksize, 0.0))
    r = ksize // 2
    ext = _pad_rows_sp(x_u8.astype(jnp.int32), r, "reflect101", axis_name)
    acc = _sep_conv_rows_valid(_conv_cols_padded(ext, taps, "reflect101"), taps)
    return jnp.clip((acc + (1 << 15)) >> 16, 0, 255).astype(jnp.uint8)


def _sp_adaptive_mean(x_u8, block, axis_name):
    """Sharded adaptive Gaussian mean (float path, replicate border)."""
    kf = [float(t) for t in gaussian_kernel_1d(block, 0.0)]
    r = block // 2
    ext = _pad_rows_sp(x_u8.astype(jnp.float32), r, "replicate", axis_name)
    mf = _sep_conv_rows_valid(_conv_cols_padded(ext, kf, "replicate"), kf)
    return jnp.rint(mf).astype(jnp.int32)


def _sp_minmax3(x_u8, is_min, axis_name):
    """Sharded 3x3 erode/dilate with OpenCV constant borders."""
    value = 255 if is_min else 0
    ext = _pad_rows_sp(x_u8, 1, "constant", axis_name, value=value)
    W = ext.shape[-1]
    xp = jnp.pad(ext, [(0, 0)] * (ext.ndim - 1) + [(1, 1)],
                 mode="constant", constant_values=value)
    op = jnp.minimum if is_min else jnp.maximum
    Hv = ext.shape[-2] - 2
    out = None
    for di in range(3):
        for dj in range(3):
            s = jax.lax.slice_in_dim(
                jax.lax.slice_in_dim(xp, di, di + Hv, axis=-2),
                dj, dj + W, axis=-1)
            out = s if out is None else op(out, s)
    return out


def sp_contamination_preprocess(frames, contrast_threshold, axis_name):
    """The stencil phase on an H-shard: bit-identical to the single-chip
    path of detectors/contamination_detector.py (gray → blur5 → adaptive
    threshold → open → close)."""
    gray = ops.bgr_to_gray(frames)
    blurred = _sp_gaussian_blur_u8(gray, 5, axis_name)
    mean = _sp_adaptive_mean(blurred, 11, axis_name)
    ci = jnp.asarray(contrast_threshold).astype(jnp.int32)
    binary = jnp.where(blurred.astype(jnp.int32) <= mean - ci,
                       jnp.uint8(255), jnp.uint8(0))
    binary = _sp_minmax3(_sp_minmax3(binary, True, axis_name), False,
                         axis_name)   # open
    binary = _sp_minmax3(_sp_minmax3(binary, False, axis_name), True,
                         axis_name)   # close
    return gray, binary


# ---------------------------------------------------------------------------
# Full sharded inspection step
# ---------------------------------------------------------------------------

def make_sharded_inspection_step(mesh: Mesh, max_blobs: int = 64,
                                 use_color: bool = True,
                                 formula: str = "python"):
    """Build a jitted multi-chip contamination-inspection step.

    Input: frames [N, H, W, 3] uint8 sharded P("data", "spatial") — N over
    data, H over spatial.  N must be divisible by data*spatial (the batch
    re-splits over the spatial axis for the labeling phase).

    Returns a function (frames, contrast, min_size, max_size, min_conf) →
    (BlobTable, confidence [N, K], accepted [N, K]) sharded P("data").
    """
    n_sp = mesh.shape["spatial"]

    def local_step(frames, ct, mins, maxs, minc):
        # frames: [Nl, Hl, W, 3] local shard
        gray_l, binary_l = sp_contamination_preprocess(frames, ct, "spatial")

        # Gather full-H planes, then re-split the batch over "spatial".
        gray = jax.lax.all_gather(gray_l, "spatial", axis=-2, tiled=True)
        binary = jax.lax.all_gather(binary_l, "spatial", axis=-2, tiled=True)
        color = jax.lax.all_gather(frames, "spatial", axis=-3, tiled=True) \
            if use_color else None

        sp_idx = jax.lax.axis_index("spatial")
        nl = frames.shape[0]
        # ceil-split: when the per-data-shard batch is smaller than the
        # spatial axis (the latency-shaped case — few frames, 2MP each),
        # pad the gathered batch so every spatial member still labels a
        # static-shape chunk; padded all-zero frames produce empty blob
        # tables and are trimmed after the row gather below.
        chunk = -(-nl // n_sp)
        if chunk * n_sp != nl:
            def pad_rows(a):
                return jnp.pad(a, [(0, chunk * n_sp - nl)]
                               + [(0, 0)] * (a.ndim - 1))
            gray, binary = pad_rows(gray), pad_rows(binary)
            color = pad_rows(color) if color is not None else None
        start = sp_idx * chunk
        gray_c = jax.lax.dynamic_slice_in_dim(gray, start, chunk, axis=0)
        binary_c = jax.lax.dynamic_slice_in_dim(binary, start, chunk, axis=0)
        color_c = (jax.lax.dynamic_slice_in_dim(color, start, chunk, axis=0)
                   if color is not None else None)

        mask = ops.ccl.fill_holes(binary_c > 0)
        labels = ops.connected_components(mask, connectivity=8)
        table = blobs_mod.blob_stats(labels, mask, gray_c, color_c,
                                     max_blobs=max_blobs,
                                     use_color=use_color)
        conf = (blobs_mod.confidence_native(table) if formula == "native"
                else blobs_mod.confidence_python(table))
        accepted = (table.valid & (table.area >= mins)
                    & (table.area <= maxs) & (conf >= minc))

        # Re-assemble the full local batch of tables on every spatial member
        # (trimming any ceil-split padding rows).
        def gather_rows(a):
            g = jax.lax.all_gather(a, "spatial", axis=0, tiled=True)
            return g[:nl] if g.shape[0] != nl else g
        table = jax.tree.map(gather_rows, table)
        conf = gather_rows(conf)
        accepted = gather_rows(accepted)
        return table, conf, accepted

    sharded = shard_map(
        local_step, mesh=mesh,
        in_specs=(P("data", "spatial"), P(), P(), P(), P()),
        out_specs=(P("data"), P("data"), P("data")),
        check_vma=False)

    @jax.jit
    def step(frames, contrast, min_size, max_size, min_conf):
        return sharded(frames,
                       jnp.int32(contrast), jnp.float32(min_size),
                       jnp.float32(max_size), jnp.float32(min_conf))

    return step


def make_line_step(mesh: Mesh, max_blobs: int = 64, use_color: bool = True):
    """Inspection step + line-level statistics reduction.

    Returns (table, conf, accepted, stats) where stats is a replicated dict
    of line totals (frames, defects, reject count at the configured
    confidence) reduced with psum across the whole mesh — the multi-chip
    equivalent of the per-station counters in system.py:126-134.
    """
    base = make_sharded_inspection_step(mesh, max_blobs, use_color)
    n_total = mesh.shape["data"] * mesh.shape["spatial"]

    def stats_local(accepted, conf, reject_threshold):
        frames = jnp.int32(accepted.shape[0])
        defects = accepted.sum().astype(jnp.int32)
        frame_has_defect = accepted.any(axis=-1)
        rejects = (frame_has_defect &
                   ((jnp.where(accepted, conf, 0.0).max(axis=-1))
                    >= reject_threshold)).sum().astype(jnp.int32)
        return frames, defects, rejects

    stats_sharded = shard_map(
        lambda a, c, rt: tuple(
            jax.lax.psum(v, ("data", "spatial"))
            for v in stats_local(a, c, rt)),
        mesh=mesh,
        in_specs=(P("data"), P("data"), P()),
        out_specs=(P(), P(), P()),
        check_vma=False)

    @jax.jit
    def step(frames, contrast, min_size, max_size, min_conf,
             reject_threshold):
        table, conf, accepted = base(frames, contrast, min_size, max_size,
                                     min_conf)
        f, d, r = stats_sharded(accepted, conf,
                                jnp.float32(reject_threshold))
        # psum over "data" double-counts the spatial replicas; normalize.
        stats = {"frames": f // mesh.shape["spatial"],
                 "defects": d // mesh.shape["spatial"],
                 "rejects": r // mesh.shape["spatial"]}
        return table, conf, accepted, stats

    return step


def make_pallas_data_parallel_step(mesh: Mesh, max_blobs: int = 64,
                                   use_color: bool = True,
                                   formula: str = "python",
                                   sweeps: int = 1,
                                   adaptive: bool = True,
                                   interpret: bool = False):
    """Data-parallel multi-chip step over the FUSED Pallas kernels.

    The fused kernels keep whole frames in VMEM, so they shard over the
    "data" axis only (each chip labels its own frames; no spatial split).
    shard_map runs the per-chip Pallas pipeline; the outputs come back
    sharded P("data") with zero collectives — the pure-throughput layout
    for production lines whose frames fit VMEM.

    Input frames must be [N, H, W, 3] with N divisible by the total device
    count; place them with ``shard_batch(mesh, frames, spatial=False)``.
    """
    from heimdall_tpu.ops.pallas_kernels import contamination_pallas_detect

    n_total = mesh.shape["data"] * mesh.shape["spatial"]
    flat_mesh = Mesh(mesh.devices.reshape(-1), ("data_all",))

    def local_step(frames, ct, mins, maxs, minc):
        return contamination_pallas_detect(
            frames, ct, mins, maxs, minc, max_blobs=max_blobs,
            use_color=use_color, formula=formula, sweeps=sweeps,
            adaptive=adaptive, interpret=interpret)

    sharded = shard_map(
        local_step, mesh=flat_mesh,
        in_specs=(P("data_all"), P(), P(), P(), P()),
        out_specs=(jax.tree.map(lambda _: P("data_all"),
                                _blob_table_structure(max_blobs)),
                   P("data_all"), P("data_all")),
        check_vma=False)

    @jax.jit
    def step(frames, contrast, min_size, max_size, min_conf):
        return sharded(frames, jnp.int32(contrast), jnp.float32(min_size),
                       jnp.float32(max_size), jnp.float32(min_conf))

    return step


def make_tiled_data_parallel_step(mesh: Mesh, max_blobs: int = 64,
                                  use_color: bool = True,
                                  formula: str = "python",
                                  sweeps: int = 6,
                                  band: int = 256):
    """Data-parallel multi-chip step over the BAND-TILED Pallas CCL path.

    The production layout for the reference's 2 MP cameras: frames too
    large for the whole-frame fused kernels shard over a flat "data" axis
    (the tiled path is per-frame independent — band kernels + interface
    merge all stay chip-local).  One v5e already does ~150 fps of 2 MP
    frames — above the 4-camera 100 fps line — so sharding here is pure
    headroom / multi-line capacity.
    Zero collectives; outputs come back sharded P("data").

    Place frames with ``shard_batch(mesh, frames, spatial=False)``.
    """
    from heimdall_tpu.detectors.contamination_detector import (
        contamination_program)

    flat_mesh = Mesh(mesh.devices.reshape(-1), ("data_all",))

    def local_step(frames, ct, mins, maxs, minc):
        return contamination_program(
            frames, ct, mins, maxs, minc, max_blobs=max_blobs,
            use_color=use_color, formula=formula, ccl_sweeps=sweeps,
            tiled_band=band)

    sharded = shard_map(
        local_step, mesh=flat_mesh,
        in_specs=(P("data_all"), P(), P(), P(), P()),
        out_specs=(jax.tree.map(lambda _: P("data_all"),
                                _blob_table_structure(max_blobs)),
                   P("data_all"), P("data_all")),
        check_vma=False)

    @jax.jit
    def step(frames, contrast, min_size, max_size, min_conf):
        return sharded(frames, jnp.int32(contrast), jnp.float32(min_size),
                       jnp.float32(max_size), jnp.float32(min_conf))

    return step


def _blob_table_structure(max_blobs):
    """A BlobTable pytree skeleton for building out_specs."""
    from heimdall_tpu.ops.blobs import BlobTable
    return BlobTable(*([0] * len(BlobTable._fields)))
