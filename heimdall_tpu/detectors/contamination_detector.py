"""Contamination detector — the reference algorithm as one TPU program.

Parity target: heimdall/detectors/contamination_detector.py:44-216.

The reference runs, per frame, on the host: gray → GaussianBlur(5,5) →
adaptiveThreshold(GAUSSIAN_C, BINARY_INV, block 11, C=contrast_threshold) →
morphology OPEN then CLOSE (3x3 rect) → findContours(EXTERNAL) → a Python
loop per contour computing area gating, moment centroid, masked fg/bg
intensity means, per-channel color means, and the confidence blend
0.5*intensity + 0.2*shape + 0.3*color.

Here the entire path — including blob labeling and all per-blob statistics —
is a single jitted XLA program over a [N, H, W, 3] uint8 batch (see
ops/filters.py, ops/threshold.py, ops/morphology.py, ops/ccl.py,
ops/blobs.py for the per-op parity notes).  Dynamic contour counts become a
fixed-capacity blob table with a validity mask; thresholds that the
reference reads from config (contrast_threshold, size gates,
min_confidence) enter as *traced scalars* so parameter changes never
recompile.

Host-side work is reduced to: H2D of the frame batch, D2H of the small
blob table, and (only when contour metadata is requested) border-following
on the returned label image.
"""

from functools import partial
from typing import Any, Dict, List, Optional

import numpy as np
import jax
import jax.numpy as jnp

from heimdall_tpu import ops
from heimdall_tpu.ops import blobs as blobs_mod
from heimdall_tpu.detectors.base import Defect, DefectDetector
from heimdall_tpu.utils import contours as contours_mod


@partial(jax.jit, static_argnames=("max_blobs", "use_color", "formula",
                                   "return_labels", "ccl_sweeps",
                                   "tiled_band", "channel_major",
                                   "tiled_runtable", "rt_bg", "rt_fg"))
def contamination_program(images: jnp.ndarray,
                          contrast_threshold: jnp.ndarray,
                          min_size: jnp.ndarray,
                          max_size: jnp.ndarray,
                          min_confidence: jnp.ndarray,
                          max_blobs: int = 64,
                          use_color: bool = True,
                          formula: str = "python",
                          return_labels: bool = False,
                          ccl_sweeps: int = 0,
                          tiled_band: int = 0,
                          channel_major: bool = False,
                          tiled_runtable: bool = True,
                          rt_bg: int = 8, rt_fg: int = 7):
    """The full batched contamination-detection device program.

    Args:
      images: uint8 [N, H, W, 3] (BGR) or [N, H, W] grayscale.
      contrast_threshold: int32 scalar — adaptiveThreshold C.
      min_size / max_size: float32 scalars — contourArea gates.
      min_confidence: float32 scalar.
      max_blobs: blob-table capacity (static).
      use_color: include the color term (static).
      formula: "python" (0.5/0.2/0.3) or "native" (0.7/0.3) — the reference
        has both variants (contamination_detector.py:160 vs detection.rs:294).
      return_labels: also return the int32 label image (for host contour
        synthesis); off on the throughput path to avoid the D2H.
      tiled_band: when > 0, hole filling and CCL run as Pallas band-local
        kernels of this many rows plus an interface merge (ops/ccl_tiled.py)
        instead of whole-frame XLA scans — the fast path for frames beyond
        the fused kernels' VMEM cap (e.g. the reference's 1920x1080
        cameras).  Label output is identical (tests/test_ccl_tiled.py).
      channel_major: images is [N, 3, H, W] — the production feeder layout
        (camera stacks deliver planes).  The tiled path consumes planes
        natively (no relayout in the program); other paths transpose back.
      rt_bg / rt_fg: run-table widths for the table-global tiled path
        (max background / filled-foreground runs per row before the
        BATCH falls back to the banded composition — always exact,
        just slower).  v5e B=256 sweep: (10,8) 1292.6 / (9,8) 1299.9 /
        (8,7) 1305.1 fps; the default ships the measured optimum —
        raise for denser scenes where batch-wide fallback would cost
        more than the wider tables.

    Returns (table: BlobTable, confidence: [N,K] f32, accepted: [N,K] bool
             [, labels]).
    """
    if channel_major:
        if images.ndim != 4 or images.shape[1] != 3:
            raise ValueError(
                f"channel_major expects [N, 3, H, W], got {images.shape}")
        if tiled_band <= 0:
            # only the tiled path consumes planes natively; the XLA op
            # chain (CPU correctness path) works on NHWC
            images = jnp.transpose(images, (0, 2, 3, 1))
            channel_major = False
    is_color = (images.ndim == 4
                and images.shape[1 if channel_major else -1] == 3)
    color = images if is_color else None
    interp = jax.default_backend() == "cpu"
    if tiled_band > 0 and color is not None:
        # fused banded preprocess kernel (bit-identical to the op chain
        # below — tests/test_preprocess_tiled.py)
        from heimdall_tpu.ops.preprocess_tiled import (
            contamination_preprocess_tiled)
        # preprocess bands are cheaper at 128 rows (measured on v5e);
        # independent of the CCL band size.  The whole tiled stack shares
        # ONE padded channel-major layout: every per-stage pad / unpad /
        # relayout of a 2MP plane costs 30-100 us/frame of HBM traffic
        # (measured r3), so the planes are transposed and band-padded
        # exactly once and every stage runs padded (frame_h contract).
        band = min(tiled_band, 128)
        cm = images if channel_major else jnp.transpose(images,
                                                        (0, 3, 1, 2))
        H = cm.shape[2]
        Hp = -(-H // band) * band
        # flood_seed: the preprocess kernel also emits the OR-flood's
        # initial state, so fill_holes_tiled's XLA seeding prologue
        # (bg/border/ext0 planes + strided edge slices) never runs.
        # The table-global path (tiled_runtable) derives its seeds from
        # the run tables instead, so it skips the emission.
        if tiled_runtable:
            # the preprocess band is independent of the CCL band as long
            # as both divide the shared padded height: 3*band//2 (192
            # over the 128 layout) amortizes the 32-row stencil halo
            # better (v5e: 226.0 vs 232.9 us/frame at 2 MP), and the
            # kernel also emits the bg RUN TABLES (per-row extraction is
            # banding-independent), removing the separate extraction
            # kernel and its reload of binary
            Hp_ = -(-H // band) * band
            pre_band = (3 * band // 2
                        if Hp_ % max(3 * band // 2, 1) == 0 else band)
            binary, gray, runid_bg, S_bg, E_bg, nrun_bg = (
                contamination_preprocess_tiled(
                    cm, contrast_threshold, band=pre_band,
                    interpret=interp, channel_major=True, padded_out=True,
                    bg_tables=rt_bg))
            flood_seed = None
        else:
            binary, gray, ext0, edges0 = contamination_preprocess_tiled(
                cm, contrast_threshold, band=band, interpret=interp,
                channel_major=True, padded_out=True, flood_seed=True)
            flood_seed = (ext0, edges0)
        if Hp != H:
            cm = jnp.pad(cm, [(0, 0), (0, 0), (0, Hp - H), (0, 0)])
        color = cm
    else:
        if channel_major:
            raise ValueError("channel_major requires the tiled color path")
        gray = ops.bgr_to_gray(images)
        blurred = ops.gaussian_blur(gray, 5, 0)
        binary = ops.adaptive_threshold(
            blurred, 255, "gaussian", "binary_inv", 11, contrast_threshold)
        se3 = np.ones((3, 3), np.uint8)
        binary = ops.morphology_ex(binary, "open", se3)
        binary = ops.morphology_ex(binary, "close", se3)
    # Hole filling reproduces findContours(RETR_EXTERNAL)+drawContours(filled)
    # semantics: ring-shaped responses (large uniform dark spots only fire at
    # their rim under adaptive thresholding) gate and measure as full discs,
    # exactly as the reference's contour-based path does.
    root_table = root_count = None
    if tiled_band > 0:
        from heimdall_tpu.ops import ccl_tiled
        # adaptive mode: 2 initial sweeps + fixpoint-checked continuation,
        # exact for any geometry.  Production scenes converge immediately,
        # so this runs ~1/3 the sweep cost of the old fixed 6.
        # 128-row bands measured faster than 256 for the flood and the
        # CCL on v5e (shorter scans, faster per-band convergence); the
        # stats kernels must share the CCL band for the slot tables
        band = min(tiled_band, 128)
        # the color branch above produced band-padded planes: run every
        # stage padded (frame_h contract) — zero per-stage pad/unpad
        fh = H if color is not None else None
        if color is not None and tiled_runtable:
            # table-global fill + CCL (ops/runtable_tiled.py): run tables
            # across bands — no flood driver rounds, no interface merge
            from heimdall_tpu.ops.runtable_tiled import (
                fill_label_runtable_tiled)
            (mask, labels, root_table, root_count, slot_list,
             slot_count) = fill_label_runtable_tiled(
                binary, band=band, frame_h=H, max_blobs=max_blobs,
                r_bg=rt_bg, r_fg=rt_fg, interpret=interp,
                pre_extracted=(runid_bg, S_bg, E_bg, nrun_bg))
        else:
            if color is not None:
                mask = ccl_tiled.fill_holes_tiled(
                    binary, band=band, sweeps=2, adaptive=True,
                    interpret=interp, frame_h=fh, seed=flood_seed)
            else:
                mask = ccl_tiled.fill_holes_tiled(
                    binary > 0, band=band, sweeps=2, adaptive=True,
                    interpret=interp, frame_h=fh)
            labels, root_table, root_count, slot_list, slot_count = (
                ccl_tiled.connected_components_tiled(
                    mask, connectivity=8, band=band, sweeps=2,
                    adaptive=True, interpret=interp,
                    return_roots=max_blobs, band_slots=True, frame_h=fh))
        from heimdall_tpu.ops.stats_tiled import blob_stats_tiled
        # stats_band coarsening helped the cct incidence lists (r4:
        # 0.476 -> 0.348 ms standalone) but LOSES against the table
        # path's in-kernel per-band presence (v5e: 140.5 us/frame at
        # the native 128 band vs 150.5 coarsened to 384) — coarsen only
        # on the banded fallback path
        sb = band if (color is not None and tiled_runtable) else 3 * band
        table = blob_stats_tiled(labels, mask, gray, color, band=band,
                                 max_blobs=max_blobs, use_color=use_color,
                                 root_table=root_table,
                                 root_count=root_count,
                                 slot_list=slot_list,
                                 slot_count=slot_count, interpret=interp,
                                 frame_h=fh,
                                 channel_major=color is not None,
                                 stats_band=sb)
        if fh is not None and return_labels:
            labels = labels[:, :H]
    else:
        mask = ops.ccl.fill_holes(binary > 0, sweeps=ccl_sweeps)
        labels = ops.connected_components(mask, connectivity=8,
                                          sweeps=ccl_sweeps)
        table = blobs_mod.blob_stats(labels, mask, gray, color,
                                     max_blobs=max_blobs,
                                     use_color=use_color)
    if formula == "native":
        conf = blobs_mod.confidence_native(table)
    else:
        conf = blobs_mod.confidence_python(table)
    size_ok = ((table.area >= min_size) & (table.area <= max_size)
               & table.valid & (table.area_px > 0))
    accepted = size_ok & (conf >= min_confidence)
    if return_labels:
        return table, conf, accepted, labels
    return table, conf, accepted


@jax.jit
def _verdict_reduce(conf, accepted):
    """[N,K] confidence + accepted mask -> per-frame (reject?, max conf)."""
    return (jnp.any(accepted, axis=1),
            jnp.max(jnp.where(accepted, conf, 0.0), axis=1))


class ContaminationDetector(DefectDetector):
    """Drop-in API-parity contamination detector, device-batched.

    Defaults match the reference (contamination_detector.py:26-38):
    min 10 / max 3000 / contrast 15 / confidence 0.25 / use_color True.
    """

    def __init__(self, name: str = "contamination_detector",
                 config: Dict[str, Any] = None):
        super().__init__(name, config)
        self.min_contaminant_size = self.config.get("min_contaminant_size", 10)
        self.max_contaminant_size = self.config.get("max_contaminant_size", 3000)
        self.contrast_threshold = self.config.get("contrast_threshold", 15)
        self.min_confidence = self.config.get("min_confidence", 0.25)
        self.use_color = self.config.get("use_color", True)
        self.max_blobs = self.config.get("max_blobs", 64)
        self.formula = self.config.get("confidence_formula", "python")
        self.include_contours = self.config.get("include_contours", True)
        # exact_geometry replaces the device approximations (Pick's-theorem
        # area, pixel centroid) with bit-exact polygon geometry traced
        # host-side, and re-applies gates with it.  "auto" (default) traces
        # accepted blobs (whose boundary the contour metadata needs anyway)
        # plus any blob within ±2 px² / ±0.02 conf of a gate boundary —
        # reference-exact output at ~zero extra host cost.  True forces the
        # trace for every valid blob; False keeps raw device values.
        self.exact_geometry = self.config.get("exact_geometry", "auto")
        # Propagation sweeps for the whole-frame XLA path (0 = loop to
        # fixpoint — the default: a fixed budget is a correctness hazard.
        # TPU measurement found bench-scene frames where 6 sweeps split one
        # component in two; only fixpoint modes are exact for every
        # geometry).  Set > 0 only to pin a known-sufficient budget.
        self.ccl_sweeps = self.config.get("ccl_sweeps", 0)
        # Adaptive fixpoint loops inside the fused Pallas kernels: exact
        # for any geometry and ~2x faster than the old fixed 6 sweeps on
        # the bench scene (the loop exits as soon as a cheap neighbor-min
        # check certifies convergence).
        self.ccl_adaptive = self.config.get("ccl_adaptive", True)
        # Truncated scan ladders inside the fused adaptive kernels: each
        # CCL phase propagates labels <= 2^5 = 32 columns instead of
        # run-wide.  Results are IDENTICAL (the in-kernel fixpoint
        # certificate keeps sweeping until converged — measured equal on
        # the bench scene); typical scenes trade a rare extra sweep for
        # fewer shift/min ops in every phase.  r3 variant sweep on v5e
        # (whole label kernel, us/frame): ss6 142.4, ss5 135.0, ss4 134.9
        # with the 3-phase adaptive unit — 5 keeps an extra doubling of
        # reach for ~nothing.  None = full-width scans; ignored when
        # ccl_adaptive is off (no certificate to lean on).
        scan_steps = self.config.get("ccl_scan_steps", 5)
        if scan_steps is not None and scan_steps < 1:
            # 0/negative would truncate every scan ladder to nothing,
            # leaving only 1-px neighbor-min propagation — still correct
            # under the fixpoint certificate but orders of magnitude more
            # sweeps.  None (full-width scans) is the supported "off".
            raise ValueError(
                f"ccl_scan_steps must be None or >= 1, got {scan_steps}")
        self.ccl_scan_steps = scan_steps
        # Run-table propagation (r5): hole filling and CCL iterate over
        # per-row RUN tables ([Rmax, H], thousands of elements) instead
        # of pixel planes when every row fits Rmax runs (per-frame
        # certified fallback to the plane sweeps otherwise).  v5e full
        # detect @256 by (rt_ccl, rt_fill): (8,12) 105.5 / (6,12) 97.5 /
        # (8,10) 99.0 / (6,10) 96.1 / (5,10) 95.2 us/frame — ship (6,10):
        # 6 covers the densest plausible bench row (box edges + disc + 3
        # contaminants) where 5 would lean on the fallback.  0 disables.
        self.rt_ccl = self.config.get("rt_ccl", 6)
        self.rt_fill = self.config.get("rt_fill", 10)
        # Compute backend: "xla" composes the ops library (fast compiles,
        # runs anywhere); "pallas" uses the fused VMEM-resident kernels
        # (ops/pallas_kernels.py — ~4x faster steady-state on a v5e but
        # minutes of first-compile through the remote Mosaic toolchain, and
        # no label-image output, so contour metadata falls back to XLA).
        self.backend = self.config.get("backend", "xla")
        self.logger.info(
            "Detector %s initialized with min_size=%s, max_size=%s, "
            "threshold=%s", self.name, self.min_contaminant_size,
            self.max_contaminant_size, self.contrast_threshold)

    # -- device execution --------------------------------------------------
    def run_device(self, images, return_labels: bool = False,
                   channel_major: bool = False):
        """Run the jitted program on a [N, H, W, C] batch; returns device
        arrays without host sync (compose with other device work).

        channel_major=True marks the input as [N, 3, H, W] — the
        production feeder layout (camera stacks deliver planes, so
        channel-major assembly is free host-side and the fused kernel
        skips a ~0.9 MB/frame relayout per call)."""
        images = jnp.asarray(images)
        if channel_major and (images.ndim != 4
                              or images.shape[1] not in (1, 3)):
            raise ValueError(
                f"channel_major expects [N, 1|3, H, W], got {images.shape}")
        if images.dtype == jnp.uint16:
            # Mono10/12/16 cameras: use the high byte (the reference's
            # pipeline operates on 8-bit data throughout)
            images = (images >> 8).astype(jnp.uint8)
        # The fused kernels keep whole frames in VMEM; beyond ~0.5 MP the
        # working set exceeds the ~16 MB budget, so large frames (e.g. the
        # reference's 1920x1080 Mono8 cameras) switch to the band-tiled
        # Pallas CCL (ops/ccl_tiled.py) instead of whole-frame kernels.
        if images.ndim == 4:              # [B, H, W, C] / [B, 3, H, W]
            frame_px = (images.shape[-2] * images.shape[-1] if channel_major
                        else images.shape[-3] * images.shape[-2])
        elif images.ndim == 3:            # [B, H, W] grayscale
            frame_px = images.shape[-2] * images.shape[-1]
        else:
            frame_px = 0
        fits_vmem = 0 < frame_px <= 400_000
        pallas_shape = (images.ndim == 3            # Mono8
                        or (images.ndim == 4
                            and (images.shape[1] in (1, 3) if channel_major
                                 else images.shape[-1] == 3)))
        if (self.backend == "pallas" and not return_labels and fits_vmem
                and pallas_shape):
            from heimdall_tpu.ops.pallas_kernels import (
                contamination_pallas_detect)
            return contamination_pallas_detect(
                images, int(self.contrast_threshold),
                float(self.min_contaminant_size),
                float(self.max_contaminant_size),
                float(self.min_confidence),
                max_blobs=self.max_blobs, use_color=self.use_color,
                formula=self.formula,
                # ccl_sweeps=0 means "loop to fixpoint", which only the
                # adaptive kernels honor; with adaptive off an explicit
                # budget is required — fall back to 6 (the old fixed
                # known-sufficient default), never clamp 0 up to 1.
                sweeps=(self.ccl_sweeps if self.ccl_sweeps > 0
                        else (2 if self.ccl_adaptive else 6)),
                adaptive=self.ccl_adaptive,
                scan_steps=(self.ccl_scan_steps if self.ccl_adaptive
                            else None),
                channel_major=channel_major and images.ndim == 4,
                rt_ccl=self.rt_ccl, rt_fill=self.rt_fill)
        # On accelerator platforms this route ALWAYS uses the band-tiled
        # Pallas CCL, never the whole-frame XLA scans: the XLA scan
        # program MISCOMPILES on TPU once the label image gets big —
        # observed at [16,1080,1920] AND [32,480,640] (foreground pixels
        # lost; CPU XLA, cv2, and both Pallas paths all agree; reduction
        # ladder: scripts/repro_xla_ccl_miscompile.py).  Rather than
        # fencing the hazard with a size guard (round 1), no accelerator
        # code path reaches the miscompiling program shape at all — the
        # tiled path is also ~2x faster there, so this strictly
        # dominates.  CPU keeps the whole-frame XLA scans (correct, and
        # much faster than interpret-mode Pallas).
        on_accel = jax.default_backend() != "cpu"
        tiled_band = 256 if on_accel else 0
        cm_in = channel_major and images.ndim == 4
        if cm_in and images.shape[1] == 1:
            images = images[:, 0]                     # Mono8: [N, H, W]
            cm_in = False
        elif cm_in and not (tiled_band > 0 and images.shape[1] == 3):
            # only the tiled color path consumes planes natively
            images = jnp.transpose(images, (0, 2, 3, 1))
            cm_in = False
        return contamination_program(
            jnp.asarray(images),
            jnp.int32(int(self.contrast_threshold)),
            jnp.float32(self.min_contaminant_size),
            jnp.float32(self.max_contaminant_size),
            jnp.float32(self.min_confidence),
            max_blobs=self.max_blobs,
            use_color=self.use_color,
            formula=self.formula,
            return_labels=return_labels,
            ccl_sweeps=self.ccl_sweeps,
            tiled_band=tiled_band,
            channel_major=cm_in)

    def verdict_device(self, images):
        """Verdict-shaped device path for production lines: per-frame
        reject flag (any accepted blob) and max accepted confidence,
        reduced ON DEVICE so the host fetches two [N] vectors instead of
        blob tables or label images.  The reference's per-bottle
        accept/reject decision (system.py:152-160 rejection hook driven by
        detector output) needs nothing more; full tables stay available
        via run_device/detect_batch for accepted bottles."""
        _, conf, accepted = self.run_device(images)
        return _verdict_reduce(conf, accepted)

    # -- host API ----------------------------------------------------------
    def detect(self, image: np.ndarray,
               context: Dict[str, Any] = None) -> List[Defect]:
        """Single-image reference-compatible API."""
        return self.detect_batch(np.asarray(image)[None], context)[0]

    def detect_batch(self, images: np.ndarray,
                     context: Dict[str, Any] = None) -> List[List[Defect]]:
        """Batched detection: one device program for the whole batch."""
        images = np.asarray(images)
        want_contours = (self.include_contours or self.exact_geometry) and (
            context is None or context.get("include_contours", True))
        out = self.run_device(images, return_labels=want_contours)
        if want_contours:
            table, conf, accepted, labels = out
            labels_np = np.asarray(labels)
        else:
            table, conf, accepted = out
            labels_np = None
        return self._table_to_defects(
            jax.device_get(table), np.asarray(conf), np.asarray(accepted),
            labels_np)

    def _candidate_slots(self, i, table, conf, accepted, valid):
        """Blob slots worth host-side work for frame i under "auto" exact
        geometry: everything accepted, plus any valid blob whose device
        area/confidence sits within the approximation margin of a gate
        boundary (Pick's-theorem area deviates ≤ ~1 px² on self-touching
        outlines; shape-score knock-on ≤ ~0.02 conf) — those can flip
        accept/reject once re-measured exactly."""
        area = np.asarray(table.area[i], np.float64)
        near_size = np.minimum(np.abs(area - self.min_contaminant_size),
                               np.abs(area - self.max_contaminant_size)) <= 2
        in_size_loose = ((area >= self.min_contaminant_size - 2)
                         & (area <= self.max_contaminant_size + 2))
        near_conf = np.abs(np.asarray(conf[i], np.float64)
                           - self.min_confidence) <= 0.02
        boundary = valid[i] & in_size_loose & (near_size | near_conf)
        return np.nonzero(accepted[i] | boundary)[0]

    def _table_to_defects(self, table, conf, accepted,
                          labels: Optional[np.ndarray]) -> List[List[Defect]]:
        mode = self.exact_geometry
        exact = mode and labels is not None     # True or "auto"
        results: List[List[Defect]] = []
        n = accepted.shape[0]
        valid = np.asarray(table.valid)
        accepted = np.asarray(accepted)
        for i in range(n):
            defects: List[Defect] = []
            # Exact modes re-gate with the bit-exact polygon area (a
            # Pick's-theorem blob within 1 px² of a gate boundary can flip
            # accept/reject versus the reference): True over every valid
            # blob, "auto" only over accepted + gate-boundary blobs.
            if not exact:
                candidates = np.nonzero(accepted[i])[0]
            elif mode == "auto":
                candidates = self._candidate_slots(i, table, conf, accepted,
                                                   valid)
            else:
                candidates = np.nonzero(valid[i])[0]
            for k in candidates:
                bbox = (int(table.x[i][k]), int(table.y[i][k]),
                        int(table.w[i][k]), int(table.h[i][k]))
                position = (int(table.cx[i][k]), int(table.cy[i][k]))
                area = float(table.area[i][k])
                confidence = float(conf[i][k])
                shape_score = float(table.shape_score[i][k])
                pts = None
                if exact:
                    from heimdall_tpu.core.pipeline import _label_of_blob
                    geom = contours_mod.exact_blob_geometry(
                        labels[i], _label_of_blob(labels[i], bbox), bbox)
                    area = geom["area"]
                    position = geom["position"]
                    pts = geom["contour"]
                    if not (self.min_contaminant_size <= area
                            <= self.max_contaminant_size):
                        continue
                    rect_area = bbox[2] * bbox[3]
                    shape_score = 1.0 - (area / rect_area
                                         if rect_area > 0 else 0.0)
                    if self.formula == "native":
                        confidence = (0.7 * float(
                            table.intensity_score[i][k])
                            + 0.3 * shape_score)
                    else:
                        confidence = (0.5 * float(
                            table.intensity_score[i][k])
                            + 0.2 * shape_score
                            + 0.3 * float(table.color_score[i][k]))
                    if confidence < self.min_confidence:
                        continue
                metadata: Dict[str, Any] = {
                    "intensity_diff": float(table.intensity_diff[i][k]),
                    "shape_score": shape_score,
                    "color_score": float(table.color_score[i][k]),
                    "bounding_box": bbox,
                }
                if labels is not None and self.include_contours:
                    if pts is None:
                        from heimdall_tpu.core.pipeline import _label_of_blob
                        pts = contours_mod.blob_contour(
                            labels[i], _label_of_blob(labels[i], bbox), bbox)
                    metadata["contour"] = pts.tolist()
                defects.append(Defect(
                    defect_type="contamination",
                    position=position,
                    size=area,
                    confidence=confidence,
                    metadata=metadata))
            results.append(defects)
        return results

    # -- visualization (parity with contamination_detector.py:218-289) -----
    def visualize(self, image: np.ndarray,
                  defects: List[Defect]) -> np.ndarray:
        from heimdall_tpu.utils import draw
        if image.ndim == 2:
            viz = np.stack([image] * 3, axis=-1)
        else:
            viz = image.copy()
        for defect in defects:
            if defect.defect_type != "contamination":
                continue
            green = int(255 * (1 - defect.confidence))
            red = int(255 * defect.confidence)
            color = (0, green, red)  # BGR
            if "bounding_box" in defect.metadata:
                x, y, w, h = defect.metadata["bounding_box"]
                draw.rect_outline(viz, (x, y), (x + w, y + h), color, 2)
                if "contour" in defect.metadata:
                    pts = np.asarray(defect.metadata["contour"],
                                     np.int32).reshape(-1, 2)
                    draw.polylines(viz, [tuple(p) for p in pts], color, 2)
                draw.put_text(viz, f"{defect.confidence:.2f}", (x, y - 5),
                              color, 1)
            else:
                radius = int(np.sqrt(max(defect.size, 0) / np.pi))
                draw.circle_outline(viz, defect.position, radius, color, 2)
        return viz
