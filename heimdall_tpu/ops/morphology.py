"""Morphological operations with OpenCV parity.

Reference behavior: heimdall/core/pipeline.py:290-332 (MorphologyStage:
open/close, rect/ellipse/cross kernels, iterations) and
heimdall/detectors/contamination_detector.py:81-87 (OPEN then CLOSE, 3x3
rect).

Erode/dilate are min/max over the structuring-element offsets — on TPU this
lowers to fused VPU select chains (separable row/column min-max for rect
kernels).  OpenCV's default border semantics are replicated: erosion pads
with +inf (255) and dilation with -inf (0), so borders never win the
reduction (verified bit-exact in tests/test_ops_parity.py).
"""

import numpy as np
import jax
import jax.numpy as jnp

MORPH_ERODE = "erode"
MORPH_DILATE = "dilate"
MORPH_OPEN = "open"
MORPH_CLOSE = "close"
MORPH_GRADIENT = "gradient"
MORPH_TOPHAT = "tophat"
MORPH_BLACKHAT = "blackhat"


def structuring_element(shape: str, ksize: int) -> np.ndarray:
    """Replicates cv2.getStructuringElement (rect / ellipse / cross)."""
    if shape == "rect":
        return np.ones((ksize, ksize), np.uint8)
    if shape == "cross":
        se = np.zeros((ksize, ksize), np.uint8)
        c = ksize // 2
        se[c, :] = 1
        se[:, c] = 1
        return se
    if shape == "ellipse":
        se = np.zeros((ksize, ksize), np.uint8)
        r = (ksize - 1) // 2
        c = (ksize - 1) // 2
        inv_r2 = 1.0 / (r * r) if r else 0.0
        for i in range(ksize):
            dy = i - r
            if abs(dy) <= r:
                dx = int(np.rint(c * np.sqrt(max(r * r - dy * dy, 0) * inv_r2)))
                j1, j2 = max(c - dx, 0), min(c + dx + 1, ksize)
                se[i, j1:j2] = 1
        return se
    raise ValueError(f"unknown structuring element shape: {shape}")


def _se_offsets(se: np.ndarray):
    """(di, dj) offsets of active SE cells relative to the anchor (centre)."""
    kh, kw = se.shape
    ah, aw = kh // 2, kw // 2
    return [(i - ah, j - aw) for i in range(kh) for j in range(kw) if se[i, j]]


def _minmax_filter(x: jnp.ndarray, se: np.ndarray, is_min: bool) -> jnp.ndarray:
    H, W = x.shape[-2], x.shape[-1]
    kh, kw = se.shape
    rh, rw = kh // 2, kw // 2
    pad_val = 255 if is_min else 0
    pad = [(0, 0)] * (x.ndim - 2) + [(rh, rh), (rw, rw)]
    xp = jnp.pad(x, pad, mode="constant", constant_values=pad_val)
    op = jnp.minimum if is_min else jnp.maximum

    if se.all():  # rect kernel: separable row/col pass
        tmp = jax.lax.slice_in_dim(xp, 0, H + 2 * rh, axis=-2)
        tmp = jax.lax.slice_in_dim(tmp, 0, W, axis=-1)
        for j in range(1, kw):
            tmp = op(tmp, jax.lax.slice_in_dim(
                jax.lax.slice_in_dim(xp, 0, H + 2 * rh, axis=-2),
                j, j + W, axis=-1))
        out = jax.lax.slice_in_dim(tmp, 0, H, axis=-2)
        for i in range(1, kh):
            out = op(out, jax.lax.slice_in_dim(tmp, i, i + H, axis=-2))
        return out

    out = None
    for (di, dj) in _se_offsets(se):
        s = jax.lax.slice_in_dim(
            jax.lax.slice_in_dim(xp, rh + di, rh + di + H, axis=-2),
            rw + dj, rw + dj + W, axis=-1)
        out = s if out is None else op(out, s)
    return out


def _resolve_se(se) -> np.ndarray:
    if isinstance(se, np.ndarray):
        return se.astype(np.uint8)
    if isinstance(se, int):
        return structuring_element("rect", se)
    raise ValueError("se must be an ndarray or an int kernel size")


def erode(image: jnp.ndarray, se, iterations: int = 1) -> jnp.ndarray:
    se = _resolve_se(se)
    out = image
    for _ in range(iterations):
        out = _minmax_filter(out, se, is_min=True)
    return out


def dilate(image: jnp.ndarray, se, iterations: int = 1) -> jnp.ndarray:
    se = _resolve_se(se)
    out = image
    for _ in range(iterations):
        out = _minmax_filter(out, se, is_min=False)
    return out


def morphology_ex(image: jnp.ndarray, op: str, se,
                  iterations: int = 1) -> jnp.ndarray:
    """cv2.morphologyEx parity.

    Note OpenCV's iteration semantics for open/close: iterations=N means
    erode xN then dilate xN (not N repetitions of the compound op).
    """
    se = _resolve_se(se)
    if op == MORPH_ERODE:
        return erode(image, se, iterations)
    if op == MORPH_DILATE:
        return dilate(image, se, iterations)
    if op == MORPH_OPEN:
        return dilate(erode(image, se, iterations), se, iterations)
    if op == MORPH_CLOSE:
        return erode(dilate(image, se, iterations), se, iterations)
    if op == MORPH_GRADIENT:
        d = dilate(image, se, iterations).astype(jnp.int32)
        e = erode(image, se, iterations).astype(jnp.int32)
        return jnp.clip(d - e, 0, 255).astype(image.dtype)
    if op == MORPH_TOPHAT:
        o = morphology_ex(image, MORPH_OPEN, se, iterations).astype(jnp.int32)
        return jnp.clip(image.astype(jnp.int32) - o, 0, 255).astype(image.dtype)
    if op == MORPH_BLACKHAT:
        c = morphology_ex(image, MORPH_CLOSE, se, iterations).astype(jnp.int32)
        return jnp.clip(c - image.astype(jnp.int32), 0, 255).astype(image.dtype)
    raise ValueError(f"unknown morphology op: {op}")
