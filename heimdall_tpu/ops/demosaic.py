"""Bayer demosaicing and YUV conversion on device.

The reference converts Bayer/YUV camera formats host-side with OpenCV
(rust/heimdall-camera/src/lib.rs:202-257 to_opencv_mat).  Here the raw
mosaic goes straight to the device and demosaics as part of the batched
preprocess — bilinear interpolation is a pair of small stencils, which XLA
fuses into the pipeline for free, and the host never touches 3x-expanded
color data.

Patterns follow the OpenCV naming convention (which denotes the 2x2 cell
such that "BayerRG" has B at (0,0) — verified against cv2.cvtColor in
tests/test_runtime_extras.py): rg → R at (1,1), bg → R at (0,0),
gr → R at (1,0), gb → R at (0,1).
"""

from functools import partial

import jax
import jax.numpy as jnp


def _avg_cross(x):
    """Mean of the 4-neighbours (replicate border)."""
    p = jnp.pad(x, [(0, 0)] * (x.ndim - 2) + [(1, 1), (1, 1)], mode="edge")
    H, W = x.shape[-2], x.shape[-1]
    s = (p[..., :-2, 1:-1] + p[..., 2:, 1:-1]
         + p[..., 1:-1, :-2] + p[..., 1:-1, 2:])
    return s * 0.25


def _avg_diag(x):
    p = jnp.pad(x, [(0, 0)] * (x.ndim - 2) + [(1, 1), (1, 1)], mode="edge")
    s = (p[..., :-2, :-2] + p[..., :-2, 2:]
         + p[..., 2:, :-2] + p[..., 2:, 2:])
    return s * 0.25


def _avg_h(x):
    p = jnp.pad(x, [(0, 0)] * (x.ndim - 2) + [(0, 0), (1, 1)], mode="edge")
    return (p[..., :, :-2] + p[..., :, 2:]) * 0.5


def _avg_v(x):
    p = jnp.pad(x, [(0, 0)] * (x.ndim - 2) + [(1, 1), (0, 0)], mode="edge")
    return (p[..., :-2, :] + p[..., 2:, :]) * 0.5


_PATTERNS = {
    # (row offset, col offset) of the R sample within each 2x2 cell,
    # keyed by the OpenCV constant name (COLOR_Bayer<XY>2BGR)
    "rg": (1, 1),
    "gr": (1, 0),
    "gb": (0, 1),
    "bg": (0, 0),
}


@partial(jax.jit, static_argnames=("pattern",))
def demosaic_bilinear(raw: jnp.ndarray, pattern: str = "rg") -> jnp.ndarray:
    """Bilinear demosaic: [..., H, W] uint8 mosaic → [..., H, W, 3] BGR."""
    if pattern not in _PATTERNS:
        raise ValueError(f"unknown Bayer pattern: {pattern}")
    ry, rx = _PATTERNS[pattern]
    H, W = raw.shape[-2], raw.shape[-1]
    x = raw.astype(jnp.float32)

    yy = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)
    xx = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
    r_mask = ((yy % 2) == ry) & ((xx % 2) == rx)
    b_mask = ((yy % 2) == 1 - ry) & ((xx % 2) == 1 - rx)
    g_mask = ~(r_mask | b_mask)

    # Red plane: at R sites the sample; at G sites the h/v average along
    # the R row/column; at B sites the diagonal average.
    r_s = jnp.where(r_mask, x, 0.0)
    g_s = jnp.where(g_mask, x, 0.0)
    b_s = jnp.where(b_mask, x, 0.0)

    # sparse-aware averages: sum of neighbours / count of contributing
    # sites — implemented by averaging the indicator alongside the values.
    def sparse(avg, vals, mask):
        num = avg(vals)
        den = avg(mask.astype(jnp.float32))
        return num / jnp.maximum(den, 1e-6)

    red = jnp.where(
        r_mask, x,
        jnp.where(g_mask,
                  sparse(lambda v: (_avg_h(v) + _avg_v(v)),
                         r_s, r_mask),
                  sparse(_avg_diag, r_s, r_mask)))
    blue = jnp.where(
        b_mask, x,
        jnp.where(g_mask,
                  sparse(lambda v: (_avg_h(v) + _avg_v(v)),
                         b_s, b_mask),
                  sparse(_avg_diag, b_s, b_mask)))
    green = jnp.where(g_mask, x, sparse(_avg_cross, g_s, g_mask))

    bgr = jnp.stack([blue, green, red], axis=-1)
    return jnp.clip(jnp.rint(bgr), 0, 255).astype(jnp.uint8)


@jax.jit
def yuv422_to_bgr(yuv: jnp.ndarray) -> jnp.ndarray:
    """YUV422 (YUYV interleaved) [..., H, W*2] uint8 → [..., H, W, 3] BGR.

    BT.601 full-range conversion, matching OpenCV's COLOR_YUV2BGR_YUYV
    within rounding.
    """
    y = yuv[..., 0::2].astype(jnp.float32)
    u = yuv[..., 1::4].astype(jnp.float32) - 128.0
    v = yuv[..., 3::4].astype(jnp.float32) - 128.0
    # upsample chroma horizontally (each U/V covers 2 Y samples)
    u = jnp.repeat(u, 2, axis=-1)[..., :y.shape[-1]]
    v = jnp.repeat(v, 2, axis=-1)[..., :y.shape[-1]]
    r = y + 1.403 * v
    g = y - 0.344 * u - 0.714 * v
    b = y + 1.773 * u
    bgr = jnp.stack([b, g, r], axis=-1)
    return jnp.clip(jnp.rint(bgr), 0, 255).astype(jnp.uint8)
