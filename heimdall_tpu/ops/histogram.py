"""Histogram equalization and CLAHE with OpenCV parity.

Reference behavior: heimdall/core/pipeline.py:506-531
(HistogramEqualizationStage: global cv2.equalizeHist or cv2.createCLAHE
with clip_limit / tile grid).

Both are built on batched 256-bin histograms computed with a compare+reduce
(TPU-friendly — no scatters).  equalizeHist replicates OpenCV's LUT
construction exactly (skip-first-nonzero-bin scaling, round-half-to-even).
CLAHE replicates OpenCV's tiling (reflect-101 extension to a multiple of the
grid), histogram clipping with uniform + stepped residual redistribution,
and bilinear LUT interpolation.
"""

import jax.numpy as jnp

from heimdall_tpu.ops.threshold import histogram256


def _apply_lut(image: jnp.ndarray, lut: jnp.ndarray) -> jnp.ndarray:
    """Apply per-image LUTs: image [..., H, W] uint8, lut [..., 256]."""
    flat = image.reshape(image.shape[:-2] + (-1,)).astype(jnp.int32)
    out = jnp.take_along_axis(lut, flat, axis=-1)
    return out.reshape(image.shape).astype(jnp.uint8)


def equalize_hist(image: jnp.ndarray) -> jnp.ndarray:
    """cv2.equalizeHist parity (batched over leading dims)."""
    hist = histogram256(image)                              # [..., 256]
    total = image.shape[-1] * image.shape[-2]
    idx = jnp.arange(256, dtype=jnp.int32)
    present = hist > 0
    first = jnp.argmax(present, axis=-1)                    # first non-zero bin
    h_first = jnp.take_along_axis(hist, first[..., None], axis=-1)  # [..., 1]
    scale = 255.0 / jnp.maximum(total - h_first, 1).astype(jnp.float32)
    csum = jnp.cumsum(hist, axis=-1)
    c_first = jnp.take_along_axis(csum, first[..., None], axis=-1)
    part = (csum - c_first).astype(jnp.float32)
    lut = jnp.clip(jnp.rint(part * scale), 0, 255).astype(jnp.int32)
    lut = jnp.where(idx <= first[..., None], 0, lut)
    # Degenerate constant image: cv2 returns the image unchanged.
    degenerate = (h_first[..., 0] == total)
    lut = jnp.where(degenerate[..., None], idx, lut)
    return _apply_lut(image, lut)


def _reflect101_extend(image: jnp.ndarray, pad_bottom: int,
                       pad_right: int) -> jnp.ndarray:
    """Extend bottom/right with BORDER_REFLECT_101, allowing pads that
    exceed the source size (cv2's copyMakeBorder keeps bouncing; jnp.pad
    caps at size-1, so build constant index vectors instead)."""
    import numpy as np

    def tri(n, padded):
        if n == 1:
            return np.zeros(padded, np.int32)
        period = 2 * (n - 1)
        j = np.arange(padded, dtype=np.int32) % period
        return np.where(j >= n, period - j, j).astype(np.int32)

    H, W = image.shape[-2], image.shape[-1]
    out = image
    if pad_bottom:
        out = jnp.take(out, jnp.asarray(tri(H, H + pad_bottom)), axis=-2)
    if pad_right:
        out = jnp.take(out, jnp.asarray(tri(W, W + pad_right)), axis=-1)
    return out


def clahe(image: jnp.ndarray, clip_limit: float = 2.0,
          tile_grid: int = 8) -> jnp.ndarray:
    """cv2.createCLAHE(clipLimit, (tile_grid, tile_grid)).apply parity.

    Bit-exact vs cv2 5.x (tests/test_ops_parity.py asserts equality),
    including OpenCV's padding quirk: when EITHER dimension is not a
    multiple of the grid, BOTH are reflect-101 extended by
    ``G - (dim % G)`` — a full extra tile row/column on the dimension that
    WAS divisible (clahe.cpp pads unconditionally in the else branch).
    Per-tile clipped histograms (uniform + stepped residual redistribution)
    build per-tile uint8 LUTs, and each output pixel bilinearly
    interpolates the 4 surrounding tile LUTs with OpenCV's
    ``x * (1/tileW) - 0.5`` convention.
    """
    H, W = image.shape[-2], image.shape[-1]
    G = tile_grid
    if H % G == 0 and W % G == 0:
        img = image
    else:
        pb = G - (H % G)
        pr = G - (W % G)
        img = _reflect101_extend(image, pb, pr)
    Hp, Wp = img.shape[-2], img.shape[-1]
    th, tw = Hp // G, Wp // G

    batch = img.shape[:-2]
    tiles = img.reshape(batch + (G, th, G, tw))
    tiles = jnp.swapaxes(tiles, -3, -2)                     # [..., G, G, th, tw]
    hist = histogram256(tiles).astype(jnp.float32)          # [..., G, G, 256]

    tile_area = th * tw
    if clip_limit > 0:
        limit = max(int(clip_limit * tile_area / 256), 1)
        clipped = jnp.minimum(hist, limit)
        excess = (hist - clipped).sum(axis=-1, keepdims=True)
        redist = jnp.floor(excess / 256.0)
        residual = (excess - redist * 256.0)
        # OpenCV distributes the residual to every step-th bin.
        step = jnp.maximum(jnp.floor(256.0 / jnp.maximum(residual, 1.0)), 1.0)
        idx = jnp.arange(256, dtype=jnp.float32)
        gets_one = (jnp.floor_divide(idx, step) * step == idx) & \
                   (idx < residual * step)
        hist = clipped + redist + gets_one.astype(jnp.float32)

    scale = 255.0 / tile_area
    csum = jnp.cumsum(hist, axis=-1)
    luts = jnp.clip(jnp.rint(csum * scale), 0, 255).astype(jnp.float32)

    # Bilinear interpolation of tile LUT outputs at every pixel.  OpenCV's
    # convention (clahe.cpp interpolation body): txf = x * (1/tileW) - 0.5
    # — a reciprocal MULTIPLY in float32, no pixel-center +0.5 — and the
    # fraction keeps the UNCLAMPED floor (at the edges both tile indices
    # clamp to the same tile, so the out-of-range fraction never shows).
    ys = jnp.arange(Hp, dtype=jnp.float32)
    xs = jnp.arange(Wp, dtype=jnp.float32)
    ty = ys * jnp.float32(1.0 / th) - 0.5
    tx = xs * jnp.float32(1.0 / tw) - 0.5
    yf = jnp.floor(ty)
    xf = jnp.floor(tx)
    fy = (ty - yf)[:, None]                                 # [Hp, 1]
    fx = (tx - xf)[None, :]                                 # [1, Wp]
    y0 = jnp.clip(yf, 0, G - 1).astype(jnp.int32)
    x0 = jnp.clip(xf, 0, G - 1).astype(jnp.int32)
    y1 = jnp.clip(yf + 1, 0, G - 1).astype(jnp.int32)
    x1 = jnp.clip(xf + 1, 0, G - 1).astype(jnp.int32)

    pix = img.astype(jnp.int32)                             # [..., Hp, Wp]

    # Memory-lean gather: flatten tile grid, index per pixel.
    luts_flat = luts.reshape(batch + (G * G, 256))
    gy0 = jnp.broadcast_to(y0[:, None], (Hp, Wp))
    gx0 = jnp.broadcast_to(x0[None, :], (Hp, Wp))
    gy1 = jnp.broadcast_to(y1[:, None], (Hp, Wp))
    gx1 = jnp.broadcast_to(x1[None, :], (Hp, Wp))

    def sample(gy, gx):
        tile_idx = gy * G + gx                              # [Hp, Wp]
        flat_idx = tile_idx * 256 + pix                     # [..., Hp, Wp]
        src = luts_flat.reshape(batch + (G * G * 256,))
        return jnp.take_along_axis(
            src.reshape(batch + (-1,)),
            flat_idx.reshape(batch + (-1,)), axis=-1).reshape(pix.shape)

    v00 = sample(gy0, gx0)
    v01 = sample(gy0, gx1)
    v10 = sample(gy1, gx0)
    v11 = sample(gy1, gx1)
    top = v00 * (1 - fx) + v01 * fx
    bot = v10 * (1 - fx) + v11 * fx
    out = top * (1 - fy) + bot * fy
    out = jnp.clip(jnp.rint(out), 0, 255).astype(jnp.uint8)
    return out[..., :H, :W]
