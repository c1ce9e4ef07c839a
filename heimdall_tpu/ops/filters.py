"""Smoothing and gradient filters with OpenCV numeric parity.

The reference applies cv2.GaussianBlur at the top of every pipeline
(reference: heimdall/core/pipeline.py:228-233 GaussianBlurStage,
heimdall/detectors/contamination_detector.py:66) and cv2.Canny for the
basic/sidewall pipelines (pipeline.py:246-259).

OpenCV's uint8 Gaussian path was reverse-engineered and verified bit-exact
(tests/test_ops_parity.py): the float64 kernel is quantized to Q8 fixed
point by cumulative (error-diffusion) rounding — see _q8_taps_bitexact —
the separable convolution accumulates in int32, and the final descale is
``(acc + 2**15) >> 16``.  Exact versus cv2.GaussianBlur for EVERY ksize
and sigma (default-sigma and explicit, probed through ksize 59); the
reference only ever uses 3, 5, and the adaptive-threshold block size 11,
so the large sizes are completeness beyond the reference's needs.

All ops take [..., H, W] (or [..., H, W, C] — filtered per channel) arrays
with any leading batch dims and are jit/vmap friendly.
"""

import math
import numpy as np
import jax
import jax.numpy as jnp

# cv2's hard-coded "bit-exact" small Gaussian kernels for sigma <= 0.
_SMALL_GAUSSIAN = {
    1: np.array([1.0]),
    3: np.array([0.25, 0.5, 0.25]),
    5: np.array([0.0625, 0.25, 0.375, 0.25, 0.0625]),
    7: np.array([0.03125, 0.109375, 0.21875, 0.28125, 0.21875, 0.109375, 0.03125]),
}

# Border-mode mapping: cv2 name -> jnp.pad mode.
_BORDERS = {
    "reflect101": "reflect",   # cv2.BORDER_REFLECT_101 (GaussianBlur default)
    "replicate": "edge",       # cv2.BORDER_REPLICATE  (adaptiveThreshold)
    "reflect": "symmetric",    # cv2.BORDER_REFLECT
    "constant": "constant",
}


def gaussian_kernel_1d(ksize: int, sigma: float = 0.0) -> np.ndarray:
    """Replicates cv2.getGaussianKernel (float64, host-side, trace-time)."""
    if sigma <= 0 and ksize in _SMALL_GAUSSIAN:
        return _SMALL_GAUSSIAN[ksize].copy()
    if sigma <= 0:
        sigma = 0.3 * ((ksize - 1) * 0.5 - 1) + 0.8
    scale2x = -0.5 / (sigma * sigma)
    c = (ksize - 1) * 0.5
    k = np.array([math.exp((i - c) * (i - c) * scale2x) for i in range(ksize)],
                 dtype=np.float64)
    return k / k.sum()


def _q8_taps(kernel: np.ndarray) -> list:
    """Quantize a normalized kernel to Q8 with centre-tap sum correction.

    This reproduces OpenCV's uint8 fixed-point filter path exactly.
    """
    ik = np.round(kernel * 256).astype(np.int64)
    ik[len(ik) // 2] += 256 - ik.sum()
    return [int(t) for t in ik]


def _pad2d(x: jnp.ndarray, r_h: int, r_w: int, border: str, value=0):
    pad = [(0, 0)] * (x.ndim - 2) + [(r_h, r_h), (r_w, r_w)]
    mode = _BORDERS.get(border, border)
    if mode == "constant":
        return jnp.pad(x, pad, mode="constant", constant_values=value)
    return jnp.pad(x, pad, mode=mode)


def _sep_conv_i32(x: jnp.ndarray, taps_h, taps_w, border: str) -> jnp.ndarray:
    """Separable integer convolution over the last two dims.

    x must be int32 [..., H, W]; returns the raw int32 accumulator
    (scaled by sum(taps_h) * sum(taps_w)).
    """
    rh, rw = len(taps_h) // 2, len(taps_w) // 2
    H, W = x.shape[-2], x.shape[-1]
    xp = _pad2d(x, rh, rw, border)
    tmp = taps_w[0] * jax.lax.slice_in_dim(xp, 0, W, axis=-1)
    for i in range(1, len(taps_w)):
        tmp = tmp + taps_w[i] * jax.lax.slice_in_dim(xp, i, i + W, axis=-1)
    out = taps_h[0] * jax.lax.slice_in_dim(tmp, 0, H, axis=-2)
    for i in range(1, len(taps_h)):
        out = out + taps_h[i] * jax.lax.slice_in_dim(tmp, i, i + H, axis=-2)
    return out


def _filter_channels(image, fn):
    """Apply a [..., H, W] filter to gray or channel-last color input."""
    if image.ndim >= 3 and image.shape[-1] in (1, 3, 4):
        moved = jnp.moveaxis(image, -1, 0)
        return jnp.moveaxis(fn(moved), 0, -1)
    return fn(image)


def gaussian_blur(image: jnp.ndarray, ksize: int, sigma: float = 0.0,
                  border: str = "reflect101") -> jnp.ndarray:
    """cv2.GaussianBlur parity for uint8 input (square kernel).

    Bit-exact versus OpenCV for the default-sigma kernels of ksize <= 11.
    Float inputs are convolved in float32 with the float64-derived kernel.
    """
    kernel = gaussian_kernel_1d(ksize, sigma)
    taps = _q8_taps_bitexact(kernel)
    def run(x):
        if x.dtype == jnp.uint8:
            # cv2's Q8 fixed-point path — bit-exact for EVERY ksize and
            # sigma (taps quantized host-side at the top of the function).
            acc = _sep_conv_i32(x.astype(jnp.int32), taps, taps, border)
            return jnp.clip((acc + (1 << 15)) >> 16, 0, 255).astype(jnp.uint8)
        kf = [float(t) for t in kernel]
        xf = x.astype(jnp.float32)
        rh = len(kf) // 2
        H, W = x.shape[-2], x.shape[-1]
        xp = _pad2d(xf, rh, rh, border)
        tmp = sum(kf[i] * jax.lax.slice_in_dim(xp, i, i + W, axis=-1)
                  for i in range(len(kf)))
        return sum(kf[i] * jax.lax.slice_in_dim(tmp, i, i + H, axis=-2)
                   for i in range(len(kf))).astype(x.dtype)

    return _filter_channels(image, run)


def _q8_taps_bitexact(kernel: np.ndarray) -> list:
    """Quantize a normalized kernel to Q8 by cumulative rounding.

    cv2 5.x quantizes computed Gaussian kernels by error diffusion:
    tap i = rint(cumsum(k*256))[i] - rint(cumsum(k*256))[i-1]; the taps
    sum to exactly 256 and need NOT be monotone (ksize 31 opens
    [0,1,0,1,2,...]).  Recovered via impulse-column probes; supersedes
    centre-tap-corrected _q8_taps (which was exact only <= 11).  """
    cs = np.rint(np.cumsum(kernel * 256.0))
    return [int(t) for t in np.diff(np.concatenate([[0.0], cs]))]


def gaussian_mean_u8(image: jnp.ndarray, ksize: int, sigma: float = 0.0,
                     border: str = "replicate") -> jnp.ndarray:
    """Local Gaussian-weighted mean as int32.

    This is the inner mean of cv2.adaptiveThreshold(ADAPTIVE_THRESH_GAUSSIAN_C).
    cv2 5.x computes it as a *float* separable convolution (replicate
    border) rounded half-to-even to an integer — unlike cv2.GaussianBlur on
    uint8, which keeps the Q8 fixed-point path.  float32 accumulation was
    verified to give zero comparison flips versus cv2's float64 across 16M
    random pixels (tests/test_ops_parity.py).
    """
    kf = [float(t) for t in gaussian_kernel_1d(ksize, sigma)]
    r = ksize // 2
    H, W = image.shape[-2], image.shape[-1]
    xp = _pad2d(image.astype(jnp.float32), r, r, border)
    tmp = sum(kf[i] * jax.lax.slice_in_dim(xp, i, i + W, axis=-1)
              for i in range(ksize))
    mf = sum(kf[i] * jax.lax.slice_in_dim(tmp, i, i + H, axis=-2)
             for i in range(ksize))
    return jnp.rint(mf).astype(jnp.int32)


def box_blur(image: jnp.ndarray, ksize: int, border: str = "reflect101",
             normalize: bool = True) -> jnp.ndarray:
    """cv2.blur / cv2.boxFilter parity (rounding is round-half-to-even)."""
    ones = [1] * ksize

    def run(x):
        if x.dtype == jnp.uint8:
            acc = _sep_conv_i32(x.astype(jnp.int32), ones, ones, border)
            if not normalize:
                return acc
            n2 = ksize * ksize  # odd => no .5 ties; half-up == f64 cvRound
            return jnp.clip((acc + n2 // 2) // n2, 0, 255).astype(jnp.uint8)
        xf = x.astype(jnp.float32)
        acc = _sep_conv_i32(xf, ones, ones, border)
        return (acc / (ksize * ksize) if normalize else acc).astype(x.dtype)

    return _filter_channels(image, run)


def box_mean_u8(image: jnp.ndarray, ksize: int,
                border: str = "replicate") -> jnp.ndarray:
    """Local box mean as int32 in [0,255] (cv2 ADAPTIVE_THRESH_MEAN_C inner)."""
    ones = [1] * ksize
    acc = _sep_conv_i32(image.astype(jnp.int32), ones, ones, border)
    n2 = ksize * ksize  # odd => no .5 ties; half-up == f64 cvRound
    return jnp.clip((acc + n2 // 2) // n2, 0, 255).astype(jnp.int32)


def sobel(image: jnp.ndarray, dx: int, dy: int,
          border: str = "replicate") -> jnp.ndarray:
    """3x3 Sobel derivative, int32 output (cv2.Sobel CV_16S semantics)."""
    smooth = [1, 2, 1]
    deriv = [-1, 0, 1]
    x = image.astype(jnp.int32)
    if dx == 1 and dy == 0:
        return _sep_conv_i32(x, smooth, deriv, border)
    if dx == 0 and dy == 1:
        return _sep_conv_i32(x, deriv, smooth, border)
    raise ValueError("sobel supports (dx,dy) in {(1,0),(0,1)}")


# tan(22.5 deg) in Q15 — the constant OpenCV's Canny NMS uses.
_TG22 = 13573


def canny(image: jnp.ndarray, threshold1: float, threshold2: float,
          aperture_size: int = 3, l2_gradient: bool = False,
          max_hysteresis_iters: int = 64) -> jnp.ndarray:
    """Canny edge detection following OpenCV's algorithm.

    Gradient (3x3 Sobel, replicate border), L1 or L2 magnitude, OpenCV's
    integer sector logic for non-maximum suppression (including its exact
    tie-breaking: >/>= for the horizontal and vertical sectors, strict >
    on both diagonal neighbours), and hysteresis by iterative propagation
    of strong edges through weak candidates (a bounded ``lax.while_loop``
    — the TPU-native replacement for OpenCV's sequential stack walk).
    Bit-exact vs cv2.Canny for aperture 3 (golden-tested on fixtures and
    random frames, both L1 and L2 gradients).

    Reference behavior: heimdall/core/pipeline.py:246-259 (CannyEdgeStage).
    """
    if aperture_size != 3:
        raise NotImplementedError("only aperture_size=3 is supported")
    low, high = min(threshold1, threshold2), max(threshold1, threshold2)

    gray = image
    gx = sobel(gray, 1, 0)
    gy = sobel(gray, 0, 1)
    if l2_gradient:
        mag = gx * gx + gy * gy
        # cv2: clamp to 32767, square only positive thresholds, then floor
        low, high = min(32767.0, low), min(32767.0, high)
        low = low * low if low > 0 else low
        high = high * high if high > 0 else high
    mag = mag if l2_gradient else jnp.abs(gx) + jnp.abs(gy)
    low, high = int(math.floor(low)), int(math.floor(high))

    # Pad magnitude with zeros so border pixels compare against 0 neighbours.
    def shift(a, di, dj):
        p = _pad2d(a, 1, 1, "constant", 0)
        H, W = a.shape[-2], a.shape[-1]
        return jax.lax.slice_in_dim(
            jax.lax.slice_in_dim(p, 1 + di, 1 + di + H, axis=-2),
            1 + dj, 1 + dj + W, axis=-1)

    # All products fit in int32: |sobel| <= 1020, 1020 * tan-constants < 2^31.
    m = mag
    xs = jnp.abs(gx)
    ys_15 = jnp.abs(gy) << 15
    tg22x = xs * _TG22
    tg67x = tg22x + (xs << 16)

    horiz = ys_15 < tg22x
    vert = ys_15 > tg67x
    diag = (~horiz) & (~vert)
    same_sign = (gx ^ gy) >= 0  # gradient in main diagonal direction

    # cv2's exact tie-breaking: horizontal/vertical compare (>, >=) against
    # (prev, next); the diagonal sectors compare strictly (>) on BOTH.
    keep_h = (m > shift(m, 0, -1)) & (m >= shift(m, 0, 1))
    keep_v = (m > shift(m, -1, 0)) & (m >= shift(m, 1, 0))
    keep_d1 = (m > shift(m, -1, -1)) & (m > shift(m, 1, 1))    # "\" diagonal
    keep_d2 = (m > shift(m, -1, 1)) & (m > shift(m, 1, -1))    # "/" diagonal

    keep = jnp.where(horiz, keep_h,
           jnp.where(vert, keep_v,
           jnp.where(same_sign, keep_d1, keep_d2)))

    cand = keep & (m > low)
    strong = cand & (m > high)

    def dilate8(a):
        out = a
        for di in (-1, 0, 1):
            for dj in (-1, 0, 1):
                if di == 0 and dj == 0:
                    continue
                out = out | shift(a, di, dj)
        return out

    def body(state):
        edges, _ = state
        grown = dilate8(edges) & cand
        new = edges | grown
        return new, jnp.any(new != edges)

    def cond(state):
        return state[1]

    edges, _ = jax.lax.while_loop(
        cond, lambda s: body(s), (strong, jnp.asarray(True)))
    return jnp.where(edges, jnp.uint8(255), jnp.uint8(0))
