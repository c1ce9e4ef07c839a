"""Global and adaptive thresholding with OpenCV parity.

Reference behavior: heimdall/core/pipeline.py:335-363 (ThresholdStage:
binary / binary_inv / trunc / tozero / Otsu / Triangle),
pipeline.py:262-287 (AdaptiveThresholdStage, Gaussian-C, block 11, C=2) and
heimdall/detectors/contamination_detector.py:70-77 (Gaussian-C BINARY_INV,
block 11, C=contrast_threshold).

The adaptive Gaussian mean reproduces OpenCV's uint8 fixed-point filter
(see ops/filters.py) with BORDER_REPLICATE, so adaptive_threshold is
bit-exact versus cv2.adaptiveThreshold for block sizes <= 11 and within
+-1 LSB of the local mean above that.  OpenCV rounds the offset C with
cvFloor for THRESH_BINARY_INV and cvCeil for THRESH_BINARY — replicated.
"""

import math

import jax.numpy as jnp

from heimdall_tpu.ops.filters import gaussian_mean_u8, box_mean_u8

# cv2 threshold type names (string API mirrors the reference's config strings).
THRESH_BINARY = "binary"
THRESH_BINARY_INV = "binary_inv"
THRESH_TRUNC = "trunc"
THRESH_TOZERO = "tozero"
THRESH_TOZERO_INV = "tozero_inv"


def threshold(image: jnp.ndarray, thresh: float, max_value: float = 255,
              method: str = THRESH_BINARY) -> jnp.ndarray:
    """cv2.threshold parity on uint8 input (fixed threshold types).

    cv2 compares ``src > thresh`` (strict) for binary/binary_inv.
    """
    x = image.astype(jnp.int32)
    t = jnp.asarray(thresh, jnp.float32)
    # cv2 rounds the threshold with cvRound for integer images.
    ti = jnp.rint(t).astype(jnp.int32)
    mv = jnp.clip(jnp.rint(jnp.asarray(max_value, jnp.float32)), 0, 255)
    mv = mv.astype(jnp.int32)
    above = x > ti
    if method == THRESH_BINARY:
        out = jnp.where(above, mv, 0)
    elif method == THRESH_BINARY_INV:
        out = jnp.where(above, 0, mv)
    elif method == THRESH_TRUNC:
        out = jnp.where(above, ti, x)
    elif method == THRESH_TOZERO:
        out = jnp.where(above, x, 0)
    elif method == THRESH_TOZERO_INV:
        out = jnp.where(above, 0, x)
    else:
        raise ValueError(f"unknown threshold method: {method}")
    return out.astype(jnp.uint8)


def histogram256(image: jnp.ndarray) -> jnp.ndarray:
    """256-bin histogram over the last two dims → [..., 256] int32."""
    flat = image.reshape(image.shape[:-2] + (-1,)).astype(jnp.int32)
    bins = jnp.arange(256, dtype=jnp.int32)
    # One-hot reduce: [..., P] vs [256] — batched, XLA lowers to efficient
    # compare+reduce; avoids scatter which is slow on TPU.
    return (flat[..., None] == bins).sum(axis=-2).astype(jnp.int32)


def otsu_threshold(image: jnp.ndarray) -> jnp.ndarray:
    """Otsu threshold value (per image) following cv2's implementation.

    Returns an int32 scalar (or batched [...]) threshold.  cv2 maximizes the
    between-class variance sigma = q1*q2*(mu1-mu2)^2 over t in [0,256) and
    returns the *first* argmax.
    """
    hist = histogram256(image).astype(jnp.float32)          # [..., 256]
    total = hist.sum(axis=-1, keepdims=True)
    i = jnp.arange(256, dtype=jnp.float32)
    omega = jnp.cumsum(hist, axis=-1) / total               # class-0 weight
    mu_t = jnp.cumsum(hist * i, axis=-1) / total            # partial mean
    mu = mu_t[..., -1:]
    denom = omega * (1.0 - omega)
    num = (mu * omega - mu_t) ** 2
    sigma = jnp.where(denom > jnp.finfo(jnp.float32).eps, num / denom, -1.0)
    return jnp.argmax(sigma, axis=-1).astype(jnp.int32)


def triangle_threshold(image: jnp.ndarray) -> jnp.ndarray:
    """Triangle method threshold following cv2's implementation exactly.

    cv2 (thresh.cpp): widen the occupied histogram range by one bin on each
    side, flip the histogram when the short tail is on the left, then walk
    from left_bound+1 to the peak maximizing max_val*i + (left_bound -
    max_ind)*h[i]; the first maximum wins; final threshold is that index
    minus one (un-flipped if needed).
    """
    hist = histogram256(image).astype(jnp.int32)
    idx = jnp.arange(256, dtype=jnp.int32)
    present = hist > 0
    first = jnp.argmax(present, axis=-1).astype(jnp.int32)
    last = 255 - jnp.argmax(present[..., ::-1], axis=-1).astype(jnp.int32)
    left_bound = jnp.maximum(first - 1, 0)
    right_bound = jnp.minimum(last + 1, 255)
    max_val = jnp.max(hist, axis=-1)
    max_ind = jnp.argmax(hist, axis=-1).astype(jnp.int32)

    flip = (max_ind - left_bound) < (right_bound - max_ind)
    h_used = jnp.where(flip[..., None], hist[..., ::-1], hist)
    lb = jnp.where(flip, 255 - right_bound, left_bound)
    mi = jnp.where(flip, 255 - max_ind, max_ind)

    a = max_val[..., None].astype(jnp.float32)
    b = (lb - mi)[..., None].astype(jnp.float32)
    tempdist = a * idx.astype(jnp.float32) + b * h_used.astype(jnp.float32)
    in_range = (idx > lb[..., None]) & (idx <= mi[..., None])
    # cv2 keeps the FIRST index with tempdist strictly greater than the
    # running max (initialized to 0 at thresh=left_bound).
    masked = jnp.where(in_range & (tempdist > 0), tempdist, -1.0)
    best = jnp.argmax(masked, axis=-1).astype(jnp.int32)
    any_pos = jnp.max(masked, axis=-1) > 0
    thresh = jnp.where(any_pos, best, lb) - 1
    thresh = jnp.where(flip, 255 - thresh, thresh)
    return thresh.astype(jnp.int32)


def threshold_auto(image: jnp.ndarray, max_value: float = 255,
                   method: str = THRESH_BINARY, auto: str = "otsu"):
    """cv2.threshold with THRESH_OTSU / THRESH_TRIANGLE: returns (t, image)."""
    if auto == "otsu":
        t = otsu_threshold(image)
    elif auto == "triangle":
        t = triangle_threshold(image)
    else:
        raise ValueError(auto)
    x = image.astype(jnp.int32)
    mv = jnp.int32(int(max_value))
    above = x > t[..., None, None]
    if method == THRESH_BINARY:
        out = jnp.where(above, mv, 0)
    elif method == THRESH_BINARY_INV:
        out = jnp.where(above, 0, mv)
    else:
        raise ValueError(f"auto threshold supports binary/binary_inv, got {method}")
    return t, out.astype(jnp.uint8)


def adaptive_threshold(image: jnp.ndarray, max_value: float = 255,
                       adaptive_method: str = "gaussian",
                       threshold_type: str = THRESH_BINARY,
                       block_size: int = 11, c=2.0) -> jnp.ndarray:
    """cv2.adaptiveThreshold parity.

    ``c`` may be a traced scalar (it enters as an additive offset), so the
    contamination detector's contrast_threshold does not trigger recompiles.
    For non-integer static ``c`` OpenCV applies cvCeil (BINARY) / cvFloor
    (BINARY_INV); traced values are assumed integral and used as-is.
    """
    if adaptive_method == "gaussian":
        mean = gaussian_mean_u8(image, block_size, 0.0, border="replicate")
    elif adaptive_method == "mean":
        mean = box_mean_u8(image, block_size, border="replicate")
    else:
        raise ValueError(f"unknown adaptive method: {adaptive_method}")

    if isinstance(c, (int, float)):
        ci = math.ceil(c) if threshold_type == THRESH_BINARY else math.floor(c)
        ci = jnp.int32(ci)
    else:
        ci = jnp.asarray(c).astype(jnp.int32)

    x = image.astype(jnp.int32)
    mv = jnp.int32(int(max_value))
    if threshold_type == THRESH_BINARY:
        out = jnp.where(x > mean - ci, mv, 0)
    elif threshold_type == THRESH_BINARY_INV:
        out = jnp.where(x <= mean - ci, mv, 0)
    else:
        raise ValueError("adaptiveThreshold supports binary/binary_inv")
    return out.astype(jnp.uint8)
