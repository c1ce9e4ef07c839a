"""Hough line transform (TPU accumulator + deterministic segment extraction).

Reference behavior: heimdall/core/pipeline.py:445-503 (HoughLinesStage wraps
cv2.HoughLinesP: rho=1, theta=pi/180, threshold, min_line_length,
max_line_gap).

cv2.HoughLinesP is *probabilistic* — it visits edge pixels in random order
and mutates the accumulator as it goes, so its output is not reproducible
even across OpenCV runs.  The TPU-native design is deterministic:

  1. a full (theta, rho) vote accumulator built on device (vmapped
     segment-sums over the edge image — one fused program for the batch),
  2. 3x3 non-maximum suppression + threshold → top-K (rho, theta) lines,
  3. for probabilistic-API compatibility, line *segments* are recovered by
     sampling each detected line on device and splitting on gaps host-side
     (max_line_gap / min_line_length semantics preserved).

Returned positions match cv2's parameterization: rho in pixels (can be
negative), theta in radians in [0, pi).
"""

import math
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=("rho_res", "theta_bins"))
def hough_accumulator(edges: jnp.ndarray, rho_res: float = 1.0,
                      theta_bins: int = 180) -> jnp.ndarray:
    """Vote accumulator [..., theta_bins, n_rho] for an edge image [..., H, W]."""
    H, W = edges.shape[-2], edges.shape[-1]
    diag = int(math.ceil(math.sqrt(H * H + W * W)))
    n_rho = int(2 * diag / rho_res) + 1

    thetas = jnp.arange(theta_bins, dtype=jnp.float32) * (math.pi / theta_bins)
    cos_t = jnp.cos(thetas)
    sin_t = jnp.sin(thetas)

    ys = jnp.arange(H, dtype=jnp.float32)[:, None]
    xs = jnp.arange(W, dtype=jnp.float32)[None, :]
    mask_flat = (edges > 0).reshape(edges.shape[:-2] + (-1,)).astype(jnp.float32)

    def per_theta(c, s):
        rho = xs * c + ys * s                                # [H, W]
        rbin = jnp.round(rho / rho_res).astype(jnp.int32) + int(diag / rho_res)
        rbin = jnp.clip(rbin, 0, n_rho - 1).reshape(-1)      # [HW]
        # one vote per edge pixel
        def seg(m):
            return jax.ops.segment_sum(m, rbin, num_segments=n_rho)
        votes = seg if mask_flat.ndim == 1 else jax.vmap(seg)
        return votes(mask_flat)

    acc = jax.vmap(per_theta)(cos_t, sin_t)                  # [T, ..., n_rho]
    if mask_flat.ndim > 1:
        acc = jnp.moveaxis(acc, 0, -2)
    return acc


def hough_lines(edges, threshold: int = 100, rho_res: float = 1.0,
                theta_bins: int = 180, max_lines: int = 32):
    """Standard Hough transform → up to max_lines (rho, theta, votes) rows.

    Single image [H, W] only (batch via vmap).  Returns numpy arrays
    (rho float32[K], theta float32[K], votes int32[K], valid bool[K]).
    """
    H, W = edges.shape[-2], edges.shape[-1]
    diag = int(math.ceil(math.sqrt(H * H + W * W)))
    acc = hough_accumulator(jnp.asarray(edges), rho_res, theta_bins)
    acc = np.asarray(acc)
    # 3x3 NMS on the accumulator
    from scipy.ndimage import maximum_filter  # available in the image
    local_max = acc >= maximum_filter(acc, size=3, mode="constant")
    peaks = (acc >= threshold) & local_max
    t_idx, r_idx = np.nonzero(peaks)
    votes = acc[t_idx, r_idx]
    order = np.argsort(-votes)[:max_lines]
    t_idx, r_idx, votes = t_idx[order], r_idx[order], votes[order]
    rho = (r_idx - diag / rho_res) * rho_res
    theta = t_idx * (math.pi / theta_bins)
    k = len(order)
    pad = max_lines - k
    return (np.pad(rho.astype(np.float32), (0, pad)),
            np.pad(theta.astype(np.float32), (0, pad)),
            np.pad(votes.astype(np.int32), (0, pad)),
            np.pad(np.ones(k, bool), (0, pad)))


def hough_lines_p(edges, threshold: int = 100, min_line_length: float = 50,
                  max_line_gap: float = 10, rho_res: float = 1.0,
                  theta_bins: int = 180, max_lines: int = 32) -> np.ndarray:
    """Deterministic stand-in for cv2.HoughLinesP.

    Returns an [N, 1, 4] int32 array of (x1, y1, x2, y2) segments — the same
    shape cv2 produces — by walking each detected Hough line across the edge
    image and splitting on gaps.
    """
    edges_np = np.asarray(edges)
    H, W = edges_np.shape[-2:]
    rho, theta, votes, valid = hough_lines(
        edges_np, threshold, rho_res, theta_bins, max_lines)
    segments = []
    for r, t, ok in zip(rho, theta, valid):
        if not ok:
            continue
        c, s = math.cos(t), math.sin(t)
        # Walk along the line direction (-s, c) from its closest point.
        x0, y0 = c * r, s * r
        length = int(math.hypot(H, W))
        run_start, gap, last_on = None, 0, None
        for step in range(-length, length + 1):
            x = int(round(x0 - s * step))
            y = int(round(y0 + c * step))
            on = (0 <= x < W and 0 <= y < H and edges_np[y, x] > 0)
            if on:
                if run_start is None:
                    run_start = (x, y)
                last_on = (x, y)
                gap = 0
            elif run_start is not None:
                gap += 1
                if gap > max_line_gap:
                    if math.dist(run_start, last_on) >= min_line_length:
                        segments.append((*run_start, *last_on))
                    run_start, last_on, gap = None, None, 0
        if run_start is not None and last_on is not None and \
                math.dist(run_start, last_on) >= min_line_length:
            segments.append((*run_start, *last_on))
    if not segments:
        return np.empty((0, 1, 4), np.int32)
    return np.asarray(segments, np.int32).reshape(-1, 1, 4)
