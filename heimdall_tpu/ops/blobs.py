"""Per-blob statistics on device: fixed-size blob tables from label images.

Replaces the reference's per-contour host loop
(heimdall/detectors/contamination_detector.py:95-177): contourArea gating,
boundingRect, moment centroid, masked foreground/background intensity means,
per-channel color means, and the blended confidence score — all computed for
every blob of every frame in one batched device program.

Key equivalences (validated against OpenCV in tests/test_blobs.py):

* ``cv2.contourArea`` of an exterior contour equals, by Pick's theorem,
  ``N_pixels - N_boundary/2 - 1`` where N_boundary counts blob pixels with a
  4-connected background neighbour (image border counts as background) —
  exact for simply-connected blobs (self-touching outlines deviate by ~1).
* ``cv2.boundingRect`` equals the pixel bounding box — exact.
* The moment centroid (polygon moments) is approximated by the pixel
  centroid; after the reference's int() truncation they agree within 1 px.
* The bbox-masked background mean is computed exactly via integral images:
  bg_sum = bbox_sum - fg_sum, using one 2-D cumulative sum per channel and
  four gathers per blob.

TPU mapping: all per-blob reductions are **compare-and-reduce** — a fused
``select(bid == k, v, identity)`` reduction over pixels for the K table
slots — which XLA fuses into plain VPU reduction loops.  No scatters, no
segment ops (TPU scatters serialize; an earlier jax.ops.segment_* version
was ~100x slower on a v5e).  Dynamic contour counts become a fixed-capacity
table (max_blobs per frame) with a validity mask — the TPU-native answer to
ragged outputs.
"""

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp


class BlobTable(NamedTuple):
    """Fixed-size per-frame blob table; every field is [..., K]."""
    valid: jnp.ndarray          # bool — slot holds a real blob
    area: jnp.ndarray           # float32 — cv2.contourArea equivalent
    area_px: jnp.ndarray        # int32 — pixel count
    cx: jnp.ndarray             # int32 — centroid x (truncated)
    cy: jnp.ndarray             # int32 — centroid y (truncated)
    x: jnp.ndarray              # int32 — bbox left
    y: jnp.ndarray              # int32 — bbox top
    w: jnp.ndarray              # int32 — bbox width
    h: jnp.ndarray              # int32 — bbox height
    intensity_diff: jnp.ndarray  # float32 — |bg_mean - fg_mean| (gray)
    intensity_score: jnp.ndarray  # float32
    shape_score: jnp.ndarray    # float32
    color_score: jnp.ndarray    # float32
    n_blobs: jnp.ndarray        # int32 [...] — true blob count (may exceed K)


def _integral(img_i32: jnp.ndarray) -> jnp.ndarray:
    """2-D inclusive prefix sum with a leading zero row/col: [..., H+1, W+1]."""
    s = jnp.cumsum(jnp.cumsum(img_i32, axis=-1), axis=-2)
    pad = [(0, 0)] * (img_i32.ndim - 2) + [(1, 0), (1, 0)]
    return jnp.pad(s, pad)


def _bbox_sum(ii: jnp.ndarray, x0, y0, x1, y1) -> jnp.ndarray:
    """Sum over the half-open box [y0,y1) x [x0,x1) via 4 gathers. [..., K]"""
    Wp = ii.shape[-1]
    flat = ii.reshape(ii.shape[:-2] + (-1,))

    def at(yy, xx):
        return jnp.take_along_axis(flat, yy * Wp + xx, axis=-1)

    return at(y1, x1) - at(y0, x1) - at(y1, x0) + at(y0, x0)


def blob_stats(labels: jnp.ndarray, mask: jnp.ndarray, gray: jnp.ndarray,
               color: Optional[jnp.ndarray] = None, max_blobs: int = 64,
               use_color: bool = True,
               root_table: Optional[jnp.ndarray] = None,
               root_count: Optional[jnp.ndarray] = None) -> BlobTable:
    """Compute the per-blob statistics table.

    Args:
      labels: int32 [B, H, W] from connected_components (background = H*W).
      mask: bool [B, H, W] foreground mask.
      gray: uint8/int32 [B, H, W] grayscale used for intensity stats.
      color: optional uint8 [B, H, W, 3] original frame for color stats.
      max_blobs: table capacity K; blobs beyond K are dropped (counted in
        n_blobs so callers can detect overflow).
      use_color: when False (or color is None) color_score is the neutral
        0.5 of the reference (contamination_detector.py:139).
      root_table / root_count: optional precomputed first-K root linear
        indices (ascending, padded with H*W) and exact component counts —
        the tiled CCL path recovers these in its band kernels, skipping
        the full-image top_k below.

    Returns BlobTable with fields [B, K].
    """
    B, H, W = mask.shape[-3], mask.shape[-2], mask.shape[-1]
    K = max_blobs
    HW = H * W
    lin = (jnp.arange(H, dtype=jnp.int32)[:, None] * W
           + jnp.arange(W, dtype=jnp.int32)[None, :])

    labels_flat = labels.reshape(B, HW)
    mask_flat = mask.reshape(B, HW)

    # --- compact blob ids -------------------------------------------------
    # Roots in raster order give compact ids.  A pixel's id is the RANK of
    # its label among the first-K root linear indices — computed by K fused
    # compare-reductions against a top_k root table instead of a full-image
    # gather (TPU gathers run ~70M elem/s; compares stream at memory speed).
    if root_table is None:
        is_root = mask & (labels == lin)                   # [B, H, W]
        root_flat = is_root.reshape(B, HW)
        n_blobs = jnp.sum(root_flat.astype(jnp.int32), axis=-1)
        keys = jnp.where(root_flat, labels_flat, HW)
        rl = -jax.lax.top_k(-keys, K)[0]                   # [B, K] ascending
    else:
        rl = root_table[:, :K]
        n_blobs = (root_count if root_count is not None
                   else jnp.sum((mask & (labels == lin))
                                .astype(jnp.int32), axis=(-2, -1)))
    count = jnp.sum((rl[:, None, :] <= labels_flat[:, :, None])
                    .astype(jnp.int32), axis=-1)           # [B, HW]
    in_table = jnp.any(rl[:, None, :] == labels_flat[:, :, None], axis=-1)
    # overflow blobs (rank >= K) and background go to the invalid bucket K
    # (masked out of every reduction below)
    bid = jnp.where(mask_flat & in_table, count - 1, K)    # [B, HW]

    ks = jnp.arange(K, dtype=jnp.int32)                    # table slots

    # --- boundary pixels (4-connected background neighbour or image edge) --
    mpad = jnp.pad(mask, [(0, 0)] * (mask.ndim - 2) + [(1, 1), (1, 1)])
    nb4 = (mpad[..., :-2, 1:-1].astype(jnp.int32)
           + mpad[..., 2:, 1:-1]
           + mpad[..., 1:-1, :-2]
           + mpad[..., 1:-1, 2:])
    boundary = mask & (nb4 < 4)

    # --- all per-blob sums in ONE one-hot matmul (MXU) ---------------------
    # stats axis S: [ones, boundary, x, y, gray, (b, g, r)]
    xs = jnp.broadcast_to(jnp.arange(W, dtype=jnp.int32)[None, :], (H, W))
    ys = jnp.broadcast_to(jnp.arange(H, dtype=jnp.int32)[:, None], (H, W))
    gray_i = gray.astype(jnp.int32)
    planes = [jnp.ones((B, H, W), jnp.float32),
              boundary.astype(jnp.float32),
              jnp.broadcast_to(xs, (B, H, W)).astype(jnp.float32),
              jnp.broadcast_to(ys, (B, H, W)).astype(jnp.float32),
              gray_i.astype(jnp.float32)]
    with_color = use_color and color is not None
    if with_color:
        for ch in range(color.shape[-1]):
            planes.append(color[..., ch].astype(jnp.float32))
    vals = jnp.stack(planes, axis=-1).reshape(B, HW, len(planes))
    onehot = (bid[..., None] == ks).astype(jnp.float32)    # [B, HW, K]
    # f32 is exact here: every per-blob partial stays below 2^24.
    sums = jnp.einsum("bps,bpk->bsk", vals, onehot,
                      preferred_element_type=jnp.float32)  # [B, S, K]

    area_px = sums[:, 0].astype(jnp.int32)
    n_boundary = sums[:, 1]
    sum_x = sums[:, 2].astype(jnp.int32)
    sum_y = sums[:, 3].astype(jnp.int32)
    fg_sum = sums[:, 4].astype(jnp.int32)

    # cv2.contourArea equivalence via Pick's theorem
    area = sums[:, 0] - 0.5 * n_boundary - 1.0

    valid = area_px > 0
    safe_px = jnp.maximum(area_px, 1)
    cx = sum_x // safe_px
    cy = sum_y // safe_px

    # --- bbox via row/column slot-presence (2 fused bool reductions) -------
    bid3 = bid.reshape(B, H, W)
    row_has = jnp.any(bid3[..., None] == ks, axis=-2)      # [B, H, K]
    col_has = jnp.any(bid3[..., None] == ks, axis=-3)      # [B, W, K]
    h_idx = jnp.arange(H, dtype=jnp.int32)[None, :, None]
    w_idx = jnp.arange(W, dtype=jnp.int32)[None, :, None]
    y0 = jnp.min(jnp.where(row_has, h_idx, H), axis=1)
    y1 = jnp.max(jnp.where(row_has, h_idx, -1), axis=1)
    x0 = jnp.min(jnp.where(col_has, w_idx, W), axis=1)
    x1 = jnp.max(jnp.where(col_has, w_idx, -1), axis=1)
    x0 = jnp.where(valid, x0, 0)
    y0 = jnp.where(valid, y0, 0)
    w = jnp.where(valid, x1 - x0 + 1, 0)
    h = jnp.where(valid, y1 - y0 + 1, 0)

    # --- intensity stats ---------------------------------------------------
    ii = _integral(gray_i)
    bbox_sum = _bbox_sum(ii, x0, y0, x0 + w, y0 + h)
    bg_px = w * h - area_px
    fg_mean = jnp.where(valid,
                        fg_sum.astype(jnp.float32) / safe_px, 127.0)
    bg_mean = jnp.where(bg_px > 0,
                        (bbox_sum - fg_sum).astype(jnp.float32)
                        / jnp.maximum(bg_px, 1), 127.0)
    intensity_diff = jnp.abs(bg_mean - fg_mean)
    intensity_score = jnp.minimum(1.0, intensity_diff / 30.0)

    # --- shape score -------------------------------------------------------
    rect_area = (w * h).astype(jnp.float32)
    shape_score = jnp.where(rect_area > 0, 1.0 - area / rect_area, 1.0)

    # --- color score -------------------------------------------------------
    if with_color:
        diffs = []
        for ch in range(color.shape[-1]):
            c_fg = sums[:, 5 + ch].astype(jnp.int32)
            c_ii = _integral(color[..., ch].astype(jnp.int32))
            c_bbox = _bbox_sum(c_ii, x0, y0, x0 + w, y0 + h)
            c_fg_mean = jnp.where(valid,
                                  c_fg.astype(jnp.float32) / safe_px, 127.0)
            c_bg_mean = jnp.where(bg_px > 0,
                                  (c_bbox - c_fg).astype(jnp.float32)
                                  / jnp.maximum(bg_px, 1), 127.0)
            diffs.append(jnp.abs(c_fg_mean - c_bg_mean))
        color_diff = jnp.maximum(jnp.maximum(diffs[0], diffs[1]), diffs[2])
        color_score = jnp.minimum(1.0, color_diff / 30.0)
    else:
        color_score = jnp.full_like(intensity_score, 0.5)

    return BlobTable(
        valid=valid, area=area, area_px=area_px, cx=cx, cy=cy,
        x=x0, y=y0, w=w, h=h,
        intensity_diff=intensity_diff, intensity_score=intensity_score,
        shape_score=shape_score, color_score=color_score, n_blobs=n_blobs)


def confidence_python(table: BlobTable) -> jnp.ndarray:
    """The reference Python confidence blend (contamination_detector.py:160):
    0.5*intensity + 0.2*shape + 0.3*color."""
    return (0.5 * table.intensity_score + 0.2 * table.shape_score
            + 0.3 * table.color_score)


def confidence_native(table: BlobTable) -> jnp.ndarray:
    """The reference native-path blend (rust/heimdall-core/src/
    detection.rs:294-298): 0.7*intensity + 0.3*shape, no color term."""
    return 0.7 * table.intensity_score + 0.3 * table.shape_score
