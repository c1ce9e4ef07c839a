"""Connected-component labeling on TPU.

The reference extracts blobs with cv2.findContours (sequential Suzuki border
following — heimdall/detectors/contamination_detector.py:90) and, in the
native path, scanline flood fill (rust/heimdall-core/src/processing.rs:322-369).
Both are inherently sequential.  The TPU-native replacement is **directional
min-label propagation with segmented associative scans**:

  1. every foreground pixel starts labeled with its own linear index,
  2. each sweep takes the neighbourhood minimum (one VPU pass) and then
     propagates minima across entire rows and columns with segmented
     min-scans (``lax.associative_scan`` — O(log W) depth, pure vector ops,
     no gathers or scatters anywhere),
  3. a ``lax.while_loop`` repeats sweeps to a fixpoint.

One sweep resolves any geodesically convex component; each extra sweep
resolves one more "turn" of concave geometry, so realistic defect masks
converge in 2-4 sweeps.  This formulation exists *because* TPU: scatters
serialize badly on the vector unit, while shifts and scans are native —
an earlier union-find (scatter-min hooking) version benchmarked ~50x
slower on a v5e despite its better asymptotics.

The final label of every component is the linear index of its
topmost-leftmost pixel, giving a deterministic raster ordering that matches
cv2.findContours ordering on typical masks.

Everything is static-shaped and batched: [..., H, W] boolean masks in,
int32 labels out, background = H*W sentinel.
"""

import jax
import jax.numpy as jnp


def _neighbor_min(labels: jnp.ndarray, sentinel: int, connectivity: int):
    """Minimum label over the neighbourhood (padding with the sentinel)."""
    H, W = labels.shape[-2], labels.shape[-1]
    pad = [(0, 0)] * (labels.ndim - 2) + [(1, 1), (1, 1)]
    lp = jnp.pad(labels, pad, mode="constant", constant_values=sentinel)

    if connectivity == 8:
        offsets = [(di, dj) for di in (-1, 0, 1) for dj in (-1, 0, 1)
                   if not (di == 0 and dj == 0)]
    else:
        offsets = [(-1, 0), (1, 0), (0, -1), (0, 1)]

    out = labels
    for (di, dj) in offsets:
        s = jax.lax.slice_in_dim(
            jax.lax.slice_in_dim(lp, 1 + di, 1 + di + H, axis=-2),
            1 + dj, 1 + dj + W, axis=-1)
        out = jnp.minimum(out, s)
    return out


def _segmented_min_scan(values: jnp.ndarray, is_reset: jnp.ndarray,
                        axis: int, reverse: bool) -> jnp.ndarray:
    """Running minimum along ``axis`` that resets at reset positions.

    Background pixels carry the sentinel and reset the scan, so minima
    propagate across each contiguous foreground run in O(log) steps.
    """
    def combine(a, b):
        av, ag = a
        bv, bg = b
        return jnp.where(bg, bv, jnp.minimum(av, bv)), ag | bg

    axis = axis % values.ndim
    out, _ = jax.lax.associative_scan(
        combine, (values, is_reset), axis=axis, reverse=reverse)
    return out


def connected_components(mask: jnp.ndarray, connectivity: int = 8,
                         max_iters: int = 0, sweeps: int = 0) -> jnp.ndarray:
    """Label connected components of a boolean mask, batched.

    Args:
      mask: bool [..., H, W].
      connectivity: 8 (cv2.findContours foreground connectivity) or 4
        (the native Rust flood fill used 4 — rust/heimdall-core/src/
        processing.rs:322).
      max_iters: optional hard bound on sweeps (0 = H+W, the theoretical
        worst case for spiral geometry; real masks converge in 2-4).
      sweeps: if > 0, run exactly this many statically-unrolled sweeps with
        NO fixpoint check (saves the while_loop overhead on the hot path;
        each sweep resolves one concave "turn", so 4-6 covers any realistic
        defect geometry — validated by the parity suite).  0 = loop to
        fixpoint (semantically safe for arbitrary masks).

    Returns:
      int32 labels [..., H, W]; foreground pixels hold the linear index
      (y*W + x) of their component's minimal pixel, background holds H*W.
    """
    H, W = mask.shape[-2], mask.shape[-1]
    sentinel = H * W
    if max_iters <= 0:
        max_iters = H + W

    lin = (jnp.arange(H, dtype=jnp.int32)[:, None] * W
           + jnp.arange(W, dtype=jnp.int32)[None, :])
    labels = jnp.where(mask, lin, sentinel)
    is_bg = ~mask

    def sweep(lab):
        lab = _neighbor_min(lab, sentinel, connectivity)
        lab = jnp.where(mask, lab, sentinel)
        for axis, reverse in ((-1, False), (-1, True), (-2, False),
                              (-2, True)):
            lab = _segmented_min_scan(lab, is_bg, axis, reverse)
            lab = jnp.where(mask, lab, sentinel)
        return lab

    if sweeps > 0:
        for _ in range(sweeps):
            labels = sweep(labels)
        return labels

    def body(state):
        lab, _, it = state
        new = sweep(lab)
        return new, jnp.any(new != lab), it + 1

    def cond(state):
        _, changed, it = state
        return jnp.logical_and(changed, it < max_iters)

    labels, _, _ = jax.lax.while_loop(
        cond, body, (labels, jnp.asarray(True), jnp.asarray(0, jnp.int32)))
    return labels


def _segmented_or_scan(flag: jnp.ndarray, is_reset: jnp.ndarray,
                       axis: int, reverse: bool) -> jnp.ndarray:
    def combine(a, b):
        av, ag = a
        bv, bg = b
        return jnp.where(bg, bv, av | bv), ag | bg

    axis = axis % flag.ndim
    out, _ = jax.lax.associative_scan(
        combine, (flag, is_reset), axis=axis, reverse=reverse)
    return out


def fill_holes(mask: jnp.ndarray, max_iters: int = 0,
               sweeps: int = 0) -> jnp.ndarray:
    """Fill interior holes of foreground components, batched.

    Reproduces the semantics of cv2.findContours(RETR_EXTERNAL) +
    drawContours(filled): everything enclosed by a component's outer
    boundary belongs to it (the reference gates on contourArea of the
    exterior contour and measures intensity over the *filled* contour mask
    — contamination_detector.py:97,104-105).  Components nested inside
    another component's hole are absorbed, exactly as RETR_EXTERNAL drops
    them.

    Implementation: boolean flood of the background from the image border
    (4-connected — the complementary connectivity of 8-connected
    foreground), using the same segmented-scan sweeps as the CCL; anything
    the flood cannot reach is hole.  No labels, no scatters.
    """
    H, W = mask.shape[-2], mask.shape[-1]
    if max_iters <= 0:
        max_iters = H + W
    bg = ~mask

    border = jnp.zeros((H, W), bool)
    border = border.at[0, :].set(True).at[-1, :].set(True)
    border = border.at[:, 0].set(True).at[:, -1].set(True)
    ext0 = bg & border

    def neighbor_or4(f):
        pad = [(0, 0)] * (f.ndim - 2) + [(1, 1), (1, 1)]
        fp = jnp.pad(f, pad)
        return (f | fp[..., :-2, 1:-1] | fp[..., 2:, 1:-1]
                | fp[..., 1:-1, :-2] | fp[..., 1:-1, 2:])

    def sweep(ext):
        ext = neighbor_or4(ext) & bg
        for axis, reverse in ((-1, False), (-1, True), (-2, False),
                              (-2, True)):
            ext = _segmented_or_scan(ext, mask, axis, reverse) & bg
        return ext

    if sweeps > 0:
        ext = ext0
        for _ in range(sweeps):
            ext = sweep(ext)
        return ~ext

    def body(state):
        ext, _, it = state
        new = sweep(ext)
        return new, jnp.any(new != ext), it + 1

    def cond(state):
        _, changed, it = state
        return jnp.logical_and(changed, it < max_iters)

    ext, _, _ = jax.lax.while_loop(
        cond, body, (ext0, jnp.asarray(True), jnp.asarray(0, jnp.int32)))
    return ~ext
