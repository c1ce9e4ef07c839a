"""Connected-component labeling on TPU.

The reference extracts blobs with cv2.findContours (sequential Suzuki border
following — heimdall/detectors/contamination_detector.py:90) and, in the
native path, scanline flood fill (rust/heimdall-core/src/processing.rs:322-369).
Both are inherently sequential.  The TPU-native replacement is iterative
**min-label propagation with pointer jumping** over the whole batch at once:

  1. every foreground pixel starts labeled with its own linear index,
  2. each step takes the minimum label over the 8- (or 4-) neighbourhood,
  3. then "pointer jumps": label <- label[label] twice, which compresses
     label chains exponentially (hop doubling),
  4. a ``lax.while_loop`` runs steps until a fixpoint.

Convergence is O(log(diameter)) pointer-jump rounds for compact blobs —
single-digit iterations for the defect sizes this framework targets.  The
final label of every component is the linear index of its topmost-leftmost
pixel, which also gives a deterministic raster ordering that matches the
contour ordering of cv2.findContours on typical masks.

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


def connected_components(mask: jnp.ndarray, connectivity: int = 8,
                         max_iters: int = 0) -> jnp.ndarray:
    """Label 8-connected components of a boolean mask, batched.

    Args:
      mask: bool [..., H, W].
      connectivity: 8 (cv2.findContours foreground connectivity) or 4
        (the native Rust flood fill used 4 — rust/heimdall-core/src/
        processing.rs:322).
      max_iters: optional hard bound on propagation rounds (0 = H+W, the
        theoretical worst case; real masks converge in a handful).

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

    batch_shape = mask.shape[:-2]
    flat_shape = batch_shape + (H * W,)
    sent_col = jnp.full(batch_shape + (1,), sentinel, jnp.int32)

    def jump(lab):
        """lab <- lab[lab] on the flattened grid (sentinel maps to itself)."""
        flat = lab.reshape(flat_shape)
        padded = jnp.concatenate([flat, sent_col], axis=-1)
        return jnp.take_along_axis(padded, flat, axis=-1).reshape(lab.shape)

    def body(state):
        lab, _, it = state
        l1 = _neighbor_min(lab, sentinel, connectivity)
        l1 = jnp.where(mask, l1, sentinel)
        l2 = jump(jump(l1))
        changed = jnp.any(l2 != lab)
        return l2, changed, it + 1

    def cond(state):
        _, changed, it = state
        return jnp.logical_and(changed, it < max_iters)

    labels, _, _ = jax.lax.while_loop(
        cond, body, (labels, jnp.asarray(True), jnp.asarray(0, jnp.int32)))
    return labels
