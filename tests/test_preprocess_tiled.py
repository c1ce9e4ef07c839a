"""Banded preprocess kernel parity vs the XLA op chain.

contamination_preprocess_tiled must be bit-identical to
gray -> gaussian_blur(5) -> adaptive_threshold(gaussian, binary_inv, 11, C)
-> open(3x3) -> close(3x3) from the ops library (itself OpenCV-parity),
including the frame-edge border semantics the in-kernel fixups reproduce.
Runs in Pallas interpret mode on CPU.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from heimdall_tpu import ops
from heimdall_tpu.ops.preprocess_tiled import contamination_preprocess_tiled

INTERP = jax.default_backend() == "cpu"


def _xla_chain(images, ct):
    gray = ops.bgr_to_gray(images)
    blurred = ops.gaussian_blur(gray, 5, 0)
    binary = ops.adaptive_threshold(blurred, 255, "gaussian", "binary_inv",
                                    11, jnp.int32(ct))
    se3 = np.ones((3, 3), np.uint8)
    binary = ops.morphology_ex(binary, "open", se3)
    binary = ops.morphology_ex(binary, "close", se3)
    return binary, gray


def _frames(b, h, w, seed, edge_blobs=False):
    rng = np.random.RandomState(seed)
    img = np.full((b, h, w, 3), 220, np.uint8)
    yy, xx = np.ogrid[:h, :w]
    for i in range(b):
        spots = [(rng.randint(0, h), rng.randint(0, w))] if edge_blobs \
            else []
        # blobs hugging every frame edge to exercise the border fixups
        if edge_blobs:
            spots += [(1, w // 2), (h - 2, w // 2), (h // 2, 1),
                      (h // 2, w - 2), (0, 0), (h - 1, w - 1)]
        for _ in range(4):
            spots.append((rng.randint(0, h), rng.randint(0, w)))
        for cy, cx in spots:
            r = rng.randint(2, 7)
            v = rng.randint(0, 70)
            m = (yy - cy) ** 2 + (xx - cx) ** 2 <= r * r
            img[i][m] = (v, v, v)
    return img


@pytest.mark.parametrize("hw,band", [((64, 96), 16), ((70, 128), 32),
                                     ((48, 64), 48),
                                     # H % band in 1..6: the bottom frame
                                     # edge sits inside band R-2's halo
                                     # window (regression: fixups were
                                     # gated on the last band only)
                                     ((35, 96), 16), ((100, 96), 48),
                                     ((81, 64), 16)])
def test_preprocess_tiled_matches_xla(hw, band):
    h, w = hw
    frames = jnp.asarray(_frames(2, h, w, seed=h + band))
    bin_t, gray_t = contamination_preprocess_tiled(frames, 15, band=band,
                                                   interpret=INTERP)
    bin_x, gray_x = _xla_chain(frames, 15)
    np.testing.assert_array_equal(np.asarray(gray_t), np.asarray(gray_x))
    np.testing.assert_array_equal(np.asarray(bin_t), np.asarray(bin_x))


def test_preprocess_tiled_edge_blobs():
    frames = jnp.asarray(_frames(2, 80, 96, seed=3, edge_blobs=True))
    bin_t, gray_t = contamination_preprocess_tiled(frames, 15, band=16,
                                                   interpret=INTERP)
    bin_x, gray_x = _xla_chain(frames, 15)
    np.testing.assert_array_equal(np.asarray(bin_t), np.asarray(bin_x))


def test_preprocess_tiled_noise_exact():
    rng = np.random.RandomState(9)
    frames = jnp.asarray(rng.randint(0, 256, (2, 64, 96, 3)).astype(
        np.uint8))
    bin_t, _ = contamination_preprocess_tiled(frames, 15, band=16,
                                              interpret=INTERP)
    bin_x, _ = _xla_chain(frames, 15)
    np.testing.assert_array_equal(np.asarray(bin_t), np.asarray(bin_x))


def test_preprocess_flood_seed_matches_prologue():
    """flood_seed=True must emit exactly the OR-flood initial state the
    XLA prologue of fill_holes_tiled computes, and the seeded fill must
    return the identical filled mask (r5: the prologue's bg/border/ext0
    planes and strided edge slices moved into the preprocess kernel)."""
    from heimdall_tpu.ops.ccl_tiled import fill_holes_tiled

    rng = np.random.RandomState(5)
    H, W, band = 70, 96, 32           # non-multiple height: pad rows live
    frames = np.full((2, H, W, 3), 220, np.uint8)
    for i in range(2):
        for _ in range(4):
            y, x = rng.randint(4, H - 4), rng.randint(4, W - 4)
            r = rng.randint(2, 9)
            yy, xx = np.ogrid[:H, :W]
            m = (yy - y) ** 2 + (xx - x) ** 2 <= r * r
            frames[i][m] = 30
    x = jnp.asarray(frames)

    binary, gray, ext0, edges0 = contamination_preprocess_tiled(
        x, jnp.int32(15), band=band, interpret=True, padded_out=True,
        flood_seed=True)
    b2, g2 = contamination_preprocess_tiled(
        x, jnp.int32(15), band=band, interpret=True, padded_out=True)
    np.testing.assert_array_equal(np.asarray(binary), np.asarray(b2))
    np.testing.assert_array_equal(np.asarray(gray), np.asarray(g2))

    # the prologue's values
    Hp = binary.shape[1]
    bg = (np.asarray(binary) == 0).astype(np.uint8)
    row = np.arange(Hp)[None, :, None]
    col = np.arange(W)[None, None, :]
    border = ((row == 0) | (row >= H - 1) | (col == 0)
              | (col == W - 1)).astype(np.uint8)
    ref_ext0 = bg * border
    np.testing.assert_array_equal(np.asarray(ext0), ref_ext0)
    R = Hp // band
    v0 = ref_ext0.reshape(2, R, band, W)
    ref_edges = np.stack([v0[:, :, 0], v0[:, :, band - 1]], axis=2)
    np.testing.assert_array_equal(np.asarray(edges0), ref_edges)

    # seeded fill == unseeded fill
    filled_seeded = fill_holes_tiled(binary, band=band, interpret=True,
                                     frame_h=H, seed=(ext0, edges0))
    filled_plain = fill_holes_tiled(binary > 0, band=band, interpret=True,
                                    frame_h=H)
    np.testing.assert_array_equal(np.asarray(filled_seeded),
                                  np.asarray(filled_plain))
