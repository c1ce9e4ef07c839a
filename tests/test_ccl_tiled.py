"""Tiled (band-local + merge) CCL parity versus the whole-frame XLA ops.

The tiled path (ops/ccl_tiled.py) must produce byte-identical label images
and hole fills to ops/ccl.py for any mask, including components that snake
across many band boundaries — that equality is what lets the detector swap
it in for large frames.  Runs in Pallas interpret mode on CPU.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from heimdall_tpu.ops import ccl
from heimdall_tpu.ops.ccl_tiled import (connected_components_tiled,
                                        fill_holes_tiled)

INTERP = jax.default_backend() == "cpu"


def _random_masks(n, h, w, seed, density=0.35):
    rng = np.random.RandomState(seed)
    return rng.rand(n, h, w) < density


def _snake(h, w, pitch=6):
    """A single serpentine component traversing every band many times."""
    m = np.zeros((h, w), bool)
    m[:, ::pitch] = True            # vertical rails crossing all bands
    for i, y in enumerate(range(0, h, pitch)):
        if i % 2 == 0:
            m[y, :] = True
        else:
            m[min(y + pitch // 2, h - 1), :] = True
    return m


def _spiral(h, w):
    m = np.zeros((h, w), bool)
    top, bot, left, right = 0, h - 1, 0, w - 1
    while top <= bot and left <= right:
        m[top, left:right + 1] = True
        m[top:bot + 1, right] = True
        m[bot, left:right + 1] = True
        m[top:bot + 1, left] = True
        top += 4
        bot -= 4
        left += 4
        right -= 4
    return m


@pytest.mark.parametrize("connectivity", [4, 8])
@pytest.mark.parametrize("hw,band", [((64, 96), 16), ((100, 48), 32),
                                     ((33, 40), 8)])
def test_tiled_labels_match_xla(connectivity, hw, band):
    h, w = hw
    # subcritical density: components stay compact enough that the fixed
    # sweep budget reaches the same fixpoint the XLA while_loop does (the
    # fixed-sweeps contract matches the fused whole-frame kernel; percolating
    # random masks need unbounded sweeps under ANY fixed budget)
    density = 0.35 if connectivity == 4 else 0.22
    masks = _random_masks(3, h, w, seed=connectivity + h, density=density)
    ref = ccl.connected_components(jnp.asarray(masks),
                                   connectivity=connectivity)
    got = connected_components_tiled(jnp.asarray(masks),
                                     connectivity=connectivity, band=band,
                                     sweeps=16, interpret=INTERP)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_single_component_across_all_bands():
    m = _snake(96, 64)[None]
    ref = ccl.connected_components(jnp.asarray(m))
    got = connected_components_tiled(jnp.asarray(m), band=16, sweeps=12,
                                     interpret=INTERP)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))
    # really one component
    lab = np.asarray(got)[0]
    assert len(np.unique(lab[m[0]])) == 1


def test_spiral_across_bands():
    m = _spiral(64, 64)[None]
    ref = ccl.connected_components(jnp.asarray(m))
    got = connected_components_tiled(jnp.asarray(m), band=16, sweeps=20,
                                     interpret=INTERP)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_band_taller_than_image_is_whole_frame():
    masks = _random_masks(2, 24, 40, seed=9, density=0.22)
    ref = ccl.connected_components(jnp.asarray(masks))
    got = connected_components_tiled(jnp.asarray(masks), band=64, sweeps=16,
                                     interpret=INTERP)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


@pytest.mark.parametrize("hw,band", [((64, 96), 16), ((50, 48), 16)])
def test_tiled_fill_holes_matches_xla(hw, band):
    h, w = hw
    rng = np.random.RandomState(h)
    masks = np.zeros((3, h, w), bool)
    yy, xx = np.ogrid[:h, :w]
    for i in range(3):
        for _ in range(4):  # rings (hollow blobs) straddling band borders
            cy, cx = rng.randint(5, h - 5), rng.randint(5, w - 5)
            r = rng.randint(4, 14)
            d2 = (yy - cy) ** 2 + (xx - cx) ** 2
            masks[i] |= (d2 <= r * r) & (d2 >= (r - 2) ** 2)
    ref = ccl.fill_holes(jnp.asarray(masks))
    got = fill_holes_tiled(jnp.asarray(masks), band=band, sweeps=10,
                           interpret=INTERP)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_fill_holes_background_through_other_band():
    # A C-shaped cavity: background region in band 0 that reaches the
    # frame border only through band 2 — band-local reasoning would call
    # it a hole; the merged labels must not.
    h, w = 48, 32
    m = np.zeros((h, w), bool)
    m[4, 4:28] = True            # top wall (band 0)
    m[4:44, 4] = True            # left wall
    m[4:44, 27] = True           # right wall
    # no bottom wall: cavity opens to the border through bands 1-2
    ref = ccl.fill_holes(jnp.asarray(m[None]))
    got = fill_holes_tiled(jnp.asarray(m[None]), band=16, sweeps=10,
                           interpret=INTERP)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))
    assert np.array_equal(np.asarray(got)[0], m)  # nothing filled


def test_contamination_program_tiled_matches_untiled():
    # End-to-end wiring: the full detection program with band-tiled CCL must
    # reproduce the whole-frame program's blob table and acceptance bit-for-bit.
    from heimdall_tpu.detectors.contamination_detector import (
        contamination_program)

    rng = np.random.RandomState(3)
    h, w = 96, 128
    frames = np.full((2, h, w, 3), 215, np.uint8)
    yy, xx = np.ogrid[:h, :w]
    for i in range(2):
        for _ in range(4):
            cy, cx = rng.randint(10, h - 10), rng.randint(10, w - 10)
            r = rng.randint(2, 8)
            m = (yy - cy) ** 2 + (xx - cx) ** 2 <= r * r
            frames[i][m] = rng.randint(0, 60)
    args = (jnp.asarray(frames), jnp.int32(15), jnp.float32(3.0),
            jnp.float32(3000.0), jnp.float32(0.2))
    t0, c0, a0, l0 = contamination_program(*args, return_labels=True,
                                           ccl_sweeps=6)
    t1, c1, a1, l1 = contamination_program(*args, return_labels=True,
                                           ccl_sweeps=6, tiled_band=32)
    np.testing.assert_array_equal(np.asarray(l0), np.asarray(l1))
    np.testing.assert_array_equal(np.asarray(a0), np.asarray(a1))
    np.testing.assert_allclose(np.asarray(c0), np.asarray(c1), atol=1e-6)
    for f in t0._fields:
        np.testing.assert_allclose(np.asarray(getattr(t0, f)),
                                   np.asarray(getattr(t1, f)),
                                   atol=1e-5, err_msg=f)


def test_program_tiled_padded_and_channel_major():
    # The shared-padded-layout flow (frame_h contract): a height NOT
    # divisible by the band exercises real pad rows through preprocess,
    # flood, CCL and stats; channel_major=True must be bit-identical to
    # NHWC input (r3: the 2MP path consumes feeder planes natively).
    from heimdall_tpu.detectors.contamination_detector import (
        contamination_program)

    rng = np.random.RandomState(7)
    h, w = 90, 128                       # Hp = 96 at band 32: 6 pad rows
    frames = np.full((2, h, w, 3), 215, np.uint8)
    yy, xx = np.ogrid[:h, :w]
    for i in range(2):
        for _ in range(4):
            cy, cx = rng.randint(8, h - 8), rng.randint(8, w - 8)
            r = rng.randint(2, 7)
            m = (yy - cy) ** 2 + (xx - cx) ** 2 <= r * r
            frames[i][m] = rng.randint(0, 60)
    gates = (jnp.int32(15), jnp.float32(3.0), jnp.float32(3000.0),
             jnp.float32(0.2))
    t0, c0, a0, l0 = contamination_program(jnp.asarray(frames), *gates,
                                           return_labels=True, ccl_sweeps=6)
    t1, c1, a1, l1 = contamination_program(jnp.asarray(frames), *gates,
                                           return_labels=True, ccl_sweeps=6,
                                           tiled_band=32)
    cmf = jnp.asarray(np.ascontiguousarray(frames.transpose(0, 3, 1, 2)))
    t2, c2, a2, l2 = contamination_program(cmf, *gates, return_labels=True,
                                           ccl_sweeps=6, tiled_band=32,
                                           channel_major=True)
    np.testing.assert_array_equal(np.asarray(l0), np.asarray(l1))
    np.testing.assert_array_equal(np.asarray(l1), np.asarray(l2))
    for (a, b) in ((a0, a1), (a1, a2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    np.testing.assert_allclose(np.asarray(c0), np.asarray(c1), atol=1e-6)
    np.testing.assert_allclose(np.asarray(c1), np.asarray(c2), atol=0)
    for f in t0._fields:
        np.testing.assert_allclose(np.asarray(getattr(t0, f)),
                                   np.asarray(getattr(t1, f)),
                                   atol=1e-5, err_msg=f)
        np.testing.assert_allclose(np.asarray(getattr(t1, f)),
                                   np.asarray(getattr(t2, f)),
                                   atol=0, err_msg=f)


def test_merge_overflow_falls_back_to_exact_path():
    # More real cross-band edges than _MAX_CHANGED: 512 one-pixel-wide
    # stripes each spanning 4 bands -> 1536 valid interface edges, above the
    # compacted-edge cap, so the cond must take the dense-gather fallback
    # and still produce exact labels.
    m = np.zeros((1, 32, 1024), bool)
    m[:, :, ::2] = True
    ref = ccl.connected_components(jnp.asarray(m))
    got = connected_components_tiled(jnp.asarray(m), band=8, sweeps=4,
                                     interpret=INTERP)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


@pytest.mark.parametrize("connectivity", [4, 8])
def test_adaptive_exact_on_percolating_masks(connectivity):
    # High-density random masks percolate: no fixed sweep budget suffices.
    # adaptive=True must still match the XLA while-loop fixpoint exactly
    # even from a single initial sweep.
    masks = _random_masks(2, 64, 96, seed=41, density=0.55)
    ref = ccl.connected_components(jnp.asarray(masks),
                                   connectivity=connectivity)
    got = connected_components_tiled(jnp.asarray(masks),
                                     connectivity=connectivity, band=16,
                                     sweeps=1, adaptive=True,
                                     interpret=INTERP)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_adaptive_spiral_one_initial_sweep():
    m = _spiral(64, 64)[None]
    ref = ccl.connected_components(jnp.asarray(m))
    got = connected_components_tiled(jnp.asarray(m), band=16, sweeps=1,
                                     adaptive=True, interpret=INTERP)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_adaptive_fill_holes_exact():
    masks = _random_masks(2, 64, 96, seed=7, density=0.5)
    ref = ccl.fill_holes(jnp.asarray(masks))
    got = fill_holes_tiled(jnp.asarray(masks), band=16, sweeps=1,
                           adaptive=True, interpret=INTERP)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_adaptive_return_roots_exact():
    masks = _random_masks(2, 48, 64, seed=13, density=0.5)
    lab_ref = ccl.connected_components(jnp.asarray(masks))
    lab, rl, n = connected_components_tiled(
        jnp.asarray(masks), band=16, sweeps=1, adaptive=True,
        interpret=INTERP, return_roots=8)
    np.testing.assert_array_equal(np.asarray(lab), np.asarray(lab_ref))
    lab_np = np.asarray(lab_ref)
    h, w = 48, 64
    for i in range(2):
        lin = np.arange(h * w).reshape(h, w)
        roots = np.sort(lin[(lab_np[i] == lin) & masks[i]])
        assert int(np.asarray(n)[i]) == roots.size
        want = np.full(8, h * w)
        want[:min(8, roots.size)] = roots[:8]
        np.testing.assert_array_equal(np.asarray(rl)[i], want)


def test_return_roots_matches_topk():
    rng = np.random.RandomState(5)
    h, w = 64, 96
    masks = np.zeros((2, h, w), bool)
    yy, xx = np.ogrid[:h, :w]
    for i in range(2):
        for _ in range(7):
            cy, cx = rng.randint(4, h - 4), rng.randint(4, w - 4)
            r = rng.randint(2, 9)
            masks[i] |= (yy - cy) ** 2 + (xx - cx) ** 2 <= r * r
    lab, rl, n = connected_components_tiled(
        jnp.asarray(masks), band=16, sweeps=10, interpret=INTERP,
        return_roots=8)
    lab_np = np.asarray(lab)
    for i in range(2):
        lin = np.arange(h * w).reshape(h, w)
        roots = np.sort(lin[(lab_np[i] == lin) & masks[i]])
        assert int(np.asarray(n)[i]) == roots.size
        want = np.full(8, h * w)
        want[:min(8, roots.size)] = roots[:8]
        np.testing.assert_array_equal(np.asarray(rl)[i], want)
