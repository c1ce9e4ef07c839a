"""Table-global fill+CCL (ops/runtable_tiled.py) parity vs the banded
flood + band-CCL + interface-merge composition, on the detector's
padded-IO contract.  Interpret mode on CPU."""

import numpy as np

import jax
import jax.numpy as jnp

from heimdall_tpu.ops.ccl_tiled import (fill_holes_tiled,
                                        connected_components_tiled)
from heimdall_tpu.ops.runtable_tiled import fill_label_runtable_tiled
from heimdall_tpu.detectors.contamination_detector import (
    contamination_program)


def _pad_binary(mask, band):
    B, H, W = mask.shape
    Hp = -(-H // band) * band
    out = np.zeros((B, Hp, W), np.uint8)
    out[:, :H] = mask * np.uint8(255)
    return out


def _check(mask, band, K=16, r_bg=12, r_fg=10):
    B, H, W = mask.shape
    binary = jnp.asarray(_pad_binary(mask, band))
    got = fill_label_runtable_tiled(binary, band=band, frame_h=H,
                                    max_blobs=K, r_bg=r_bg, r_fg=r_fg,
                                    interpret=True)
    g_mask, g_lab, g_rl, g_nb, g_sl, g_sc = got

    ref_mask = fill_holes_tiled(binary > 0, band=band, interpret=True,
                                frame_h=H)
    ref = connected_components_tiled(ref_mask, connectivity=8, band=band,
                                     sweeps=2, adaptive=True,
                                     interpret=True, return_roots=K,
                                     band_slots=True, frame_h=H)
    r_lab, r_rl, r_nb, r_sl, r_sc = ref
    np.testing.assert_array_equal(np.asarray(g_mask), np.asarray(ref_mask))
    np.testing.assert_array_equal(np.asarray(g_lab), np.asarray(r_lab))
    np.testing.assert_array_equal(np.asarray(g_rl), np.asarray(r_rl))
    np.testing.assert_array_equal(np.asarray(g_nb), np.asarray(r_nb))
    np.testing.assert_array_equal(np.asarray(g_sc), np.asarray(r_sc))
    # slot_list beyond slot_count is argsort-order arbitrary: compare the
    # occupied prefixes as SETS per band (both must name the same slots)
    sl_g, sl_r = np.asarray(g_sl), np.asarray(r_sl)
    sc = np.asarray(r_sc)
    for b in range(sc.shape[0]):
        for band_i in range(sc.shape[1]):
            n = sc[b, band_i]
            assert set(sl_g[b, band_i, :n]) == set(sl_r[b, band_i, :n])


def _shapes(H=70, W=96):
    yy, xx = np.mgrid[0:H, 0:W]
    ring = (((yy - 30) ** 2 + (xx - 30) ** 2 >= 64)
            & ((yy - 30) ** 2 + (xx - 30) ** 2 <= 144)).astype(np.uint8)
    blob = (((yy - 50) ** 2 + (xx - 70) ** 2) <= 36).astype(np.uint8)
    tall = np.zeros((H, W), np.uint8)
    tall[5:65, 80:84] = 1               # spans several bands
    return yy, xx, ring, blob, tall


def test_runtable_tiled_basic():
    _, _, ring, blob, tall = _shapes()
    _check(np.stack([ring | blob, tall | blob]), band=16)


def test_runtable_tiled_band_spanning_and_edges():
    H, W = 70, 96
    yy, xx, ring, blob, tall = _shapes(H, W)
    m = np.zeros((H, W), np.uint8)
    m[0:8, 0:30] = 1                    # touches top + left border
    m[-6:, 60:] = 1                     # bottom-right corner
    m |= ring
    u = np.zeros((H, W), np.uint8)      # U open to border next to O
    u[10:60, 4:7] = 1
    u[10:60, 30:33] = 1
    u[57:60, 4:33] = 1
    u[10:60, 50:53] = 1
    u[10:60, 76:79] = 1
    u[10:13, 50:79] = 1
    u[57:60, 50:79] = 1
    _check(np.stack([m, u]), band=16)


def test_runtable_tiled_fallback_paths():
    H, W = 70, 96
    board = np.zeros((H, W), np.uint8)
    board[20:40, 10:90] = (np.indices((20, 80)).sum(0) % 2)
    # board: > r_bg/r_fg runs per row -> both fallbacks fire
    _check(board[None], band=16)
    # empty and full
    _check(np.zeros((1, H, W), np.uint8), band=16)
    _check(np.ones((1, H, W), np.uint8), band=16)


def test_runtable_tiled_full_program_parity():
    """contamination_program(tiled_runtable=True) == (False) end to end
    on a bench-shaped scene (non-band-multiple height)."""
    rng = np.random.RandomState(4)
    H, W = 70, 96
    frames = np.full((2, H, W, 3), 220, np.uint8)
    for i in range(2):
        for _ in range(4):
            y, x = rng.randint(6, H - 6), rng.randint(6, W - 6)
            r = rng.randint(2, 10)
            yy, xx = np.ogrid[:H, :W]
            frames[i][(yy - y) ** 2 + (xx - x) ** 2 <= r * r] = 25
    x = jnp.asarray(frames)
    args = (jnp.int32(15), jnp.float32(0.0), jnp.float32(1e9),
            jnp.float32(0.0))
    a = contamination_program(x, *args, max_blobs=16, tiled_band=32,
                              tiled_runtable=True)
    b = contamination_program(x, *args, max_blobs=16, tiled_band=32,
                              tiled_runtable=False)
    for ta, tb in ((a, b),):
        for f in ("valid", "area_px", "cx", "cy", "x", "y", "w", "h",
                  "n_blobs"):
            np.testing.assert_array_equal(
                np.asarray(getattr(ta[0], f)), np.asarray(getattr(tb[0], f)),
                err_msg=f)
        np.testing.assert_array_equal(np.asarray(ta[2]), np.asarray(tb[2]))


def test_runtable_tiled_fuzz_random_density():
    """Randomized property check: table-global vs banded composition on
    masks sweeping density from sparse specks to near-overflow run
    counts (some draws trip the fallback guards — both paths must agree
    everywhere)."""
    rng = np.random.RandomState(123)
    H, W, band = 64, 96, 16
    yy, xx = np.mgrid[0:H, 0:W]
    masks = []
    for trial in range(10):
        m = np.zeros((H, W), np.uint8)
        n_obj = rng.randint(1, 12)
        for _ in range(n_obj):
            kind = rng.randint(3)
            y, x = rng.randint(0, H), rng.randint(0, W)
            if kind == 0:          # disc
                r = rng.randint(1, 10)
                m |= ((yy - y) ** 2 + (xx - x) ** 2 <= r * r)
            elif kind == 1:        # ring (hole maker)
                r = rng.randint(4, 12)
                d2 = (yy - y) ** 2 + (xx - x) ** 2
                m |= ((d2 >= (r - 2) ** 2) & (d2 <= r * r))
            else:                  # bar
                h2, w2 = rng.randint(1, 20), rng.randint(1, 30)
                m[max(0, y - h2):y + h2, max(0, x - w2):x + w2] = 1
        masks.append(m)
    for i in range(0, len(masks), 2):
        _check(np.stack(masks[i:i + 2]), band=band, r_bg=8, r_fg=7)
