"""Banded Pallas blob-stats parity vs the XLA blob_stats.

blob_stats_tiled (ops/stats_tiled.py) must reproduce ops.blobs.blob_stats
field-for-field — blob_stats is itself OpenCV-parity (tests/test_blobs.py),
so equality here carries the parity chain to the 2 MP path.  Runs in Pallas
interpret mode on CPU.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from heimdall_tpu.ops import blobs as blobs_mod
from heimdall_tpu.ops.ccl import connected_components, fill_holes
from heimdall_tpu.ops.ccl_tiled import connected_components_tiled
from heimdall_tpu.ops.stats_tiled import blob_stats_tiled

INTERP = jax.default_backend() == "cpu"


def _scene(b, h, w, n_blobs, seed):
    """Random blob scene: mask + gray + color frames."""
    rng = np.random.RandomState(seed)
    mask = np.zeros((b, h, w), bool)
    yy, xx = np.ogrid[:h, :w]
    for i in range(b):
        for _ in range(n_blobs):
            cy, cx = rng.randint(3, h - 3), rng.randint(3, w - 3)
            r = rng.randint(2, 9)
            mask[i] |= (yy - cy) ** 2 + (xx - cx) ** 2 <= r * r
    color = rng.randint(0, 255, (b, h, w, 3)).astype(np.uint8)
    gray = color.mean(axis=-1).astype(np.uint8)
    return mask, gray, color


def _tables_equal(t0, t1):
    for f in t0._fields:
        np.testing.assert_allclose(np.asarray(getattr(t0, f)),
                                   np.asarray(getattr(t1, f)),
                                   atol=1e-5, err_msg=f)


@pytest.mark.parametrize("use_color", [True, False])
@pytest.mark.parametrize("hw,band", [((64, 96), 16), ((50, 48), 16)])
def test_stats_tiled_matches_xla(use_color, hw, band):
    h, w = hw
    mask, gray, color = _scene(2, h, w, 6, seed=h + use_color)
    mask = jnp.asarray(fill_holes(jnp.asarray(mask)))
    labels = connected_components(mask)
    _, rl, nb = connected_components_tiled(
        mask, band=band, sweeps=2, adaptive=True, interpret=INTERP,
        return_roots=16)
    ref = blobs_mod.blob_stats(labels, mask, jnp.asarray(gray),
                               jnp.asarray(color), max_blobs=16,
                               use_color=use_color)
    got = blob_stats_tiled(labels, mask, jnp.asarray(gray),
                           jnp.asarray(color), band=band, max_blobs=16,
                           use_color=use_color, root_table=rl,
                           root_count=nb, interpret=INTERP)
    _tables_equal(ref, got)


def test_stats_tiled_overflow_counted():
    # more blobs than table capacity: first-K raster blobs kept, n_blobs
    # reports the true count — identical to the XLA contract
    mask, gray, color = _scene(1, 64, 96, 14, seed=3)
    mask = jnp.asarray(fill_holes(jnp.asarray(mask)))
    labels = connected_components(mask)
    K = 4
    _, rl, nb = connected_components_tiled(
        mask, band=16, sweeps=2, adaptive=True, interpret=INTERP,
        return_roots=K)
    ref = blobs_mod.blob_stats(labels, mask, jnp.asarray(gray),
                               jnp.asarray(color), max_blobs=K)
    got = blob_stats_tiled(labels, mask, jnp.asarray(gray),
                           jnp.asarray(color), band=16, max_blobs=K,
                           root_table=rl, root_count=nb, interpret=INTERP)
    _tables_equal(ref, got)
    assert int(np.asarray(got.n_blobs)[0]) > K


def test_stats_tiled_empty_frame():
    mask = jnp.zeros((2, 48, 64), bool)
    labels = connected_components(mask)
    _, rl, nb = connected_components_tiled(
        mask, band=16, sweeps=1, adaptive=True, interpret=INTERP,
        return_roots=8)
    gray = jnp.zeros((2, 48, 64), jnp.uint8)
    got = blob_stats_tiled(labels, mask, gray, None, band=16, max_blobs=8,
                           root_table=rl, root_count=nb, interpret=INTERP)
    assert not np.asarray(got.valid).any()
    assert (np.asarray(got.n_blobs) == 0).all()


def test_band_slot_incidence_exact():
    """slot_list/slot_count from band_slots=True must mark slot k present
    in band r iff some pixel of band r carries label rl[k]."""
    mask, _, _ = _scene(2, 64, 96, 8, seed=11)
    mask = jnp.asarray(fill_holes(jnp.asarray(mask)))
    band = 16
    lab, rl, nb, sl, sc = connected_components_tiled(
        mask, band=band, sweeps=2, adaptive=True, interpret=INTERP,
        return_roots=16, band_slots=True)
    lab_np, rl_np = np.asarray(lab), np.asarray(rl)
    sl_np, sc_np = np.asarray(sl), np.asarray(sc)
    B, H, W = lab_np.shape
    R = -(-H // band)
    for b in range(B):
        for r in range(R):
            rows = lab_np[b, r * band:(r + 1) * band]
            want = {k for k in range(16)
                    if rl_np[b, k] < H * W and (rows == rl_np[b, k]).any()}
            got = set(sl_np[b, r, :sc_np[b, r]].tolist())
            assert got == want, (b, r, got, want)


def test_stats_tiled_with_slots_matches_without():
    mask, gray, color = _scene(2, 64, 96, 7, seed=21)
    mask = jnp.asarray(fill_holes(jnp.asarray(mask)))
    band = 16
    lab, rl, nb, sl, sc = connected_components_tiled(
        mask, band=band, sweeps=2, adaptive=True, interpret=INTERP,
        return_roots=16, band_slots=True)
    base = blob_stats_tiled(lab, mask, jnp.asarray(gray),
                            jnp.asarray(color), band=band, max_blobs=16,
                            root_table=rl, root_count=nb, interpret=INTERP)
    slotted = blob_stats_tiled(lab, mask, jnp.asarray(gray),
                               jnp.asarray(color), band=band, max_blobs=16,
                               root_table=rl, root_count=nb,
                               slot_list=sl, slot_count=sc,
                               interpret=INTERP)
    _tables_equal(base, slotted)


def test_stats_tiled_chunked_batch_matches():
    """B > 32 triggers the SMEM-bounded lax.map chunking (ops/stats_tiled
    _batch_chunk): results must be identical to the unchunked contract.
    At the 2 MP design point B=128 the slot tables alone need 1.13 MB of
    the core's 1 MB SMEM — chunking is what makes that batch compile."""
    from heimdall_tpu.ops.stats_tiled import _batch_chunk, _SAFE_WORDS
    assert _batch_chunk(128) == 32
    # non-divisible batches keep the full measured-safe chunk (padding in
    # _chunked_call absorbs the remainder) — a prime batch no longer
    # degrades to B sequential batch-1 invocations
    assert _batch_chunk(48) == 32
    assert _batch_chunk(37) == 32
    assert _batch_chunk(7) == 7
    # heavier scalar-prefetch footprints shrink the cap proportionally so
    # the SMEM budget holds for any K/R, lighter ones never exceed the
    # measured-safe 32
    assert _batch_chunk(128, 2 * _SAFE_WORDS) == 16
    assert _batch_chunk(128, 64 * _SAFE_WORDS) == 1
    assert _batch_chunk(128, 10) == 32

    mask, gray, color = _scene(34, 32, 48, 4, seed=5)
    mask = jnp.asarray(fill_holes(jnp.asarray(mask)))
    band = 16
    lab, rl, nb, sl, sc = connected_components_tiled(
        mask, band=band, sweeps=2, adaptive=True, interpret=INTERP,
        return_roots=16, band_slots=True)
    got = blob_stats_tiled(lab, mask, jnp.asarray(gray),
                           jnp.asarray(color), band=band, max_blobs=16,
                           root_table=rl, root_count=nb,
                           slot_list=sl, slot_count=sc, interpret=INTERP)
    labels = connected_components(mask)
    ref = blobs_mod.blob_stats(labels, mask, jnp.asarray(gray),
                               jnp.asarray(color), max_blobs=16)
    _tables_equal(ref, got)


@pytest.mark.parametrize("use_color", [True, False])
def test_stats_tiled_coarse_stats_band(use_color):
    """stats_band coarsening: stats kernels on 3x-wider bands than the
    CCL's incidence lists, via the one-hot group-OR list coarsening.
    Shape chosen so Hp (= 96) is divisible by both band (16) and
    stats_band (48) — the eligibility gate the 2 MP path hits
    (Hp 1152 = 9*128 = 3*384)."""
    h, w = 96, 64
    mask, gray, color = _scene(2, h, w, 7, seed=31 + use_color)
    mask = jnp.asarray(fill_holes(jnp.asarray(mask)))
    labels = connected_components(mask)
    _, rl, nb, sl, sc = connected_components_tiled(
        mask, band=16, sweeps=2, adaptive=True, interpret=INTERP,
        return_roots=16, band_slots=True)
    base = blob_stats_tiled(labels, mask, jnp.asarray(gray),
                            jnp.asarray(color), band=16, max_blobs=16,
                            use_color=use_color, root_table=rl,
                            root_count=nb, slot_list=sl, slot_count=sc,
                            interpret=INTERP)
    coarse = blob_stats_tiled(labels, mask, jnp.asarray(gray),
                              jnp.asarray(color), band=16, max_blobs=16,
                              use_color=use_color, root_table=rl,
                              root_count=nb, slot_list=sl, slot_count=sc,
                              interpret=INTERP, stats_band=48)
    _tables_equal(base, coarse)
