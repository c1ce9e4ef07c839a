"""Banded per-slot statistics in the fused kernel: parity vs the XLA path.

The fused kernel's stats loop reduces over dynamic [_STATS_BAND, W] row
bands walked down from each blob's root row (ops/pallas_kernels.py,
``banded_stats``).  The walk's correctness rests on components being
row-contiguous; these tests pin the edge cases of the band machinery:

  * blob taller than one band (multi-band accumulation + the `low`
    double-count guard after clamping),
  * blob at the frame bottom (clamped band start),
  * blob at the top-left corner (band start 0, boundary pixels on the
    image border),
  * several blobs in one band (independent slot walks).

Reference rebuilt: heimdall/detectors/contamination_detector.py:95-177
(the per-contour stats loop).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from heimdall_tpu.ops.pallas_kernels import pallas_blob_table, _STATS_BAND
from heimdall_tpu.detectors.contamination_detector import (
    contamination_program)

INT_FIELDS = ("valid", "area_px", "cx", "cy", "x", "y", "w", "h", "n_blobs")
FLOAT_FIELDS = ("area", "intensity_diff", "intensity_score", "shape_score",
                "color_score")


@pytest.mark.skipif(jax.default_backend() != "cpu",
                    reason="interpret-mode test")
def test_banded_stats_parity_edge_cases():
    H, W, B = 2 * _STATS_BAND, 128, 3
    frames = np.full((B, H, W, 3), 200, np.uint8)
    # frame 0: small speck + mid-frame blob (the typical one-band case)
    frames[0, 10:20, 30:40] = 20
    frames[0, 200:240, 60:100] = 35
    # frame 1: tall blob spanning two bands
    frames[1, 100:230, 50:60] = 10
    # frame 2: bottom blob (clamped band) + top-left corner blob
    frames[2, 240:252, 5:15] = 50
    frames[2, 0:6, 0:6] = 60
    ct = 15

    tbl = pallas_blob_table(jnp.asarray(frames), ct, max_blobs=8,
                            sweeps=2, adaptive=True, interpret=True)
    want, _, _ = contamination_program(jnp.asarray(frames), ct, 1, 10 ** 9,
                                       0.0, max_blobs=8)
    assert int(np.asarray(tbl.n_blobs).sum()) == 5
    for f in INT_FIELDS:
        a, b = np.asarray(getattr(tbl, f)), np.asarray(getattr(want, f))
        assert (a == b).all(), f
    for f in FLOAT_FIELDS:
        a, b = np.asarray(getattr(tbl, f)), np.asarray(getattr(want, f))
        assert np.allclose(a, b, atol=1e-5), f
