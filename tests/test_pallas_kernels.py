"""Fused Pallas kernel parity versus the XLA ops pipeline.

The kernel (ops/pallas_kernels.py) must reproduce the XLA path's
BlobTable exactly (same Q8 blur, float adaptive mean, morphology, hole
filling, CCL compact ordering, and stat formulas).  Runs in interpret
mode on CPU so the parity gate is part of the normal suite; the real-TPU
execution is exercised by bench.py and the detector backend tests.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from heimdall_tpu.ops.pallas_kernels import pallas_blob_table
from heimdall_tpu.detectors.contamination_detector import (
    contamination_program)


def _frames(n=2, h=64, w=128, seed=0):
    rng = np.random.RandomState(seed)
    frames = np.full((n, h, w, 3), 220, np.uint8)
    for i in range(n):
        for _ in range(3):
            y, x = rng.randint(8, h - 8), rng.randint(8, w - 8)
            r = rng.randint(2, 7)
            v = rng.randint(0, 60)
            yy, xx = np.ogrid[:h, :w]
            m = (yy - y) ** 2 + (xx - x) ** 2 <= r * r
            frames[i][m] = (v, v, v)
    return frames


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_pallas_matches_xla(seed):
    interpret = jax.default_backend() == "cpu"
    frames = jnp.asarray(_frames(seed=seed))
    t_pl = pallas_blob_table(frames, 15, max_blobs=32, sweeps=6,
                             interpret=interpret)
    t_xla, _, _ = contamination_program(
        frames, jnp.int32(15), jnp.float32(0.0), jnp.float32(1e9),
        jnp.float32(0.0), max_blobs=32, ccl_sweeps=6)

    np.testing.assert_array_equal(np.asarray(t_pl.valid),
                                  np.asarray(t_xla.valid))
    np.testing.assert_array_equal(np.asarray(t_pl.area_px),
                                  np.asarray(t_xla.area_px))
    np.testing.assert_allclose(np.asarray(t_pl.area),
                               np.asarray(t_xla.area), atol=1e-4)
    for f in ("cx", "cy", "x", "y", "w", "h"):
        np.testing.assert_array_equal(np.asarray(getattr(t_pl, f)),
                                      np.asarray(getattr(t_xla, f)),
                                      err_msg=f)
    for f in ("intensity_score", "shape_score", "color_score"):
        np.testing.assert_allclose(np.asarray(getattr(t_pl, f)),
                                   np.asarray(getattr(t_xla, f)),
                                   atol=1e-4, err_msg=f)
    np.testing.assert_array_equal(np.asarray(t_pl.n_blobs),
                                  np.asarray(t_xla.n_blobs))


def test_pallas_grayscale_matches_xla():
    """Mono8 [B, H, W] input runs the fused kernel directly (production
    cameras are grayscale — rust/heimdall-gige/src/camera.rs:48-68): no
    channel relayout, color sums skipped in-kernel, color_score 0.5 as in
    the reference (contamination_detector.py:157)."""
    interpret = jax.default_backend() == "cpu"
    gray = _frames(n=2, h=64, w=128, seed=9)[..., 0]
    t_pl = pallas_blob_table(jnp.asarray(gray), 15, max_blobs=16,
                             sweeps=2, adaptive=True, scan_steps=5,
                             interpret=interpret)
    t_xla, _, _ = contamination_program(
        jnp.asarray(gray), jnp.int32(15), jnp.float32(0.0),
        jnp.float32(1e9), jnp.float32(0.0), max_blobs=16, ccl_sweeps=6)
    for fld in ("valid", "area", "area_px", "cx", "cy", "x", "y", "w",
                "h", "color_score"):
        np.testing.assert_array_equal(np.asarray(getattr(t_pl, fld)),
                                      np.asarray(getattr(t_xla, fld)))
    np.testing.assert_allclose(np.asarray(t_pl.intensity_score),
                               np.asarray(t_xla.intensity_score),
                               atol=1e-5)
    valid = np.asarray(t_pl.valid)
    assert valid.any()
    assert (np.asarray(t_pl.color_score)[valid] == 0.5).all()


def test_pallas_channel_major_matches_nhwc():
    """[B, 3, H, W] input with channel_major=True (the production feeder
    layout — no per-call relayout) is bit-identical to NHWC."""
    interpret = jax.default_backend() == "cpu"
    frames = jnp.asarray(_frames(n=2, h=64, w=128, seed=11))
    t_a = pallas_blob_table(frames, 15, max_blobs=16, sweeps=2,
                            adaptive=True, scan_steps=5,
                            interpret=interpret)
    t_b = pallas_blob_table(jnp.transpose(frames, (0, 3, 1, 2)), 15,
                            max_blobs=16, sweeps=2, adaptive=True,
                            scan_steps=5, interpret=interpret,
                            channel_major=True)
    for fld in t_a._fields:
        np.testing.assert_array_equal(np.asarray(getattr(t_a, fld)),
                                      np.asarray(getattr(t_b, fld)))


@pytest.mark.parametrize("h,w", [(48, 96), (64, 100), (56, 72)])
def test_pallas_odd_sizes(h, w):
    """Non-lane-aligned frame sizes still match the XLA path."""
    interpret = jax.default_backend() == "cpu"
    frames = jnp.asarray(_frames(n=1, h=h, w=w, seed=5))
    t_pl = pallas_blob_table(frames, 15, max_blobs=16, sweeps=6,
                             interpret=interpret)
    t_xla, _, _ = contamination_program(
        frames, jnp.int32(15), jnp.float32(0.0), jnp.float32(1e9),
        jnp.float32(0.0), max_blobs=16, ccl_sweeps=6)
    np.testing.assert_array_equal(np.asarray(t_pl.area_px),
                                  np.asarray(t_xla.area_px))
    np.testing.assert_array_equal(np.asarray(t_pl.x), np.asarray(t_xla.x))


def test_detector_pallas_backend_matches_xla():
    """ContaminationDetector(backend=pallas) == backend=xla defect lists."""
    from heimdall_tpu.detectors.contamination_detector import (
        ContaminationDetector)
    frames = _frames(n=2, h=64, w=128, seed=3)
    kwargs = {"include_contours": False, "min_contaminant_size": 3}
    det_x = ContaminationDetector(config={**kwargs, "backend": "xla"})
    if jax.default_backend() == "cpu":
        import heimdall_tpu.ops.pallas_kernels as pk
        orig = pk.contamination_pallas

        def interp(*a, **k):
            k["interpret"] = True
            return orig(*a, **k)
        pk.contamination_pallas = interp
        try:
            det_p = ContaminationDetector(
                config={**kwargs, "backend": "pallas"})
            got_p = det_p.detect_batch(frames)
        finally:
            pk.contamination_pallas = orig
    else:
        det_p = ContaminationDetector(config={**kwargs, "backend": "pallas"})
        got_p = det_p.detect_batch(frames)
    got_x = det_x.detect_batch(frames)
    for a, b in zip(got_p, got_x):
        assert len(a) == len(b)
        for da, db in zip(a, b):
            assert da.position == db.position
            assert abs(da.confidence - db.confidence) < 1e-4


@pytest.mark.parametrize("seed", [7, 8])
def test_pallas_adaptive_exact_on_noise(seed):
    """adaptive=True must equal the XLA fixpoint (ccl_sweeps=0) even on
    percolating masks, where no fixed sweep budget converges.  Raw noise
    frames survive the open() as long tortuous components — the worst
    case for propagation-count heuristics."""
    interpret = jax.default_backend() == "cpu"
    rng = np.random.RandomState(seed)
    frames = jnp.asarray(rng.randint(0, 256, (2, 64, 128, 3)).astype(
        np.uint8))
    t_pl = pallas_blob_table(frames, 15, max_blobs=64, sweeps=1,
                             adaptive=True, interpret=interpret)
    t_xla, _, _ = contamination_program(
        frames, jnp.int32(15), jnp.float32(0.0), jnp.float32(1e9),
        jnp.float32(0.0), max_blobs=64, ccl_sweeps=0)
    np.testing.assert_array_equal(np.asarray(t_pl.n_blobs),
                                  np.asarray(t_xla.n_blobs))
    np.testing.assert_array_equal(np.asarray(t_pl.valid),
                                  np.asarray(t_xla.valid))
    np.testing.assert_array_equal(np.asarray(t_pl.area_px),
                                  np.asarray(t_xla.area_px))
    for f in ("cx", "cy", "x", "y", "w", "h"):
        np.testing.assert_array_equal(np.asarray(getattr(t_pl, f)),
                                      np.asarray(getattr(t_xla, f)),
                                      err_msg=f)
    for f in ("intensity_score", "shape_score", "color_score"):
        np.testing.assert_allclose(np.asarray(getattr(t_pl, f)),
                                   np.asarray(getattr(t_xla, f)),
                                   atol=1e-4, err_msg=f)


def test_pallas_adaptive_matches_fixed_on_typical_scene():
    """On the production-like scene the adaptive loop must reproduce the
    fixed-6-sweep table (both converge; ordering identical)."""
    interpret = jax.default_backend() == "cpu"
    frames = jnp.asarray(_frames(n=2, h=64, w=128, seed=4))
    t_a = pallas_blob_table(frames, 15, max_blobs=32, sweeps=1,
                            adaptive=True, interpret=interpret)
    t_f = pallas_blob_table(frames, 15, max_blobs=32, sweeps=6,
                            interpret=interpret)
    np.testing.assert_array_equal(np.asarray(t_a.area_px),
                                  np.asarray(t_f.area_px))
    np.testing.assert_array_equal(np.asarray(t_a.cx), np.asarray(t_f.cx))
    np.testing.assert_array_equal(np.asarray(t_a.cy), np.asarray(t_f.cy))
    np.testing.assert_array_equal(np.asarray(t_a.n_blobs),
                                  np.asarray(t_f.n_blobs))


def test_pallas_truncated_scans_match_full():
    """scan_steps truncates each CCL phase's doubling ladder; the adaptive
    fixpoint certificate keeps sweeping until converged, so the resulting
    tables must be IDENTICAL to full-width scans for any value (the
    detector defaults to 6 — ~8% whole-path win on v5e)."""
    interpret = jax.default_backend() == "cpu"
    frames = _frames(n=2, h=64, w=128, seed=7)
    # a wide hollow rectangle forces long runs + ring propagation
    frames[0, 10:12, 8:120] = 40
    frames[0, 50:52, 8:120] = 40
    frames[0, 10:52, 8:10] = 40
    frames[0, 10:52, 118:120] = 40
    frames = jnp.asarray(frames)
    base = pallas_blob_table(frames, 15, max_blobs=32, sweeps=1,
                             adaptive=True, interpret=interpret)
    for ss in (6, 3):
        got = pallas_blob_table(frames, 15, max_blobs=32, sweeps=1,
                                adaptive=True, interpret=interpret,
                                scan_steps=ss)
        for f in ("valid", "area_px", "cx", "cy", "x", "y", "w", "h",
                  "n_blobs"):
            np.testing.assert_array_equal(
                np.asarray(getattr(base, f)), np.asarray(getattr(got, f)),
                err_msg=f"scan_steps={ss} field {f}")


def _mask_frames(masks):
    """Stack binary masks into dark-on-white BGR frames."""
    out = []
    for m in masks:
        img = np.full(m.shape + (3,), 230, np.uint8)
        img[m > 0] = 20
        out.append(img)
    return jnp.asarray(np.stack(out))


def test_pallas_joint_label_matches_classic():
    """The joint dual-class fixpoint (_label_flood_joint: hole-fill + CCL
    + hole labeling in ONE loop) must be bit-equal to the classic
    fill->label composition — including the nesting case its loop-2
    feedback exists for (an fg island inside another component's hole
    merges with it, because the classic order fills the hole first)."""
    interpret = jax.default_backend() == "cpu"
    H, W = 96, 128
    yy, xx = np.mgrid[0:H, 0:W]

    def ring(cy, cx, r0, r1):
        d2 = (yy - cy) ** 2 + (xx - cx) ** 2
        return ((d2 >= r0 * r0) & (d2 <= r1 * r1)).astype(np.uint8)

    # nested rings + dot (3 nesting levels) + a separate blob
    nested = (ring(48, 40, 22, 26) | ring(48, 40, 10, 13)
              | (((yy - 48) ** 2 + (xx - 40) ** 2) <= 9).astype(np.uint8)
              | (((yy - 30) ** 2 + (xx - 100) ** 2) <= 49).astype(np.uint8))
    # U (cavity open to exterior) next to O (true hole)
    uo = np.zeros((H, W), np.uint8)
    uo[20:70, 10:13] = 1
    uo[20:70, 40:43] = 1
    uo[67:70, 10:43] = 1
    uo[20:70, 80:83] = 1
    uo[20:70, 110:113] = 1
    uo[20:23, 80:113] = 1
    uo[67:70, 80:113] = 1
    frames = _mask_frames([nested, uo])

    from heimdall_tpu.ops.pallas_kernels import contamination_pallas
    a = contamination_pallas(frames, 15, max_blobs=32, sweeps=2,
                             adaptive=True, scan_steps=5,
                             interpret=interpret, joint=False)
    b = contamination_pallas(frames, 15, max_blobs=32, sweeps=2,
                             adaptive=True, scan_steps=5,
                             interpret=interpret, joint=True)
    for name, x, y in zip(("sums", "bbox", "bgsum", "n"), a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y),
                                      err_msg=name)


def test_pallas_joint_blob_table_random():
    """Joint path end-to-end through pallas_blob_table on random scenes."""
    interpret = jax.default_backend() == "cpu"
    frames = jnp.asarray(_frames(n=3, h=64, w=128, seed=11))
    t_c = pallas_blob_table(frames, 15, max_blobs=32, sweeps=2,
                            adaptive=True, scan_steps=5,
                            interpret=interpret, joint=False)
    t_j = pallas_blob_table(frames, 15, max_blobs=32, sweeps=2,
                            adaptive=True, scan_steps=5,
                            interpret=interpret, joint=True)
    for f in ("valid", "area_px", "cx", "cy", "x", "y", "w", "h",
              "n_blobs"):
        np.testing.assert_array_equal(np.asarray(getattr(t_c, f)),
                                      np.asarray(getattr(t_j, f)),
                                      err_msg=f)


def test_pallas_runtable_matches_sweeps():
    """The run-table fill/CCL (r5: table fixpoints over per-row runs,
    per-frame fallback to plane sweeps on run overflow) must be
    bit-equal to the plane-sweep path, including when the fallback
    branch fires (a dense checkerboard patch exceeds any Rmax)."""
    interpret = jax.default_backend() == "cpu"
    from heimdall_tpu.ops.pallas_kernels import contamination_pallas

    H, W = 96, 128
    yy, xx = np.mgrid[0:H, 0:W]
    ring = (((yy - 48) ** 2 + (xx - 40) ** 2 >= 100)
            & ((yy - 48) ** 2 + (xx - 40) ** 2 <= 196))
    blob = ((yy - 30) ** 2 + (xx - 100) ** 2) <= 49
    board = np.zeros((H, W), bool)
    board[60:76, 60:124] = (np.indices((16, 64)).sum(0) % 2) > 0
    frames = _mask_frames([(ring | blob).astype(np.uint8),
                           (board | blob).astype(np.uint8)])

    kw = dict(max_blobs=32, sweeps=2, adaptive=True, scan_steps=5,
              interpret=interpret)
    a = contamination_pallas(frames, 15, **kw)
    b = contamination_pallas(frames, 15, rt_ccl=8, rt_fill=12, **kw)
    for name, x, y in zip(("sums", "bbox", "bgsum", "n"), a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y),
                                      err_msg=name)


def test_pallas_runtable_bench_scene():
    """rt path on the real bench scene generator (rect outline + disc +
    contaminants — the production-shaped geometry)."""
    interpret = jax.default_backend() == "cpu"
    from heimdall_tpu.ops.pallas_kernels import contamination_pallas
    import bench

    frames = jnp.asarray(bench.make_frames(4, seed=9))
    kw = dict(max_blobs=64, sweeps=2, adaptive=True, scan_steps=5,
              interpret=interpret)
    a = contamination_pallas(frames, 15, **kw)
    b = contamination_pallas(frames, 15, rt_ccl=8, rt_fill=12, **kw)
    for name, x, y in zip(("sums", "bbox", "bgsum", "n"), a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y),
                                      err_msg=name)


def test_pallas_runtable_fuzz_random_density():
    """Randomized property check for the fused-kernel run-table path:
    rt fill/CCL vs plane sweeps over masks from sparse to dense (some
    draws exceed the table widths and exercise the per-frame fallback)."""
    interpret = jax.default_backend() == "cpu"
    from heimdall_tpu.ops.pallas_kernels import contamination_pallas

    rng = np.random.RandomState(77)
    H, W = 64, 128
    yy, xx = np.mgrid[0:H, 0:W]
    masks = []
    for _ in range(6):
        m = np.zeros((H, W), np.uint8)
        for _ in range(rng.randint(1, 10)):
            kind = rng.randint(3)
            y, x = rng.randint(0, H), rng.randint(0, W)
            if kind == 0:
                r = rng.randint(1, 9)
                m |= ((yy - y) ** 2 + (xx - x) ** 2 <= r * r)
            elif kind == 1:
                r = rng.randint(4, 11)
                d2 = (yy - y) ** 2 + (xx - x) ** 2
                m |= ((d2 >= (r - 2) ** 2) & (d2 <= r * r))
            else:
                m[max(0, y - rng.randint(1, 16)):y + rng.randint(1, 16),
                  max(0, x - rng.randint(1, 24)):x + rng.randint(1, 24)] = 1
        masks.append(m)
    frames = _mask_frames(masks)
    kw = dict(max_blobs=32, sweeps=2, adaptive=True, scan_steps=5,
              interpret=interpret)
    a = contamination_pallas(frames, 15, **kw)
    b = contamination_pallas(frames, 15, rt_ccl=6, rt_fill=10, **kw)
    for name, x, y in zip(("sums", "bbox", "bgsum", "n"), a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y),
                                      err_msg=name)
