"""Int8 quantized segmentation inference (models/quantized.py).

Gates: the manual float replica matches the flax forward bit-for-bit, the
int8 model's probability maps track the float model closely (IoU of the
thresholded masks), persistence round-trips, and the quantized model drops
into SegmentationDetector unchanged.
"""

import os

import numpy as np

import jax.numpy as jnp

from heimdall_tpu.models.segmentation import (DefectSegmenter,
                                              SegmentationDetector,
                                              _to_model_input)
from heimdall_tpu.models.quantized import (QuantizedSegmenter,
                                           _float_forward_taps)


def _scene(n, h=48, w=64, seed=0):
    rng = np.random.RandomState(seed)
    frames = np.full((n, h, w, 3), 210, np.uint8)
    masks = np.zeros((n, h, w), bool)
    yy, xx = np.ogrid[:h, :w]
    for i in range(n):
        cy, cx = rng.randint(10, h - 10), rng.randint(10, w - 10)
        r = rng.randint(3, 7)
        m = (yy - cy) ** 2 + (xx - cx) ** 2 <= r * r
        frames[i][m] = 30
        masks[i] = m
    return frames, masks


def _trained_segmenter(steps=60):
    frames, masks = _scene(16, seed=1)
    seg = DefectSegmenter(base=8, seed=0, learning_rate=3e-3)
    for _ in range(steps):
        seg.train_step(frames, masks)
    return seg, frames


def test_float_replica_matches_flax():
    seg, frames = _trained_segmenter(steps=5)
    x, _ = _to_model_input(frames[:4])
    want = np.asarray(seg._predict(seg.params, x))
    logits, taps = _float_forward_taps(seg.params, x)
    got = np.asarray(jnp.asarray(logits)[..., 0])
    got = 1.0 / (1.0 + np.exp(-got))
    np.testing.assert_allclose(got, want, atol=1e-5)
    assert set(taps) == {f"Conv_{i}" for i in range(8)} | {
        "ConvTranspose_0", "ConvTranspose_1"}


def test_quantized_tracks_float():
    seg, frames = _trained_segmenter()
    qseg = QuantizedSegmenter.from_segmenter(seg, frames[:8])
    test_frames, test_masks = _scene(4, seed=99)
    p_f = seg.predict(test_frames)
    p_q = qseg.predict(test_frames)
    assert p_q.shape == p_f.shape
    m_f = p_f >= 0.5
    m_q = p_q >= 0.5
    inter = (m_f & m_q).sum()
    union = (m_f | m_q).sum()
    assert union == 0 or inter / union > 0.8, (inter, union)
    # probability maps agree closely where the float model is confident
    conf = (p_f < 0.2) | (p_f > 0.8)
    assert np.abs(p_q - p_f)[conf].mean() < 0.05
    # and the quantized model still localizes the defect
    on = p_q[test_masks].mean()
    off = p_q[~test_masks].mean()
    assert on > off + 0.2, (on, off)


def test_save_load_roundtrip(tmp_path):
    seg, frames = _trained_segmenter(steps=10)
    qseg = QuantizedSegmenter.from_segmenter(seg, frames[:4])
    path = os.path.join(tmp_path, "qseg.npz")
    qseg.save(path)
    qseg2 = QuantizedSegmenter.load(path)
    test_frames, _ = _scene(2, seed=5)
    np.testing.assert_allclose(qseg.predict(test_frames),
                               qseg2.predict(test_frames), atol=1e-6)


def test_quantized_in_segmentation_detector():
    seg, frames = _trained_segmenter()
    qseg = QuantizedSegmenter.from_segmenter(seg, frames[:8])
    det = SegmentationDetector(qseg, config={"threshold": 0.5,
                                             "min_contaminant_size": 3})
    test_frames, test_masks = _scene(2, seed=7)
    results = det.detect_batch(test_frames)
    assert len(results) == 2
    for i, defects in enumerate(results):
        assert len(defects) >= 1
        d = max(defects, key=lambda d: d.size)
        ys, xs = np.nonzero(test_masks[i])
        cy, cx = ys.mean(), xs.mean()
        assert abs(d.position[0] - cx) < 6 and abs(d.position[1] - cy) < 6
