"""Segmentation model family + live training-data capture.

End-to-end closed loop the reference never built: capture frames from the
line → rasterize masks → train the U-Net until it localizes defects →
SegmentationDetector emits Defect records through the standard blob-table
machinery.
"""

import numpy as np
import pytest

from heimdall_tpu.models.capture import TrainingDataCapture
from heimdall_tpu.models.segmentation import (DefectSegmenter,
                                              SegmentationDetector)


def _scene(n, h=48, w=64, seed=0):
    """Bright frames with one dark disc; returns frames + true masks."""
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


class TestSegmenter:
    def test_training_reduces_loss_and_localizes(self):
        frames, masks = _scene(16, seed=1)
        seg = DefectSegmenter(base=8, seed=0, learning_rate=3e-3)
        losses = [seg.train_step(frames, masks) for _ in range(60)]
        assert losses[-1] < losses[0] * 0.5, (losses[0], losses[-1])

        test_frames, test_masks = _scene(4, seed=99)
        prob = seg.predict(test_frames)
        assert prob.shape == test_masks.shape
        # prediction concentrates on the defect
        on = prob[test_masks].mean()
        off = prob[~test_masks].mean()
        assert on > off + 0.2, (on, off)

    def test_detector_adapter_emits_defects(self):
        frames, masks = _scene(16, seed=2)
        seg = DefectSegmenter(base=8, seed=0, learning_rate=3e-3)
        for _ in range(60):
            seg.train_step(frames, masks)
        det = SegmentationDetector(seg, config={"threshold": 0.5,
                                                "min_contaminant_size": 3})
        test_frames, test_masks = _scene(2, seed=7)
        results = det.detect_batch(test_frames)
        assert len(results) == 2
        for i, defects in enumerate(results):
            assert len(defects) >= 1
            d = max(defects, key=lambda d: d.size)
            ys, xs = np.nonzero(test_masks[i])
            cy, cx = ys.mean(), xs.mean()
            assert abs(d.position[0] - cx) < 6
            assert abs(d.position[1] - cy) < 6
            assert d.defect_type == "segmented_defect"

    def test_save_load_roundtrip(self, tmp_path):
        frames, masks = _scene(4)
        seg = DefectSegmenter(base=8, seed=0)
        seg.train_step(frames, masks)
        p = tmp_path / "seg.msgpack"
        seg.save(str(p))
        seg2 = DefectSegmenter(base=8, seed=123)
        seg2.load(str(p))
        np.testing.assert_allclose(seg.predict(frames[:1]),
                                   seg2.predict(frames[:1]), atol=1e-6)


class TestCapture:
    def _defect(self, x, y, w, h, conf=0.8):
        from heimdall_tpu.detectors.base import Defect
        return Defect("contamination", (x + w // 2, y + h // 2),
                      float(w * h), conf,
                      metadata={"bounding_box": (x, y, w, h)})

    def test_shard_roundtrip(self, tmp_path):
        cap = TrainingDataCapture(str(tmp_path), shard_size=4,
                                  sample_rate=0.0)
        frames, _ = _scene(8, seed=3)
        kept = 0
        for i in range(8):
            defects = [self._defect(10, 12, 6, 6)] if i % 2 == 0 else []
            kept += int(cap.add(frames[i], defects))
        # only defect frames kept (sample_rate 0); flush the remainder
        assert kept == 4
        cap.flush()
        shards = list(cap.iter_shards())
        assert sum(s["frames"].shape[0] for s in shards) == 4
        f, m = cap.dataset_masks()
        assert f.shape[0] == 4 and m.shape == f.shape[:3]
        assert m[0, 12:18, 10:16].all() and not m[0, 0:5, 0:5].any()

    def test_station_capture_wiring(self, tmp_path):
        import time
        from heimdall_tpu.core.system import System
        system = System()
        system.config.add_camera("cam_cap", {
            "type": "simulation", "width": 96, "height": 64, "seed": 4,
            "defect_probability": 1.0})
        system.add_station("cap_station", {
            "camera_id": "cam_cap",
            "inspector": "contamination",
            "inspector_config": {"contamination_detector_config": {
                "min_contaminant_size": 3, "contrast_threshold": 25,
                "min_confidence": 0.1, "include_contours": False}},
            "batch_size": 2,
            "capture_training_data": str(tmp_path),
            "capture_sample_rate": 1.0,
        })
        station = system.stations["cap_station"]
        assert station.capture is not None
        station.start()
        deadline = time.time() + 120
        while time.time() < deadline and station.capture.captured < 2:
            time.sleep(0.2)
        station.stop()
        station.capture.flush()
        assert station.capture.captured >= 2
        f, m = station.capture.dataset_masks()
        assert f.shape[0] >= 2
