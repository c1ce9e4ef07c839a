#!/usr/bin/env python3
"""End-to-end model workflow: capture -> train -> quantize -> deploy.

The reference ships an empty ``models/`` placeholder (SURVEY.md §2); this
framework fills it with a learned-model family.  This example walks the
full loop on simulated line data:

  1. capture training frames + weak labels from the classical detector
     (models/capture.py — the same machinery stations use on-line via the
     ``capture_training_data`` config key),
  2. train the U-Net defect segmenter on the captured masks,
  3. post-training-quantize it to int8 (s8xs8->s32 convs on the MXU),
  4. drop the quantized model into the detector stack and compare its
     verdicts with the float model and the classical detector.

Run: python examples/model_training.py   (CPU-safe; a few minutes)
"""

import sys
import tempfile

import numpy as np

sys.path.insert(0, ".")

from heimdall_tpu.core.acquisition import SimulationImageSource
from heimdall_tpu.detectors.contamination_detector import (
    ContaminationDetector)
from heimdall_tpu.models.capture import TrainingDataCapture
from heimdall_tpu.models.segmentation import (DefectSegmenter,
                                              SegmentationDetector)
from heimdall_tpu.models.quantized import QuantizedSegmenter


def main():
    # 1. capture: classical detector provides weak labels -----------------
    src = SimulationImageSource("capture", {
        "width": 128, "height": 96, "seed": 7, "defect_probability": 1.0})
    src.open()
    det = ContaminationDetector(config={"include_contours": False,
                                        "min_contaminant_size": 3})
    capture_dir = tempfile.mkdtemp(prefix="heimdall_capture_")
    cap = TrainingDataCapture(capture_dir, shard_size=16)
    n_frames = 48
    frames = np.stack([src.read()[1] for _ in range(n_frames)])
    results = det.detect_batch(frames)
    n_def = cap.add_batch(frames, results)
    cap.flush()
    print(f"captured {n_frames} frames, {n_def} with defects, "
          f"shards in {capture_dir}")

    # 2. train the segmenter on captured masks ----------------------------
    imgs, masks = cap.dataset_masks()
    seg = DefectSegmenter(base=8, seed=0, learning_rate=3e-3)
    for step in range(80):
        loss = seg.train_step(imgs, masks)
        if step % 20 == 0:
            print(f"  train step {step}: loss {float(loss):.4f}")

    # 3. int8 post-training quantization ----------------------------------
    qseg = QuantizedSegmenter.from_segmenter(seg, imgs[:16])
    p_float = seg.predict(imgs[:8])
    p_int8 = qseg.predict(imgs[:8])
    agree = np.mean((p_float > 0.5) == (p_int8 > 0.5))
    print(f"int8 vs float mask agreement: {agree:.4f}")

    # 4. deploy through the detector stack --------------------------------
    test = np.stack([src.read()[1] for _ in range(8)])
    det_f = SegmentationDetector(seg, config={"min_contaminant_size": 3})
    det_q = SegmentationDetector(qseg, config={"min_contaminant_size": 3})
    for name, d in (("float", det_f), ("int8", det_q)):
        found = sum(len(r) for r in d.detect_batch(test))
        print(f"  {name} segmentation detector: {found} defects "
              f"on {len(test)} frames")
    classical = sum(len(r) for r in det.detect_batch(test))
    print(f"  classical detector: {classical} defects (reference count)")
    src.close()


if __name__ == "__main__":
    main()
