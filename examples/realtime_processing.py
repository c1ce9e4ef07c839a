#!/usr/bin/env python3
"""Real-time acquisition → TPU processing over the native ring buffer.

Equivalent of rust/examples/realtime_processing.rs: a pinned native
producer thread paces camera frames into the lock-free ring; the consumer
drains batches and runs the fused TPU contamination program; latency and
jitter statistics print at the end.
"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import time

import numpy as np

from heimdall_tpu.runtime.feeder import NativeCameraFeeder
from heimdall_tpu.detectors.contamination_detector import (
    ContaminationDetector)


def main():
    feeder = NativeCameraFeeder(width=640, height=480, fps=100,
                                defect_probability=0.3, capacity=64,
                                cpu=1, rt_priority=10, seed=7)
    detector = ContaminationDetector(config={"include_contours": False,
                                             "use_color": False})
    batch_size = 8
    n_batches = 10

    with feeder:
        # warm up the compiled program while frames accumulate
        warm = np.zeros((batch_size, 480, 640), np.uint8)
        detector.detect_batch(warm)

        total_defects = 0
        t0 = time.time()
        for b in range(n_batches):
            batch = feeder.ring.pop_batch(batch_size, timeout_s=2.0)
            if len(batch) == 0:
                continue
            results = detector.detect_batch(batch)
            defects = sum(len(r) for r in results)
            total_defects += defects
            print(f"batch {b}: {len(batch)} frames, {defects} defects")
        elapsed = time.time() - t0

        stats = feeder.stats()
    print(f"\nprocessed {n_batches * batch_size} frames in {elapsed:.2f}s")
    print(f"total defects: {total_defects}")
    print(f"ring stats: {stats}")


if __name__ == "__main__":
    main()
