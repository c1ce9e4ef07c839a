#!/usr/bin/env python3
"""Full production-line simulation: 4 cameras → TPU → verdicts → rejection.

BASELINE.json config #5: "full line simulation: 4-camera acquisition →
preprocess → detect → verdict at 90,000 BPH".  Four simulated GigE cameras
produce synchronized FrameSets; sets accumulate into device batches; the
fused TPU program returns per-frame verdicts; rejects fire delayed PLC
pulses.  The loop reports sustained bottles/hour and whether the 90k BPH /
<10 ms-per-bottle gates hold.

Usage: python examples/line_simulation.py [seconds] [bottles_per_trigger]
"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import sys
import time

import numpy as np

from heimdall_tpu.camera.gige import GigESystem, SyncMode
from heimdall_tpu.detectors.contamination_detector import (
    ContaminationDetector)
from heimdall_tpu.runtime.plc import RejectionController
from heimdall_tpu.perf.metrics import SlidingWindow

TARGET_BPH = 90_000


def main(duration_s: float = 10.0, sets_per_batch: int = 8,
         width: int = 640, height: int = 480):
    system = GigESystem(backend="simulator", sync_mode=SyncMode.SOFTWARE)
    for i in range(4):
        system.add_camera(f"cam_{i}", {"width": width, "height": height,
                                       "fps": 10_000, "pattern": "bottle"})
    system.configure()
    system.start()

    detector = ContaminationDetector(config={"include_contours": False,
                                             "use_color": False})
    rejector = RejectionController(delay_ms=100, pulse_duration_ms=50)
    latency_ms = SlidingWindow(1000)

    # compile with the production batch shape
    warm = np.zeros((4 * sets_per_batch, height, width), np.uint8)
    detector.detect_batch(warm)

    bottles = 0
    rejects = 0
    t_start = time.time()
    while time.time() - t_start < duration_s:
        t0 = time.time()
        framesets = [system.acquire_frames() for _ in range(sets_per_batch)]
        batch = np.concatenate([fs.to_batch() for fs in framesets])
        results = detector.detect_batch(batch)
        t_batch = time.time() - t0

        # one bottle per frameset; reject when any of its 4 views flags
        for s, fs in enumerate(framesets):
            views = results[4 * s: 4 * (s + 1)]
            bottles += 1
            if any(views):
                conf = max(d.confidence for v in views for d in v)
                rejector.reject("line", confidence=conf)
                rejects += 1
        latency_ms.push(t_batch / sets_per_batch * 1000)

    elapsed = time.time() - t_start
    system.stop()

    bph = bottles / elapsed * 3600
    per_bottle_ms = latency_ms.avg()
    p99_ms = latency_ms.percentile(99)
    print(f"\nbottles inspected: {bottles} in {elapsed:.1f}s")
    print(f"throughput: {bph:,.0f} BPH "
          f"({'PASS' if bph >= TARGET_BPH else 'below'} the "
          f"{TARGET_BPH:,} BPH target)")
    print(f"per-bottle processing: avg {per_bottle_ms:.2f} ms, "
          f"p99 {p99_ms:.2f} ms "
          f"({'PASS' if p99_ms < 10 else 'above'} the 10 ms deadline)")
    print(f"rejects: {rejects} ({rejects/max(bottles,1)*100:.1f}%), "
          f"pulses fired: {rejector.stats()['fired']}")
    print(f"sync stats: {system.sync_manager.stats()}")
    return bph, p99_ms


if __name__ == "__main__":
    duration = float(sys.argv[1]) if len(sys.argv) > 1 else 10.0
    spb = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    main(duration, spb)
