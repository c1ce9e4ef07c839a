#!/usr/bin/env python3
"""Multi-camera synchronized inspection line.

Equivalent of rust/examples/gige_bottle_inspection.rs: discover simulated
GigE cameras, acquire synchronized FrameSets, batch them onto the TPU for
contamination detection, print per-set verdicts and diagnostics.
"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import numpy as np

from heimdall_tpu.camera.gige import GigESystem, SyncMode
from heimdall_tpu.detectors.contamination_detector import (
    ContaminationDetector)


def main():
    system = GigESystem(backend="simulator", sync_mode=SyncMode.SOFTWARE)
    for i in range(4):
        system.add_camera(f"cam_{i}", {"width": 640, "height": 480,
                                       "fps": 1000})
    system.configure()
    system.start()

    detector = ContaminationDetector(config={"include_contours": False,
                                             "use_color": False})
    try:
        for trigger in range(5):
            frameset = system.acquire_frames()
            batch = frameset.to_batch()             # [4, H, W]
            results = detector.detect_batch(batch)
            verdicts = ["REJECT" if d else "pass" for d in results]
            print(f"trigger {trigger}: frame_id={frameset.frame_id} "
                  f"verdicts={verdicts}")
    finally:
        system.stop()

    print("\ndiagnostics:")
    system.start()
    for key, value in system.diagnostics().items():
        print(f"  {key}: {value}")
    system.stop()


if __name__ == "__main__":
    main()
