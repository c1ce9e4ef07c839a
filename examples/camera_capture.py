#!/usr/bin/env python3
"""Capture frames from a (simulated) camera and print frame stats.

Equivalent of the reference example rust/examples/camera_capture.rs:
create a camera via the factory, acquire N frames, report timing.
"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import time

from heimdall_tpu.camera.hal import CameraFactory


def main():
    camera = CameraFactory.create("simulator", "demo_cam",
                                  {"width": 640, "height": 480, "fps": 60})
    camera.initialize()
    camera.start_acquisition()
    print(f"camera: {camera.info()}")

    start = time.time()
    n = 30
    for i in range(n):
        frame = camera.acquire_frame()
        img = frame.to_ndarray()
        print(f"frame {frame.frame_id}: shape={img.shape} "
              f"mean={img.mean():.1f} min={img.min()} max={img.max()}")
    elapsed = time.time() - start
    camera.stop_acquisition()
    print(f"{n} frames in {elapsed:.2f}s = {n/elapsed:.1f} fps")


if __name__ == "__main__":
    main()
