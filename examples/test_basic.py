#!/usr/bin/env python3
"""Basic smoke demo: simulation source + 2-stage pipeline with timings.

Equivalent of the reference's heimdall/test_basic.py:17-80 (without the
cv2.imshow display dependency): generate simulated frames, run a small
pipeline, print per-stage timings.
"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import numpy as np

from heimdall_tpu.core.acquisition import SimulationImageSource
from heimdall_tpu.core.pipeline import (GaussianBlurStage, GrayscaleStage,
                                        Pipeline)


def main():
    source = SimulationImageSource("demo", {"width": 640, "height": 480,
                                            "defect_probability": 0.5,
                                            "seed": 42})
    source.open()

    pipeline = Pipeline("basic_demo", instrumented=True)
    pipeline.add_stage(GrayscaleStage("grayscale"))
    pipeline.add_stage(GaussianBlurStage("blur", {"kernel_size": 5}))

    for i in range(3):
        ok, frame = source.read()
        assert ok
        ctx = pipeline.process(frame)
        print(f"frame {i}: success={ctx['success']} "
              f"result={ctx['result_image'].shape}")
        for stage, t in ctx["stage_times"].items():
            print(f"  {stage}: {t*1000:.2f} ms")
    source.close()
    print("basic pipeline OK")


if __name__ == "__main__":
    main()
