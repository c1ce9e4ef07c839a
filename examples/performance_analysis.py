#!/usr/bin/env python3
"""Profiling-session demo: per-stage timings + system metrics + reports.

Equivalent of rust/examples/performance_analysis.rs: a ProfilingSession
wrapping a simulated camera + TPU detection workload, producing a
multi-format performance report.
"""

import os as _os, sys as _sys
_REPO = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
_sys.path.insert(0, _REPO)

# Persistent compilation cache: without it every run recompiles the
# detector from scratch (~25 s unloaded, 300+ s under suite-level
# contention — the round-2 CI replay's one red test).
import jax  # noqa: E402
jax.config.update("jax_compilation_cache_dir",
                  _os.path.join(_REPO, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np  # noqa: E402

from heimdall_tpu.camera.hal import CameraFactory
from heimdall_tpu.detectors.contamination_detector import (
    ContaminationDetector)
from heimdall_tpu.perf.profiling import ProfilingManager
from heimdall_tpu.perf.reports import ReportFormat


def main():
    manager = ProfilingManager(output_dir="reports")
    session = manager.start_session("performance_analysis")

    camera = CameraFactory.create("simulator", "perf_cam",
                                  {"width": 640, "height": 480, "fps": 500})
    camera.initialize()
    camera.start_acquisition()
    detector = ContaminationDetector(config={"include_contours": False,
                                             "use_color": False})

    # warm-up (compile)
    with session.timing("compile"):
        detector.detect_batch(np.zeros((8, 480, 640), np.uint8))

    for batch_idx in range(5):
        with session.timing("acquire_batch"):
            frames = np.stack(
                [camera.acquire_frame().to_ndarray() for _ in range(8)])
        with session.timing("detect_batch"):
            results = detector.detect_batch(frames)
        session.increment("frames", len(frames))
        session.increment("defects", sum(len(r) for r in results))
        session.sample_system()

    camera.stop_acquisition()

    report = session.report()
    print(report.render(ReportFormat.TEXT))
    print()
    print(report.render(ReportFormat.MARKDOWN))
    path = manager.end_session("performance_analysis")
    print(f"\nJSON report saved to {path}")


if __name__ == "__main__":
    main()
