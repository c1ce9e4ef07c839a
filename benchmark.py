#!/usr/bin/env python3
"""A/B benchmark harness: TPU path vs native C++ scalar path vs (optional)
OpenCV.

API-compatible with the reference benchmark.py:28-150 (argparse -i/-t/-f,
contamination-detection and image-processing benchmarks with mean-over-N
timing and speedup printout), with the Rust side replaced by the C++
native bridge and the Python/OpenCV side replaced by the TPU detector
(OpenCV itself is also timed when installed, giving the true
reference-baseline comparison).

bench.py (repo root) is the driver-facing single-metric benchmark; this
script is the human-facing A/B tool.
"""

import argparse
import sys
import time

import numpy as np


def make_image(width=640, height=480, n_defects=2, seed=0):
    from heimdall_tpu.utils import draw
    rng = np.random.RandomState(seed)
    img = np.full((height, width, 3), 220, np.uint8)
    draw.filled_circle(img, (width // 2, height // 2 + 100), 95,
                       (80, 80, 80))
    for _ in range(n_defects):
        x = rng.randint(width // 4, 3 * width // 4)
        y = rng.randint(height // 4, 3 * height // 4)
        r = rng.randint(5, 15)
        draw.filled_circle(img, (x, y), r, (30, 30, 30))
    return img


def benchmark_contamination_detection(iterations: int, image: np.ndarray,
                                      batch: int = 8) -> None:
    print("=== contamination detection ===")
    from heimdall_tpu.detectors.contamination_detector import (
        ContaminationDetector)
    from heimdall_tpu import native_bridge

    # the production backend is the fused Pallas path; fall back to the
    # XLA composition when the Mosaic toolchain is unavailable
    det = ContaminationDetector(config={"include_contours": False,
                                        "backend": "pallas"})
    try:
        det.detect(image)  # compile
    except Exception:  # noqa: BLE001
        det = ContaminationDetector(config={"include_contours": False})
        det.detect(image)
    start = time.time()
    for _ in range(iterations):
        defects = det.detect(image)
    tpu_single = (time.time() - start) / iterations
    print(f"TPU single-frame:  {tpu_single*1000:8.2f} ms/frame "
          f"({len(defects)} defects)")

    # pipelined sustained throughput: detect_batch syncs per call, which
    # in this environment pays a ~24 ms network-tunnel ack per dispatch —
    # the production driver (and bench.py) keep batches in flight, so the
    # fair batched number issues all dispatches then forces once.
    frames = np.stack([image] * batch)
    x_dev = None
    try:
        import jax
        x_dev = jax.device_put(frames, jax.devices()[0])
    except Exception:  # noqa: BLE001
        pass
    det.run_device(x_dev if x_dev is not None else frames)  # compile
    iters_b = max(iterations, 8)
    start = time.time()
    pending = [det.run_device(x_dev if x_dev is not None else frames)[2]
               for _ in range(iters_b)]
    for acc in pending:
        np.asarray(acc[0, 0])
    tpu_batch = (time.time() - start) / iters_b / batch
    print(f"TPU batched (N={batch}, pipelined): "
          f"{tpu_batch*1000:8.2f} ms/frame")

    if native_bridge.is_available():
        out = native_bridge.benchmark_processing(image,
                                                 iterations=iterations)
        native_ms = out.get("native_ms_per_frame")
        if native_ms:
            print(f"Native C++ scalar: {native_ms:8.2f} ms/frame")
            print(f"TPU-batched speedup vs native: "
                  f"{native_ms / (tpu_batch*1000):.1f}x")

    try:
        import cv2
        sys.path.insert(0, "tests")
        from test_detector_parity import cv2_oracle
        start = time.time()
        for _ in range(iterations):
            cv2_oracle(image)
        cv_ms = (time.time() - start) / iterations * 1000
        print(f"OpenCV reference:  {cv_ms:8.2f} ms/frame")
        print(f"TPU-batched speedup vs OpenCV: {cv_ms/(tpu_batch*1000):.1f}x")
    except ImportError:
        pass


def benchmark_image_processing(iterations: int, image: np.ndarray) -> None:
    print("=== preprocessing pipelines ===")
    from heimdall_tpu.core.pipeline import PipelineFactory
    for ptype in ("basic", "contamination"):
        pipe = PipelineFactory.create_pipeline("bench", ptype)
        pipe.process_batch(image[None])  # compile
        start = time.time()
        for _ in range(iterations):
            pipe.process_batch(image[None])
        ms = (time.time() - start) / iterations * 1000
        print(f"{ptype:>14s}: {ms:8.2f} ms/frame")


def benchmark_acquisition(iterations: int) -> None:
    """Per-SyncMode multi-camera acquisition timing (the reference's
    criterion scenarios, gige/benches/acquisition_bench.rs:11-88)."""
    print("=== acquisition (4 simulated cameras) ===")
    from heimdall_tpu.camera.gige import GigESystem, SyncMode
    for mode in (SyncMode.SOFTWARE, SyncMode.HARDWARE, SyncMode.FREERUN):
        system = GigESystem(backend="simulator", sync_mode=mode)
        for i in range(4):
            system.add_camera(f"cam_{i}", {"width": 640, "height": 480,
                                           "fps": 10_000,
                                           "pattern": "bottle"})
        system.configure()
        system.start()
        system.acquire_frames(timeout_s=5.0)  # warm
        start = time.time()
        for _ in range(iterations):
            system.acquire_frames(timeout_s=5.0)
        ms = (time.time() - start) / iterations * 1000
        system.stop()
        print(f"{mode:>10s}: {ms:8.2f} ms/frameset "
              f"({'PASS' if ms <= 5.0 else 'over'} the 5 ms gate)")


def main(argv=None):
    parser = argparse.ArgumentParser(
        description="Heimdall TPU A/B benchmark")
    parser.add_argument("-i", "--iterations", type=int, default=10)
    parser.add_argument("-t", "--test",
                        choices=["detection", "processing", "acquisition",
                                 "all"], default="all")
    parser.add_argument("-f", "--file", type=str,
                        help="benchmark this image instead of synthetic")
    parser.add_argument("-b", "--batch", type=int, default=8)
    args = parser.parse_args(argv)

    if args.file:
        import cv2
        image = cv2.imread(args.file)
        if image is None:
            print(f"cannot read {args.file}", file=sys.stderr)
            return 1
    else:
        image = make_image()

    if args.test in ("detection", "all"):
        benchmark_contamination_detection(args.iterations, image,
                                          args.batch)
    if args.test in ("processing", "all"):
        benchmark_image_processing(args.iterations, image)
    if args.test in ("acquisition", "all"):
        benchmark_acquisition(args.iterations)
    return 0


if __name__ == "__main__":
    sys.exit(main())
