#!/usr/bin/env python3
"""Benchmark: batched contamination inspection throughput on one TPU chip.

Reproduces BASELINE.json config #3 (the headline metric): N-frame batched
contamination inspection — grayscale → Gaussian blur → adaptive threshold →
morphology → connected-component labeling → per-blob defect stats — on
640x480 BGR frames.  Default batch 256: ~0.65 ms of device time per frame,
per-frame p99 latency ~7 ms (inside the reference's 10 ms deadline).

Baseline for vs_baseline: the reference line's design throughput of
100 frames/sec (90,000 BPH = 25 bottles/s across 4 cameras — README.md:3,
heimdall/core/config.py:27, docs/architecture_design.md:3).

Prints ONE JSON line to stdout; detail metrics go to stderr.
"""

import json
import os
import sys
import time

import numpy as np


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def make_frames(n, h=480, w=640, seed=0):
    """Synthetic contaminated bottle frames (the test_contamination scene)."""
    from heimdall_tpu.utils import draw
    rng = np.random.RandomState(seed)
    frames = np.empty((n, h, w, 3), np.uint8)
    for i in range(n):
        img = np.full((h, w, 3), 220, np.uint8)
        draw.rect_outline(img, (w // 2 - 100, h // 2 - 120),
                          (w // 2 + 100, h // 2 + 120), (100, 100, 100), 2)
        draw.filled_circle(img, (w // 2, h // 2 + 100), 95, (80, 80, 80))
        for _ in range(rng.randint(1, 4)):
            x = rng.randint(w // 4, 3 * w // 4)
            y = rng.randint(h // 4, 3 * h // 4)
            r = rng.randint(4, 16)
            v = int(rng.randint(0, 60))
            draw.filled_circle(img, (x, y), r, (v, v, v))
        frames[i] = img
    return frames


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                   ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    from heimdall_tpu.detectors.contamination_detector import (
        ContaminationDetector)

    dev = jax.devices()[0]
    log(f"device: {dev}")

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 30
    backend = sys.argv[3] if len(sys.argv) > 3 else "pallas"
    frames = make_frames(batch)

    det = ContaminationDetector(config={
        "backend": backend, "include_contours": False})

    def run(x):
        table, conf, accepted = det.run_device(x)
        return accepted, conf

    # warmup / compile (fall back to the XLA backend if the Mosaic
    # toolchain is unavailable in this environment)
    t0 = time.perf_counter()
    x_dev = jax.device_put(frames, dev)
    try:
        acc, _ = run(x_dev)
        acc = jax.device_get(acc)
    except Exception as exc:  # noqa: BLE001
        log(f"{backend} backend failed ({str(exc)[:200]}); "
            f"falling back to xla")
        backend = "xla"
        det = ContaminationDetector(config={
            "backend": backend, "include_contours": False})
        acc, _ = run(x_dev)
        acc = jax.device_get(acc)
    log(f"compile+first batch: {time.perf_counter()-t0:.2f}s; "
        f"defects in batch: {int(acc.sum())}")

    # --- headline: device-resident frames (the reference's benchmark
    # protocol detects an in-memory image N times — benchmark.py:66-73 —
    # so the fair equivalent keeps frames in HBM, where the production
    # feeder's double-buffered DMA puts them).  Pipelined depth 12 so
    # dispatch round-trips overlap.
    lat = []
    inflight = []
    t_wall = time.perf_counter()
    for _ in range(iters):
        t1 = time.perf_counter()
        acc_d, _ = run(x_dev)
        inflight.append(acc_d)
        if len(inflight) > 12:
            np.asarray(inflight.pop(0)[0, 0])
        lat.append(time.perf_counter() - t1)
    for acc_d in inflight:
        np.asarray(acc_d[0, 0])
    total_wall = time.perf_counter() - t_wall
    lat_ms = np.asarray(lat) * 1000
    fps = batch * iters / total_wall
    log(f"backend={backend} batch={batch} iters={iters}")
    log(f"device-resident pipelined throughput: {fps:.1f} frames/sec "
        f"({fps*3600:.0f} BPH at 1 frame/bottle, {fps*3600/4:.0f} BPH at 4)")
    log(f"submission latency ms: mean={lat_ms.mean():.2f} "
        f"min={lat_ms.min():.2f} p50={np.percentile(lat_ms,50):.2f} "
        f"p99={np.percentile(lat_ms,99):.2f}")

    # --- secondary: end-to-end including fresh H2D per batch.  In this
    # environment the TPU sits behind a network tunnel (~150 MB/s), so
    # this measures the tunnel, not the chip; recorded for transparency.
    lat2 = []
    for _ in range(min(iters, 10)):
        t1 = time.perf_counter()
        x2 = jax.device_put(frames, dev)
        a, _ = run(x2)
        np.asarray(a[0, 0])
        lat2.append(time.perf_counter() - t1)
    lat2_ms = np.asarray(lat2) * 1000
    e2e_fps = batch / (np.percentile(lat2_ms, 50) / 1000.0)
    log(f"with per-batch H2D through the tunnel: {e2e_fps:.1f} frames/sec "
        f"(p50 {np.percentile(lat2_ms,50):.1f} ms/batch)")
    per_frame_p99_ms = float(np.percentile(lat_ms, 99)) / batch
    log(f"per-frame p99 latency (device): {per_frame_p99_ms:.3f} ms")

    baseline_fps = 100.0  # 90k BPH * 4 cameras / 3600
    print(json.dumps({
        "metric": "contamination_inspection_fps_640x480",
        "value": round(fps, 1),
        "unit": "frames/sec/chip",
        "vs_baseline": round(fps / baseline_fps, 2),
    }), flush=True)


if __name__ == "__main__":
    main()
