#!/usr/bin/env python3
"""Benchmark: batched contamination inspection throughput on one TPU chip.

Reproduces BASELINE.json config #3 (the headline metric): N-frame batched
contamination inspection — grayscale → Gaussian blur → adaptive threshold →
morphology → connected-component labeling → per-blob defect stats — on
640x480 BGR frames, end-to-end per batch: host→HBM transfer of the uint8
frames, the fused device program, and D2H of the (small) blob tables.

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
    import jax.numpy as jnp
    from heimdall_tpu.detectors.contamination_detector import (
        ContaminationDetector)
    from heimdall_tpu.ops import blobs as blobs_mod

    dev = jax.devices()[0]
    log(f"device: {dev}")

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 30
    backend = sys.argv[3] if len(sys.argv) > 3 else "pallas"
    frames = make_frames(batch)

    det = ContaminationDetector(config={
        "backend": backend, "include_contours": False})

    def run(frames_host):
        x = jax.device_put(frames_host, dev)
        table, conf, accepted = det.run_device(x)
        return jax.device_get(accepted), jax.device_get(conf)

    # warmup / compile
    t0 = time.perf_counter()
    acc, _ = run(frames)
    log(f"compile+first batch: {time.perf_counter()-t0:.2f}s; "
        f"defects in batch: {int(acc.sum())}")

    # timed loop (fresh H2D each iteration — the production path)
    lat = []
    for _ in range(iters):
        t1 = time.perf_counter()
        run(frames)
        lat.append(time.perf_counter() - t1)

    lat_ms = np.asarray(lat) * 1000
    # median-based throughput: the remote-tunnel transport adds rare
    # multi-second stalls unrelated to device time; median reflects the
    # sustained rate the chip delivers.
    p50 = float(np.percentile(lat_ms, 50))
    fps = batch / (p50 / 1000.0)
    per_frame_p99_ms = float(np.percentile(lat_ms, 99)) / batch
    log(f"backend={backend} batch={batch} iters={iters}")
    log(f"throughput (median batch latency): {fps:.1f} frames/sec "
        f"({fps*3600:.0f} BPH at 1 frame/bottle, {fps*3600/4:.0f} BPH at 4)")
    log(f"batch latency ms: mean={lat_ms.mean():.2f} min={lat_ms.min():.2f} "
        f"p50={p50:.2f} p99={np.percentile(lat_ms,99):.2f}")
    log(f"per-frame p99 latency: {per_frame_p99_ms:.3f} ms")

    baseline_fps = 100.0  # 90k BPH * 4 cameras / 3600
    print(json.dumps({
        "metric": "contamination_inspection_fps_640x480",
        "value": round(fps, 1),
        "unit": "frames/sec/chip",
        "vs_baseline": round(fps / baseline_fps, 2),
    }), flush=True)


if __name__ == "__main__":
    main()
