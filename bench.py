#!/usr/bin/env python3
"""Benchmark: batched contamination inspection throughput on one TPU chip.

Reproduces BASELINE.json config #3 (the headline metric): N-frame batched
contamination inspection — grayscale → Gaussian blur → adaptive threshold →
morphology → connected-component labeling → per-blob defect stats — on
640x480 BGR frames.  Default batch 256: ~0.4 ms of device time per frame
with the adaptive fixpoint kernels (~2500 fps/chip), per-frame p99 latency
~3 ms (inside the reference's 10 ms deadline).

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

    # --- the remaining BASELINE.json configs (stderr detail) -------------
    # config #1: single-image contamination detect (test_contamination)
    one = jax.device_put(frames[:1], dev)
    run(one)  # compile the batch-1 shape
    lat1 = []
    for _ in range(10):
        t1 = time.perf_counter()
        a, _ = run(one)
        np.asarray(a[0, 0])
        lat1.append(time.perf_counter() - t1)
    log(f"config#1 single-image detect: "
        f"p50 {np.percentile(np.asarray(lat1)*1000, 50):.2f} ms")

    # config #2: preprocessing only (gray + blur + adaptive threshold)
    import jax.numpy as jnp
    from heimdall_tpu import ops

    @jax.jit
    def preprocess(x):
        g = ops.bgr_to_gray(x)
        b = ops.gaussian_blur(g, 5)
        return ops.adaptive_threshold(b, 255, "gaussian", "binary_inv",
                                      11, jnp.int32(15))
    xb = jax.device_put(frames, dev)
    np.asarray(preprocess(xb)[0, 0, 0])
    lat2b = []
    for _ in range(10):
        t1 = time.perf_counter()
        r = preprocess(xb)
        np.asarray(r[0, 0, 0])
        lat2b.append(time.perf_counter() - t1)
    pre_ms = np.percentile(np.asarray(lat2b) * 1000, 50)
    log(f"config#2 preprocessing only: p50 {pre_ms:.2f} ms/batch "
        f"({batch/(pre_ms/1000):.0f} fps)")

    # config #4: file-source acquisition stream at 25 fps feeding inspect
    from heimdall_tpu.core.acquisition import SimulationImageSource
    src = SimulationImageSource("bench", {"width": 640, "height": 480,
                                          "seed": 1,
                                          "defect_probability": 1.0})
    src.open()
    deadline_hits = 0
    n_stream = 50
    small = jax.device_put(frames[:1], dev)  # reuse compiled batch-1
    for _ in range(n_stream):
        t1 = time.perf_counter()
        _, frame = src.read()
        x1 = jax.device_put(frame[None], dev)
        a, _ = run(x1)
        np.asarray(a[0, 0])
        if time.perf_counter() - t1 <= 1 / 25:
            deadline_hits += 1
    log(f"config#4 25fps stream: {deadline_hits}/{n_stream} frames met "
        f"the 40 ms budget (sim-draw + H2D + detect + verdict)")
    # config #5 (full 4-camera line sim) lives in examples/line_simulation.py

    # --- design-point detail: 1920x1080 (the reference's 4x Basler 2MP
    # cameras) through the band-tiled Pallas CCL path -------------------
    if os.environ.get("BENCH_2MP", "1") != "0":
        from heimdall_tpu.detectors.contamination_detector import (
            contamination_program)
        b2 = 16
        big = make_frames(b2, 1080, 1920, seed=2)
        xbig = jax.device_put(big, dev)
        args2 = (xbig, jnp.int32(15), jnp.float32(3.0), jnp.float32(3000.0),
                 jnp.float32(0.25))
        run2 = lambda: contamination_program(*args2, ccl_sweeps=6,  # noqa: E731
                                             tiled_band=256)
        np.asarray(run2()[2][0, 0])
        # deep pipeline: every early force pays the ~24 ms tunnel ack, so
        # keep all batches in flight and force once at the end
        infl = []
        t1 = time.perf_counter()
        it2 = 24
        for _ in range(it2):
            infl.append(run2()[2])
        for acc2 in infl:
            np.asarray(acc2[0, 0])
        dt2 = time.perf_counter() - t1
        log(f"design-point 1920x1080 tiled detect: {b2*it2/dt2:.1f} fps "
            f"({dt2/it2/b2*1000:.2f} ms/frame; line needs 100 fps = "
            f"4 cams x 25)")

    baseline_fps = 100.0  # 90k BPH * 4 cameras / 3600
    print(json.dumps({
        "metric": "contamination_inspection_fps_640x480",
        "value": round(fps, 1),
        "unit": "frames/sec/chip",
        "vs_baseline": round(fps / baseline_fps, 2),
    }), flush=True)


if __name__ == "__main__":
    main()
