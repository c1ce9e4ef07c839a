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


class guarded:
    """Context manager: a failing secondary bench config logs and moves
    on instead of killing the process (the headline JSON line must always
    reach stdout for the driver)."""

    def __init__(self, name):
        self.name = name

    def __enter__(self):
        return self

    def __exit__(self, et, ev, tb):
        if et is not None:
            log(f"{self.name} FAILED: {et.__name__}: {str(ev)[:300]}")
        return True


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

    # batch 2048: the tunnel charges ~24 ms of overhead per executable
    # launch on the EXECUTION timeline regardless of batch size — even
    # fully pipelined, 20 back-to-back tiny programs take 20 x 24 ms
    # (scripts/profile_dispatch.py) — so the headline batch amortizes it;
    # device compute per frame is flat from 256 up.
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 16
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
    # feeder's double-buffered DMA puts them).  Submit every batch up
    # front and force ONLY the last one: the device executes launches in
    # order, so the last result's readiness bounds the whole window, and
    # no mid-loop ~30 ms fetch round-trips pollute the measurement.
    lat = []
    results = []
    t_wall = time.perf_counter()
    for _ in range(iters):
        t1 = time.perf_counter()
        acc_d, _ = run(x_dev)
        results.append(acc_d)
        lat.append(time.perf_counter() - t1)
    np.asarray(results[-1][0, 0])
    total_wall = time.perf_counter() - t_wall
    del results
    lat_ms = np.asarray(lat) * 1000
    fps = batch * iters / total_wall
    per_batch_ms = total_wall / iters * 1000
    log(f"backend={backend} batch={batch} iters={iters}")
    log(f"device-resident pipelined throughput: {fps:.1f} frames/sec "
        f"({fps*3600:.0f} BPH at 1 frame/bottle, {fps*3600/4:.0f} BPH at 4)")
    log(f"submission latency ms: mean={lat_ms.mean():.2f} "
        f"min={lat_ms.min():.2f} p50={np.percentile(lat_ms,50):.2f} "
        f"p99={np.percentile(lat_ms,99):.2f}")

    log(f"batch wall time: {per_batch_ms:.1f} ms/batch "
        f"({per_batch_ms/batch*1e3:.1f} us/frame; est device "
        f"{(per_batch_ms-24)/batch*1e3:.1f} us/frame net of the ~24 ms "
        f"tunnel launch overhead)")

    # The headline is measured; print the driver's JSON line NOW so a
    # failure in any secondary config can never lose the round's number.
    baseline_fps = 100.0  # 90k BPH * 4 cameras / 3600
    print(json.dumps({
        "metric": "contamination_inspection_fps_640x480",
        "value": round(fps, 1),
        "unit": "frames/sec/chip",
        "vs_baseline": round(fps / baseline_fps, 2),
    }), flush=True)

    del x_dev

    with guarded("h2d-secondary"):
        # --- secondary: end-to-end including fresh H2D per batch.  In this
        # environment the TPU sits behind a network tunnel (~20-150 MB/s), so
        # this measures the tunnel, not the chip; recorded for transparency.
        # Capped at 128 frames/put: the tunnel moves ~20 MB/s, so a full
        # 2048-frame put is 1.9 GB = minutes of pure transfer.
        nh = min(batch, 128)
        small = frames[:nh]
        lat2 = []
        for _ in range(3):
            t1 = time.perf_counter()
            x2 = jax.device_put(small, dev)
            a, _ = run(x2)
            np.asarray(a[0, 0])
            lat2.append(time.perf_counter() - t1)
            del x2, a
        lat2_ms = np.asarray(lat2) * 1000
        e2e_fps = nh / (np.percentile(lat2_ms, 50) / 1000.0)
        log(f"with per-batch H2D through the tunnel ({nh} frames/put): "
            f"{e2e_fps:.1f} frames/sec "
            f"(p50 {np.percentile(lat2_ms,50):.1f} ms/batch)")

    p50_0 = 0.0
    with guarded("config#1"):
        # --- the remaining BASELINE.json configs (stderr detail) -------------
        # config #1: single-image contamination detect (test_contamination),
        # latency-shaped: persistent compiled batch-1 program, pre-put input
        # buffer, one launch, minimal D2H (the [1, K] accepted row).  The
        # tunnel charges ~24 ms launch + ~6 ms fetch per round trip
        # (scripts/profile_dispatch.py), so the same protocol is also timed
        # on a no-op program and the difference — the detection program's own
        # cost — is reported against the reference's <10 ms deadline.
        one = jax.device_put(frames[:1], dev)
        noop = jax.jit(lambda x: x[:, 0, 0, 0] > 0)
        run(one)
        np.asarray(noop(one)[0])
        lat1, lat0 = [], []
        for _ in range(10):
            t1 = time.perf_counter()
            a, _ = run(one)
            np.asarray(a[0, 0])
            lat1.append(time.perf_counter() - t1)
            t1 = time.perf_counter()
            np.asarray(noop(one)[0])
            lat0.append(time.perf_counter() - t1)
        p50_1 = np.percentile(np.asarray(lat1) * 1000, 50)
        p50_0 = np.percentile(np.asarray(lat0) * 1000, 50)
        log(f"config#1 single-image detect: p50 {p50_1:.2f} ms end-to-end "
            f"(tunnel floor {p50_0:.2f} ms; detection program "
            f"{max(p50_1 - p50_0, 0):.2f} ms vs the 10 ms deadline)")

    with guarded("config#2"):
        # config #2: preprocessing only (gray + blur + adaptive threshold).
        # Batch capped at 256: the XLA preprocess materializes several f32/i32
        # planes per frame, which at batch 2048 exceeds the chip's 16 GB HBM
        # alongside the resident headline buffers.
        import jax.numpy as jnp
        from heimdall_tpu import ops

        @jax.jit
        def preprocess(x):
            g = ops.bgr_to_gray(x)
            b = ops.gaussian_blur(g, 5)
            return ops.adaptive_threshold(b, 255, "gaussian", "binary_inv",
                                          11, jnp.int32(15))
        npre = min(batch, 256)
        xb = jax.device_put(frames[:npre], dev)
        np.asarray(preprocess(xb)[0, 0, 0])
        lat2b = []
        for _ in range(10):
            t1 = time.perf_counter()
            r = preprocess(xb)
            np.asarray(r[0, 0, 0])
            lat2b.append(time.perf_counter() - t1)
        del xb, r
        pre_ms = np.percentile(np.asarray(lat2b) * 1000, 50)
        log(f"config#2 preprocessing only: p50 {pre_ms:.2f} ms/batch of {npre} "
            f"({npre/(pre_ms/1000):.0f} fps)")

    with guarded("config#4"):
        # config #4: file-source acquisition stream at 25 fps feeding inspect,
        # pipelined through runtime/feeder.py's DeviceFeeder in push mode: a
        # collector thread fetches each verdict the moment the device finishes
        # it, so the measured read -> verdict latency is the true
        # H2D+detect+readback critical path (not queue waiting), while the
        # producer keeps submitting at line rate.  Deadline: read -> verdict
        # within the 40 ms frame budget.
        from heimdall_tpu.core.acquisition import SimulationImageSource
        from heimdall_tpu.runtime.feeder import DeviceFeeder
        src = SimulationImageSource("bench", {"width": 640, "height": 480,
                                              "seed": 1,
                                              "defect_probability": 1.0})
        src.open()
        n_stream = 50
        period = 1 / 25

        # Per-frame tunnel floor for THIS protocol: a fresh 0.9 MB H2D put
        # + launch + fetch round trip with a no-op program.  The stream
        # netting uses this (not config#1's pre-put floor): through the
        # tunnel the put alone costs ~45 ms at ~20 MB/s, which a
        # PCIe-attached host pays ~60 us for.
        noop1 = jax.jit(lambda x: x[:, 0, 0, 0] > 0)
        probe = frames[:1]
        np.asarray(noop1(jax.device_put(probe, dev))[0])
        lat_f = []
        for _ in range(8):
            t1 = time.perf_counter()
            np.asarray(noop1(jax.device_put(probe, dev))[0])
            lat_f.append(time.perf_counter() - t1)
        floor_ms = float(np.percentile(np.asarray(lat_f) * 1000, 50))

        def step(frame_np):
            x1 = jax.device_put(frame_np[None], dev)
            a, _ = run(x1)
            # return the whole [1, K] array: slicing (a[0]) would trace and
            # launch a separate device program — another ~24 ms tunnel
            # round-trip per frame
            return a

        stream_lat = []

        def on_verdict(_verdict, t_read):
            stream_lat.append(time.perf_counter() - t_read)

        feeder = DeviceFeeder(step, max_in_flight=3, on_done=on_verdict)
        t_next = time.perf_counter()
        for _ in range(n_stream):
            # pace the source at 25 fps like the reference's file stream
            now = time.perf_counter()
            if now < t_next:
                time.sleep(t_next - now)
            t_next = max(t_next + period, time.perf_counter())
            t1 = time.perf_counter()
            _, frame = src.read()
            feeder.submit(frame, meta=t1)
        feeder.close()
        stream_ms = np.asarray(stream_lat) * 1000
        deadline_hits = int((stream_ms <= 40.0).sum())
        # Net out the measured put+launch+fetch tunnel floor (floor_ms):
        # what remains is the detection program + feeder overhead a
        # PCIe-attached host would actually see against the 40 ms budget.
        net_ms = stream_ms - floor_ms
        net_hits = int((net_ms <= 40.0).sum())
        log(f"config#4 25fps stream: {deadline_hits}/{n_stream} frames met "
            f"the 40 ms budget (prompt-collected read+H2D+detect+verdict; "
            f"p50 {np.percentile(stream_ms, 50):.1f} ms, "
            f"max {stream_ms.max():.1f} ms; net of the {floor_ms:.1f} ms "
            f"put+launch+fetch tunnel floor: {net_hits}/{n_stream} hits, "
            f"p50 {np.percentile(net_ms, 50):.1f} ms)")
        # config #5 (full 4-camera line sim) lives in examples/line_simulation.py

    with guarded("2MP design point"):
        # --- design-point detail: 1920x1080 (the reference's 4x Basler 2MP
        # cameras) through the band-tiled Pallas CCL path -------------------
        if os.environ.get("BENCH_2MP", "1") != "0":
            from heimdall_tpu.detectors.contamination_detector import (
                contamination_program)
            # batch 128 amortizes the ~24 ms per-launch tunnel overhead that
            # made earlier 2MP numbers irreproducible (VERDICT r1 #5): at
            # b2=16 the floor alone adds 1.5 ms/frame, at 128 it's 0.19.
            b2 = 128
            big = make_frames(b2, 1080, 1920, seed=2)
            xbig = jax.device_put(big, dev)
            args2 = (xbig, jnp.int32(15), jnp.float32(3.0), jnp.float32(3000.0),
                     jnp.float32(0.25))
            run2 = lambda: contamination_program(*args2, ccl_sweeps=6,  # noqa: E731
                                                 tiled_band=256)
            np.asarray(run2()[2][0, 0])
            # submit all batches, force only the last (in-order execution)
            infl = []
            t1 = time.perf_counter()
            it2 = 12
            for _ in range(it2):
                infl.append(run2()[2])
            np.asarray(infl[-1][0, 0])
            dt2 = time.perf_counter() - t1
            del infl
            log(f"design-point 1920x1080 tiled detect: {b2*it2/dt2:.1f} fps "
                f"({dt2/it2/b2*1000:.2f} ms/frame wall; est device "
                f"{(dt2/it2*1000-24)/b2:.2f} ms/frame net of launch overhead; "
                f"line needs 100 fps = 4 cams x 25)")


if __name__ == "__main__":
    main()
