#!/usr/bin/env python3
"""Benchmark: batched contamination inspection throughput on one TPU chip.

Reproduces BASELINE.json config #3 (the headline metric): N-frame batched
contamination inspection — grayscale → Gaussian blur → adaptive threshold →
morphology → connected-component labeling → per-blob defect stats — on
640x480 BGR frames, then the remaining BASELINE configs (#1 single-image
latency, #2 preprocess-only, #4 25 fps stream, #5 full line simulation)
and the 2 MP design point as guarded secondaries.

Baseline for vs_baseline: the reference line's design throughput of
100 frames/sec (90,000 BPH = 25 bottles/s across 4 cameras — README.md:3,
heimdall/core/config.py:27, docs/architecture_design.md:3).

Protocol notes for this environment (TPU behind a network tunnel):
  * Bench frames are SYNTHESIZED ON DEVICE (same scene, bit-identical to
    make_frames — tests/test_bench_synth.py) so the measurement starts
    from HBM-resident data instead of pushing ~2 GB through the tunnel
    (~20-100 MB/s, minutes of pure transfer).  The reference's protocol
    also times detection on an in-memory image (benchmark.py:66-73).
  * The persistent compilation cache (.jax_cache/, committed) is
    instrumented: the bench logs every cache entry the run WRITES — a
    nonempty list means this process compiled something the repo should
    have shipped warm.
  * Tunnel-bound measurements (fresh H2D per batch) run LAST and report
    the measured tunnel floor alongside, so chip numbers are never
    hostage to tunnel weather.

Prints ONE JSON line to stdout; detail metrics go to stderr.
"""

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.abspath(__file__))


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
        if et is None:
            return False
        # swallow ordinary failures only: KeyboardInterrupt/SystemExit must
        # still abort the whole bench
        if not issubclass(et, Exception):
            return False
        log(f"{self.name} FAILED: {et.__name__}: {str(ev)[:300]}")
        return True


# ---------------------------------------------------------------------------
# bench scene (the test_contamination scenario)
# ---------------------------------------------------------------------------

def scene_params(n, h=480, w=640, seed=0):
    """Per-frame contaminant parameters [n, 3, 4] (x, y, r, v; r=-1 pads).

    Draws from the SAME RandomState sequence as make_frames so the
    device-synthesized batch is bit-identical to the host one."""
    rng = np.random.RandomState(seed)
    p = np.full((n, 3, 4), -1, np.int32)
    for i in range(n):
        for j in range(rng.randint(1, 4)):
            x = rng.randint(w // 4, 3 * w // 4)
            y = rng.randint(h // 4, 3 * h // 4)
            r = rng.randint(4, 16)
            v = int(rng.randint(0, 60))
            p[i, j] = (x, y, r, v)
    return p


def _scene_base(h, w):
    """The static scene (bottle rect outline + base disc) as [h, w] int32."""
    import jax.numpy as jnp
    ys = jnp.arange(h, dtype=jnp.int32)[:, None]
    xs = jnp.arange(w, dtype=jnp.int32)[None, :]
    img = jnp.full((h, w), 220, jnp.int32)
    # rect_outline((w/2-100, h/2-120), (w/2+100, h/2+120), t=2): four
    # filled_rects, t//2 = 1 before the corner, (t-1)//2 = 0 after
    x0, x1 = w // 2 - 100, w // 2 + 100
    y0, y1 = h // 2 - 120, h // 2 + 120
    hband = (xs >= x0 - 1) & (xs <= x1 + 1)
    vband = (ys >= y0 - 1) & (ys <= y1 + 1)
    rect = ((hband & (((ys >= y0 - 1) & (ys <= y0))
                      | ((ys >= y1 - 1) & (ys <= y1))))
            | (vband & (((xs >= x0 - 1) & (xs <= x0))
                        | ((xs >= x1 - 1) & (xs <= x1)))))
    img = jnp.where(rect, 100, img)
    cy, cx, r = h // 2 + 100, w // 2, 95
    disc = (ys - cy) ** 2 + (xs - cx) ** 2 <= r * r
    return jnp.where(disc, 80, img)


def synth_frames_device(params, h=480, w=640):
    """[n, 3, 4] params -> [n, h, w, 3] uint8 frames, entirely on device.

    Bit-identical to make_frames(n, h, w, seed) when params come from
    scene_params(n, h, w, seed) — asserted in tests/test_bench_synth.py."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def build(p):
        ys = jnp.arange(h, dtype=jnp.int32)[:, None]
        xs = jnp.arange(w, dtype=jnp.int32)[None, :]
        base = _scene_base(h, w)

        def per_frame(q):
            img = base
            for j in range(q.shape[0]):   # draw order matters on overlap
                x, y, r, v = q[j, 0], q[j, 1], q[j, 2], q[j, 3]
                m = (r >= 0) & ((ys - y) ** 2 + (xs - x) ** 2 <= r * r)
                img = jnp.where(m, v, img)
            return img

        g = jax.vmap(per_frame)(p).astype(jnp.uint8)
        return jnp.repeat(g[..., None], 3, axis=-1)

    return build(jnp.asarray(params))


def make_frames(n, h=480, w=640, seed=0):
    """Host-side synthetic contaminated bottle frames (kept for tests,
    profilers, and the H2D-path measurements)."""
    from heimdall_tpu.utils import draw
    params = scene_params(n, h, w, seed)
    frames = np.empty((n, h, w, 3), np.uint8)
    for i in range(n):
        img = np.full((h, w, 3), 220, np.uint8)
        draw.rect_outline(img, (w // 2 - 100, h // 2 - 120),
                          (w // 2 + 100, h // 2 + 120), (100, 100, 100), 2)
        draw.filled_circle(img, (w // 2, h // 2 + 100), 95, (80, 80, 80))
        for j in range(3):
            x, y, r, v = params[i, j]
            if r >= 0:
                draw.filled_circle(img, (x, y), int(r), (int(v),) * 3)
        frames[i] = img
    return frames


# ---------------------------------------------------------------------------
# persistent-cache instrumentation
# ---------------------------------------------------------------------------

_CACHE_DIR = os.path.join(REPO, ".jax_cache")


def _cache_snapshot():
    try:
        return set(os.listdir(_CACHE_DIR))
    except OSError:
        return set()


def _cache_delta(before, label):
    new = sorted(_cache_snapshot() - before)
    if new:
        log(f"cache MISS during {label}: this process compiled+wrote "
            f"{len(new)} entries (commit these): {new}")
    else:
        log(f"cache: no new entries written during {label} (warm)")
    return _cache_snapshot()


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    from heimdall_tpu.detectors.contamination_detector import (
        ContaminationDetector)

    t_start = time.perf_counter()

    def phase(name):
        log(f"[t+{time.perf_counter()-t_start:7.1f}s] {name}")

    t0 = time.perf_counter()
    dev = jax.devices()[0]
    log(f"device: {dev} (backend init {time.perf_counter()-t0:.2f}s)")

    # batch 6144: the tunnel charges tens of ms of per-batch overhead on
    # the EXECUTION timeline regardless of batch size (scripts/
    # profile_dispatch.py), so the headline batch amortizes it; the r3
    # batch scan measured 172.9 us/frame at 4096, 162.5 at 6144, and flat
    # 162.5-162.8 at 8192 — 6144 is the knee, and the fused single kernel
    # keeps HBM residency to the input buffer alone.
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 6144
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    backend = sys.argv[3] if len(sys.argv) > 3 else "pallas"

    # First device round-trip as its own phase: the tunnel sometimes takes
    # minutes to grant the device / answer the first RPC (observed 0.5 s
    # to 12 min run to run) — time it separately so that stall is never
    # misattributed to compilation or synthesis.
    t0 = time.perf_counter()
    np.asarray(jax.jit(lambda: jnp.zeros((8, 128)).sum())())
    log(f"first device round-trip: {time.perf_counter()-t0:.2f}s")

    cache_seen = _cache_snapshot()
    t0 = time.perf_counter()
    x_dev = synth_frames_device(scene_params(batch))
    x_dev.block_until_ready()
    np.asarray(x_dev[0, 0, 0])      # axon: block_until_ready doesn't block
    log(f"device frame synthesis ({batch} frames): "
        f"{time.perf_counter()-t0:.2f}s (no tunnel H2D; observed 0.8-750s "
        f"run to run — remote compile on first-ever shape, else remote "
        f"server state/weather)")
    # Headline input is CHANNEL-MAJOR ([B, 3, H, W] — the production
    # feeder layout: camera stacks deliver planes, so this is what a real
    # line hands the chip) so the measured program pays no per-call
    # relayout.  Small NHWC slices are kept for the secondary configs.
    x_small = jnp.array(x_dev[:256])             # NHWC, config #2
    # configs #1/#4 put single frames through the tunnel CHANNEL-MAJOR
    # (the feeder layout, same as the headline)
    frame1 = np.ascontiguousarray(
        np.asarray(x_dev[:1]).transpose(0, 3, 1, 2))
    x_cm = jnp.transpose(x_dev, (0, 3, 1, 2))
    np.asarray(x_cm[0, 0, 0, 0])
    del x_dev
    phase("synthesis done")

    det = ContaminationDetector(config={
        "backend": backend, "include_contours": False})

    def run(x):
        table, conf, accepted = det.run_device(x, channel_major=True)
        return accepted, conf

    # warmup / compile (fall back to the XLA backend if the Mosaic
    # toolchain is unavailable in this environment)
    t0 = time.perf_counter()
    try:
        acc, _ = run(x_cm)
        acc = jax.device_get(acc)
    except Exception as exc:  # noqa: BLE001
        log(f"{backend} backend failed ({str(exc)[:200]}); "
            f"falling back to xla")
        backend = "xla"
        det = ContaminationDetector(config={
            "backend": backend, "include_contours": False})
        acc, _ = run(x_cm)
        acc = jax.device_get(acc)
    log(f"first batch (compile-or-cache-load + run): "
        f"{time.perf_counter()-t0:.2f}s; defects in batch: {int(acc.sum())}")
    cache_seen = _cache_delta(cache_seen, "headline warmup")

    # --- headline: device-resident frames (the reference's benchmark
    # protocol detects an in-memory image N times — benchmark.py:66-73 —
    # so the fair equivalent keeps frames in HBM, where the production
    # feeder's double-buffered DMA puts them).  Submit every batch up
    # front and force ONLY the last one: the device executes launches in
    # order, so the last result's readiness bounds the whole window, and
    # no mid-loop ~30 ms fetch round-trips pollute the measurement.
    #
    # Measured as THREE independent windows, headline = MEDIAN window:
    # the TPU sits behind a shared tunnel whose weather varies run to
    # run (r1/r2 showed unexplained 1.7x swings between runs minutes
    # apart); per-window logging makes any such swing visible inside a
    # single artifact instead of across rounds.
    n_windows = 3
    win_iters = max(2, iters // n_windows)
    win_fps = []
    lat_all = []
    for w in range(n_windows):
        lat = []
        results = []
        t_wall = time.perf_counter()
        for _ in range(win_iters):
            t1 = time.perf_counter()
            acc_d, _ = run(x_cm)
            results.append(acc_d)
            lat.append(time.perf_counter() - t1)
        np.asarray(results[-1][0, 0])
        total_wall = time.perf_counter() - t_wall
        del results
        f = batch * win_iters / total_wall
        win_fps.append(f)
        lat_all += lat
        log(f"window {w}: {f:.1f} fps ({total_wall/win_iters*1000:.1f} "
            f"ms/batch of {batch})")
    fps = float(np.median(win_fps))
    per_batch_ms = batch / fps * 1000
    lat_ms = np.asarray(lat_all) * 1000
    log(f"backend={backend} batch={batch} iters={win_iters}x{n_windows}")
    log(f"device-resident pipelined throughput (median of {n_windows} "
        f"windows, spread {min(win_fps):.0f}-{max(win_fps):.0f}): "
        f"{fps:.1f} frames/sec "
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
    # It is printed AGAIN as the very last stdout line (r4's driver
    # tail-parsed stdout and got a secondary line — VERDICT r4 #2): the
    # early print survives crashes, the final one is what tail parsers see.
    baseline_fps = 100.0  # 90k BPH * 4 cameras / 3600
    headline_json = json.dumps({
        "metric": "contamination_inspection_fps_640x480",
        "value": round(fps, 1),
        "unit": "frames/sec/chip",
        "vs_baseline": round(fps / baseline_fps, 2),
    })
    print(headline_json, flush=True)

    p50_0 = 0.0
    phase("headline done")
    with guarded("config#1"):
        # --- the remaining BASELINE.json configs (stderr detail) -----------
        # config #1: single-image contamination detect (test_contamination),
        # latency-shaped: persistent compiled batch-1 program, pre-put input
        # buffer, one launch, minimal D2H.  The tunnel charges a ~24-40 ms
        # round trip whose run-to-run jitter dwarfs the sub-ms program, so
        # the program's own cost is measured by an N-ITERATED JITTED LOOP
        # over the detect body (one launch runs it n times; the tunnel
        # floor cancels in the (n=65) - (n=1) difference divided by 64,
        # shrinking the floor jitter's contribution 64x).  r3 measured the
        # old two-roundtrip difference at 0.24 / 1.60 / 2.07 ms across
        # same-day artifacts — pure noise; this protocol replaces it
        # (VERDICT r3 #3).
        one = jax.device_put(frame1, dev)          # [1, 3, H, W]

        @jax.jit
        def detect_loop(x, n):
            def body(_, carry):
                xi, _acc = carry
                a, _conf = run(xi)
                na = jnp.sum(a.astype(jnp.int32))
                # serialize iterations with a dependence XLA cannot fold:
                # the raw BITS of the confidence sum (bitcast) have no
                # provable range, unlike a sum of 0/1 casts (whose >= 0
                # bound XLA's range analysis DID prove in r4, folding the
                # select and CSE-ing the loop body — the measured "cost"
                # collapsed to jitter).  The NaN bit pattern 0x7fffffff
                # never arises from summing finite confidences, so xi is
                # unchanged at runtime but formally iteration-dependent.
                d = jax.lax.bitcast_convert_type(jnp.sum(_conf), jnp.int32)
                xn = jnp.where(d == jnp.int32(0x7FFFFFFF), xi ^ 1, xi)
                return xn, na + d
            return jax.lax.fori_loop(0, n, body, (x, jnp.int32(0)))[1]

        n_hi = jnp.int32(65)
        n_lo = jnp.int32(1)
        np.asarray(detect_loop(one, n_hi))          # compile + warm
        lat_hi, lat_lo = [], []
        for _ in range(8):
            t1 = time.perf_counter()
            np.asarray(detect_loop(one, n_hi))
            lat_hi.append(time.perf_counter() - t1)
            t1 = time.perf_counter()
            np.asarray(detect_loop(one, n_lo))
            lat_lo.append(time.perf_counter() - t1)
        p50_hi = np.percentile(np.asarray(lat_hi) * 1000, 50)
        p50_lo = np.percentile(np.asarray(lat_lo) * 1000, 50)
        prog_ms = max(p50_hi - p50_lo, 0.0) / 64.0
        log(f"config#1 single-image detect: program cost {prog_ms:.3f} ms "
            f"(64-iteration amortized; n=65 loop p50 {p50_hi:.2f} ms, n=1 "
            f"p50 {p50_lo:.2f} ms incl. tunnel floor) vs the 10 ms deadline")

    with guarded("config#2"):
        # config #2: preprocessing only (gray + blur + adaptive threshold).
        # Batch capped at 256: the XLA preprocess materializes several f32/i32
        # planes per frame, which at batch 2048 exceeds the chip's 16 GB HBM
        # alongside the resident headline buffers.
        from heimdall_tpu import ops

        @jax.jit
        def preprocess(x):
            g = ops.bgr_to_gray(x)
            b = ops.gaussian_blur(g, 5)
            return ops.adaptive_threshold(b, 255, "gaussian", "binary_inv",
                                          11, jnp.int32(15))
        npre = min(batch, 256)
        xb = x_small[:npre]              # device-resident, no tunnel
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
    cache_seen = _cache_delta(cache_seen, "configs #1-#2")

    # Free the headline buffers NOW: the 6144-frame channel-major batch is
    # ~5.7 GB of HBM, and leaving it resident through the 2MP config
    # (256 x 1080 x 1920 intermediates) ran the chip out of memory
    # (r3h artifact: RESOURCE_EXHAUSTED on 2MP AND the h2d secondary).
    del x_cm, x_small

    phase("configs #1-#2 done")
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
        probe = frame1
        np.asarray(noop1(jax.device_put(probe, dev))[0])
        lat_f = []
        for _ in range(8):
            t1 = time.perf_counter()
            np.asarray(noop1(jax.device_put(probe, dev))[0])
            lat_f.append(time.perf_counter() - t1)
        floor_ms = float(np.percentile(np.asarray(lat_f) * 1000, 50))

        # Per-frame phase instrumentation (VERDICT r4 #6: the stream's
        # rare 10x outliers were unexplained): for every frame record the
        # host-side submit phases (assembly, device_put, launch) and the
        # collector-side wait; the slowest frames are logged with their
        # breakdown so any stall is attributed to a phase, not guessed.
        sub_phases = []          # (dt_asm, dt_put, dt_launch) per frame

        def step(frame_np):
            ta = time.perf_counter()
            # feeder-equivalent channel-major assembly (host-side, ~free)
            cm1 = np.ascontiguousarray(frame_np.transpose(2, 0, 1))[None]
            tb = time.perf_counter()
            x1 = jax.device_put(cm1, dev)
            tc = time.perf_counter()
            a, _ = run(x1)
            # return the whole [1, K] array: slicing (a[0]) would trace and
            # launch a separate device program — another ~24 ms tunnel
            # round-trip per frame
            td = time.perf_counter()
            sub_phases.append((tb - ta, tc - tb, td - tc))
            return a

        stream_lat = []          # (total, wait_after_submit) per frame

        def on_verdict(_verdict, meta):
            t_read, t_submitted = meta
            now = time.perf_counter()
            stream_lat.append((now - t_read, now - t_submitted))

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
            feeder.submit(frame, meta=(t1, time.perf_counter()))
        feeder.close()
        stream_ms = np.asarray([t for t, _ in stream_lat]) * 1000
        wait_ms = np.asarray([w for _, w in stream_lat]) * 1000
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
        worst = np.argsort(stream_ms)[-5:][::-1]
        for i in worst:
            asm, put, launch = (x * 1000 for x in sub_phases[i])
            log(f"  config#4 frame {i:2d}: total {stream_ms[i]:7.1f} ms = "
                f"assembly {asm:5.1f} + put {put:6.1f} + launch "
                f"{launch:6.1f} + collector wait {wait_ms[i]:7.1f} "
                f"(fetch RTT + queued device work)")

    phase("config #4 done")
    with guarded("config#5"):
        # config #5: the full production-line simulation — 4 simulated GigE
        # cameras -> FrameSet assembly -> batched verdict-shaped detection ->
        # rejection pulses (examples/line_simulation.py, run short).  Its
        # batches cross the tunnel, so the raw BPH is tunnel-bound here; the
        # log reports raw AND net-of-tunnel (PCIe-host-equivalent) BPH
        # against the 90k target, plus the measured tunnel rate for context.
        import contextlib
        sys.path.insert(0, REPO)
        from examples.line_simulation import main as line_main
        from examples.line_simulation import latency_main
        with contextlib.redirect_stdout(sys.stderr):
            bph, p99_ms, detail = line_main(6.0, 8, return_detail=True)
        net_bph = detail["net_bph"]
        log(f"config#5 line sim: {bph:,.0f} BPH raw through the tunnel "
            f"(H2D {detail['h2d_mb_s']:.0f} MB/s), {net_bph:,.0f} BPH net "
            f"of tunnel transfer ({'PASS' if net_bph >= 90000 else 'below'} "
            f"the 90k target); per-bottle p99 {p99_ms:.2f} ms "
            f"({'PASS' if p99_ms < 10 else 'above'} the 10 ms deadline, "
            f"net p99 {detail['net_p99_ms']:.2f} ms — batch-of-32 "
            f"throughput shape; the deadline gate is the latency mode "
            f"below)")
        # deadline-shaped mode (VERDICT r4 #3): 1 bottle set per batch,
        # synchronous verdict — the per-bottle <10 ms gate
        with contextlib.redirect_stdout(sys.stderr):
            lat = latency_main(15.0, return_detail=True)
        log(f"config#5 latency mode: {lat['bottles']} bottles at 1 set/"
            f"batch; net-of-floor per-bottle p50 {lat['net_p50_ms']:.2f} "
            f"ms, p95 {lat['net_p95_ms']:.2f} ms, "
            f"p99 {lat['net_p99_ms']:.2f} ms "
            f"({'PASS' if lat['net_p99_ms'] < 10 else 'above'} the 10 ms "
            f"deadline at p99; floor {lat['floor_ms']:.1f} ms, raw p99 "
            f"{lat['p99_ms']:.2f} ms through the tunnel)")

    phase("config #5 done")
    with guarded("2MP design point"):
        # --- design-point detail: 1920x1080 (the reference's 4x Basler 2MP
        # cameras) through the band-tiled Pallas CCL path -------------------
        if os.environ.get("BENCH_2MP", "1") != "0":
            from heimdall_tpu.detectors.contamination_detector import (
                contamination_program)
            # batch 128 amortizes the ~24 ms per-launch tunnel overhead that
            # made earlier 2MP numbers irreproducible (VERDICT r1 #5): at
            # b2=16 the floor alone adds 1.5 ms/frame, at 128 it's 0.19,
            # at 256 it's 0.09.
            from jax.errors import JaxRuntimeError
            for b2 in (256, 128):
                # NHWC input (cv2/reference color-image convention).  A/B
                # r3: feeding pre-transposed planes (channel_major=True)
                # measured ~2% SLOWER than letting the program fold the
                # relayout into the banded preprocess, so the bench keeps
                # the reference layout.
                xbig = synth_frames_device(
                    scene_params(b2, 1080, 1920, seed=2), 1080, 1920)
                np.asarray(xbig[0, 0, 0])
                args2 = (xbig, jnp.int32(15), jnp.float32(3.0),
                         jnp.float32(3000.0), jnp.float32(0.25))
                run2 = lambda: contamination_program(  # noqa: E731
                    *args2, ccl_sweeps=6, tiled_band=256)
                try:
                    np.asarray(run2()[2][0, 0])
                    break
                except JaxRuntimeError as e:   # OOM at this batch: halve
                    if "RESOURCE_EXHAUSTED" not in str(e) or b2 == 128:
                        raise
                    log(f"2MP at batch {b2} exhausted HBM; retrying at 128")
                    del xbig, args2, run2
            # Same protocol as the headline: THREE independent windows
            # (submit all, force only the last), report the MEDIAN — r3's
            # single-window 2MP point swung 16% between same-day artifacts
            # (980 vs 1134.7 fps, VERDICT r3 weak #4).
            it2 = 4
            fps2 = []
            for _w in range(3):
                infl = []
                t1 = time.perf_counter()
                for _ in range(it2):
                    infl.append(run2()[2])
                np.asarray(infl[-1][0, 0])
                dt2 = time.perf_counter() - t1
                del infl
                fps2.append(b2 * it2 / dt2)
                log(f"  2MP window {_w}: {fps2[-1]:.1f} fps")
            del xbig
            fps2_med = float(np.median(fps2))
            log(f"design-point 1920x1080 tiled detect: {fps2_med:.1f} fps "
                f"(median of 3 windows, spread {min(fps2):.0f}-"
                f"{max(fps2):.0f}; {1000/fps2_med:.2f} ms/frame wall; est "
                f"device {1000/fps2_med - 24/b2:.2f} ms/frame net of launch "
                f"overhead; line needs 100 fps = 4 cams x 25)")
    cache_seen = _cache_delta(cache_seen, "configs #4-#5 + 2MP")

    phase("2MP done")
    with guarded("h2d-secondary"):
        # --- tunnel-bound last: end-to-end including fresh H2D per batch.
        # In this environment the TPU sits behind a network tunnel
        # (~20-150 MB/s day to day), so this measures the tunnel, not the
        # chip; recorded for transparency, with the implied tunnel rate.
        nh = 128
        # host-side generation + channel-major assembly (what the C++
        # feeder does for free), then a fresh put per batch
        small = np.ascontiguousarray(
            make_frames(nh).transpose(0, 3, 1, 2))
        lat2 = []
        for _ in range(3):
            t1 = time.perf_counter()
            x2 = jax.device_put(small, dev)
            a, _ = run(x2)
            np.asarray(a[0, 0])
            lat2.append(time.perf_counter() - t1)
            del x2, a
        lat2_ms = np.asarray(lat2) * 1000
        p50 = np.percentile(lat2_ms, 50)
        e2e_fps = nh / (p50 / 1000.0)
        log(f"with per-batch H2D through the tunnel ({nh} frames/put): "
            f"{e2e_fps:.1f} frames/sec (p50 {p50:.1f} ms/batch; implied "
            f"tunnel rate {small.nbytes/1e6/(p50/1000):.0f} MB/s — this "
            f"line measures the tunnel, not the chip)")

    # final stdout line == the headline JSON (see the early print above)
    print(headline_json, flush=True)


if __name__ == "__main__":
    main()
