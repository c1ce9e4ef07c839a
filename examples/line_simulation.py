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
    put_s = []
    for _ in range(2):
        t = time.time()
        x = jax.device_put(warm)
        np.asarray(x[0, 0, 0])      # fence (axon block_until_ready no-ops)
        put_s.append(time.time() - t)
        del x
    transfer_s = min(put_s)
    h2d_mb_s = warm.nbytes / 1e6 / transfer_s

    bottles = 0
    rejects = 0
    n_batches = 0
    net_lat_ms = SlidingWindow(1000)

    # Serial fenced loop with a PREALLOCATED batch buffer.  Two measured
    # pathologies in this environment drove the shape of this loop (see
    # ROADMAP.md "line sim"): (1) fresh np.concatenate of ~10 MB per batch
    # stalls 1+ s once JAX transfer machinery is active (allocator
    # pathology) — frames are written straight into one reused buffer
    # instead; (2) letting H2D run in the background (DeviceFeeder push
    # mode) starves every Python thread, so acquisition slows 50x — the
    # verdict fetch right after submit fences the transfer and keeps the
    # host and the tunnel strictly alternating.  On a PCIe-attached TPU
    # host (H2D ~10 GB/s, launch ~100 us) the feeder's pipelined push
    # mode is the right loop; through the tunnel, serial wins.
    buf = warm
    t_acq = t_dev = 0.0
    mb_pushed = 0.0
    t_start = time.time()
    while time.time() - t_start < duration_s:
        t0 = time.time()
        for s in range(sets_per_batch):
            fs = system.acquire_frames()
            for c, (_cid, fr) in enumerate(sorted(fs.frames.items())):
                buf[4 * s + c] = fr.data
        t1 = time.time()
        flags, confs = detector.verdict_device(buf)
        flags = np.asarray(flags)
        t2 = time.time()
        t_acq += t1 - t0
        t_dev += t2 - t1
        mb_pushed += buf.nbytes / 1e6
        confs_np = None
        for s in range(sets_per_batch):
            bottles += 1
            if flags[4 * s: 4 * (s + 1)].any():
                if confs_np is None:
                    confs_np = np.asarray(confs)
                conf = float(confs_np[4 * s: 4 * (s + 1)].max())
                rejector.reject("line", confidence=conf)
                rejects += 1
        latency_ms.push((t2 - t0) / sets_per_batch * 1000)
        net_lat_ms.push(max(t2 - t0 - transfer_s, 0.0)
                        / sets_per_batch * 1000)
        n_batches += 1

    elapsed = time.time() - t_start
    system.stop()
    print(f"stage time: acquisition+assembly {t_acq:.1f}s, "
          f"H2D+detect+verdict {t_dev:.1f}s of {elapsed:.1f}s; "
          f"H2D pushed {mb_pushed / elapsed:.0f} MB/s through the tunnel")

    bph = bottles / elapsed * 3600
    per_bottle_ms = latency_ms.avg()
    p99_ms = latency_ms.percentile(99)
    print(f"\nbottles inspected: {bottles} in {elapsed:.1f}s")
    print(f"throughput: {bph:,.0f} BPH "
          f"({'PASS' if bph >= TARGET_BPH else 'below'} the "
          f"{TARGET_BPH:,} BPH target)")
    print(f"per-bottle processing: avg {per_bottle_ms:.2f} ms, "
          f"p99 {p99_ms:.2f} ms "
          f"({'PASS' if p99_ms < 10 else 'above'} the 10 ms deadline)")
    print(f"rejects: {rejects} ({rejects/max(bottles,1)*100:.1f}%), "
          f"pulses fired: {rejector.stats()['fired']}")
    print(f"sync stats: {system.sync_manager.stats()}")

    # net-of-transfer figures: what the same loop sustains once pure H2D
    # transfer time (measured above on this link) is excluded — the
    # PCIe-host-equivalent number.
    net_elapsed = max(elapsed - n_batches * transfer_s, 1e-6)
    net_bph = bottles / net_elapsed * 3600
    net_p99_ms = net_lat_ms.percentile(99)
    print(f"net of H2D transfer ({h2d_mb_s:.0f} MB/s link, "
          f"{transfer_s*1000:.0f} ms/batch): {net_bph:,.0f} BPH, "
          f"per-bottle p99 {net_p99_ms:.2f} ms")
    if return_detail:
        return bph, p99_ms, {"net_bph": net_bph, "h2d_mb_s": h2d_mb_s,
                             "net_p99_ms": net_p99_ms,
                             "transfer_ms_per_batch": transfer_s * 1000,
                             "n_batches": n_batches, "bottles": bottles,
                             "rejects": rejects}
    return bph, p99_ms


if __name__ == "__main__":
    duration = float(sys.argv[1]) if len(sys.argv) > 1 else 10.0
    spb = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    main(duration, spb)
