#!/usr/bin/env python3
"""Quantify the axon tunnel's per-dispatch/per-fetch overheads.

Every optimization decision depends on this accounting: how much wall
time does (a) an executable launch, (b) a slice-of-result launch, (c) a
D2H fetch cost, and do launches overlap device compute?

Usage: python scripts/profile_dispatch.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(
                          os.path.dirname(os.path.abspath(__file__))),
                          ".jax_cache"))
    import jax.numpy as jnp

    dev = jax.devices()[0]
    print(f"device: {dev}", flush=True)
    iters = 20

    # -- (a) tiny op, force only at the end: pure submission cost ---------
    x = jax.device_put(np.arange(1024, dtype=np.float32), dev)
    tiny = jax.jit(lambda v: v + 1.0)
    np.asarray(tiny(x)[0])
    t0 = time.perf_counter()
    outs = [tiny(x) for _ in range(iters)]
    t_submit = (time.perf_counter() - t0) / iters
    t0 = time.perf_counter()
    for o in outs:
        np.asarray(o[0])
    t_force = (time.perf_counter() - t0) / iters
    print(f"tiny op: submit {t_submit*1000:.2f} ms/call, "
          f"slice+fetch {t_force*1000:.2f} ms/call", flush=True)

    # -- (b) one combined force at the end (single fetch) ------------------
    t0 = time.perf_counter()
    outs = [tiny(x) for _ in range(iters)]
    last = jax.jit(lambda vs: sum(v[0] for v in vs))(outs)
    np.asarray(last)
    t_all = time.perf_counter() - t0
    print(f"tiny op x{iters} + one combined fetch: "
          f"{t_all/iters*1000:.2f} ms/call", flush=True)

    # -- (c) D2H fetch costs by size --------------------------------------
    for n in (16, 16384, 1 << 20, 1 << 24):
        a = jax.device_put(np.zeros(n, np.uint8), dev)
        np.asarray(a[:1])
        t0 = time.perf_counter()
        for _ in range(5):
            np.asarray(a)
        dt = (time.perf_counter() - t0) / 5
        print(f"device_get {n/1e6:8.3f} MB: {dt*1000:8.2f} ms "
              f"({n/dt/1e6:.0f} MB/s)", flush=True)

    # -- (d) does device compute overlap submission? ----------------------
    # A compute-heavy op (big matmul loop) submitted repeatedly: if wall
    # time per call >> submit cost, device-bound; compare sequential vs
    # pipelined totals.
    m = jax.device_put(np.random.RandomState(0).randn(2048, 2048)
                       .astype(np.float32), dev)

    @jax.jit
    def heavy(a):
        def body(i, acc):
            return acc @ a * 1e-3
        return jax.lax.fori_loop(0, 40, body, a)[0, 0]

    np.asarray(heavy(m))
    t0 = time.perf_counter()
    outs = [heavy(m) for _ in range(10)]
    t_submit_h = (time.perf_counter() - t0) / 10
    for o in outs:
        np.asarray(o)
    t_total_h = (time.perf_counter() - t0) / 10
    print(f"heavy op: submit {t_submit_h*1000:.2f} ms/call, "
          f"wall {t_total_h*1000:.2f} ms/call (device-bound if >> submit)",
          flush=True)

    # -- (e) per-dispatch floor vs batch size for a pallas-style kernel ---
    from heimdall_tpu.ops.pallas_kernels import contamination_pallas_detect
    for batch in (128, 256, 512, 1024):
        frames = np.full((batch, 480, 640, 3), 200, np.uint8)
        fx = jax.device_put(frames, dev)

        def run():
            return contamination_pallas_detect(
                fx, 15, 10.0, 3000.0, 0.25, max_blobs=64, adaptive=True,
                sweeps=2)[2]
        np.asarray(run()[0, 0])
        infl = []
        t0 = time.perf_counter()
        n = max(4, 2048 // batch)
        for _ in range(n):
            infl.append(run())
        t_sub = (time.perf_counter() - t0) / n
        for o in infl:
            np.asarray(o[0, 0])
        dt = (time.perf_counter() - t0) / n
        print(f"detect batch={batch:5d}: submit {t_sub*1000:7.2f} ms, "
              f"wall {dt*1000:7.2f} ms/batch = "
              f"{dt/batch*1e6:6.1f} us/frame ({batch/dt:7.1f} fps)",
              flush=True)


if __name__ == "__main__":
    main()
