#!/usr/bin/env python3
"""Interpret-mode correctness check for the run-table CCL A/B variant
(scripts/profile_ccl_variants.ccl_runtable) vs the shipped sweeps."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np


def main():
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from heimdall_tpu.ops import pallas_kernels as pk
    from profile_ccl_variants import ccl_runtable

    rng = np.random.RandomState(3)
    ok = True

    def run_pair(mask, Rmax):
        H, W = mask.shape
        sentinel = H * W
        fg = jnp.asarray(mask.astype(np.int32))[None]

        def kernel(fg_ref, a_ref, b_ref):
            f = fg_ref[0]
            row = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)
            col = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
            lab0 = jnp.where(f > 0, row * W + col, sentinel)
            a_ref[0] = pk._ccl_sweeps(lab0, f, sentinel, 2, adaptive=True,
                                      scan_steps=5)
            b_ref[0] = ccl_runtable(pk, jnp, jax, pltpu, lab0, f, sentinel,
                                    Rmax=Rmax)

        a, b = pl.pallas_call(
            kernel,
            grid=(1,),
            in_specs=[pl.BlockSpec((1, H, W), lambda i: (i, 0, 0))],
            out_specs=[pl.BlockSpec((1, H, W), lambda i: (i, 0, 0))] * 2,
            out_shape=[jax.ShapeDtypeStruct((1, H, W), jnp.int32)] * 2,
            interpret=True)(fg)
        return np.asarray(a[0]), np.asarray(b[0])

    H, W = 96, 128
    yy, xx = np.mgrid[0:H, 0:W]

    cases = {}
    # hollow rect + disc + specks (the bench scene's structure)
    m = np.zeros((H, W), np.uint8)
    m[10:80, 20:22] = 1
    m[10:80, 100:102] = 1
    m[10:12, 20:102] = 1
    m[78:80, 20:102] = 1
    m |= ((yy - 50) ** 2 + (xx - 60) ** 2 <= 15 ** 2)
    m |= ((yy - 30) ** 2 + (xx - 40) ** 2 <= 4 ** 2)
    cases["rect+disc+speck"] = m
    # diagonal chain (8-conn corner touches)
    m = np.zeros((H, W), np.uint8)
    for i in range(30):
        m[10 + 2 * i: 12 + 2 * i, 10 + 2 * i: 12 + 2 * i] = 1
    cases["diag chain"] = m
    # spiral
    m = np.zeros((H, W), np.uint8)
    t = np.linspace(0, 5 * np.pi, 3000)
    r = 2 + t * 2.0
    sy = np.clip((48 + r * np.sin(t)).astype(int), 0, H - 1)
    sx = np.clip((64 + r * np.cos(t)).astype(int), 0, W - 1)
    m[sy, sx] = 1
    m[np.clip(sy + 1, 0, H - 1), sx] = 1
    cases["spiral"] = m
    # random blobs
    m = np.zeros((H, W), np.uint8)
    for _ in range(10):
        cy, cx = rng.randint(3, H - 3), rng.randint(3, W - 3)
        rr = rng.randint(1, 9)
        m |= ((yy - cy) ** 2 + (xx - cx) ** 2 <= rr * rr)
    cases["random"] = m
    # overflow trigger: > Rmax runs in a row (forces the classic branch)
    m = np.zeros((H, W), np.uint8)
    for k in range(20):
        m[40:44, 4 + 6 * k: 7 + 6 * k] = 1
    cases["overflow->fallback"] = m
    cases["empty"] = np.zeros((H, W), np.uint8)
    cases["full"] = np.ones((H, W), np.uint8)

    for name, m in cases.items():
        for Rmax in (12, 8):
            a, b = run_pair(m, Rmax)
            same = np.array_equal(a, b)
            ok &= same
            print(f"{'OK  ' if same else 'FAIL'} {name} (Rmax={Rmax})"
                  + ("" if same
                     else f"  diff={int((a != b).sum())}"), flush=True)

    print("ALL OK" if ok else "FAILURES", flush=True)
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
