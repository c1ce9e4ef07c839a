#!/usr/bin/env python3
"""Correctness check: the joint flood+CCL kernel vs the classic
fill->label composition, in interpret mode on CPU.

Covers the bench scene plus adversarial geometry: nested fg islands
inside holes (arbitrary depth), spirals, border-touching blobs, frames
with no fg and full fg.  Run before/after touching _label_flood_joint.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np


def main():
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from heimdall_tpu.ops.pallas_kernels import contamination_pallas

    rng = np.random.RandomState(7)

    def compare(frames, label, **kw):
        frames = jnp.asarray(frames)
        a = contamination_pallas(frames, 15, interpret=True, adaptive=True,
                                 sweeps=2, scan_steps=5, joint=False, **kw)
        b = contamination_pallas(frames, 15, interpret=True, adaptive=True,
                                 sweeps=2, scan_steps=5, joint=True, **kw)
        ok = True
        for name, x, y in zip(("sums", "bbox", "bgsum", "n"), a, b):
            if not np.array_equal(np.asarray(x), np.asarray(y)):
                ok = False
                print(f"  MISMATCH {label} {name}: "
                      f"{np.asarray(x).ravel()[:8]} vs "
                      f"{np.asarray(y).ravel()[:8]}")
        print(f"{'OK  ' if ok else 'FAIL'} {label}")
        return ok

    ok = True

    # 1. the bench scene (includes contaminants inside the rect's hole)
    from bench import make_frames
    ok &= compare(make_frames(6, seed=3), "bench scene x6")

    # 2. synthetic masks exercising nesting: build frames whose threshold
    #    output is controlled — dark shapes on white
    def frame_from_mask(mask):
        img = np.full(mask.shape + (3,), 230, np.uint8)
        img[mask > 0] = 20
        return img

    H, W = 128, 256
    yy, xx = np.mgrid[0:H, 0:W]

    def ring(cy, cx, r0, r1):
        d2 = (yy - cy) ** 2 + (xx - cx) ** 2
        return ((d2 >= r0 * r0) & (d2 <= r1 * r1)).astype(np.uint8)

    # nested: ring > island-ring > inner dot (3 levels)
    m = ring(64, 64, 26, 30) | ring(64, 64, 12, 15) | \
        (((yy - 64) ** 2 + (xx - 64) ** 2) <= 9).astype(np.uint8)
    # a separate plain blob to keep a second component alive
    m = m | (((yy - 40) ** 2 + (xx - 200) ** 2) <= 64).astype(np.uint8)
    ok &= compare(frame_from_mask(m)[None], "nested rings + blob")

    # 3. spiral (worst-case propagation path)
    m = np.zeros((H, W), np.uint8)
    cy, cx = 64, 128
    t = np.linspace(0, 6 * np.pi, 4000)
    r = 3 + t * 2.2
    sy = np.clip((cy + r * np.sin(t)).astype(int), 0, H - 1)
    sx = np.clip((cx + r * np.cos(t)).astype(int), 0, W - 1)
    m[sy, sx] = 1
    m[sy, np.clip(sx + 1, 0, W - 1)] = 1
    ok &= compare(frame_from_mask(m)[None], "spiral")

    # 4. blobs touching every border + 1px checkerboard patch (max runs)
    m = np.zeros((H, W), np.uint8)
    m[0:10, 30:60] = 1
    m[-10:, 100:140] = 1
    m[50:70, 0:8] = 1
    m[20:44, -6:] = 1
    m[80:96, 40:72] = (np.indices((16, 32)).sum(0) % 2).astype(np.uint8)
    ok &= compare(frame_from_mask(m)[None], "borders + checkerboard")

    # 5. empty and full frames
    ok &= compare(frame_from_mask(np.zeros((H, W), np.uint8))[None],
                  "empty")
    ok &= compare(frame_from_mask(np.ones((H, W), np.uint8))[None], "full")

    # 6. random blobs batch
    fr = []
    for _ in range(4):
        m = np.zeros((H, W), np.uint8)
        for _ in range(rng.randint(2, 8)):
            cy2, cx2 = rng.randint(5, H - 5), rng.randint(5, W - 5)
            rr = rng.randint(2, 14)
            m |= (((yy - cy2) ** 2 + (xx - cx2) ** 2) <= rr * rr)
        fr.append(frame_from_mask(m))
    ok &= compare(np.stack(fr), "random blobs x4")

    # 7. U-shape whose cavity opens to the border (NOT a hole) next to a
    #    closed O (a hole): exercises the exterior-vs-hole distinction
    m = np.zeros((H, W), np.uint8)
    m[30:90, 20:24] = 1
    m[30:90, 56:60] = 1
    m[86:90, 20:60] = 1          # U (open top)
    m[30:90, 120:124] = 1
    m[30:90, 156:160] = 1
    m[30:34, 120:160] = 1
    m[86:90, 120:160] = 1        # O (closed)
    ok &= compare(frame_from_mask(m)[None], "U vs O")

    print("ALL OK" if ok else "FAILURES", flush=True)
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
