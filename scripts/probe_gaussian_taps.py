"""Recover cv2.GaussianBlur's uint8 fixed-point taps by impulse probing.

This is the tool that cracked the ksize > 11 parity gap (r5).  cv2 5.x's
uint8 Gaussian path is separable Q8 fixed point with final descale
``(acc + 2**15) >> 16``; a constant 255-valued COLUMN therefore reads the
vertical taps back out of the output almost verbatim:

    out[j] = (255 * S * t[j] + 2**15) >> 16   with S = sum(taps) = 256
           = t[j]  for t[j] < 128

Probing every odd ksize 3..59 (and explicit sigmas) showed the recovered
taps reproduce cv2.GaussianBlur EXACTLY, and that for computed kernels
(ksize > 7 or sigma > 0) they equal cumulative (error-diffusion) rounding
of the float64 kernel:

    t[i] = rint(cumsum(k * 256))[i] - rint(cumsum(k * 256))[i - 1]

which forces sum(t) == 256 and permits non-monotone taps (ksize 31 opens
[0, 1, 0, 1, 2, ...] — impossible under any per-tap rounding, the clue
that led here).  The shipped implementation is
heimdall_tpu/ops/filters.py::_q8_taps_bitexact; golden tests in
tests/test_ops_parity.py::TestGaussianBlur.

Run: python scripts/probe_gaussian_taps.py   (needs cv2; CPU-only)
"""

import math
import sys

import numpy as np

import cv2


def probe_taps(n, sigma=0.0):
    """Read cv2's vertical Q8 taps out of a constant-column impulse."""
    r = n // 2
    H, W = 64, max(4 * n + 1, 65)
    img = np.zeros((H, W), np.uint8)
    img[:, W // 2] = 255
    out = cv2.GaussianBlur(img, (n, n), sigma)
    return out[H // 2, W // 2 - r:W // 2 + r + 1].astype(np.int64)


def cumulative_taps(n, sigma=0.0):
    """diff(rint(cumsum(k*256))) of the float64 getGaussianKernel kernel."""
    if sigma <= 0:
        sigma = 0.15 * n + 0.35
    c = (n - 1) * 0.5
    v = np.array([math.exp(-0.5 * ((i - c) / sigma) ** 2) for i in range(n)],
                 dtype=np.float64)
    cs = np.rint(np.cumsum(v / v.sum() * 256.0))
    return np.diff(np.concatenate([[0.0], cs])).astype(np.int64)


def sep_q8(img, taps):
    """The Q8 pipeline: int32 separable conv, (acc + 2**15) >> 16."""
    n = len(taps)
    r = n // 2
    xp = np.pad(img.astype(np.int64), r, mode="reflect")
    H, W = img.shape
    tmp = np.zeros((H + 2 * r, W), np.int64)
    for i in range(n):
        tmp += taps[i] * xp[:, i:i + W]
    out = np.zeros((H, W), np.int64)
    for i in range(n):
        out += taps[i] * tmp[i:i + H, :]
    return np.clip((out + (1 << 15)) >> 16, 0, 255).astype(np.uint8)


def main():
    rng = np.random.default_rng(0)
    failures = 0
    configs = [(n, 0.0) for n in range(3, 60, 2)]
    configs += [(n, s) for n in (5, 9, 13, 21, 31)
                for s in (0.8, 1.7, 2.5, 4.0, 7.3)]
    for n, sigma in configs:
        probed = probe_taps(n, sigma)
        # The hardcoded small kernels (ksize <= 7, sigma <= 0) are exact
        # multiples of 1/256 — cumulative rounding of the COMPUTED Gaussian
        # does not apply to them (cv2 never computes a kernel there).
        check_gen = not (sigma <= 0 and n <= 7)
        if check_gen and not np.array_equal(probed, cumulative_taps(n, sigma)):
            print(f"GEN MISMATCH n={n} sigma={sigma}: probed={list(probed)} "
                  f"cumulative={list(cumulative_taps(n, sigma))}")
            failures += 1
        img = rng.integers(0, 256, (120, 160), dtype=np.uint8)
        ref = cv2.GaussianBlur(img, (n, n), sigma)
        bad = int((sep_q8(img, probed) != ref).sum())
        if bad:
            print(f"PIPE MISMATCH n={n} sigma={sigma}: {bad} pixels")
            failures += 1
    print(f"checked {len(configs)} configs: "
          f"{'ALL EXACT' if failures == 0 else f'{failures} FAILURES'}")
    return 0 if failures == 0 else 1


if __name__ == "__main__":
    sys.exit(main())
