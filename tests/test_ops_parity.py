"""Golden parity tests: heimdall_tpu.ops versus OpenCV.

Each op the reference pipelines rely on (SURVEY.md §2.1 "Pipeline stages")
is checked against cv2 on random noise and on realistic bottle frames.
Bit-exactness is asserted where the design guarantees it (grayscale,
Gaussian blur ksize<=11, adaptive threshold, fixed/Otsu threshold,
morphology, equalizeHist); tolerance bounds elsewhere (Canny, CLAHE).
"""

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

import jax.numpy as jnp

from heimdall_tpu import ops


def _noise(rng, h=120, w=160, c=None):
    shape = (h, w) if c is None else (h, w, c)
    return rng.randint(0, 256, shape, dtype=np.uint8)


def _bottle(rng, h=480, w=640):
    """Synthetic bottle frame like the reference simulation source."""
    img = np.ones((h, w, 3), np.uint8) * 220
    cv2.rectangle(img, (w // 2 - 100, h // 2 - 120), (w // 2 + 100, h // 2 + 120),
                  (100, 100, 100), 2)
    cv2.circle(img, (w // 2, h // 2 + 100), 95, (80, 80, 80), -1)
    for _ in range(3):
        x = rng.randint(w // 3, 2 * w // 3)
        y = rng.randint(h // 3, 2 * h // 3)
        r = rng.randint(3, 12)
        v = int(rng.randint(0, 60))
        cv2.circle(img, (x, y), r, (v, v, v), -1)
    return img


class TestGrayscale:
    def test_bit_exact_noise(self, rng):
        img = _noise(rng, c=3)
        got = np.asarray(ops.bgr_to_gray(jnp.asarray(img)))
        want = cv2.cvtColor(img, cv2.COLOR_BGR2GRAY)
        np.testing.assert_array_equal(got, want)

    def test_bit_exact_bottle(self, rng):
        img = _bottle(rng)
        got = np.asarray(ops.bgr_to_gray(jnp.asarray(img)))
        want = cv2.cvtColor(img, cv2.COLOR_BGR2GRAY)
        np.testing.assert_array_equal(got, want)

    def test_batched(self, rng):
        imgs = np.stack([_noise(rng, c=3) for _ in range(4)])
        got = np.asarray(ops.bgr_to_gray(jnp.asarray(imgs)))
        for i in range(4):
            np.testing.assert_array_equal(
                got[i], cv2.cvtColor(imgs[i], cv2.COLOR_BGR2GRAY))

    def test_gray_passthrough(self, rng):
        img = _noise(rng)
        np.testing.assert_array_equal(
            np.asarray(ops.bgr_to_gray(jnp.asarray(img))), img)


class TestGaussianBlur:
    @pytest.mark.parametrize("ksize", [3, 5, 7, 9, 11])
    def test_bit_exact(self, rng, ksize):
        img = _noise(rng, 256, 256)
        got = np.asarray(ops.gaussian_blur(jnp.asarray(img), ksize))
        want = cv2.GaussianBlur(img, (ksize, ksize), 0)
        np.testing.assert_array_equal(got, want)

    def test_explicit_sigma(self, rng):
        img = _noise(rng, 128, 128)
        got = np.asarray(ops.gaussian_blur(jnp.asarray(img), 5, 1.5))
        want = cv2.GaussianBlur(img, (5, 5), 1.5)
        np.testing.assert_array_equal(got, want)

    def test_color(self, rng):
        img = _noise(rng, 64, 64, 3)
        got = np.asarray(ops.gaussian_blur(jnp.asarray(img), 5))
        want = cv2.GaussianBlur(img, (5, 5), 0)
        np.testing.assert_array_equal(got, want)

    @pytest.mark.parametrize("ksize", [13, 15, 21, 25, 31, 51])
    def test_large_kernel_bit_exact(self, rng, ksize):
        # cv2's computed-kernel quantization is cumulative (error-diffusion)
        # rounding of k*256 — recovered via impulse probes (r5); taps need
        # not be monotone (ksize 31 opens [0,1,0,1,2,...]).
        img = _noise(rng, 128, 128)
        got = np.asarray(ops.gaussian_blur(jnp.asarray(img), ksize))
        want = cv2.GaussianBlur(img, (ksize, ksize), 0)
        np.testing.assert_array_equal(got, want)

    @pytest.mark.parametrize("ksize,sigma", [(5, 0.8), (11, 2.9), (21, 4.0)])
    def test_explicit_sigma_bit_exact(self, rng, ksize, sigma):
        img = _noise(rng, 128, 128)
        got = np.asarray(ops.gaussian_blur(jnp.asarray(img), ksize, sigma))
        want = cv2.GaussianBlur(img, (ksize, ksize), sigma)
        np.testing.assert_array_equal(got, want)


class TestBoxBlur:
    @pytest.mark.parametrize("ksize", [3, 5, 7, 15])
    def test_bit_exact(self, rng, ksize):
        # odd n^2 means acc/n^2 has no exact .5 ties, so integer half-up
        # rounding equals cv2's f64 cvRound; verified exhaustively over
        # every achievable 3x3 window sum (scripts-level probe, r5).
        img = _noise(rng, 128, 128)
        got = np.asarray(ops.box_blur(jnp.asarray(img), ksize))
        want = cv2.blur(img, (ksize, ksize))
        np.testing.assert_array_equal(got, want)
        assert (got != want).mean() < 0.01


class TestThreshold:
    @pytest.mark.parametrize("method,cvm", [
        ("binary", cv2.THRESH_BINARY),
        ("binary_inv", cv2.THRESH_BINARY_INV),
        ("trunc", cv2.THRESH_TRUNC),
        ("tozero", cv2.THRESH_TOZERO),
        ("tozero_inv", cv2.THRESH_TOZERO_INV),
    ])
    def test_fixed(self, rng, method, cvm):
        img = _noise(rng)
        got = np.asarray(ops.threshold(jnp.asarray(img), 50, 255, method))
        _, want = cv2.threshold(img, 50, 255, cvm)
        np.testing.assert_array_equal(got, want)

    def test_otsu(self, rng):
        img = _bottle(rng)
        gray = cv2.cvtColor(img, cv2.COLOR_BGR2GRAY)
        t, got = ops.threshold_auto(jnp.asarray(gray), 255, "binary", "otsu")
        want_t, want = cv2.threshold(gray, 0, 255,
                                     cv2.THRESH_BINARY | cv2.THRESH_OTSU)
        assert int(t) == int(want_t)
        np.testing.assert_array_equal(np.asarray(got), want)

    def test_triangle(self, rng):
        img = _bottle(rng)
        gray = cv2.cvtColor(img, cv2.COLOR_BGR2GRAY)
        t, got = ops.threshold_auto(jnp.asarray(gray), 255, "binary", "triangle")
        want_t, want = cv2.threshold(gray, 0, 255,
                                     cv2.THRESH_BINARY | cv2.THRESH_TRIANGLE)
        assert abs(int(t) - int(want_t)) <= 1


class TestAdaptiveThreshold:
    @pytest.mark.parametrize("block", [3, 5, 11])
    @pytest.mark.parametrize("c", [2, 15, -3])
    @pytest.mark.parametrize("ttype,cvt", [
        ("binary", cv2.THRESH_BINARY),
        ("binary_inv", cv2.THRESH_BINARY_INV),
    ])
    def test_gaussian_bit_exact(self, rng, block, c, ttype, cvt):
        img = _noise(rng, 200, 200)
        got = np.asarray(ops.adaptive_threshold(
            jnp.asarray(img), 255, "gaussian", ttype, block, c))
        want = cv2.adaptiveThreshold(
            img, 255, cv2.ADAPTIVE_THRESH_GAUSSIAN_C, cvt, block, c)
        np.testing.assert_array_equal(got, want)

    def test_mean_bit_exact(self, rng):
        img = _noise(rng, 200, 200)
        got = np.asarray(ops.adaptive_threshold(
            jnp.asarray(img), 255, "mean", "binary_inv", 11, 4))
        want = cv2.adaptiveThreshold(
            img, 255, cv2.ADAPTIVE_THRESH_MEAN_C, cv2.THRESH_BINARY_INV, 11, 4)
        np.testing.assert_array_equal(got, want)

    def test_traced_c(self, rng):
        """contrast_threshold enters traced — no recompile, same result."""
        import jax
        img = _noise(rng, 100, 100)
        f = jax.jit(lambda x, c: ops.adaptive_threshold(
            x, 255, "gaussian", "binary_inv", 11, c))
        for c in (5, 15, 25):
            got = np.asarray(f(jnp.asarray(img), jnp.int32(c)))
            want = cv2.adaptiveThreshold(
                img, 255, cv2.ADAPTIVE_THRESH_GAUSSIAN_C,
                cv2.THRESH_BINARY_INV, 11, c)
            np.testing.assert_array_equal(got, want)


class TestMorphology:
    @pytest.mark.parametrize("shape", ["rect", "ellipse", "cross"])
    @pytest.mark.parametrize("ksize", [3, 5])
    def test_structuring_element(self, shape, ksize):
        cvshape = {"rect": cv2.MORPH_RECT, "ellipse": cv2.MORPH_ELLIPSE,
                   "cross": cv2.MORPH_CROSS}[shape]
        got = ops.structuring_element(shape, ksize)
        want = cv2.getStructuringElement(cvshape, (ksize, ksize))
        np.testing.assert_array_equal(got, want)

    @pytest.mark.parametrize("op,cvo", [
        ("erode", cv2.MORPH_ERODE), ("dilate", cv2.MORPH_DILATE),
        ("open", cv2.MORPH_OPEN), ("close", cv2.MORPH_CLOSE),
        ("gradient", cv2.MORPH_GRADIENT),
        ("tophat", cv2.MORPH_TOPHAT), ("blackhat", cv2.MORPH_BLACKHAT),
    ])
    @pytest.mark.parametrize("shape", ["rect", "ellipse", "cross"])
    def test_ops_bit_exact(self, rng, op, cvo, shape):
        img = (rng.rand(80, 90) > 0.5).astype(np.uint8) * 255
        se = ops.structuring_element(shape, 3)
        got = np.asarray(ops.morphology_ex(jnp.asarray(img), op, se))
        want = cv2.morphologyEx(img, cvo, se)
        np.testing.assert_array_equal(got, want)

    def test_iterations(self, rng):
        img = (rng.rand(64, 64) > 0.5).astype(np.uint8) * 255
        se = ops.structuring_element("rect", 3)
        got = np.asarray(ops.morphology_ex(jnp.asarray(img), "open", se, 2))
        want = cv2.morphologyEx(img, cv2.MORPH_OPEN, se, iterations=2)
        np.testing.assert_array_equal(got, want)

    def test_grayscale_morphology(self, rng):
        img = _noise(rng, 64, 64)
        se = ops.structuring_element("rect", 5)
        got = np.asarray(ops.erode(jnp.asarray(img), se))
        np.testing.assert_array_equal(got, cv2.erode(img, se))


class TestHistogram:
    def test_equalize_bit_exact(self, rng):
        img = _noise(rng)
        got = np.asarray(ops.equalize_hist(jnp.asarray(img)))
        want = cv2.equalizeHist(img)
        np.testing.assert_array_equal(got, want)

    def test_equalize_bottle(self, rng):
        gray = cv2.cvtColor(_bottle(rng), cv2.COLOR_BGR2GRAY)
        got = np.asarray(ops.equalize_hist(jnp.asarray(gray)))
        np.testing.assert_array_equal(got, cv2.equalizeHist(gray))

    def test_clahe_bit_exact_bottle(self, rng):
        gray = cv2.cvtColor(_bottle(rng), cv2.COLOR_BGR2GRAY)
        got = np.asarray(ops.clahe(jnp.asarray(gray), 2.0, 8))
        np.testing.assert_array_equal(got, cv2.createCLAHE(2.0, (8, 8))
                                      .apply(gray))

    @pytest.mark.parametrize("h,w,grid,clip", [
        (120, 160, 8, 2.0),     # divisible both dims
        (48, 110, 4, 1.0),      # H divisible, W not (full extra tile row!)
        (406, 392, 8, 3.5),     # W divisible, H not
        (37, 53, 8, 2.0),       # neither divisible
        (192, 579, 4, 0.0),     # clipping disabled
        (16, 40, 16, 2.0),      # pad (16 rows) exceeds source height
    ])
    def test_clahe_bit_exact(self, h, w, grid, clip):
        r = np.random.RandomState(h * 131 + w)
        gray = r.randint(0, 256, (h, w), np.uint8)
        got = np.asarray(ops.clahe(jnp.asarray(gray), clip, grid))
        want = cv2.createCLAHE(clip, (grid, grid)).apply(gray)
        np.testing.assert_array_equal(got, want)

    def test_clahe_bit_exact_smooth(self, rng):
        # peaked histograms exercise the residual-redistribution path
        gray = cv2.GaussianBlur(_noise(rng, 97, 203), (9, 9), 0)
        got = np.asarray(ops.clahe(jnp.asarray(gray), 3.0, 8))
        np.testing.assert_array_equal(
            got, cv2.createCLAHE(3.0, (8, 8)).apply(gray))


class TestCanny:
    def test_exact_on_bottle(self, rng):
        gray = cv2.cvtColor(_bottle(rng), cv2.COLOR_BGR2GRAY)
        blurred = cv2.GaussianBlur(gray, (5, 5), 0)
        got = np.asarray(ops.canny(jnp.asarray(blurred.astype(np.int32)),
                                   50, 150))
        want = cv2.Canny(blurred, 50, 150)
        np.testing.assert_array_equal(got, want)

    @pytest.mark.parametrize("l2", [False, True])
    def test_exact_on_random(self, l2):
        r = np.random.RandomState(7 + l2)
        for t in range(6):
            h, w = r.randint(16, 120), r.randint(16, 160)
            img = r.randint(0, 256, (h, w)).astype(np.uint8)
            if t % 2:
                img = cv2.GaussianBlur(img, (5, 5), 0)
            t1, t2 = sorted(r.randint(5, 400, 2).tolist())
            got = np.asarray(ops.canny(jnp.asarray(img.astype(np.int32)),
                                       t1, t2, l2_gradient=l2))
            want = cv2.Canny(img, t1, t2, L2gradient=l2)
            np.testing.assert_array_equal(got, want, err_msg=f"iter {t}")
