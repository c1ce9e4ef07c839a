"""End-to-end parity: ContaminationDetector versus the OpenCV algorithm.

The oracle below re-implements the reference detection recipe with OpenCV
calls (documented in SURVEY.md §2.1 / contamination_detector.py:44-216):
gray → GaussianBlur(5,5) → adaptiveThreshold(GAUSSIAN_C, BINARY_INV, 11, C)
→ morph OPEN + CLOSE (3x3) → findContours(EXTERNAL) → per-contour area
gate, moment centroid, masked fg/bg means, confidence blend.  Parity is
asserted at the blob level: same defect count, positions within 1 px,
contourArea within 0.5, confidence within 0.02 — on synthetic contaminated
bottles and on the reference repo's bundled fixtures when present.
"""

import os

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from heimdall_tpu.detectors.contamination_detector import ContaminationDetector

REF_FIXTURES = [
    f"/root/reference/contaminated_{i}.jpg" for i in (1, 2, 3)
]


def cv2_oracle(image, min_size=10, max_size=3000, contrast=15,
               min_conf=0.25, use_color=True):
    """The reference algorithm, straight OpenCV (blob-level oracle)."""
    original = image
    gray = cv2.cvtColor(image, cv2.COLOR_BGR2GRAY) if image.ndim == 3 else image
    blurred = cv2.GaussianBlur(gray, (5, 5), 0)
    binary = cv2.adaptiveThreshold(blurred, 255,
                                   cv2.ADAPTIVE_THRESH_GAUSSIAN_C,
                                   cv2.THRESH_BINARY_INV, 11, contrast)
    kernel = cv2.getStructuringElement(cv2.MORPH_RECT, (3, 3))
    binary = cv2.morphologyEx(binary, cv2.MORPH_OPEN, kernel)
    binary = cv2.morphologyEx(binary, cv2.MORPH_CLOSE, kernel)
    contours, _ = cv2.findContours(binary, cv2.RETR_EXTERNAL,
                                   cv2.CHAIN_APPROX_SIMPLE)
    out = []
    for contour in contours:
        area = cv2.contourArea(contour)
        if area < min_size or area > max_size:
            continue
        mask = np.zeros_like(gray)
        cv2.drawContours(mask, [contour], 0, 255, -1)
        x, y, w, h = cv2.boundingRect(contour)
        M = cv2.moments(contour)
        if M["m00"] <= 0:
            continue
        cx, cy = int(M["m10"] / M["m00"]), int(M["m01"] / M["m00"])
        roi = gray[y:y + h, x:x + w]
        roi_mask = mask[y:y + h, x:x + w]
        bg = np.mean(roi[roi_mask == 0]) if np.any(roi_mask == 0) else 127
        fg = np.mean(roi[roi_mask == 255]) if np.any(roi_mask == 255) else 127
        intensity_diff = abs(bg - fg)
        intensity_score = min(1.0, intensity_diff / 30.0)
        rect_area = w * h
        shape_score = 1.0 - (area / rect_area if rect_area > 0 else 0)
        color_score = 0.5
        if use_color and original.ndim == 3:
            diffs = []
            for ch in cv2.split(original[y:y + h, x:x + w]):
                cfg = np.mean(ch[roi_mask == 255]) if np.any(roi_mask == 255) else 127
                cbg = np.mean(ch[roi_mask == 0]) if np.any(roi_mask == 0) else 127
                diffs.append(abs(cfg - cbg))
            color_score = min(1.0, max(diffs) / 30.0)
        confidence = 0.5 * intensity_score + 0.2 * shape_score + 0.3 * color_score
        if confidence >= min_conf:
            out.append({"pos": (cx, cy), "area": area, "conf": confidence,
                        "bbox": (x, y, w, h)})
    return out


def make_contaminated_bottle(seed, h=480, w=640, n_defects=2):
    """The test_contamination.py scenario: bottle + deterministic dark dots
    (reference heimdall/test_contamination.py:36-51)."""
    rng = np.random.RandomState(seed)
    img = np.full((h, w, 3), 220, np.uint8)
    cv2.rectangle(img, (w // 2 - 100, h // 2 - 120),
                  (w // 2 + 100, h // 2 + 120), (100, 100, 100), 2)
    cv2.circle(img, (w // 2, h // 2 + 100), 95, (80, 80, 80), -1)
    positions = [(w // 4, h // 2), (3 * w // 4, h // 2)][:n_defects]
    for (x, y) in positions:
        r = rng.randint(15, 30)
        v = int(rng.randint(0, 60))
        cv2.circle(img, (x, y), r, (v, v, v), -1)
    return img


def assert_blob_parity(defects, oracle, pos_tol=1, area_tol=1.01,
                       conf_tol=0.02):
    # area_tol: Pick's-theorem contourArea is exact for simply-connected
    # blobs; self-touching outlines (corner-connected lobes) deviate by up
    # to ~1 px^2 (~1% of adversarial shapes, rarer after morphology).
    assert len(defects) == len(oracle), (
        f"count mismatch: got {len(defects)} "
        f"{[(d.position, d.size, round(d.confidence,3)) for d in defects]} "
        f"vs oracle {len(oracle)} "
        f"{[(o['pos'], o['area'], round(o['conf'],3)) for o in oracle]}")
    unmatched = list(oracle)
    for d in defects:
        match = None
        for o in unmatched:
            if (abs(d.position[0] - o["pos"][0]) <= pos_tol
                    and abs(d.position[1] - o["pos"][1]) <= pos_tol):
                match = o
                break
        assert match is not None, f"no oracle match for {d}"
        unmatched.remove(match)
        assert abs(d.size - match["area"]) <= area_tol, (d, match)
        assert abs(d.confidence - match["conf"]) <= conf_tol, (d, match)
        assert tuple(d.metadata["bounding_box"]) == tuple(match["bbox"])


class TestDetectorParity:
    def test_synthetic_bottles(self):
        det = ContaminationDetector(config={"include_contours": False})
        for seed in range(5):
            img = make_contaminated_bottle(seed)
            got = det.detect(img)
            want = cv2_oracle(img)
            assert_blob_parity(got, want)

    def test_inspector_defaults(self):
        """The ContaminationInspector's detector settings (min 3 / thr 25 /
        conf 0.3)."""
        det = ContaminationDetector(config={
            "min_contaminant_size": 3, "max_contaminant_size": 3000,
            "contrast_threshold": 25, "min_confidence": 0.3,
            "use_color": True, "include_contours": False})
        for seed in (7, 8):
            img = make_contaminated_bottle(seed, n_defects=2)
            got = det.detect(img)
            want = cv2_oracle(img, min_size=3, max_size=3000, contrast=25,
                              min_conf=0.3)
            assert_blob_parity(got, want)

    @pytest.mark.parametrize("path", REF_FIXTURES)
    def test_reference_fixtures(self, path):
        """Blob parity on the reference repo's own bundled images."""
        if not os.path.exists(path):
            pytest.skip("reference fixtures not available")
        img = cv2.imread(path)
        det = ContaminationDetector(config={"include_contours": False})
        got = det.detect(img)
        want = cv2_oracle(img)
        assert_blob_parity(got, want)

    def test_batch_consistency(self):
        """detect_batch over N frames == N single detects."""
        det = ContaminationDetector(config={"include_contours": False})
        imgs = np.stack([make_contaminated_bottle(s) for s in range(4)])
        batched = det.detect_batch(imgs)
        for i in range(4):
            single = det.detect(imgs[i])
            assert len(batched[i]) == len(single)
            for a, b in zip(batched[i], single):
                assert a.position == b.position
                assert abs(a.confidence - b.confidence) < 1e-5

    def test_grayscale_input(self):
        det = ContaminationDetector(config={"include_contours": False})
        img = cv2.cvtColor(make_contaminated_bottle(3), cv2.COLOR_BGR2GRAY)
        got = det.detect(img)
        want = cv2_oracle(img, use_color=False)
        assert_blob_parity(got, want)

    def test_native_formula(self):
        """The 0.7/0.3 native-path confidence variant exists and differs."""
        det_py = ContaminationDetector(config={"include_contours": False})
        det_rs = ContaminationDetector(config={
            "include_contours": False, "confidence_formula": "native"})
        img = make_contaminated_bottle(1)
        d_py = det_py.detect(img)
        d_rs = det_rs.detect(img)
        assert d_py and d_rs
        assert any(abs(a.confidence - b.confidence) > 1e-6
                   for a, b in zip(d_py, d_rs))

    def test_contour_metadata(self):
        det = ContaminationDetector()  # contours on by default
        img = make_contaminated_bottle(2)
        defects = det.detect(img)
        assert defects
        for d in defects:
            pts = np.asarray(d.metadata["contour"])
            assert pts.ndim == 3 and pts.shape[-1] == 2
            x, y, w, h = d.metadata["bounding_box"]
            assert (pts[..., 0] >= x).all() and (pts[..., 0] < x + w).all()
            assert (pts[..., 1] >= y).all() and (pts[..., 1] < y + h).all()


class TestExactGeometry:
    def test_polygon_helpers_match_cv2(self):
        from heimdall_tpu.utils import contours as cm
        img = np.zeros((80, 120), np.uint8)
        cv2.circle(img, (40, 40), 13, 255, -1)
        cv2.ellipse(img, (85, 45), (18, 9), 20, 0, 360, 255, -1)
        found, _ = cv2.findContours(img, cv2.RETR_EXTERNAL,
                                    cv2.CHAIN_APPROX_NONE)
        for c in found:
            want_area = cv2.contourArea(c)
            M = cv2.moments(c)
            got_area = cm.polygon_area(c)
            m00, m10, m01 = cm.polygon_moments(c)
            assert got_area == pytest.approx(want_area)
            assert m00 == pytest.approx(abs(M["m00"]))
            assert int(m10 / m00) == int(M["m10"] / M["m00"])
            assert int(m01 / m00) == int(M["m01"] / M["m00"])

    def test_exact_mode_bitexact_vs_oracle(self):
        """exact_geometry: size/position match cv2 EXACTLY (no tolerance)
        on the synthetic corpus."""
        det = ContaminationDetector(config={"include_contours": False,
                                            "exact_geometry": True})
        for seed in range(4):
            img = make_contaminated_bottle(seed)
            got = det.detect(img)
            want = cv2_oracle(img)
            assert len(got) == len(want)
            got_s = sorted((d.position, d.size) for d in got)
            want_s = sorted((o["pos"], o["area"]) for o in want)
            assert got_s == want_s, (got_s, want_s)


class TestEdgeCases:
    def test_clean_frame_no_defects(self):
        """A defect-free frame yields an empty defect list (and the device
        program handles the all-background label image)."""
        det = ContaminationDetector(config={"include_contours": False})
        clean = np.full((240, 320, 3), 220, np.uint8)
        assert det.detect(clean) == []
        assert cv2_oracle(clean) == []

    def test_blob_table_overflow_reported(self):
        """More blobs than table capacity: n_blobs exceeds K and exactly K
        slots fill (documented overflow contract)."""
        from heimdall_tpu.detectors.contamination_detector import (
            contamination_program)
        import jax.numpy as jnp
        rng = np.random.RandomState(0)
        img = np.full((128, 192, 3), 220, np.uint8)
        for _ in range(30):
            x, y = rng.randint(8, 184), rng.randint(8, 120)
            img[y:y + 4, x:x + 4] = 20
        table, conf, acc = contamination_program(
            jnp.asarray(img[None]), jnp.int32(15), jnp.float32(0.0),
            jnp.float32(1e9), jnp.float32(0.0), max_blobs=8, ccl_sweeps=6)
        n = int(np.asarray(table.n_blobs)[0])
        assert n > 8
        assert int(np.asarray(table.valid)[0].sum()) == 8

    def test_tiny_frame(self):
        det = ContaminationDetector(config={"include_contours": False})
        img = np.full((32, 48, 3), 220, np.uint8)
        img[12:20, 20:28] = 20
        got = det.detect(img)
        want = cv2_oracle(img)
        assert_blob_parity(got, want)
