"""Direct parity against the reference implementation itself.

Imports the actual reference package (read-only at /root/reference) and
compares defect outputs on identical frames — the strongest parity
evidence available.  Skipped when the reference checkout or its
dependencies are absent.
"""

import os
import sys

import numpy as np
import pytest

REF = "/root/reference"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REF, "heimdall")),
    reason="reference checkout not available")

cv2 = pytest.importorskip("cv2")


@pytest.fixture(scope="module")
def ref_detector_cls():
    sys.path.insert(0, REF)
    try:
        from heimdall.detectors.contamination_detector import (
            ContaminationDetector as RefDetector)
    except Exception as exc:  # pragma: no cover
        pytest.skip(f"reference import failed: {exc}")
    finally:
        sys.path.remove(REF)
    return RefDetector


def _frames():
    sys.path.insert(0, "examples")
    from test_contamination import add_artificial_contamination, make_bottle
    out = [add_artificial_contamination(make_bottle(), seed=s)
           for s in (1, 2, 3)]
    for i in (1, 2, 3):
        p = os.path.join(REF, f"contaminated_{i}.jpg")
        if os.path.exists(p):
            out.append(cv2.imread(p))
    return out


@pytest.mark.parametrize("config", [
    {},  # reference defaults: min 10 / max 3000 / thr 15 / conf 0.25
    {"min_contaminant_size": 3, "contrast_threshold": 25,
     "min_confidence": 0.3},
])
def test_defect_parity_vs_reference(ref_detector_cls, config):
    import logging
    logging.disable(logging.CRITICAL)   # the reference logs per contour
    try:
        ref = ref_detector_cls(config=dict(config))
        from heimdall_tpu.detectors.contamination_detector import (
            ContaminationDetector)
        mine = ContaminationDetector(config={**config,
                                             "include_contours": False})
        for img in _frames():
            want = ref.detect(img.copy())
            got = mine.detect(img.copy())
            assert len(got) == len(want), (
                f"count: got {[(d.position, d.size) for d in got]} "
                f"want {[(d.position, d.size) for d in want]}")
            unmatched = list(want)
            for d in got:
                # default ("auto") exact geometry: area and centroid are
                # the reference's own contour values — assert equality
                match = None
                for w in unmatched:
                    if d.position == w.position:
                        match = w
                        break
                assert match is not None, f"no reference match for {d}"
                unmatched.remove(match)
                assert abs(d.size - match.size) < 1e-6, (d.size, match.size)
                assert abs(d.confidence - match.confidence) <= 1e-6, (
                    d.confidence, match.confidence)
                assert tuple(d.metadata["bounding_box"]) == \
                    tuple(match.metadata["bounding_box"])
    finally:
        logging.disable(logging.NOTSET)


def test_self_touching_outline_parity(ref_detector_cls):
    """Corner-touching blobs (self-touching outer contour) are where
    Pick's-theorem area deviates from cv2.contourArea; the default "auto"
    exact-geometry mode must still match the reference exactly."""
    import logging
    logging.disable(logging.CRITICAL)
    try:
        img = np.full((120, 160, 3), 220, np.uint8)
        # two dark squares meeting at one diagonal corner -> one
        # 8-connected component with a self-touching outline
        img[30:45, 40:55] = 20
        img[45:60, 55:70] = 20
        # and a diagonal chain of three small squares
        img[70:78, 100:108] = 15
        img[78:86, 108:116] = 15
        img[86:94, 116:124] = 15
        ref = ref_detector_cls(config={"max_contaminant_size": 100000})
        from heimdall_tpu.detectors.contamination_detector import (
            ContaminationDetector)
        mine = ContaminationDetector(config={"max_contaminant_size": 100000})
        want = ref.detect(img.copy())
        got = mine.detect(img.copy())
        assert len(got) == len(want), (
            [(d.position, d.size) for d in got],
            [(d.position, d.size) for d in want])
        for d, w in zip(sorted(got, key=lambda d: d.position),
                        sorted(want, key=lambda d: d.position)):
            assert d.position == w.position
            assert abs(d.size - w.size) < 1e-6, (d.size, w.size)
            assert abs(d.confidence - w.confidence) <= 1e-6, (
                d.confidence, w.confidence)
    finally:
        logging.disable(logging.NOTSET)


def test_holed_blob_confidence_parity(ref_detector_cls):
    """Blobs with interior holes: the reference scores intensity/color over
    drawContours-FILLED masks (contamination_detector.py:117-163), so the
    device path must score over hole-filled components, not the raw mask.
    A thick dark ring (hole survives the 3x3 close) is the adversarial
    case; confidence must match to float32 rounding."""
    import logging
    logging.disable(logging.CRITICAL)
    try:
        img = np.full((200, 260, 3), 220, np.uint8)
        yy, xx = np.ogrid[:200, :260]
        d2 = (yy - 100) ** 2 + (xx - 130) ** 2
        img[(d2 <= 22 * 22) & (d2 >= 9 * 9)] = (25, 25, 25)
        d2b = (yy - 60) ** 2 + (xx - 60) ** 2
        img[(d2b <= 15 * 15) & (d2b >= 6 * 6)] = (30, 30, 30)

        cfg = {"max_contaminant_size": 100000}
        ref = ref_detector_cls(config=dict(cfg))
        from heimdall_tpu.detectors.contamination_detector import (
            ContaminationDetector)
        mine = ContaminationDetector(config=dict(cfg))
        want = ref.detect(img.copy())
        got = mine.detect(img.copy())
        assert len(got) == len(want) >= 2
        for g in got:
            m = [w for w in want if w.position == g.position]
            assert m, f"no reference blob at {g.position}"
            assert abs(g.size - m[0].size) < 1e-6
            assert abs(g.confidence - m[0].confidence) <= 1e-6, (
                g.confidence, m[0].confidence)
    finally:
        logging.disable(logging.NOTSET)
