#!/usr/bin/env python3
"""Diagnose the remaining confidence deviation vs the reference.

For every parity frame, compares per-blob (intensity, color) scores of the
device path against the reference's drawContours-filled-mask computation,
and reports the pixel-membership diff between the device mask (hole-filled
CCL component) and cv2's filled contour mask.
"""
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, "examples")

import numpy as np
import cv2

REF = "/root/reference"
sys.path.insert(0, REF)
from heimdall.detectors.contamination_detector import (  # noqa: E402
    ContaminationDetector as RefDetector)
sys.path.remove(REF)

from heimdall_tpu.detectors.contamination_detector import (  # noqa: E402
    ContaminationDetector)
from test_contamination import add_artificial_contamination, make_bottle  # noqa: E402

import logging
logging.disable(logging.CRITICAL)


def frames():
    out = [add_artificial_contamination(make_bottle(), seed=s)
           for s in (1, 2, 3)]
    for i in (1, 2, 3):
        p = os.path.join(REF, f"contaminated_{i}.jpg")
        if os.path.exists(p):
            out.append(cv2.imread(p))
    return out


def main():
    ref = RefDetector(config={})
    mine = ContaminationDetector(config={"include_contours": True})
    # self-touching scene from the parity suite
    extra = np.full((120, 160, 3), 220, np.uint8)
    extra[30:45, 40:55] = 20
    extra[45:60, 55:70] = 20
    extra[70:78, 100:108] = 15
    extra[78:86, 108:116] = 15
    extra[86:94, 116:124] = 15

    worst = 0.0
    for fi, img in enumerate(frames() + [extra]):
        cfg = {} if fi < 6 else {"max_contaminant_size": 100000}
        ref = RefDetector(config=dict(cfg))
        mine = ContaminationDetector(config=dict(cfg))
        want = ref.detect(img.copy())
        got = mine.detect(img.copy())
        for d in got:
            m = [w for w in want if w.position == d.position]
            if not m:
                print(f"frame {fi}: UNMATCHED {d.position}")
                continue
            w = m[0]
            dc = abs(d.confidence - w.confidence)
            di = abs(d.metadata["intensity_diff"]
                     - w.metadata["intensity_diff"])
            ds = abs(d.metadata["shape_score"] - w.metadata["shape_score"])
            dcol = abs(d.metadata["color_score"] - w.metadata["color_score"])
            worst = max(worst, dc)
            if dc > 1e-9:
                print(f"frame {fi} blob@{d.position}: dconf={dc:.6f} "
                      f"dint={di:.4f} dshape={ds:.6f} dcolor={dcol:.6f} "
                      f"area={d.size}")
                # membership diff: rebuild both masks
                contour = np.asarray(w.metadata["contour"], np.int32)
                cmask = np.zeros(img.shape[:2], np.uint8)
                cv2.drawContours(cmask, [contour.reshape(-1, 1, 2)], 0, 255,
                                 -1)
                x, y, bw, bh = w.metadata["bounding_box"]
                cm = cmask[y:y+bh, x:x+bw] > 0
                # device mask: reproduce from the label image
                import jax.numpy as jnp
                from heimdall_tpu.detectors.contamination_detector import (
                    contamination_program)
                table, conf, acc, labels = contamination_program(
                    jnp.asarray(img)[None], jnp.int32(15), jnp.float32(3.0),
                    jnp.float32(1e9), jnp.float32(0.0), return_labels=True)
                lab = np.asarray(labels[0])
                from heimdall_tpu.core.pipeline import _label_of_blob
                lid = _label_of_blob(lab, (x, y, bw, bh))
                dm = lab[y:y+bh, x:x+bw] == lid
                only_ref = int((cm & ~dm).sum())
                only_dev = int((dm & ~cm).sum())
                print(f"    mask diff: ref-only {only_ref} px, "
                      f"device-only {only_dev} px, "
                      f"ref {int(cm.sum())} dev {int(dm.sum())}")
    print(f"\nworst confidence deviation: {worst:.6f}")


if __name__ == "__main__":
    main()
