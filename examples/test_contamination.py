#!/usr/bin/env python3
"""End-to-end contamination demo: deterministic defects → inspect → save.

Equivalent of the reference's heimdall/test_contamination.py:21-125 (its
parity-fixture generator): create synthetic bottles with two deterministic
dark-circle contaminations, run the ContaminationInspector, write
original/processed/visualization images to results/ (viewable with
``python -m heimdall_tpu.serving.web_viewer``), and print summary stats.
"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import os

import numpy as np

from heimdall_tpu.inspection.contamination_inspector import (
    ContaminationInspector)
from heimdall_tpu.utils import draw


def add_artificial_contamination(image, seed):
    """Two dark circles at (w/4, h/2) and (3w/4, h/2), like the reference
    (test_contamination.py:36-51)."""
    rng = np.random.RandomState(seed)
    h, w = image.shape[:2]
    for x in (w // 4, 3 * w // 4):
        radius = rng.randint(15, 30)
        shade = int(rng.randint(0, 60))
        draw.filled_circle(image, (x, h // 2), radius,
                           (shade, shade, shade))
    return image


def make_bottle(width=640, height=480):
    img = np.full((height, width, 3), 220, np.uint8)
    cx, cy = width // 2, height // 2
    bw, bh = min(width, height) // 3, min(width, height) // 2
    draw.rect_outline(img, (cx - bw // 2, cy - bh // 2),
                      (cx + bw // 2, cy + bh // 2), (100, 100, 100), 2)
    draw.filled_circle(img, (cx, cy + bh // 2 - 20), bw // 2 - 5,
                       (80, 80, 80))
    return img


def save(path, image):
    try:
        import cv2
        cv2.imwrite(path, image)
        return True
    except ImportError:
        np.save(path + ".npy", image)
        return True


def main():
    os.makedirs("results", exist_ok=True)
    inspector = ContaminationInspector("demo")
    total_defects = 0
    for i in range(1, 4):
        image = add_artificial_contamination(make_bottle(), seed=i)
        result = inspector.inspect(image)
        print(f"inspection {i}: success={result.success} "
              f"defects={result.defect_count} "
              f"time={result.processing_time*1000:.1f} ms")
        for d in result.defects:
            print(f"  {d}")
        total_defects += result.defect_count
        save(f"results/original_{i}.jpg", result.images["original"])
        save(f"results/processed_{i}.jpg", result.images["processed"])
        save(f"results/visualization_{i}.jpg",
             result.images["visualization"])
    print(f"\ntotal: {total_defects} defects in 3 inspections "
          f"(expected 2 per frame)")
    print("view results: python -m heimdall_tpu.serving.web_viewer -d "
          "results")


if __name__ == "__main__":
    main()
