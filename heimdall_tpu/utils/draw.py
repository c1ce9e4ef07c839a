"""Pure-NumPy raster drawing helpers.

The reference leans on cv2 drawing (circles, rectangles, text) for its
synthetic frames and visualizations (heimdall/core/acquisition.py:313-361,
detectors/contamination_detector.py:218-289).  This framework keeps drawing
host-side and dependency-free: a small numpy rasterizer with an embedded
5x7 bitmap font, so simulation and visualization work without OpenCV.
"""

from typing import Sequence, Tuple

import numpy as np

Color = Tuple[int, int, int]


def _color_of(img: np.ndarray, color) -> np.ndarray:
    if img.ndim == 2:
        if isinstance(color, (tuple, list)):
            color = color[0]
        return np.uint8(color)
    return np.asarray(color, np.uint8)


def filled_circle(img: np.ndarray, center: Tuple[int, int], radius: int,
                  color) -> np.ndarray:
    h, w = img.shape[:2]
    cx, cy = center
    y0, y1 = max(cy - radius, 0), min(cy + radius + 1, h)
    x0, x1 = max(cx - radius, 0), min(cx + radius + 1, w)
    if y0 >= y1 or x0 >= x1:
        return img
    ys = np.arange(y0, y1)[:, None] - cy
    xs = np.arange(x0, x1)[None, :] - cx
    mask = ys * ys + xs * xs <= radius * radius
    img[y0:y1, x0:x1][mask] = _color_of(img, color)
    return img


def circle_outline(img: np.ndarray, center: Tuple[int, int], radius: int,
                   color, thickness: int = 1) -> np.ndarray:
    h, w = img.shape[:2]
    cx, cy = center
    r_out, r_in = radius + thickness / 2.0, max(radius - thickness / 2.0, 0)
    y0, y1 = max(cy - radius - thickness, 0), min(cy + radius + thickness + 1, h)
    x0, x1 = max(cx - radius - thickness, 0), min(cx + radius + thickness + 1, w)
    if y0 >= y1 or x0 >= x1:
        return img
    ys = np.arange(y0, y1)[:, None] - cy
    xs = np.arange(x0, x1)[None, :] - cx
    d2 = ys * ys + xs * xs
    mask = (d2 <= r_out * r_out) & (d2 >= r_in * r_in)
    img[y0:y1, x0:x1][mask] = _color_of(img, color)
    return img


def filled_rect(img: np.ndarray, pt1: Tuple[int, int], pt2: Tuple[int, int],
                color) -> np.ndarray:
    h, w = img.shape[:2]
    x0, x1 = sorted((pt1[0], pt2[0]))
    y0, y1 = sorted((pt1[1], pt2[1]))
    x0, y0 = max(x0, 0), max(y0, 0)
    x1, y1 = min(x1 + 1, w), min(y1 + 1, h)
    if x0 < x1 and y0 < y1:
        img[y0:y1, x0:x1] = _color_of(img, color)
    return img


def rect_outline(img: np.ndarray, pt1: Tuple[int, int], pt2: Tuple[int, int],
                 color, thickness: int = 1) -> np.ndarray:
    x0, x1 = sorted((pt1[0], pt2[0]))
    y0, y1 = sorted((pt1[1], pt2[1]))
    t = thickness
    filled_rect(img, (x0 - t // 2, y0 - t // 2), (x1 + t // 2, y0 + (t - 1) // 2), color)
    filled_rect(img, (x0 - t // 2, y1 - t // 2), (x1 + t // 2, y1 + (t - 1) // 2), color)
    filled_rect(img, (x0 - t // 2, y0 - t // 2), (x0 + (t - 1) // 2, y1 + t // 2), color)
    filled_rect(img, (x1 - t // 2, y0 - t // 2), (x1 + (t - 1) // 2, y1 + t // 2), color)
    return img


def line(img: np.ndarray, pt1: Tuple[int, int], pt2: Tuple[int, int],
         color, thickness: int = 1) -> np.ndarray:
    """Bresenham polyline segment with square brush."""
    x0, y0 = pt1
    x1, y1 = pt2
    n = int(max(abs(x1 - x0), abs(y1 - y0))) + 1
    xs = np.rint(np.linspace(x0, x1, n)).astype(int)
    ys = np.rint(np.linspace(y0, y1, n)).astype(int)
    r = max(thickness // 2, 0)
    h, w = img.shape[:2]
    col = _color_of(img, color)
    for dx in range(-r, r + 1):
        for dy in range(-r, r + 1):
            xi = np.clip(xs + dx, 0, w - 1)
            yi = np.clip(ys + dy, 0, h - 1)
            img[yi, xi] = col
    return img


def polylines(img: np.ndarray, points: Sequence[Tuple[int, int]], color,
              thickness: int = 1, closed: bool = True) -> np.ndarray:
    pts = list(points)
    if closed and len(pts) > 1:
        pts = pts + [pts[0]]
    for a, b in zip(pts[:-1], pts[1:]):
        line(img, a, b, color, thickness)
    return img


# 5x7 bitmap font covering the glyphs the framework prints.
_FONT = {
    "0": "01110 10001 10011 10101 11001 10001 01110",
    "1": "00100 01100 00100 00100 00100 00100 01110",
    "2": "01110 10001 00001 00010 00100 01000 11111",
    "3": "11110 00001 00001 01110 00001 00001 11110",
    "4": "00010 00110 01010 10010 11111 00010 00010",
    "5": "11111 10000 11110 00001 00001 10001 01110",
    "6": "00110 01000 10000 11110 10001 10001 01110",
    "7": "11111 00001 00010 00100 01000 01000 01000",
    "8": "01110 10001 10001 01110 10001 10001 01110",
    "9": "01110 10001 10001 01111 00001 00010 01100",
    ".": "00000 00000 00000 00000 00000 01100 01100",
    ":": "00000 01100 01100 00000 01100 01100 00000",
    "-": "00000 00000 00000 11111 00000 00000 00000",
    " ": "00000 00000 00000 00000 00000 00000 00000",
    "A": "01110 10001 10001 11111 10001 10001 10001",
    "B": "11110 10001 10001 11110 10001 10001 11110",
    "C": "01110 10001 10000 10000 10000 10001 01110",
    "D": "11110 10001 10001 10001 10001 10001 11110",
    "E": "11111 10000 10000 11110 10000 10000 11111",
    "F": "11111 10000 10000 11110 10000 10000 10000",
    "G": "01110 10001 10000 10111 10001 10001 01111",
    "H": "10001 10001 10001 11111 10001 10001 10001",
    "I": "01110 00100 00100 00100 00100 00100 01110",
    "K": "10001 10010 10100 11000 10100 10010 10001",
    "L": "10000 10000 10000 10000 10000 10000 11111",
    "M": "10001 11011 10101 10101 10001 10001 10001",
    "N": "10001 11001 10101 10011 10001 10001 10001",
    "O": "01110 10001 10001 10001 10001 10001 01110",
    "P": "11110 10001 10001 11110 10000 10000 10000",
    "R": "11110 10001 10001 11110 10100 10010 10001",
    "S": "01111 10000 10000 01110 00001 00001 11110",
    "T": "11111 00100 00100 00100 00100 00100 00100",
    "U": "10001 10001 10001 10001 10001 10001 01110",
    "V": "10001 10001 10001 10001 10001 01010 00100",
    "W": "10001 10001 10001 10101 10101 11011 10001",
    "X": "10001 01010 00100 00100 00100 01010 10001",
    "Y": "10001 01010 00100 00100 00100 00100 00100",
    "Z": "11111 00001 00010 00100 01000 10000 11111",
}


def put_text(img: np.ndarray, text: str, org: Tuple[int, int], color,
             scale: int = 1) -> np.ndarray:
    """Draw text with the embedded bitmap font (org = bottom-left, cv2-like)."""
    x, y = org
    y_top = y - 7 * scale
    col = _color_of(img, color)
    h, w = img.shape[:2]
    for ch in text.upper():
        glyph = _FONT.get(ch)
        if glyph is None:
            x += 6 * scale
            continue
        rows = glyph.split()
        for gy, row in enumerate(rows):
            for gx, bit in enumerate(row):
                if bit == "1":
                    y0 = y_top + gy * scale
                    x0 = x + gx * scale
                    if 0 <= y0 < h - scale + 1 and 0 <= x0 < w - scale + 1:
                        img[y0:y0 + scale, x0:x0 + scale] = col
        x += 6 * scale
    return img
