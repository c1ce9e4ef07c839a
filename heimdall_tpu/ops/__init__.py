"""TPU-native image operators.

All operators are pure JAX functions over channel-last arrays with arbitrary
leading batch dimensions ([..., H, W] grayscale or [..., H, W, C] color),
jit/vmap/shard_map friendly, static-shaped, and numerically matched to the
OpenCV semantics the reference framework relies on (verified by golden tests
in tests/test_ops_parity.py).
"""

from heimdall_tpu.ops.color import bgr_to_gray, gray_to_bgr
from heimdall_tpu.ops.filters import (
    gaussian_blur,
    box_blur,
    gaussian_kernel_1d,
    sobel,
    canny,
)
from heimdall_tpu.ops.threshold import (
    threshold,
    threshold_auto,
    otsu_threshold,
    triangle_threshold,
    adaptive_threshold,
)
from heimdall_tpu.ops.morphology import (
    erode,
    dilate,
    morphology_ex,
    structuring_element,
)
from heimdall_tpu.ops.histogram import equalize_hist, clahe, histogram256
from heimdall_tpu.ops import ccl
from heimdall_tpu.ops.ccl import connected_components, fill_holes
from heimdall_tpu.ops.blobs import blob_stats, BlobTable
from heimdall_tpu.ops.hough import hough_lines, hough_lines_p
from heimdall_tpu.ops.demosaic import demosaic_bilinear, yuv422_to_bgr
