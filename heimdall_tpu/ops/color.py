"""Color conversions with OpenCV numeric parity.

The reference framework converts BGR frames to grayscale at the top of every
pipeline (reference: heimdall/core/pipeline.py:214-217 GrayscaleStage,
heimdall/detectors/contamination_detector.py:59-62).  OpenCV's uint8
BGR→GRAY path is fixed-point: Y = (B*b + G*g + R*r + 2^(S-1)) >> S with
BT.601 weights.  cv2 5.x uses S=15 (b=3735, g=19235, r=9798); this was
verified bit-exact against cv2.cvtColor in tests/test_ops_parity.py.
"""

import jax.numpy as jnp

# BT.601 luma weights in Q15 fixed point — matches cv2 5.x exactly.
_B_Q15 = 3735   # round(0.114  * 2**15)
_G_Q15 = 19235  # round(0.587  * 2**15)
_R_Q15 = 9798   # round(0.299  * 2**15)
_SHIFT = 15


def bgr_to_gray(image: jnp.ndarray) -> jnp.ndarray:
    """BGR uint8 [..., H, W, 3] → grayscale uint8 [..., H, W].

    Bit-exact with cv2.cvtColor(img, cv2.COLOR_BGR2GRAY) on uint8 input.
    Float inputs use the float BT.601 weights instead.
    """
    if image.ndim >= 3 and image.shape[-1] == 3:
        if image.dtype == jnp.uint8:
            b = image[..., 0].astype(jnp.int32)
            g = image[..., 1].astype(jnp.int32)
            r = image[..., 2].astype(jnp.int32)
            y = (b * _B_Q15 + g * _G_Q15 + r * _R_Q15 + (1 << (_SHIFT - 1))) >> _SHIFT
            return y.astype(jnp.uint8)
        b, g, r = image[..., 0], image[..., 1], image[..., 2]
        return 0.114 * b + 0.587 * g + 0.299 * r
    return image


def gray_to_bgr(image: jnp.ndarray) -> jnp.ndarray:
    """Grayscale [..., H, W] → BGR [..., H, W, 3] by channel replication."""
    if image.ndim >= 3 and image.shape[-1] == 3:
        return image
    return jnp.stack([image, image, image], axis=-1)
