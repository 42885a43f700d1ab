"""Color conversion.

The reference converts decoded BGR frames to gray on the host with OpenCV
(reference src/denseflow_gpu.cpp:163). We provide the same conversion as a
JAX op so it can run on device when frames are shipped in color, using
OpenCV's fixed-point BT.601 coefficients; matches
`cv2.cvtColor(..., COLOR_BGR2GRAY)` within 1 LSB (cv2's SIMD path rounds
a hair differently on some pixels).
"""

from __future__ import annotations

import jax.numpy as jnp

# OpenCV fixed-point BT.601 luma: (R*4899 + G*9617 + B*1868 + 2^13) >> 14
_R, _G, _B, _SHIFT = 4899, 9617, 1868, 14


def bgr_to_gray(bgr: jnp.ndarray) -> jnp.ndarray:
    """uint8 (..., H, W, 3) BGR -> uint8 (..., H, W) gray, OpenCV-exact."""
    b = bgr[..., 0].astype(jnp.int32)
    g = bgr[..., 1].astype(jnp.int32)
    r = bgr[..., 2].astype(jnp.int32)
    y = (r * _R + g * _G + b * _B + (1 << (_SHIFT - 1))) >> _SHIFT
    return y.astype(jnp.uint8)
