"""Core image ops (pure JAX): resize, warping, gradients, filters,
pyramids. These are the building blocks shared by all flow solvers.
(Grayscale conversion happens host-side in the decode stage — cv2 — so
only gray uint8 crosses the wire.)"""

from denseflow_tpu.ops.resize import resize_bilinear, compute_new_size
from denseflow_tpu.ops.warp import warp_bicubic, warp_bilinear
from denseflow_tpu.ops.derivatives import (
    centered_gradient,
    forward_gradient,
    divergence,
)
from denseflow_tpu.ops.filters import gaussian_kernel_1d, sep_filter2d, box_filter
from denseflow_tpu.ops.pyramid import build_pyramid, pyramid_shapes

__all__ = [
    "resize_bilinear",
    "compute_new_size",
    "warp_bicubic",
    "warp_bilinear",
    "centered_gradient",
    "forward_gradient",
    "divergence",
    "gaussian_kernel_1d",
    "sep_filter2d",
    "box_filter",
    "build_pyramid",
    "pyramid_shapes",
]
