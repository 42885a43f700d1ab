"""Flow -> uint8 quantization, on device.

Re-implements the reference's two quantization schemes with bit-exact
formulas, but batched and jit-compiled so the (large float32) flow fields are
shrunk to uint8 *before* the device->host transfer — the reference instead
downloads raw float flow and quantizes in a scalar CPU double-loop
(reference src/common.cpp:4-16, src/denseflow_gpu.cpp:339).

* `quantize_flow_pair`: the jpg-path CAST formula
  (reference src/common.cpp:6): v>H -> 255, v<L -> 0, else
  round(255*(v-L)/(H-L)) with L=-bound, H=+bound (banker's rounding, like
  cvRound).
* `quantize_flow_png`: the adaptive-bound 3-channel png scheme
  (reference src/common.cpp:18-46): per-frame dynamic bounds snapped to a
  4-multiple (never an 8-multiple), x/y stored as v*128/bound + 128, and
  bound/4 encoded into channel 2 (top half = bound_x, bottom half = bound_y).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def quantize_cast(v: jnp.ndarray, lower: float, upper: float) -> jnp.ndarray:
    """The CAST macro, vectorized. Returns uint8."""
    scaled = jnp.round(255.0 * (v - lower) / (upper - lower))
    out = jnp.where(v > upper, 255.0, jnp.where(v < lower, 0.0, scaled))
    return out.astype(jnp.uint8)


def quantize_flow_pair(flow: jnp.ndarray, bound: float) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(..., H, W, 2) float flow -> (img_x, img_y) uint8 (..., H, W)."""
    return (
        quantize_cast(flow[..., 0], -bound, bound),
        quantize_cast(flow[..., 1], -bound, bound),
    )


def _adaptive_bound(comp: jnp.ndarray, axis_len: int) -> jnp.ndarray:
    """Per-frame png bound for one flow component (reference src/common.cpp:24-32).

    comp: (..., H, W) one component. axis_len: w for x, h for y.
    bound = min(1020, ceil(min(axis_len, max|comp|) * 128/127 / 4) * 4),
    then += 4 if divisible by 8. Returns float (..,) per-frame bound.
    """
    mag = jnp.maximum(
        jnp.abs(jnp.min(comp, axis=(-2, -1))), jnp.abs(jnp.max(comp, axis=(-2, -1)))
    )
    b = jnp.minimum(255.0 * 4.0, jnp.ceil((jnp.minimum(float(axis_len), mag) * 128.0 / 127.0) / 4.0) * 4.0)
    b = jnp.where(jnp.mod(b.astype(jnp.int32), 8) == 0, b + 4.0, b)
    return b


def quantize_flow_png(flow: jnp.ndarray) -> jnp.ndarray:
    """(..., H, W, 2) float flow -> (..., H, W, 3) uint8 BGR png payload.

    Channel 0: quantized x, channel 1: quantized y, channel 2: bounds/4
    (rows [0, h//2] = bound_x/4, rows [h//2+1, h) = bound_y/4 — the
    reference's two filled rectangles, reference src/common.cpp:40-42).
    """
    h, w = flow.shape[-3], flow.shape[-2]
    fx = flow[..., 0]
    fy = flow[..., 1]
    bound_x = _adaptive_bound(fx, w)[..., None, None]
    bound_y = _adaptive_bound(fy, h)[..., None, None]
    # cv2 convertTo: saturate_cast<uchar>(round(v * alpha + beta))
    qx = jnp.clip(jnp.round(fx * (128.0 / bound_x) + 128.0), 0, 255)
    qy = jnp.clip(jnp.round(fy * (128.0 / bound_y) + 128.0), 0, 255)
    row = jnp.arange(h).reshape(h, 1)
    half_h = h // 2
    bchan = jnp.where(
        row <= half_h,
        jnp.round(bound_x / 4.0),
        jnp.round(bound_y / 4.0),
    )
    bchan = jnp.broadcast_to(bchan, qx.shape)
    return jnp.stack([qx, qy, bchan], axis=-1).astype(jnp.uint8)


def dequantize_flow_png(img: jnp.ndarray) -> jnp.ndarray:
    """Inverse of the png scheme (for tests / consumers): uint8 (..,H,W,3)
    -> float flow (..,H,W,2)."""
    h = img.shape[-3]
    bx = img[..., 0:1, 0:1, 2].astype(jnp.float32) * 4.0
    by = img[..., h - 1:h, 0:1, 2].astype(jnp.float32) * 4.0
    fx = (img[..., 0].astype(jnp.float32) - 128.0) * (bx / 128.0)
    fy = (img[..., 1].astype(jnp.float32) - 128.0) * (by / 128.0)
    return jnp.stack([fx, fy], axis=-1)
