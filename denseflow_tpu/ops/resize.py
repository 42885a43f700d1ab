"""Bilinear resize + the reference's resize policy.

`compute_new_size` reproduces the priority table of the reference's
`get_new_size` (reference src/denseflow_gpu.cpp:44-80): (nw,nh) both set >
nw-only keep-aspect > nh-only keep-aspect > ns short-side (only when
min(w,h) > ns — never upscale) > no resize.

`resize_bilinear` matches cv2.resize INTER_LINEAR semantics (half-pixel
centers, no antialiasing) — the interpolation the reference uses both for
ingest resize (reference src/denseflow_gpu.cpp:169) and, inside OpenCV's
CUDA TVL1, for pyramid down/up-sampling.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def compute_new_size(
    width: int,
    height: int,
    new_width: int = 0,
    new_height: int = 0,
    new_short: int = 0,
) -> Optional[Tuple[int, int]]:
    """Return (new_w, new_h) or None for "no resize"."""
    if new_width > 0 and new_height > 0:
        return new_width, new_height
    if new_width > 0 and new_height == 0:
        return new_width, int(round(height * 1.0 / width * new_width))
    if new_width == 0 and new_height > 0:
        return int(round(width * 1.0 / height * new_height)), new_height
    if new_short > 0 and min(width, height) > new_short:
        if width < height:
            return new_short, int(round(height * 1.0 / width * new_short))
        return int(round(width * 1.0 / height * new_short)), new_short
    return None


def _axis_coords(dst_n: int, src_n: int) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Source sample positions for one axis under half-pixel-center mapping.

    Returns (i0, i1, frac): integer neighbors (clipped) and the blend weight,
    replicating cv2's INTER_LINEAR coordinate rule
    src = (dst + 0.5) * scale - 0.5, with edge clamping.
    """
    scale = src_n / dst_n
    x = (jnp.arange(dst_n, dtype=jnp.float32) + 0.5) * scale - 0.5
    i0 = jnp.floor(x)
    frac = x - i0
    i0i = jnp.clip(i0.astype(jnp.int32), 0, src_n - 1)
    i1i = jnp.clip(i0i + 1, 0, src_n - 1)
    # cv2 clamps the *coordinate*: when x < 0 the weight collapses to pixel 0
    frac = jnp.where(x < 0, 0.0, frac)
    frac = jnp.where(x > src_n - 1, 1.0, frac)
    return i0i, i1i, frac


def resize_bilinear(img: jnp.ndarray, new_hw: Tuple[int, int]) -> jnp.ndarray:
    """Resize (..., H, W) float array to (..., new_h, new_w), cv2-compatible.

    Operates on the trailing two axes; any leading batch axes pass through.
    Input may be any float dtype; output is float32. For uint8 in/out use
    `resize_bilinear_u8`.
    """
    new_h, new_w = new_hw
    src_h, src_w = img.shape[-2], img.shape[-1]
    if (src_h, src_w) == (new_h, new_w):
        return img.astype(jnp.float32)
    x = img.astype(jnp.float32)
    y0, y1, fy = _axis_coords(new_h, src_h)
    x0, x1, fx = _axis_coords(new_w, src_w)
    # rows
    top = jnp.take(x, y0, axis=-2)
    bot = jnp.take(x, y1, axis=-2)
    fy = fy.reshape((-1, 1))
    rows = top * (1.0 - fy) + bot * fy
    # cols
    left = jnp.take(rows, x0, axis=-1)
    right = jnp.take(rows, x1, axis=-1)
    return left * (1.0 - fx) + right * fx


_RESIZE_MATS: dict = {}


def _resize_axis_matrix(n_out: int, n_in: int):
    """Dense (n_out, n_in) operator equal to one axis of
    `resize_bilinear` (same half-pixel-center + clamping rule)."""
    import numpy as np

    key = (n_out, n_in)
    hit = _RESIZE_MATS.get(key)
    if hit is not None:
        return hit
    R = np.zeros((n_out, n_in), np.float64)
    if n_out == n_in:
        R = np.eye(n_in)
    else:
        scale = n_in / n_out
        for o in range(n_out):
            x = (o + 0.5) * scale - 0.5
            i0 = int(np.floor(x))
            frac = x - i0
            i0c = min(max(i0, 0), n_in - 1)
            i1c = min(i0c + 1, n_in - 1)
            if x < 0:
                frac = 0.0
            if x > n_in - 1:
                frac = 1.0
            R[o, i0c] += 1.0 - frac
            R[o, i1c] += frac
    # cache the NUMPY array: a jnp constant materialized during a jit
    # trace is a tracer, and caching it across calls leaks it
    m = R.astype(np.float32)
    _RESIZE_MATS[key] = m
    return m


def resize_bilinear_mm(img: jnp.ndarray, new_hw: Tuple[int, int]) -> jnp.ndarray:
    """`resize_bilinear` as two dense per-axis matmuls (MXU path).

    Identical sampling rule; summation is reassociated (matmul
    accumulation vs two-tap lerp), so results differ from the take-based
    form only in float rounding. Used on the solvers' hot paths — TPU
    gathers serialize where a (n_out, n_in) matmul is near-free on the
    MXU (round-5 Farneback profile: the level blur+resize chains cost
    more than the fused solver kernels)."""
    new_h, new_w = new_hw
    src_h, src_w = img.shape[-2], img.shape[-1]
    if (src_h, src_w) == (new_h, new_w):
        return img.astype(jnp.float32)
    x = img.astype(jnp.float32)
    Mv = jnp.asarray(_resize_axis_matrix(new_h, src_h))
    Mh = jnp.asarray(_resize_axis_matrix(new_w, src_w))
    x = jnp.einsum("oh,...hw->...ow", Mv, x,
                   precision=jax.lax.Precision.HIGHEST)
    return jnp.einsum("qw,...ow->...oq", Mh, x,
                      precision=jax.lax.Precision.HIGHEST)


def resize_bilinear_u8(img: jnp.ndarray, new_hw: Tuple[int, int]) -> jnp.ndarray:
    """uint8 resize with round-half-away rounding (cv2-close; ±1 LSB)."""
    out = resize_bilinear(img.astype(jnp.float32), new_hw)
    return jnp.clip(jnp.round(out), 0, 255).astype(jnp.uint8)


def scale_flow_up(flow: jnp.ndarray, new_hw: Tuple[int, int], factor: float) -> jnp.ndarray:
    """Upscale a flow field between pyramid levels and rescale its magnitude.

    Mirrors OpenCV TVL1's per-level upsample: bilinear-resize each component
    to the finer grid and multiply by 1/scaleStep.
    flow: (..., 2, H, W) -> (..., 2, new_h, new_w).
    """
    # take-based (NOT resize_bilinear_mm): byte-identity across device
    # counts requires batch-shape-invariant float ordering (see
    # ops/pyramid.build_pyramid)
    up = resize_bilinear(flow, new_hw)
    return up * jnp.float32(factor)
