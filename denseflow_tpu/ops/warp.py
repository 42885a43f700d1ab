"""Backward warping of an image by a flow field.

OpenCV's CUDA TVL1 warps I1 (and its gradients) by the current flow with
bicubic texture fetches; matching that interpolation is load-bearing for the
≤0.5px EPE target. We implement cubic-convolution interpolation with
OpenCV's coefficient a = -0.75 and clamp-to-edge borders, plus a cheaper
bilinear variant used by the fast preset.

All functions operate on (..., H, W) images with flow components given as
separate (..., H, W) u (x-displacement) and v (y-displacement) arrays, i.e.
sample src at (x + u, y + v) — same convention as the reference's solvers.
"""

from __future__ import annotations

import jax.numpy as jnp


def _cubic_weights(t: jnp.ndarray):
    """Cubic convolution weights for fractional offset t in [0,1), a=-0.75.

    Returns weights for taps at offsets (-1, 0, +1, +2).
    w(x) = (a+2)|x|^3 - (a+3)|x|^2 + 1            for |x| <= 1
    w(x) = a|x|^3 - 5a|x|^2 + 8a|x| - 4a          for 1 < |x| < 2
    """
    a = -0.75
    t2 = t * t
    t3 = t2 * t
    w0 = a * (t3 - 2.0 * t2 + t)                        # |x| = 1 + t
    w1 = (a + 2.0) * t3 - (a + 3.0) * t2 + 1.0          # |x| = t
    w2 = -(a + 2.0) * t3 + (2.0 * a + 3.0) * t2 - a * t  # |x| = 1 - t
    w3 = a * (t2 - t3)                                  # |x| = 2 - t
    return w0, w1, w2, w3


def _gather2d(img: jnp.ndarray, yi: jnp.ndarray, xi: jnp.ndarray) -> jnp.ndarray:
    """img (..., H, W), yi/xi int32 (..., H, W) clipped -> gathered values."""
    h, w = img.shape[-2], img.shape[-1]
    flat = img.reshape(img.shape[:-2] + (h * w,))
    idx = yi * w + xi
    return jnp.take_along_axis(flat, idx.reshape(idx.shape[:-2] + (h * w,)), axis=-1).reshape(img.shape)


def warp_bilinear(img: jnp.ndarray, u: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Sample img at (x+u, y+v) with bilinear interpolation, clamped edges."""
    h, w = img.shape[-2], img.shape[-1]
    ys = jnp.arange(h, dtype=jnp.float32).reshape(h, 1)
    xs = jnp.arange(w, dtype=jnp.float32).reshape(1, w)
    fx = jnp.clip(xs + u, 0.0, w - 1.0)
    fy = jnp.clip(ys + v, 0.0, h - 1.0)
    x0 = jnp.floor(fx)
    y0 = jnp.floor(fy)
    tx = fx - x0
    ty = fy - y0
    x0i = jnp.clip(x0.astype(jnp.int32), 0, w - 1)
    y0i = jnp.clip(y0.astype(jnp.int32), 0, h - 1)
    x1i = jnp.clip(x0i + 1, 0, w - 1)
    y1i = jnp.clip(y0i + 1, 0, h - 1)
    v00 = _gather2d(img, y0i, x0i)
    v01 = _gather2d(img, y0i, x1i)
    v10 = _gather2d(img, y1i, x0i)
    v11 = _gather2d(img, y1i, x1i)
    top = v00 * (1 - tx) + v01 * tx
    bot = v10 * (1 - tx) + v11 * tx
    return top * (1 - ty) + bot * ty


def warp_bicubic(img: jnp.ndarray, u: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Sample img at (x+u, y+v) with cubic convolution (a=-0.75), clamped.

    Separable 4x4 tap stencil: 4 row-gathers x 4 col-weights.
    """
    h, w = img.shape[-2], img.shape[-1]
    ys = jnp.arange(h, dtype=jnp.float32).reshape(h, 1)
    xs = jnp.arange(w, dtype=jnp.float32).reshape(1, w)
    fx = jnp.clip(xs + u, 0.0, w - 1.0)
    fy = jnp.clip(ys + v, 0.0, h - 1.0)
    x0 = jnp.floor(fx)
    y0 = jnp.floor(fy)
    tx = fx - x0
    ty = fy - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)
    wx = _cubic_weights(tx)
    wy = _cubic_weights(ty)
    acc = jnp.zeros_like(fx)
    for dy in range(-1, 3):
        yi = jnp.clip(y0i + dy, 0, h - 1)
        row = jnp.zeros_like(fx)
        for dx in range(-1, 3):
            xi = jnp.clip(x0i + dx, 0, w - 1)
            row = row + wx[dx + 1] * _gather2d(img, yi, xi)
        acc = acc + wy[dy + 1] * row
    return acc
