"""Separable filters (Gaussian / box) on the trailing (H, W) axes.

Used by Farneback (Gaussian-weighted polynomial expansion + windowed
aggregation) and the pyramid builders. Implemented as two 1-D convolutions
with BORDER_REFLECT_101 padding (OpenCV's default border), expressed as
padded matmul-free convs that XLA fuses well on TPU.
"""

from __future__ import annotations

import math

import jax.numpy as jnp
import numpy as np


def gaussian_kernel_1d(ksize: int, sigma: float) -> np.ndarray:
    """OpenCV-compatible normalized 1-D Gaussian (cv2.getGaussianKernel)."""
    if sigma <= 0:
        sigma = 0.3 * ((ksize - 1) * 0.5 - 1) + 0.8
    half = (ksize - 1) / 2.0
    xs = np.arange(ksize, dtype=np.float64) - half
    k = np.exp(-(xs * xs) / (2.0 * sigma * sigma))
    return (k / k.sum()).astype(np.float32)


def _pad1d(x: jnp.ndarray, pad: int, axis: int, border: str) -> jnp.ndarray:
    """Pad one axis with an OpenCV border mode: 'reflect101'
    (gfedcb|abcdefgh|gfedcb) or 'replicate' (aaaaaa|abcdefgh|hhhhhh)."""
    if pad == 0:
        return x
    n = x.shape[axis]
    if border == "reflect101":
        idx_lo = np.arange(pad, 0, -1) % n
        idx_hi = (n - 2 - np.arange(pad)) % n
    elif border == "replicate":
        idx_lo = np.zeros(pad, dtype=np.int64)
        idx_hi = np.full(pad, n - 1, dtype=np.int64)
    else:
        raise ValueError(border)
    lo = jnp.take(x, jnp.asarray(idx_lo), axis=axis)
    hi = jnp.take(x, jnp.asarray(idx_hi), axis=axis)
    return jnp.concatenate([lo, x, hi], axis=axis)


def conv1d(
    x: jnp.ndarray, kernel: np.ndarray, axis: int, border: str = "reflect101"
) -> jnp.ndarray:
    """Correlate x with a short 1-D kernel along `axis`.

    Unrolled as shifted adds — for the short kernels used here (<= ~32 taps)
    XLA fuses this into a handful of VPU ops, no gather/conv lowering needed.
    """
    k = np.asarray(kernel, dtype=np.float32)
    pad = (len(k) - 1) // 2
    xp = _pad1d(x.astype(jnp.float32), pad, axis, border)
    n = x.shape[axis]
    out = None
    for i, ki in enumerate(k):
        sl = [slice(None)] * x.ndim
        sl[axis] = slice(i, i + n)
        term = xp[tuple(sl)] * jnp.float32(ki)
        out = term if out is None else out + term
    return out


def sep_filter2d(
    x: jnp.ndarray, kx: np.ndarray, ky: np.ndarray, border: str = "reflect101"
) -> jnp.ndarray:
    """Separable 2-D correlation on the trailing (H, W) axes."""
    out = conv1d(x, ky, axis=x.ndim - 2, border=border)
    return conv1d(out, kx, axis=x.ndim - 1, border=border)


def gaussian_blur(x: jnp.ndarray, ksize: int, sigma: float) -> jnp.ndarray:
    k = gaussian_kernel_1d(ksize, sigma)
    return sep_filter2d(x, k, k)


def box_filter(x: jnp.ndarray, ksize: int, border: str = "replicate") -> jnp.ndarray:
    """Normalized box filter (mean over a ksize x ksize window)."""
    k = np.full((ksize,), 1.0 / ksize, dtype=np.float32)
    return sep_filter2d(x, k, k, border=border)
