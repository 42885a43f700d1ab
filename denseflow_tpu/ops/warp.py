"""Backward warping of an image by a flow field.

OpenCV's CUDA TVL1 warps I1 (and its gradients) by the current flow with
bicubic texture fetches; matching that interpolation is load-bearing for the
≤0.5px EPE target. Two implementations:

* `warp_bicubic` / `warp_bilinear`: direct gather formulation (XLA gather).
  Exact, but TPU gathers run ~100x below memory bandwidth — kept as the
  CPU-path reference and correctness oracle.
* `warp_shift` (+ wrappers `warp_bicubic_shift`): the TPU-native
  formulation. The interpolation kernel K is evaluated per pixel against a
  sweep of static image shifts: out = Σ_k K(d - k) · shift(img, k) for
  integer k in [-D-1, D+2], where d is the (clamped) displacement. Pure
  VPU select/multiply/add — no gather anywhere — at the cost of clamping
  displacements to ±D (`max_disp`). Axis-sequential: vertical resample
  then horizontal, which matches the 2-D tensor-product kernel exactly
  for flow constant along rows/columns and differs only where the flow
  field varies within the kernel support (TV-regularized flow is
  piecewise-smooth, so this is boundary-localized and far inside the EPE
  budget).

All functions operate on (..., H, W) images with flow components given as
(..., H, W) u (x-displacement) and v (y-displacement) arrays, i.e. sample
src at (x + u, y + v) — same convention as the reference's solvers.
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


# ---------------------------------------------------------------------------
# TPU-native masked-shift warping (no gathers)
# ---------------------------------------------------------------------------


def _cubic_kernel(x: jnp.ndarray) -> jnp.ndarray:
    """Cubic-convolution kernel, a=-0.75, support (-2, 2). Algebraically
    identical to the 4-tap weights in `_cubic_weights`."""
    a = -0.75
    ax = jnp.abs(x)
    ax2 = ax * ax
    ax3 = ax2 * ax
    inner = (a + 2.0) * ax3 - (a + 3.0) * ax2 + 1.0
    outer = a * (ax3 - 5.0 * ax2 + 8.0 * ax - 4.0)
    return jnp.where(ax < 1.0, inner, jnp.where(ax < 2.0, outer, 0.0))


def _linear_kernel(x: jnp.ndarray) -> jnp.ndarray:
    """Triangle kernel, support (-1, 1) — bilinear interpolation."""
    return jnp.maximum(0.0, 1.0 - jnp.abs(x))


def _shift_axis(img: jnp.ndarray, k: int, axis: int) -> jnp.ndarray:
    """shift(img, k)[..., y, ...] = img[..., clamp(y+k), ...] (replicate)."""
    if k == 0:
        return img
    n = img.shape[axis]
    sl = [slice(None)] * img.ndim
    pad = [slice(None)] * img.ndim
    if k > 0:
        sl[axis] = slice(k, n)
        pad[axis] = slice(n - 1, n)
        body = img[tuple(sl)]
        edge = img[tuple(pad)]
        reps = [1] * img.ndim
        reps[axis] = k
        return jnp.concatenate([body, jnp.tile(edge, reps)], axis=axis)
    k = -k
    sl[axis] = slice(0, n - k)
    pad[axis] = slice(0, 1)
    body = img[tuple(sl)]
    edge = img[tuple(pad)]
    reps = [1] * img.ndim
    reps[axis] = k
    return jnp.concatenate([jnp.tile(edge, reps), body], axis=axis)


def _resample_axis(
    img: jnp.ndarray, disp: jnp.ndarray, axis: int, max_disp: int, kernel
) -> jnp.ndarray:
    """1-D resample along `axis` at per-pixel displacement `disp` (clamped
    to ±max_disp), as a sweep of static shifts weighted by the kernel.

    img may have extra leading axes vs disp (e.g. a stack of images warped
    by one flow field); coefficients broadcast across them.
    """
    import jax

    n = img.shape[axis]
    # position clamped to the image, displacement clamped to ±max_disp
    shape = [1] * disp.ndim
    shape[axis - (img.ndim - disp.ndim)] = n
    coords = jnp.arange(n, dtype=jnp.float32).reshape(shape)
    d = jnp.clip(disp, -float(max_disp), float(max_disp))
    pos = jnp.clip(coords + d, 0.0, n - 1.0)
    d = pos - coords

    support = 2 if kernel is _cubic_kernel else 1
    lo = -max_disp - support + 1
    hi = max_disp + support

    # replicate-pad once for the full static range, then sweep shifts as
    # dynamic slices inside a fori_loop — the body compiles once, and the
    # loop runs only over the displacement range ACTUALLY present in the
    # flow field (terms outside [min d, max d] have zero coefficients), so
    # small motion costs a handful of passes instead of 2*max_disp+4
    pad_widths = [(0, 0)] * img.ndim
    pad_widths[axis] = (-lo, hi)
    padded = jnp.pad(img.astype(jnp.float32), pad_widths, mode="edge")

    k_lo = jnp.clip(
        jnp.floor(jnp.min(d)).astype(jnp.int32) - support + 1, lo, hi
    )
    k_hi = jnp.clip(jnp.ceil(jnp.max(d)).astype(jnp.int32) + support, lo, hi)

    out_shape = jnp.broadcast_shapes(img.shape, disp.shape)
    starts_base = [0] * img.ndim
    sizes = list(img.shape)

    def body(k, out):
        starts = list(starts_base)
        starts[axis] = k - lo  # padded offset
        shifted = jax.lax.dynamic_slice(padded, starts, sizes)
        c = kernel(d - k.astype(jnp.float32))
        return out + c * shifted

    out = jnp.zeros(out_shape, jnp.float32)
    return jax.lax.fori_loop(k_lo, k_hi + 1, body, out)


def warp_shift(
    img: jnp.ndarray,
    u: jnp.ndarray,
    v: jnp.ndarray,
    max_disp: int,
    kernel: str = "cubic",
    impl: str = "auto",
) -> jnp.ndarray:
    """Warp img at (x+u, y+v) with the masked-shift method (see module doc).

    img: (..., H, W); u, v: broadcast-compatible (..., H, W) flow. Extra
    leading axes of img (image stacks sharing one flow) are supported and
    share the per-pixel coefficients.

    impl="auto" dispatches CPU backends to the gather formulation: CPU
    gathers are fast and the O(max_disp) shift sweep is not (the two agree
    within the clamp; see tests/test_ops.py::TestShiftWarp). Pass "shift"
    or "gather" to force.
    """
    import jax

    if impl == "gather" or (impl == "auto" and jax.default_backend() == "cpu"):
        gather_fn = warp_bicubic if kernel == "cubic" else warp_bilinear
        d = float(max_disp)
        uc = jnp.clip(u, -d, d)
        vc = jnp.clip(v, -d, d)
        if img.ndim > uc.ndim:
            lead = img.shape[: img.ndim - uc.ndim]
            flat = img.reshape((-1,) + img.shape[img.ndim - uc.ndim:])
            out = jnp.stack([gather_fn(flat[i], uc, vc) for i in range(flat.shape[0])])
            return out.reshape(lead + out.shape[1:])
        return gather_fn(img, uc, vc)
    kfn = _cubic_kernel if kernel == "cubic" else _linear_kernel
    ya = img.ndim - 2
    xa = img.ndim - 1
    tmp = _resample_axis(img, v, ya, max_disp, kfn)
    return _resample_axis(tmp, u, xa, max_disp, kfn)


def warp_bicubic_shift(
    img: jnp.ndarray, u: jnp.ndarray, v: jnp.ndarray, max_disp: int
) -> jnp.ndarray:
    return warp_shift(img, u, v, max_disp, "cubic")


def warp_bilinear_shift(
    img: jnp.ndarray, u: jnp.ndarray, v: jnp.ndarray, max_disp: int
) -> jnp.ndarray:
    return warp_shift(img, u, v, max_disp, "linear")
