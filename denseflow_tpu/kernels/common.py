"""Shared in-VMEM primitives for the fused Pallas flow kernels.

Everything here operates on a single (hp, wp) float32 plane held in VMEM —
padded up from a real (h, w) image so Mosaic's `tpu.dynamic_rotate` sees
(8, 128)-aligned vector shapes — and is built by a factory closing over the
geometry. Two primitives cover all the solvers' memory-access patterns:

* `make_resample`: per-pixel-displacement 1-D resampling (the warp) as a
  sweep of whole-plane dynamic rolls over the displacement range actually
  present, replicate-clamped at the REAL image border (the padded band is
  masked off). Shared by TVL1 (cubic), Brox (cubic) and Farneback (linear).
* `make_shift` / `make_conv_taps`: static-offset neighbor views and tap
  stencils with replicate borders at the real extent — the 4-neighbor
  Laplacians, derivative stencils and small separable filters.

The interpolation/stencil math matches ops/warp.py and ops/filters.py
(the XLA oracle path) so fused and unfused solvers agree within float
reassociation error; see tests/test_tiling.py and tests/test_brox_fused.py.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

_SUPPORT_CUBIC = 2
_SUPPORT_LINEAR = 1


def cubic_kernel(x: jnp.ndarray) -> jnp.ndarray:
    """Cubic-convolution kernel, a=-0.75 (OpenCV INTER_CUBIC), support (-2,2)."""
    a = -0.75
    ax = jnp.abs(x)
    ax2 = ax * ax
    ax3 = ax2 * ax
    inner = (a + 2.0) * ax3 - (a + 3.0) * ax2 + 1.0
    outer = a * (ax3 - 5.0 * ax2 + 8.0 * ax - 4.0)
    return jnp.where(ax < 1.0, inner, jnp.where(ax < 2.0, outer, 0.0))


def linear_kernel(x: jnp.ndarray) -> jnp.ndarray:
    """Triangle kernel, support (-1, 1) — bilinear interpolation."""
    return jnp.maximum(0.0, 1.0 - jnp.abs(x))


def make_plane_ops(h: int, w: int, hp: int, wp: int, interpret: bool):
    """Build the plane-op toolkit for real extent (h, w) padded to (hp, wp).

    Returns an object with:
      .row_i() / .col_i()       int32 index planes
      .real()                   bool plane: inside the real image
      .shift(p, k, axis)        static shift, replicate-clamped at (h, w)
      .conv_taps(p, taps, axis) tap stencil sum_k c_k * shift(p, k)
      .resample(planes, disp, axis, max_disp, kernel) warp sweep
    """
    roll = jnp.roll if interpret else pltpu.roll
    shape = (hp, wp)

    def row_i():
        return jax.lax.broadcasted_iota(jnp.int32, shape, 0)

    def col_i():
        return jax.lax.broadcasted_iota(jnp.int32, shape, 1)

    def real():
        # built lazily INSIDE the kernel body (a concrete array here would
        # be a captured constant, which pallas_call rejects)
        return jnp.logical_and(row_i() < h, col_i() < w)

    def _edges(p, axis):
        if axis == 0:
            lo = jnp.broadcast_to(p[:1, :], shape)
            hi = jnp.broadcast_to(p[h - 1 : h, :], shape)
        else:
            lo = jnp.broadcast_to(p[:, :1], shape)
            hi = jnp.broadcast_to(p[:, w - 1 : w], shape)
        return lo, hi

    def shift(p, k: int, axis: int):
        """shift(p, k)[y] = p[clamp(y+k, 0, n-1)] with n the REAL extent.

        Kept as the two-select nested-where form on purpose (round 5): a
        sign-specialized single select measured NO gain on chip (the
        second select fuses into the roll for free) and its different
        fusion shape made interpret-mode results batch-size-dependent,
        breaking the slab byte-identity contract."""
        if k == 0:
            return p
        n = h if axis == 0 else w
        lo, hi = _edges(p, axis)
        t = (row_i() if axis == 0 else col_i()) + k
        # pltpu.roll rejects static negative shifts; roll is circular over
        # the PADDED extent, so normalize mod the padded size
        np_ax = hp if axis == 0 else wp
        s = roll(p, (-k) % np_ax, axis)
        return jnp.where(t < 0, lo, jnp.where(t > n - 1, hi, s))

    def conv_taps(p, taps: Sequence[float], axis: int, center: int):
        """sum_k taps[k] * shift(p, k - center), skipping zero taps.

        Unrolled — use only for SHORT stencils: Mosaic's stack allocator
        can hold every tap's plane live at once, so a long unrolled
        stencil costs taps x plane of scoped VMEM (use box_sum for wide
        constant-coefficient windows)."""
        out = None
        for i, c in enumerate(taps):
            if c == 0.0:
                continue
            term = jnp.float32(c) * shift(p, i - center, axis)
            out = term if out is None else out + term
        return out

    def box_sum(p, win: int, axis: int, zero_pad: bool = False):
        """sum of shift(p, k, axis) for k in [-(win//2), win//2], replicate
        borders at the real extent — as a fori_loop with a TRACED shift so
        only one tap plane is ever live (vs `conv_taps`' win planes).

        zero_pad=True allows a padded band of >= win//2 along the summed
        axis to be ZEROED and used as scratch: the sum switches to
        cascaded-doubling circular partial sums — ceil(log2(win))+~2
        static rolls instead of `win` traced rolls+selects (the round-4
        Farneback bottleneck: the 13-tap loop cost 2x13 rolls and 2x26
        selects per plane per iteration). The band is masked to 0 here (p
        itself may hold garbage there, e.g. resample's replicated edges),
        circular wraps then land in the zeroed band by the pad
        precondition, so the cascade equals the zero-padded window sum;
        replicate-border semantics are restored by adding
        count-of-clamped-taps * edge-value ramps (exact in exact
        arithmetic; float association differs from the loop form by design
        — callers compare against the XLA oracle, not bytes)."""
        n = h if axis == 0 else w
        np_ax = hp if axis == 0 else wp
        lo, hi = _edges(p, axis)
        t0 = row_i() if axis == 0 else col_i()
        ctr = win // 2

        if zero_pad and np_ax - n >= ctr and win >= 4:
            # circular windowed sum S[y] = sum_{j=0..win-1} p[(y+j) % np]
            # by doubling, then recenter by ctr
            sums = {1: jnp.where(t0 < n, p, 0.0)}
            m = 1
            while m * 2 <= win:
                prev = sums[m]
                sums[m * 2] = prev + roll(prev, (-m) % np_ax, axis)
                m *= 2
            total = None
            off = 0
            rem = win
            while rem:
                if rem >= m:
                    part = sums[m]
                    if off:
                        part = roll(part, (-off) % np_ax, axis)
                    total = part if total is None else total + part
                    off += m
                    rem -= m
                m //= 2
            s = roll(total, ctr % np_ax, axis)  # out[y] = S[y - ctr]
            cnt_lo = jnp.maximum(0, ctr - t0).astype(jnp.float32)
            cnt_hi = jnp.maximum(0, t0 + ctr - (n - 1)).astype(jnp.float32)
            return s + cnt_lo * lo + cnt_hi * hi

        def body(j, acc):
            k = j - ctr
            t = t0 + k
            s = roll(p, (-k) % np_ax, axis)
            return acc + jnp.where(t < 0, lo, jnp.where(t > n - 1, hi, s))

        return jax.lax.fori_loop(0, win, body, jnp.zeros(shape, jnp.float32))

    def resample(planes, disp, axis: int, max_disp: float, kernel: str):
        """1-D resample of each plane in `planes` along `axis` at per-pixel
        displacement `disp` (shared coefficient sweep), clamped to
        ±max_disp and into the real extent (replicate borders) — matches
        ops/warp._resample_axis. Returns a tuple like `planes`."""
        kfn = cubic_kernel if kernel == "cubic" else linear_kernel
        support = _SUPPORT_CUBIC if kernel == "cubic" else _SUPPORT_LINEAR
        n = h if axis == 0 else w
        coords = (row_i() if axis == 0 else col_i()).astype(jnp.float32)
        in_real = coords < float(n)
        d = jnp.clip(disp, -max_disp, max_disp)
        pos = jnp.clip(coords + d, 0.0, float(n - 1))
        # padded pixels would clamp far back into the image and blow the
        # sweep range open — pin their displacement to 0
        d = jnp.where(in_real, pos - coords, 0.0)

        k_lo = jnp.floor(jnp.min(d)).astype(jnp.int32) - support + 1
        k_hi = jnp.ceil(jnp.max(d)).astype(jnp.int32) + support

        def body(k, outs):
            kf = k.astype(jnp.float32)
            c = kfn(d - kf)
            # tap index t = coord + k; roll wraps, so patch the
            # out-of-image bands with the replicated edge values.
            # Edge broadcasts are built INSIDE the body: hoisted out of
            # the sweep they become loop-invariant full planes that Mosaic
            # keeps live for the whole loop (2 planes per resampled input
            # — enough to blow the 16 MB scoped-VMEM limit on the larger
            # kernels); in here they fuse into the selects.
            t = coords + kf
            lo_band = t < 0.0
            hi_band = t > float(n - 1)
            # (-k) % extent, NEVER a possibly-negative traced shift:
            # pltpu.roll MISCOMPILES negative traced shifts on planes
            # spanning more than one tile along the axis (hardware-
            # verified round 4: all negative shifts wrong at 96 sublanes /
            # 384 lanes, correct at 16/128; invisible at zero displacement
            # because the wrong taps get zero kernel weight)
            np_ax = hp if axis == 0 else wp
            new = []
            for p, o in zip(planes, outs):
                e_lo, e_hi = _edges(p, axis)
                s = roll(p, (-k) % np_ax, axis)
                tapped = jnp.where(lo_band, e_lo, jnp.where(hi_band, e_hi, s))
                new.append(o + c * tapped)
            return tuple(new)

        z = tuple(jnp.zeros(shape, jnp.float32) for _ in planes)
        return jax.lax.fori_loop(k_lo, k_hi + 1, body, z)

    from types import SimpleNamespace

    return SimpleNamespace(
        row_i=row_i,
        col_i=col_i,
        real=real,
        shift=shift,
        conv_taps=conv_taps,
        box_sum=box_sum,
        resample=resample,
    )
