"""Batched Farneback optical flow (polynomial expansion), TPU-native.

Matches OpenCV's `calcOpticalFlowFarneback` / `cuda::FarnebackOpticalFlow`
as created by the reference (reference src/denseflow_gpu.cpp:301,329) with
defaults (SURVEY.md §2.2 N2): numLevels=5, pyrScale=0.5, winSize=13,
numIters=10, polyN=5, polySigma=1.1, flags=0 (box aggregation).

Per level (coarse→fine): the level image is the *full-resolution* input,
Gaussian-smoothed with sigma=(1/scale-1)/2 and bilinearly resized to the
level size. Each pixel's neighborhood is fit with a quadratic polynomial
f(x) ≈ c + bᵀx + xᵀAx under Gaussian weights (separable least squares);
displacement follows from the normal equations G d = h built from averaged
A and the b difference, aggregated over a winSize box.

TPU-first: the polynomial expansion is six separable 1-D convolutions (VPU
shifted-adds), the normal-equation solve is elementwise, and everything is
batched over B frame pairs in a single jit region — no per-pair dispatch.
The only gather is the bilinear resampling of the 5 coefficient planes at
the displaced positions, once per iteration.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from denseflow_tpu.ops.filters import conv1d, gaussian_kernel_1d, sep_filter2d
from denseflow_tpu.ops.resize import resize_bilinear


@dataclasses.dataclass(frozen=True)
class FarnebackParams:
    num_levels: int = 5
    pyr_scale: float = 0.5
    win_size: int = 13
    num_iters: int = 10
    poly_n: int = 5
    poly_sigma: float = 1.1
    min_size: int = 8  # stop adding levels below this side length
    # Convergence stop for the per-level displacement iterations: exit
    # when an iteration's RMS per-pixel flow update fell below stop_eps px
    # (OpenCV runs the fixed numIters budget; trailing iterations on
    # converged content are no-ops within this ball). 0 disables.
    stop_eps: float = 1e-3
    # displacement clamp for the gather-free masked-shift resampling of the
    # coefficient planes (see ops/warp.py); scaled per pyramid level
    max_disp: int = 40
    # Kernel selection for the per-level iteration loop:
    #   "fused" — Pallas kernel (kernels/farneback_fused.py): warp +
    #             normal-eq + box blur + solve VMEM-resident per pair (the
    #             XLA path streams ~15 HBM plane passes per iteration)
    #   "off"   — pure XLA; the CPU / oracle path
    #   "auto"  — "fused" on TPU (spatially tiled beyond VMEM), "off" on CPU
    use_pallas: str = "auto"


def _poly_exp_setup(n: int, sigma: float):
    """Precompute the Gaussian window and the inverse normal matrix for the
    quadratic fit over basis (1, x, y, x², y², xy)."""
    xs = np.arange(-n, n + 1, dtype=np.float64)
    g = np.exp(-(xs * xs) / (2.0 * sigma * sigma))
    g /= g.sum()
    # separable projection kernels
    xg = xs * g
    xxg = xs * xs * g
    # normal matrix G = sum w(x,y) * basis basis^T, separable moments
    m0 = g.sum()  # = 1
    m2 = (xs * xs * g).sum()
    m4 = (xs ** 4 * g).sum()
    G = np.zeros((6, 6))
    G[0, 0] = m0 * m0
    G[1, 1] = m2 * m0
    G[2, 2] = m0 * m2
    G[3, 3] = m4 * m0
    G[4, 4] = m0 * m4
    G[5, 5] = m2 * m2
    G[0, 3] = G[3, 0] = m2 * m0
    G[0, 4] = G[4, 0] = m0 * m2
    G[3, 4] = G[4, 3] = m2 * m2
    invG = np.linalg.inv(G)
    return (
        g.astype(np.float32),
        xg.astype(np.float32),
        xxg.astype(np.float32),
        invG.astype(np.float32),
    )


def poly_expand(img: jnp.ndarray, n: int, sigma: float) -> jnp.ndarray:
    """(..., H, W) float -> (..., H, W, 5) coefficients (bx, by, cxx, cyy, cxy).

    cxy is the coefficient of the monomial x·y (i.e. 2·A[0,1]).
    """
    g, xg, xxg, invG = _poly_exp_setup(n, sigma)
    ya, xa = img.ndim - 2, img.ndim - 1
    b = "replicate"
    # vertical pass then horizontal pass for all six projections
    vg = conv1d(img, g, ya, b)
    vxg = conv1d(img, xg, ya, b)
    vxxg = conv1d(img, xxg, ya, b)
    S1 = conv1d(vg, g, xa, b)
    Sx = conv1d(vg, xg, xa, b)
    Sy = conv1d(vxg, g, xa, b)
    Sxx = conv1d(vg, xxg, xa, b)
    Syy = conv1d(vxxg, g, xa, b)
    Sxy = conv1d(vxg, xg, xa, b)
    S = jnp.stack([S1, Sx, Sy, Sxx, Syy, Sxy], axis=-1)
    coef = jnp.einsum("...k,jk->...j", S, jnp.asarray(invG))
    # keep (bx, by, cxx, cyy, cxy); drop the constant term
    return coef[..., 1:6]


# Border attenuation used by OpenCV near image edges (5-pixel band).
_BORDER = np.array([0.14, 0.14, 0.4472, 0.4472, 0.4472], dtype=np.float32)


def _border_scale(h: int, w: int) -> jnp.ndarray:
    def axis_scale(n: int) -> np.ndarray:
        s = np.ones(n, dtype=np.float32)
        k = min(len(_BORDER), n)
        s[:k] *= _BORDER[:k]
        s[n - k:] *= _BORDER[:k][::-1]
        return s
    return jnp.asarray(np.outer(axis_scale(h), axis_scale(w)))


def _sample_bilinear_planes(
    R: jnp.ndarray, dx: jnp.ndarray, dy: jnp.ndarray, max_disp: int
) -> jnp.ndarray:
    """Bilinearly resample coefficient planes R (..., H, W, C) at the
    displaced positions (x+dx, y+dy), via the gather-free masked-shift
    resampler (one coefficient sweep shared by the C-plane stack)."""
    from denseflow_tpu.ops.warp import warp_shift

    planes = jnp.moveaxis(R, -1, 0)  # (C, ..., H, W)
    out = warp_shift(planes, dx, dy, max_disp, kernel="linear")
    return jnp.moveaxis(out, 0, -1)


def update_matrices(
    R0: jnp.ndarray,
    R1: jnp.ndarray,
    flow: jnp.ndarray,
    bscale: jnp.ndarray,
    max_disp: int,
) -> jnp.ndarray:
    """Build the 5 normal-equation planes M = (G11, G12, G22, h1, h2)."""
    dx = flow[..., 0]
    dy = flow[..., 1]
    R1s = _sample_bilinear_planes(R1, dx, dy, max_disp)

    a11 = (R0[..., 2] + R1s[..., 2]) * 0.5
    a22 = (R0[..., 3] + R1s[..., 3]) * 0.5
    a12 = (R0[..., 4] + R1s[..., 4]) * 0.25  # stored cxy = 2*A01, halved twice
    db1 = (R0[..., 0] - R1s[..., 0]) * 0.5
    db2 = (R0[..., 1] - R1s[..., 1]) * 0.5
    # absolute displacement: h += A d_prior
    b1 = db1 + a11 * dx + a12 * dy
    b2 = db2 + a12 * dx + a22 * dy

    a11 = a11 * bscale
    a22 = a22 * bscale
    a12 = a12 * bscale
    b1 = b1 * bscale
    b2 = b2 * bscale

    g11 = a11 * a11 + a12 * a12
    g12 = (a11 + a22) * a12
    g22 = a22 * a22 + a12 * a12
    h1 = a11 * b1 + a12 * b2
    h2 = a12 * b1 + a22 * b2
    return jnp.stack([g11, g12, g22, h1, h2], axis=-1)


def solve_flow(M_blur: jnp.ndarray) -> jnp.ndarray:
    g11 = M_blur[..., 0]
    g12 = M_blur[..., 1]
    g22 = M_blur[..., 2]
    h1 = M_blur[..., 3]
    h2 = M_blur[..., 4]
    idet = 1.0 / (g11 * g22 - g12 * g12 + 1e-3)
    fx = (g22 * h1 - g12 * h2) * idet
    fy = (g11 * h2 - g12 * h1) * idet
    return jnp.stack([fx, fy], axis=-1)


def _box_blur_planes(M: jnp.ndarray, win: int) -> jnp.ndarray:
    k = np.full((win,), 1.0 / win, dtype=np.float32)
    ya, xa = M.ndim - 3, M.ndim - 2
    out = conv1d(M, k, ya, "replicate")
    return conv1d(out, k, xa, "replicate")


def _level_geometry(h: int, w: int, p: FarnebackParams):
    """Static per-level (scale, h, w, smooth_ksize, smooth_sigma), coarse
    level last — mirrors OpenCV's level-count clamp."""
    levels = 0
    scale = 1.0
    for k in range(p.num_levels):
        scale *= p.pyr_scale
        if w * scale < p.min_size or h * scale < p.min_size:
            break
        levels = k + 1
    out = []
    for k in range(levels, -1, -1):
        s = p.pyr_scale ** k
        sigma = (1.0 / s - 1.0) * 0.5
        ksize = max(int(round(sigma * 5)) | 1, 3)
        out.append((s, int(round(h * s)), int(round(w * s)), ksize, sigma))
    return out  # coarse first


_LEVEL_MATS: dict = {}


def _level_matrices(src_h: int, src_w: int, lh: int, lw: int,
                    ksize: int, sigma: float):
    """Dense (lh, src_h) / (lw, src_w) operators for one pyramid level's
    `gaussian blur (reflect101) + bilinear resize` — built once per
    geometry on the host and applied as two MXU matmuls.

    The XLA shifted-add blur was the dominant remaining Farneback cost
    after the level loop and poly expansion were fused (round-5 profile:
    the coarse levels blur the FULL-RES image with 39- and 77-tap
    kernels, ~16 ms of a 66 ms solve at pair_batch 128). Blur and resize
    are both linear and separable, so each axis collapses to one small
    dense matrix — work the MXU does in ~0.1 ms. Exact up to float
    reassociation (gated by the cv2-oracle fidelity tests). CAVEAT: XLA
    tiles matmuls by batch shape, so multi-DEVICE Farneback runs (which
    solve B/N-pair slabs) agree with single-device runs within the
    solver's epsilon ball rather than byte-for-byte — the same contract
    as the h5 float path (test_sharding's h5 note); TVL1/Brox keep exact
    byte identity (their pyramid deliberately stays take-based,
    ops/pyramid.build_pyramid)."""
    key = (src_h, src_w, lh, lw, ksize, round(float(sigma), 6))
    hit = _LEVEL_MATS.get(key)
    if hit is not None:
        return hit
    g = gaussian_kernel_1d(ksize, sigma).astype(np.float64)
    c = (ksize - 1) // 2

    def blur_mat(n):
        Bm = np.zeros((n, n), np.float64)
        for j, kv in enumerate(g):
            off = j - c
            for r in range(n):
                t = r + off
                while not 0 <= t <= n - 1:  # reflect101 fold
                    t = -t if t < 0 else 2 * (n - 1) - t
                Bm[r, t] += kv
        return Bm

    def resize_mat(n_out, n_in):
        if n_out == n_in:
            return np.eye(n_in)
        R = np.zeros((n_out, n_in), np.float64)
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
        return R

    # cache NUMPY arrays: jnp constants made during a jit trace are
    # tracers, and caching those across calls leaks them
    Mv = (resize_mat(lh, src_h) @ blur_mat(src_h)).astype(np.float32)
    Mh = (resize_mat(lw, src_w) @ blur_mat(src_w)).astype(np.float32)
    _LEVEL_MATS[key] = (Mv, Mh)
    return Mv, Mh


def _level_image_matmul(I, lh, lw, ksize, sigma):
    """blur+resize of (B, H, W) via the dense per-axis operators (MXU)."""
    Mv, Mh = _level_matrices(I.shape[-2], I.shape[-1], lh, lw, ksize, sigma)
    Mv, Mh = jnp.asarray(Mv), jnp.asarray(Mh)
    hi = jnp.einsum(
        "oh,bhw->bow", Mv, I, precision=jax.lax.Precision.HIGHEST
    )
    return jnp.einsum(
        "qw,bow->boq", Mh, hi, precision=jax.lax.Precision.HIGHEST
    )


def _pallas_mode(p: "FarnebackParams") -> str:
    if p.use_pallas == "auto":
        return "off" if jax.default_backend() == "cpu" else "fused"
    return p.use_pallas


def farneback_flow(
    I0: jnp.ndarray,
    I1: jnp.ndarray,
    p: FarnebackParams,
    interpret: bool = False,
) -> jnp.ndarray:
    """I0, I1: (B, H, W) float32 (0..255 gray) -> flow (B, H, W, 2).

    interpret=True forces the fused Pallas kernel through the Pallas
    interpreter (CPU) — used by tests to exercise the TPU kernel's math
    without a chip."""
    h, w = I0.shape[-2], I0.shape[-1]
    geom = _level_geometry(h, w, p)
    mode = "fused" if interpret else _pallas_mode(p)
    flow = None
    for li, (scale, lh, lw, ksize, sigma) in enumerate(geom):
        if flow is None:
            flow = jnp.zeros(I0.shape[:-2] + (lh, lw, 2), jnp.float32)
        else:
            flow = resize_bilinear(
                jnp.moveaxis(flow, -1, -3), (lh, lw)
            )
            flow = jnp.moveaxis(flow, -3, -1) * (1.0 / p.pyr_scale)
        if mode == "fused":
            # blur+resize as two dense MXU matmuls (see _level_matrices)
            L0 = _level_image_matmul(I0, lh, lw, ksize, sigma)
            L1 = _level_image_matmul(I1, lh, lw, ksize, sigma)
        else:
            gk = gaussian_kernel_1d(ksize, sigma)
            B0 = sep_filter2d(I0, gk, gk)
            B1 = sep_filter2d(I1, gk, gk)
            L0 = resize_bilinear(B0, (lh, lw))
            L1 = resize_bilinear(B1, (lh, lw))
        d_lvl = max(4, int(round(p.max_disp * scale)))
        if mode == "fused":
            from denseflow_tpu.kernels.farneback_fused import (
                farneback_level_fused_tiled,
                poly_expand_fused,
                polyexp_fused_fits,
            )

            if polyexp_fused_fits(lh, lw, p.poly_n):
                # both images through one fused polyexp call (channel-
                # first output feeds the level kernel transpose-free); the
                # XLA conv chain measured ~2/3 of the solve once the level
                # loop was fused (round-5 profile)
                nb = L0.shape[0]
                R = poly_expand_fused(
                    jnp.concatenate([L0, L1]), p.poly_n, p.poly_sigma,
                    interpret,
                )
                R0cf, R1cf = R[:nb], R[nb:]
            else:
                R0cf = jnp.moveaxis(
                    poly_expand(L0, p.poly_n, p.poly_sigma), -1, -3
                )
                R1cf = jnp.moveaxis(
                    poly_expand(L1, p.poly_n, p.poly_sigma), -1, -3
                )
            u, v = farneback_level_fused_tiled(
                R0cf,
                R1cf,
                flow[..., 0],
                flow[..., 1],
                win_size=int(p.win_size),
                num_iters=int(p.num_iters),
                max_disp=float(d_lvl),
                stop_eps=float(p.stop_eps),
                interpret=interpret,
            )
            flow = jnp.stack([u, v], axis=-1)
            continue
        R0 = poly_expand(L0, p.poly_n, p.poly_sigma)
        R1 = poly_expand(L1, p.poly_n, p.poly_sigma)
        bscale = _border_scale(lh, lw)
        M = update_matrices(R0, R1, flow, bscale, d_lvl)
        if p.stop_eps > 0:
            # per-pair RMS-update stop with FREEZE (batch-invariant, same
            # contract as the TVL1/Brox stops)
            stop = jnp.float32(p.stop_eps * p.stop_eps * lh * lw)

            def cond(s):
                n, active = s[0], s[1]
                return jnp.logical_and(n < p.num_iters, jnp.any(active))

            def body(s):
                n, active, flow, M = s
                new = solve_flow(_box_blur_planes(M, p.win_size))
                err = jnp.sum((new - flow) ** 2, axis=(-3, -2, -1))
                keep = active[:, None, None, None]
                flow = jnp.where(keep, new, flow)
                active = active & (err > stop)
                M = update_matrices(R0, R1, flow, bscale, d_lvl)
                return n + 1, active, flow, M

            _, _, flow, _ = jax.lax.while_loop(
                cond, body,
                (jnp.int32(0), jnp.ones(flow.shape[:1], bool), flow, M),
            )
        else:
            for it in range(p.num_iters):
                flow = solve_flow(_box_blur_planes(M, p.win_size))
                if it < p.num_iters - 1:
                    M = update_matrices(R0, R1, flow, bscale, d_lvl)
    return flow


def make_farneback_solver(height: int, width: int, params: FarnebackParams):
    @jax.jit
    def solver(I0_u8: jnp.ndarray, I1_u8: jnp.ndarray) -> jnp.ndarray:
        return farneback_flow(
            I0_u8.astype(jnp.float32), I1_u8.astype(jnp.float32), params
        )

    return solver
