"""Independent NumPy TV-L1 oracle (fidelity gate for the JAX solvers).

A from-scratch implementation of Zach/Pock/Bischof duality-based TV-L1
following the published IPOL article (J. Sánchez Pérez, E. Meinhardt-Llopis,
G. Facciolo, "TV-L1 Optical Flow Estimation", IPOL 2013) — the same
algorithm family the reference's `cuda::OpticalFlowDual_TVL1` implements
(reference src/denseflow_gpu.cpp:299,327), but with deliberately DIFFERENT
machinery so agreement is evidence, not tautology:

* warping / pyramid resampling via scipy `map_coordinates` cubic B-splines
  (the product uses a masked-shift cubic-convolution sweep, ops/warp.py);
* its own pyramid construction (Gaussian presmooth + spline zoom);
* IPOL's stopping rule (mean squared update per pixel < epsilon^2).

Used by tools/make_goldens.py to produce checked-in golden flow fields
(tests/golden/*.npz) and by tests/test_fidelity.py to enforce the
BASELINE.json gate: mean EPE <= 0.5 px at reference hyperparameters.
"""

from __future__ import annotations

import numpy as np
from scipy import ndimage


def _centered_gradient(img: np.ndarray):
    gx = np.zeros_like(img)
    gy = np.zeros_like(img)
    gx[:, 1:-1] = 0.5 * (img[:, 2:] - img[:, :-2])
    gx[:, 0] = 0.5 * (img[:, 1] - img[:, 0])
    gx[:, -1] = 0.5 * (img[:, -1] - img[:, -2])
    gy[1:-1, :] = 0.5 * (img[2:, :] - img[:-2, :])
    gy[0, :] = 0.5 * (img[1, :] - img[0, :])
    gy[-1, :] = 0.5 * (img[-1, :] - img[-2, :])
    return gx, gy


def _forward_gradient(u: np.ndarray):
    fx = np.zeros_like(u)
    fy = np.zeros_like(u)
    fx[:, :-1] = u[:, 1:] - u[:, :-1]
    fy[:-1, :] = u[1:, :] - u[:-1, :]
    return fx, fy


def _divergence(p1: np.ndarray, p2: np.ndarray):
    div = np.zeros_like(p1)
    div[:, 0] += p1[:, 0]
    div[:, 1:] += p1[:, 1:] - p1[:, :-1]
    div[0, :] += p2[0, :]
    div[1:, :] += p2[1:, :] - p2[:-1, :]
    return div


def _warp(img: np.ndarray, u: np.ndarray, v: np.ndarray) -> np.ndarray:
    """Sample img at (x+u, y+v), cubic B-spline, clamped to the image."""
    h, w = img.shape
    ys, xs = np.mgrid[0:h, 0:w].astype(np.float64)
    cy = np.clip(ys + v, 0, h - 1)
    cx = np.clip(xs + u, 0, w - 1)
    return ndimage.map_coordinates(img, [cy, cx], order=3, mode="nearest")


def _zoom_to(img: np.ndarray, shape) -> np.ndarray:
    zy = shape[0] / img.shape[0]
    zx = shape[1] / img.shape[1]
    out = ndimage.zoom(img, (zy, zx), order=3, mode="nearest", grid_mode=True)
    assert out.shape == tuple(shape), (out.shape, shape)
    return out


def tvl1_numpy(
    I0: np.ndarray,
    I1: np.ndarray,
    tau: float = 0.25,
    lambda_: float = 0.15,
    theta: float = 0.3,
    nscales: int = 5,
    warps: int = 5,
    epsilon: float = 0.01,
    iterations: int = 300,
    scale_step: float = 0.8,
    min_size: int = 16,
) -> np.ndarray:
    """I0, I1: (H, W) float in 0..255 -> flow (H, W, 2) [u, v].

    Defaults are the reference's CUDA TVL1 hyperparameters
    (SURVEY.md §2.2 N1)."""
    I0 = np.ascontiguousarray(I0, np.float64)
    I1 = np.ascontiguousarray(I1, np.float64)
    h, w = I0.shape

    # pyramid geometry (same level count rule as the product so both
    # solve the same multiscale problem)
    shapes = [(h, w)]
    for _ in range(1, nscales):
        nh = int(round(shapes[-1][0] * scale_step))
        nw = int(round(shapes[-1][1] * scale_step))
        if min(nh, nw) < min_size:
            break
        shapes.append((nh, nw))

    # Gaussian presmooth before each downsample (IPOL: sigma tied to the
    # zoom factor), built independently of the product's pyramid
    sigma = 0.8 * np.sqrt(1.0 / (scale_step * scale_step) - 1.0)
    pyr0, pyr1 = [I0], [I1]
    for lvl in range(1, len(shapes)):
        pyr0.append(_zoom_to(ndimage.gaussian_filter(pyr0[-1], sigma), shapes[lvl]))
        pyr1.append(_zoom_to(ndimage.gaussian_filter(pyr1[-1], sigma), shapes[lvl]))

    l_t = lambda_ * theta
    taut = tau / theta
    u = np.zeros(shapes[-1], np.float64)
    v = np.zeros(shapes[-1], np.float64)

    for lvl in range(len(shapes) - 1, -1, -1):
        A, B = pyr0[lvl], pyr1[lvl]
        lh, lw = shapes[lvl]
        Bx, By = _centered_gradient(B)
        p11 = np.zeros_like(u); p12 = np.zeros_like(u)
        p21 = np.zeros_like(u); p22 = np.zeros_like(u)
        for _ in range(warps):
            u0, v0 = u.copy(), v.copy()
            Bw = _warp(B, u0, v0)
            Bwx = _warp(Bx, u0, v0)
            Bwy = _warp(By, u0, v0)
            grad = Bwx * Bwx + Bwy * Bwy
            rho_c = Bw - Bwx * u0 - Bwy * v0 - A
            for _n in range(iterations):
                rho = rho_c + Bwx * u + Bwy * v
                th = l_t * grad
                d1 = np.where(
                    rho < -th, l_t * Bwx,
                    np.where(rho > th, -l_t * Bwx,
                             np.where(grad > 1e-12, -rho / np.maximum(grad, 1e-12) * Bwx, 0.0)),
                )
                d2 = np.where(
                    rho < -th, l_t * Bwy,
                    np.where(rho > th, -l_t * Bwy,
                             np.where(grad > 1e-12, -rho / np.maximum(grad, 1e-12) * Bwy, 0.0)),
                )
                un = (u + d1) + theta * _divergence(p11, p12)
                vn = (v + d2) + theta * _divergence(p21, p22)
                err = np.mean((un - u) ** 2 + (vn - v) ** 2)
                u, v = un, vn
                ux, uy = _forward_gradient(u)
                vx, vy = _forward_gradient(v)
                n1 = 1.0 + taut * np.sqrt(ux * ux + uy * uy)
                n2 = 1.0 + taut * np.sqrt(vx * vx + vy * vy)
                p11 = (p11 + taut * ux) / n1
                p12 = (p12 + taut * uy) / n1
                p21 = (p21 + taut * vx) / n2
                p22 = (p22 + taut * vy) / n2
                if err < epsilon * epsilon:
                    break
        if lvl > 0:
            nh, nw = shapes[lvl - 1]
            inv = 1.0 / scale_step
            u = _zoom_to(u, (nh, nw)) * inv
            v = _zoom_to(v, (nh, nw)) * inv
    return np.stack([u, v], axis=-1).astype(np.float32)
