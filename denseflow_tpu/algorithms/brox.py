"""Batched Brox et al. 2004 variational optical flow, TPU-native.

Semantics follow the reference's explicit creation call
(reference src/denseflow_gpu.cpp:303): alpha=0.197 (smoothness), gamma=50
(gradient constancy), pyramid scale=0.8, inner_iterations=10,
outer_iterations=77, solver_iterations=10, with inputs as float32 in [0,1]
(the reference converts gray frames with 1/255,
reference src/denseflow_gpu.cpp:331-333).

Energy: ∫ Ψ(|I1(x+w)-I0(x)|² + γ|∇I1(x+w)-∇I0(x)|²) + α Ψ(|∇u|²+|∇v|²),
Ψ(s²)=sqrt(s²+ε²). Coarse-to-fine over a scale-0.8 pyramid; per level,
`outer` warping iterations each linearize the data term at the current flow,
run `inner` lagged-diffusivity fixed-point steps, each solved with `solver`
Jacobi sweeps for the flow increment (du, dv).

All loops are `lax.fori_loop`s over a batch of B pairs — one jit region per
frame geometry, no per-pair dispatch.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from denseflow_tpu.ops.filters import conv1d, gaussian_kernel_1d, sep_filter2d
from denseflow_tpu.ops.pyramid import build_pyramid, pyramid_shapes
from denseflow_tpu.ops.resize import resize_bilinear
from denseflow_tpu.ops.warp import warp_shift

_PSI_EPS2 = 0.001 * 0.001


@dataclasses.dataclass(frozen=True)
class BroxParams:
    alpha: float = 0.197
    gamma: float = 50.0
    scale_step: float = 0.8
    inner_iterations: int = 10
    outer_iterations: int = 77
    solver_iterations: int = 10
    min_size: int = 16
    # Convergence stop for the outer warping loop: exit when an outer
    # step's flow update satisfies sum(du^2 + dv^2) <= (stop_eps^2 * area),
    # i.e. the RMS per-pixel update fell below stop_eps px — the remaining
    # outers would no-op within the same ball. The reference's CUDA Brox
    # runs all 77 outers unconditionally (src/denseflow_gpu.cpp:303); at
    # 1e-3 px RMS the result is indistinguishable (golden EPE gates are
    # 0.5 px) while typical content converges in a fraction of the
    # budget. 0 disables (reference-exact iteration count).
    stop_eps: float = 1e-3
    # Brox presmoothing of the input images
    presmooth_sigma: float = 0.8
    # displacement clamp for the gather-free masked-shift warp
    # (see ops/warp.py); scaled per pyramid level
    max_disp: int = 40
    # Kernel selection for the level solve:
    #   "fused" — per-scale Pallas kernel (kernels/brox_fused.py): the
    #             whole 77x10x10 warp/fixed-point/Jacobi nest VMEM-resident
    #             (the XLA path streams ~30 HBM plane passes per sweep and
    #             measured ~6 device flows/s at 256p — round-3 verdict)
    #   "off"   — pure XLA; the CPU / oracle path
    #   "auto"  — "fused" on TPU (spatially tiled beyond VMEM), "off" on CPU
    use_pallas: str = "auto"


# 5-point derivative stencil (Brox uses 4th-order central differences)
_D5 = np.array([1.0, -8.0, 0.0, 8.0, -1.0], dtype=np.float32) / 12.0


def _dx(img: jnp.ndarray) -> jnp.ndarray:
    return conv1d(img, _D5, img.ndim - 1, "replicate")


def _dy(img: jnp.ndarray) -> jnp.ndarray:
    return conv1d(img, _D5, img.ndim - 2, "replicate")


def _psi_deriv(s2: jnp.ndarray) -> jnp.ndarray:
    """Ψ'(s²) = 1 / (2·sqrt(s² + ε²)); the constant 2 is absorbed (it scales
    data and smoothness terms identically)."""
    return jax.lax.rsqrt(s2 + _PSI_EPS2)


def _shift(x, dy_, dx_):
    """Neighbor view with replicated borders (used for the weighted 4-neighbor
    Laplacian in the smoothness term)."""
    if dy_ == 1:
        x = jnp.concatenate([x[..., 1:, :], x[..., -1:, :]], axis=-2)
    elif dy_ == -1:
        x = jnp.concatenate([x[..., :1, :], x[..., :-1, :]], axis=-2)
    if dx_ == 1:
        x = jnp.concatenate([x[..., :, 1:], x[..., :, -1:]], axis=-1)
    elif dx_ == -1:
        x = jnp.concatenate([x[..., :, :1], x[..., :, :-1]], axis=-1)
    return x


def _pallas_mode(p: "BroxParams") -> str:
    if p.use_pallas == "auto":
        return "off" if jax.default_backend() == "cpu" else "fused"
    return p.use_pallas


def _solve_level(
    I0, I1, u, v, p: BroxParams, max_disp: int, interpret: bool = False
):
    """One pyramid level: outer warping loop around inner fixed-point +
    Jacobi solver. All arrays (B, H, W)."""
    mode = "fused" if interpret else _pallas_mode(p)
    if mode == "fused":
        from denseflow_tpu.kernels.brox_fused import brox_scale_fused_tiled

        u, v = brox_scale_fused_tiled(
            I0, I1, u, v,
            alpha=float(p.alpha),
            gamma=float(p.gamma),
            inner_iterations=int(p.inner_iterations),
            outer_iterations=int(p.outer_iterations),
            solver_iterations=int(p.solver_iterations),
            max_disp=float(max_disp),
            stop_eps=float(p.stop_eps),
            interpret=interpret,
        )
        return u, v
    alpha = jnp.float32(p.alpha)
    gamma = jnp.float32(p.gamma)

    I1x_full = _dx(I1)
    I1y_full = _dy(I1)
    I0x = _dx(I0)
    I0y = _dy(I0)

    area = I0.shape[-1] * I0.shape[-2]
    stop = jnp.float32(p.stop_eps * p.stop_eps * area) if p.stop_eps > 0 else None
    # the inner stop compounds with the outer one (an early-frozen
    # linearization shifts every later outer), so it runs 4x tighter in
    # RMS (16x in the squared sum) — measured drift vs the full budget
    # drops ~10x for ~1 extra inner step
    stop_in = None if stop is None else stop * jnp.float32(1.0 / 16.0)

    def outer_body(uv):
        u, v, active, n = uv
        warped = warp_shift(
            jnp.stack([I1, I1x_full, I1y_full]), u, v, max_disp, "cubic"
        )
        I1w, Ix, Iy = warped[0], warped[1], warped[2]
        Iz = I1w - I0
        Ixx = _dx(Ix)
        Ixy = _dy(Ix)
        Iyy = _dy(Iy)
        Ixz = Ix - I0x
        Iyz = Iy - I0y

        du = jnp.zeros_like(u)
        dv = jnp.zeros_like(v)

        def inner_body(state):
            j, act_i, du, dv = state
            du0, dv0 = du, dv
            # lagged diffusivity at the current increment. ONE robust
            # penalty over intensity + gradient constancy combined —
            # Brox et al. 2004 eq. (4): Ψ(|I_z|² + γ|∇I_z|²) — which is
            # what OpenCV's CUDA Brox (NCV) implements. Separate Ψ per
            # term (the Bruhn-variant) destabilizes at γ=50 on
            # [0,1]-scaled intensities (round-2 divergence).
            r_data = Iz + Ix * du + Iy * dv
            r_gx = Ixz + Ixx * du + Ixy * dv
            r_gy = Iyz + Ixy * du + Iyy * dv
            psi_d = _psi_deriv(
                r_data * r_data + gamma * (r_gx * r_gx + r_gy * r_gy)
            )

            U = u + du
            V = v + dv
            Ux, Uy = _dx(U), _dy(U)
            Vx, Vy = _dx(V), _dy(V)
            psi_s = _psi_deriv(Ux * Ux + Uy * Uy + Vx * Vx + Vy * Vy)

            # interface diffusivities (arithmetic mean with each neighbor)
            wE = 0.5 * (psi_s + _shift(psi_s, 0, 1))
            wW = 0.5 * (psi_s + _shift(psi_s, 0, -1))
            wS = 0.5 * (psi_s + _shift(psi_s, 1, 0))
            wN = 0.5 * (psi_s + _shift(psi_s, -1, 0))
            wsum = wE + wW + wS + wN

            # constant (per fixed-point step) data-term pieces
            a11 = psi_d * (Ix * Ix + gamma * (Ixx * Ixx + Ixy * Ixy))
            a12 = psi_d * (Ix * Iy + gamma * (Ixx * Ixy + Ixy * Iyy))
            a22 = psi_d * (Iy * Iy + gamma * (Ixy * Ixy + Iyy * Iyy))
            b1 = -psi_d * (Iz * Ix + gamma * (Ixz * Ixx + Iyz * Ixy))
            b2 = -psi_d * (Iz * Iy + gamma * (Ixz * Ixy + Iyz * Iyy))

            def jacobi_body(_, duv2):
                du, dv = duv2
                U = u + du
                V = v + dv
                lap_u = (
                    wE * _shift(U, 0, 1)
                    + wW * _shift(U, 0, -1)
                    + wS * _shift(U, 1, 0)
                    + wN * _shift(U, -1, 0)
                    - wsum * u
                )
                lap_v = (
                    wE * _shift(V, 0, 1)
                    + wW * _shift(V, 0, -1)
                    + wS * _shift(V, 1, 0)
                    + wN * _shift(V, -1, 0)
                    - wsum * v
                )
                denom_u = a11 + alpha * wsum
                denom_v = a22 + alpha * wsum
                du_new = (b1 - a12 * dv + alpha * lap_u) / denom_u
                dv_new = (b2 - a12 * du_new + alpha * lap_v) / denom_v
                return du_new, dv_new

            du, dv = jax.lax.fori_loop(
                0, p.solver_iterations, jacobi_body, (du, dv)
            )
            if stop is None:
                return j + 1, act_i, du, dv
            # per-pair stop on the INNER fixed point too: when a step's
            # increment change fell below the same RMS threshold, further
            # lagged-diffusivity steps refine below tolerance (freeze
            # keeps pairs independent, as in the outer stop)
            err_i = jnp.sum(
                (du - du0) ** 2 + (dv - dv0) ** 2, axis=(-2, -1)
            )
            keep = act_i[:, None, None]
            du = jnp.where(keep, du, du0)
            dv = jnp.where(keep, dv, dv0)
            return j + 1, act_i & (err_i > stop_in), du, dv

        if stop is None:
            _, _, du, dv = jax.lax.fori_loop(
                0, p.inner_iterations,
                lambda _, s: inner_body(s),
                (jnp.int32(0), jnp.ones(u.shape[:1], bool), du, dv),
            )
        else:
            _, _, du, dv = jax.lax.while_loop(
                lambda s: jnp.logical_and(
                    s[0] < p.inner_iterations, jnp.any(s[1])
                ),
                inner_body,
                (jnp.int32(0), jnp.ones(u.shape[:1], bool), du, dv),
            )
        if stop is None:
            return u + du, v + dv, active, n + 1
        # per-pair convergence with FREEZE (like TVL1): a converged pair
        # stops updating, so every pair's trajectory is independent of
        # its batch-mates and outputs are invariant to chunk grouping
        err = jnp.sum(du * du + dv * dv, axis=(-2, -1))
        keep = active[:, None, None]
        u = jnp.where(keep, u + du, u)
        v = jnp.where(keep, v + dv, v)
        return u, v, active & (err > stop), n + 1

    active0 = jnp.ones(u.shape[:1], bool)
    if stop is None:
        u, v, _, _ = jax.lax.fori_loop(
            0, p.outer_iterations,
            lambda _, s: outer_body(s), (u, v, active0, jnp.int32(0)),
        )
    else:
        u, v, _, _ = jax.lax.while_loop(
            lambda s: jnp.logical_and(
                s[3] < p.outer_iterations, jnp.any(s[2])
            ),
            outer_body,
            (u, v, active0, jnp.int32(0)),
        )
    return u, v


def brox_flow(
    I0: jnp.ndarray,
    I1: jnp.ndarray,
    p: BroxParams,
    interpret: bool = False,
) -> jnp.ndarray:
    """I0, I1: (B, H, W) float32 in [0,1] -> flow (B, H, W, 2).

    interpret=True forces the fused Pallas kernel through the Pallas
    interpreter (CPU) — used by tests to exercise the TPU kernel's math
    without a chip."""
    h, w = I0.shape[-2], I0.shape[-1]
    gk = gaussian_kernel_1d(5, p.presmooth_sigma)
    I0s = sep_filter2d(I0, gk, gk)
    I1s = sep_filter2d(I1, gk, gk)
    shapes = pyramid_shapes(h, w, p.scale_step, nscales=100, min_size=p.min_size)
    pyr0 = build_pyramid(I0s, shapes)
    pyr1 = build_pyramid(I1s, shapes)
    inv = 1.0 / p.scale_step
    u = jnp.zeros(I0.shape[:-2] + shapes[-1], jnp.float32)
    v = jnp.zeros_like(u)
    for lvl in range(len(shapes) - 1, -1, -1):
        d_lvl = max(4, int(round(p.max_disp * shapes[lvl][1] / shapes[0][1])))
        u, v = _solve_level(pyr0[lvl], pyr1[lvl], u, v, p, d_lvl, interpret)
        if lvl > 0:
            nh, nw = shapes[lvl - 1]
            u = resize_bilinear(u, (nh, nw)) * inv
            v = resize_bilinear(v, (nh, nw)) * inv
    return jnp.stack([u, v], axis=-1)


def make_brox_solver(height: int, width: int, params: BroxParams):
    @jax.jit
    def solver(I0_u8: jnp.ndarray, I1_u8: jnp.ndarray) -> jnp.ndarray:
        scale = jnp.float32(1.0 / 255.0)
        return brox_flow(
            I0_u8.astype(jnp.float32) * scale,
            I1_u8.astype(jnp.float32) * scale,
            params,
        )

    return solver
