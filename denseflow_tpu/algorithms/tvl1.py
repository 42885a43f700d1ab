"""Batched TV-L1 optical flow (Zach, Pock, Bischof 2007), TPU-native.

Semantics match OpenCV's `cuda::OpticalFlowDual_TVL1` as invoked by the
reference (reference src/denseflow_gpu.cpp:299,327) with its default
hyper-parameters (SURVEY.md §2.2 N1): tau=0.25, lambda=0.15, theta=0.3,
nscales=5, warps=5, epsilon=0.01, iterations=300, scaleStep=0.8, gamma=0,
useInitialFlow=false. Per scale (coarse→fine), per warp: bicubically warp I1
and its centered gradients by the current flow, then run primal-dual
fixed-point iterations (three-way residual thresholding + dual ascent on the
TV term) until the summed squared update drops below eps^2 * area or the
iteration cap is hit. No median filtering (the CUDA variant has none).

TPU-first design decisions (vs the reference's serial per-pair CUDA calls):

* the whole solver is one jit-compiled function over a **batch of B pairs**
  (B, H, W); all ops are batch-transparent, so a single invocation fills the
  VPU with B simultaneous solves;
* pyramid geometry is static (computed host-side), the inner fixed-point
  loop is a `lax.while_loop` whose convergence test is the max over the
  batch of per-pair errors — converged pairs ride along (extra iterations
  past convergence change results by < epsilon by construction);
* everything stays on device end-to-end; callers quantize on device too, so
  only uint8 crosses back to the host.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import List, Tuple

import jax
import jax.numpy as jnp

from denseflow_tpu.ops.derivatives import centered_gradient, divergence, forward_gradient
from denseflow_tpu.ops.pyramid import build_pyramid, pyramid_shapes
from denseflow_tpu.ops.resize import resize_bilinear
from denseflow_tpu.ops.warp import warp_shift

_GRAD_EPS = 1.1920929e-07  # numeric_limits<float>::epsilon(), OpenCV's guard


@dataclasses.dataclass(frozen=True)
class TVL1Params:
    tau: float = 0.25
    lambda_: float = 0.15
    theta: float = 0.3
    nscales: int = 5
    warps: int = 5
    epsilon: float = 0.01
    iterations: int = 300
    scale_step: float = 0.8
    # error check cadence: evaluate the epsilon stop every N iterations
    # (1 = OpenCV-exact; N runs at most N-1 harmless extra iterations past
    # convergence while cutting the full-plane reduction cost N-fold).
    # Measured on v5e at 256p (round-5 SOL pass): 24 hits 1765 flows/s on
    # bench content vs 1470 at 16 — first-block convergence also arms the
    # warp-level early exit, and 24 lets easy scales clear it — while on
    # hard mixed-motion content 24 ties 16 (863 vs 872) and 8 loses ~26%.
    check_every: int = 24
    min_size: int = 16
    # Displacement clamp for the masked-shift warp (TPU-native, gather-free;
    # see ops/warp.py). Flows beyond ±max_disp px at the finest level stop
    # being tracked — the reference's unbounded texture fetch has no such
    # limit, but 40px at 256p covers typical video motion and the jpg
    # output path clips at ±bound (default 32) anyway.
    max_disp: int = 40
    # Kernel selection for the hot loop:
    #   "fused"   — per-scale Pallas kernel: warp sweep + primal-dual loop,
    #               all VMEM-resident (kernels/tvl1_fused.py). Fastest: the
    #               XLA path's bottleneck is the warp sweep streaming the
    #               image stack through HBM per shift.
    #   "off"     — pure XLA (lax.while_loop); the CPU / oracle path.
    #   "auto"    — "fused" on TPU at every geometry (working sets beyond
    #               VMEM are spatially tiled — tvl1_fused.plan_tiles), "off"
    #               on CPU.
    use_pallas: str = "auto"


def _pallas_mode(p: "TVL1Params", h: int, w: int) -> str:
    if p.use_pallas == "auto":
        import jax as _jax

        return "off" if _jax.default_backend() == "cpu" else "fused"
    return p.use_pallas


def _solve_one_scale(
    I0: jnp.ndarray,
    I1: jnp.ndarray,
    u1: jnp.ndarray,
    u2: jnp.ndarray,
    p: TVL1Params,
    max_disp: int,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Run warps x iterations at a single pyramid level. All (B, H, W)."""
    l_t = p.lambda_ * p.theta
    taut = p.tau / p.theta
    area = I0.shape[-1] * I0.shape[-2]
    scaled_eps = jnp.float32(p.epsilon * p.epsilon * area)

    I1x, I1y = centered_gradient(I1)

    mode = "fused" if interpret else _pallas_mode(p, I0.shape[-2], I0.shape[-1])
    if mode == "fused":
        from denseflow_tpu.kernels.tvl1_fused import tvl1_scale_fused_tiled as tvl1_scale_fused

        return tvl1_scale_fused(
            I0, I1, I1x, I1y, u1, u2,
            l_t=float(l_t),
            theta=float(p.theta),
            taut=float(taut),
            epsilon=float(p.epsilon),
            iterations=int(p.iterations),
            warps=int(p.warps),
            max_disp=float(max_disp),
            check_every=int(p.check_every),
            interpret=interpret,
        )

    p11 = jnp.zeros_like(u1)
    p12 = jnp.zeros_like(u1)
    p21 = jnp.zeros_like(u1)
    p22 = jnp.zeros_like(u1)

    def warp_body(carry, _):
        u1, u2, p11, p12, p21, p22 = carry
        # snapshot flow for this warp; warp I1 and its gradients together
        # (one coefficient sweep shared by the 3-image stack)
        u1_0, u2_0 = u1, u2
        warped = warp_shift(
            jnp.stack([I1, I1x, I1y]), u1_0, u2_0, max_disp, "cubic"
        )
        I1w, I1wx, I1wy = warped[0], warped[1], warped[2]
        grad = I1wx * I1wx + I1wy * I1wy
        rho_c = I1w - I1wx * u1_0 - I1wy * u2_0 - I0

        def iter_cond(state):
            _, _, _, _, _, _, active, n = state
            return jnp.logical_and(n < p.iterations, jnp.any(active))

        def iter_body(state):
            u1, u2, p11, p12, p21, p22, active, n = state
            rho = rho_c + I1wx * u1 + I1wy * u2
            # three-way thresholding on the data residual
            d1 = jnp.where(
                rho < -l_t * grad,
                l_t * I1wx,
                jnp.where(
                    rho > l_t * grad,
                    -l_t * I1wx,
                    jnp.where(grad > _GRAD_EPS, -rho / jnp.maximum(grad, _GRAD_EPS) * I1wx, 0.0),
                ),
            )
            d2 = jnp.where(
                rho < -l_t * grad,
                l_t * I1wy,
                jnp.where(
                    rho > l_t * grad,
                    -l_t * I1wy,
                    jnp.where(grad > _GRAD_EPS, -rho / jnp.maximum(grad, _GRAD_EPS) * I1wy, 0.0),
                ),
            )
            v1 = u1 + d1
            v2 = u2 + d2
            u1n = v1 + p.theta * divergence(p11, p12)
            u2n = v2 + p.theta * divergence(p21, p22)
            # per-pair convergence with FREEZE: a converged pair stops
            # updating, so every pair's trajectory is independent of its
            # batch-mates — outputs are invariant to batch/chunk grouping
            # (the reference solves pairs serially, so coupling them
            # through a shared stop test would change results with the
            # batch size; the fused Pallas kernel is per-pair by
            # construction)
            err = jnp.sum((u1n - u1) ** 2 + (u2n - u2) ** 2, axis=(-2, -1))
            act = active & (err > scaled_eps)
            keep = active[:, None, None]
            u1n = jnp.where(keep, u1n, u1)
            u2n = jnp.where(keep, u2n, u2)
            # dual ascent
            g1x, g1y = forward_gradient(u1n)
            g2x, g2y = forward_gradient(u2n)
            ng1 = 1.0 + taut * jnp.sqrt(g1x * g1x + g1y * g1y)
            ng2 = 1.0 + taut * jnp.sqrt(g2x * g2x + g2y * g2y)
            p11 = jnp.where(keep, (p11 + taut * g1x) / ng1, p11)
            p12 = jnp.where(keep, (p12 + taut * g1y) / ng1, p12)
            p21 = jnp.where(keep, (p21 + taut * g2x) / ng2, p21)
            p22 = jnp.where(keep, (p22 + taut * g2y) / ng2, p22)
            return (u1n, u2n, p11, p12, p21, p22, act, n + 1)

        init = (u1, u2, p11, p12, p21, p22,
                jnp.ones((u1.shape[0],), bool), jnp.int32(0))
        u1, u2, p11, p12, p21, p22, _, _ = jax.lax.while_loop(
            iter_cond, iter_body, init
        )
        return (u1, u2, p11, p12, p21, p22), None

    carry = (u1, u2, p11, p12, p21, p22)
    # scan over warps: identical body per warp, compiled once
    carry, _ = jax.lax.scan(warp_body, carry, None, length=p.warps)
    u1, u2, p11, p12, p21, p22 = carry
    return u1, u2


def tvl1_flow(
    I0: jnp.ndarray,
    I1: jnp.ndarray,
    params: TVL1Params,
    interpret: bool = False,
) -> jnp.ndarray:
    """I0, I1: (B, H, W) float32 in 0..255 -> flow (B, H, W, 2) float32.

    interpret=True forces the fused Pallas kernel through the Pallas
    interpreter (CPU) — used by tests to exercise the TPU kernel's math
    without a chip."""
    h, w = I0.shape[-2], I0.shape[-1]
    shapes = pyramid_shapes(h, w, params.scale_step, params.nscales, params.min_size)
    pyr0 = build_pyramid(I0, shapes)
    pyr1 = build_pyramid(I1, shapes)

    inv = 1.0 / params.scale_step
    u1 = jnp.zeros(I0.shape[:-2] + shapes[-1], jnp.float32)
    u2 = jnp.zeros_like(u1)
    for lvl in range(len(shapes) - 1, -1, -1):
        # displacement bound scales with the level resolution: motion of
        # max_disp px at the finest level is max_disp * (w_lvl/w_0) here
        d_lvl = max(4, int(round(params.max_disp * shapes[lvl][1] / shapes[0][1])))
        u1, u2 = _solve_one_scale(
            pyr0[lvl], pyr1[lvl], u1, u2, params, d_lvl, interpret
        )
        if lvl > 0:
            nh, nw = shapes[lvl - 1]
            u1 = resize_bilinear(u1, (nh, nw)) * inv
            u2 = resize_bilinear(u2, (nh, nw)) * inv
    return jnp.stack([u1, u2], axis=-1)


def make_tvl1_solver(height: int, width: int, params: TVL1Params):
    """jit-compiled uint8-in solver for a fixed frame geometry."""

    @jax.jit
    def solver(I0_u8: jnp.ndarray, I1_u8: jnp.ndarray) -> jnp.ndarray:
        I0 = I0_u8.astype(jnp.float32)
        I1 = I1_u8.astype(jnp.float32)
        return tvl1_flow(I0, I1, params)

    return solver
