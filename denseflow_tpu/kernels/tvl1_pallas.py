"""Pallas kernel for the TVL1 primal-dual fixed-point loop.

The solver's hot loop (reference: OpenCV CUDA TVL1's 300-iteration
estimateU/estimateDualVariables cycle, invoked at
reference src/denseflow_gpu.cpp:327) runs entirely in VMEM: for each frame
pair (one grid step per pair), the six state planes (u1, u2, p11..p22) and
four per-warp constants (I1wx, I1wy, rho_c, grad) are resident on-chip, so
the ~300 stencil iterations touch HBM exactly twice — once to load, once to
store. The XLA version of the same loop moves ~16 planes through HBM per
iteration and is bandwidth-bound; this kernel is VPU-bound.

Per-pair convergence: each grid step carries its own error scalar, so a
converged pair stops iterating even while its batch neighbors continue —
semantically closer to the reference (per-pair epsilon exit) than the XLA
path's batch-max test.

VMEM budget at the 256px bench geometry (256 x 341 f32, padded to 384
lanes): 10 planes x 384 KB ≈ 3.8 MB — comfortably inside ~16 MB/core.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_GRAD_EPS = 1.1920929e-07


def _make_kernel(l_t: float, theta: float, taut: float, scaled_eps: float,
                 iterations: int, check_every: int):
    def kernel(
        I1wx_ref, I1wy_ref, rho_c_ref, grad_ref,
        u1_ref, u2_ref, p11_ref, p12_ref, p21_ref, p22_ref,
        u1_out, u2_out, p11_out, p12_out, p21_out, p22_out,
    ):
        I1wx = I1wx_ref[0]
        I1wy = I1wy_ref[0]
        rho_c = rho_c_ref[0]
        grad = grad_ref[0]
        fi = l_t * grad
        d_body = -1.0 / jnp.maximum(grad, _GRAD_EPS)
        grad_ok = grad > _GRAD_EPS

        def one_iter(state, with_err: bool):
            u1, u2, p11, p12, p21, p22, _ = state
            rho = rho_c + I1wx * u1 + I1wy * u2
            mul = jnp.where(
                rho < -fi,
                l_t,
                jnp.where(
                    rho > fi,
                    -l_t,
                    jnp.where(grad_ok, rho * d_body, 0.0),
                ),
            )
            v1 = u1 + mul * I1wx
            v2 = u2 + mul * I1wy
            # primal: u = v + theta * div(p)
            u1n = v1 + theta * _div(p11, p12)
            u2n = v2 + theta * _div(p21, p22)
            # the epsilon test is evaluated once per `check_every` block, so
            # the full-plane reduction is only paid on the block's last
            # iteration (the XLA-fidelity cadence pays it every iteration)
            if with_err:
                err = jnp.sum((u1n - u1) ** 2 + (u2n - u2) ** 2)
            else:
                err = state[-1]
            # dual: p = (p + taut * grad(u)) / (1 + taut * |grad(u)|),
            # divides folded into one reciprocal per flow component
            g1x = _fgx(u1n)
            g1y = _fgy(u1n)
            g2x = _fgx(u2n)
            g2y = _fgy(u2n)
            r1 = pl.reciprocal(1.0 + taut * jnp.sqrt(g1x * g1x + g1y * g1y))
            r2 = pl.reciprocal(1.0 + taut * jnp.sqrt(g2x * g2x + g2y * g2y))
            p11n = (p11 + taut * g1x) * r1
            p12n = (p12 + taut * g1y) * r1
            p21n = (p21 + taut * g2x) * r2
            p22n = (p22 + taut * g2y) * r2
            return u1n, u2n, p11n, p12n, p21n, p22n, err

        def cond(state):
            n, u1, u2, p11, p12, p21, p22, err = state
            return jnp.logical_and(n < iterations, err > scaled_eps)

        def body(state):
            n, u1, u2, p11, p12, p21, p22, _ = state
            # run `check_every` iterations per error evaluation; only the
            # block's final iteration computes the error reduction
            s = (u1, u2, p11, p12, p21, p22, jnp.float32(0.0))
            s = jax.lax.fori_loop(
                0, check_every - 1, lambda _, st: one_iter(st, False), s
            )
            s = one_iter(s, True)
            u1, u2, p11, p12, p21, p22, err = s
            return (n + check_every, u1, u2, p11, p12, p21, p22, err)

        init = (
            jnp.int32(0),
            u1_ref[0], u2_ref[0],
            p11_ref[0], p12_ref[0], p21_ref[0], p22_ref[0],
            jnp.float32(jnp.inf),
        )
        final = jax.lax.while_loop(cond, body, init)
        _, u1, u2, p11, p12, p21, p22, _ = final
        u1_out[0] = u1
        u2_out[0] = u2
        p11_out[0] = p11
        p12_out[0] = p12
        p21_out[0] = p21
        p22_out[0] = p22

    return kernel


def _div(p1, p2):
    """Backward divergence (adjoint of forward gradient), replicating
    ops/derivatives.divergence for 2-D planes."""
    dpx = jnp.concatenate([p1[:, :1], p1[:, 1:] - p1[:, :-1]], axis=1)
    dpy = jnp.concatenate([p2[:1, :], p2[1:, :] - p2[:-1, :]], axis=0)
    return dpx + dpy


def _fgx(u):
    return jnp.concatenate([u[:, 1:] - u[:, :-1], jnp.zeros_like(u[:, :1])], axis=1)


def _fgy(u):
    return jnp.concatenate([u[1:, :] - u[:-1, :], jnp.zeros_like(u[:1, :])], axis=0)


@functools.partial(
    jax.jit,
    static_argnames=(
        "l_t", "theta", "taut", "epsilon", "iterations", "check_every"
    ),
)
def tvl1_iterate_pallas(
    I1wx: jnp.ndarray,
    I1wy: jnp.ndarray,
    rho_c: jnp.ndarray,
    grad: jnp.ndarray,
    u1: jnp.ndarray,
    u2: jnp.ndarray,
    p11: jnp.ndarray,
    p12: jnp.ndarray,
    p21: jnp.ndarray,
    p22: jnp.ndarray,
    *,
    l_t: float,
    theta: float,
    taut: float,
    epsilon: float,
    iterations: int,
    check_every: int = 4,
) -> Tuple[jnp.ndarray, ...]:
    """Run the primal-dual loop for one warp stage. All arrays (B, H, W)."""
    b, h, w = u1.shape
    scaled_eps = float(epsilon * epsilon * h * w) if epsilon > 0 else -1.0
    kernel = _make_kernel(l_t, theta, taut, scaled_eps, iterations, check_every)
    plane = jax.ShapeDtypeStruct((b, h, w), jnp.float32)
    spec = pl.BlockSpec((1, h, w), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    flops_per_iter = 40 * h * w
    return pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[spec] * 10,
        out_specs=[spec] * 6,
        out_shape=[plane] * 6,
        cost_estimate=pl.CostEstimate(
            flops=flops_per_iter * iterations,
            bytes_accessed=16 * b * h * w * 4,
            transcendentals=2 * h * w * iterations,
        ),
    )(I1wx, I1wy, rho_c, grad, u1, u2, p11, p12, p21, p22)
