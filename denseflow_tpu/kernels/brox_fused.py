"""Fused per-scale Brox-2004 Pallas kernel: warp + fixed-point + Jacobi in VMEM.

The XLA Brox path (algorithms/brox.py) is HBM-bound: its 77 outer x 10
inner x 10 Jacobi sweeps each stream ~30 (B, H, W) planes through HBM,
measuring ~6 device flows/s at 256p — ~128x slower than TVL1 on the same
chip (round-3 verdict). This kernel applies the machinery proven out by
kernels/tvl1_fused.py to the Brox level solve (reference call site
src/denseflow_gpu.cpp:303: alpha=0.197, gamma=50, scale=0.8, inner=10,
outer=77, solver=10): one frame pair per grid step with the whole level
state resident in VMEM:

* the 77-outer warping loop, each outer bicubically warping I1 and its
  gradients by the current flow via the adaptive roll-sweep resampler
  (kernels/common.py — the same sweep as the TVL1 kernel);
* the 10-step lagged-diffusivity fixed point (psi' of the COMBINED
  data+gradient residual — Brox eq. 4, matching algorithms/brox.py);
* the 10-sweep Jacobi solve for (du, dv) per fixed-point step.

HBM traffic per level drops to one load of (I0, I1, u, v) and one store of
(u, v) — the XLA path pays ~30 plane passes PER JACOBI SWEEP. VMEM: ~25
live f32 planes (_PLANES, incl. temporaries); image gradients (I0x, I0y,
I1x, I1y) are recomputed per outer and (Ixx, Ixy, Iyy) per inner from the
resident planes — 5-tap stencils are near-free on the VPU while a plane
kept live costs 384 KB at the 256x384 bench geometry.

Geometries beyond VMEM spatially tile exactly like the TVL1 kernel
(tvl1_fused.plan_tiles with this kernel's plane count), halo sized to
max_disp + cubic support.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from denseflow_tpu.kernels.common import make_plane_ops

_PSI_EPS2 = 0.001 * 0.001
_SUPPORT = 2  # cubic kernel support radius

# live f32 planes (carry + consts + temporaries), for the VMEM planner
_PLANES = 28
# longest pallas grid per call (see tvl1_fused: grid length deepens
# Mosaic's pipelining and can push near-limit working sets out of VMEM);
# Brox carries more planes than TVL1 so the cap is halved
_MAX_GRID_BATCH = 16

# 5-point derivative stencil (4th-order central differences), the same
# taps as algorithms/brox._D5
_D5 = [1.0 / 12.0, -8.0 / 12.0, 0.0, 8.0 / 12.0, -1.0 / 12.0]


def _make_kernel(h: int, w: int, hp: int, wp: int, alpha: float, gamma: float,
                 inner_iterations: int, outer_iterations: int,
                 solver_iterations: int, max_disp: float, stop_eps: float,
                 inner_stop: bool, interpret: bool):
    ops = make_plane_ops(h, w, hp, wp, interpret)

    def dx(p):
        return ops.conv_taps(p, _D5, 1, 2)

    def dy(p):
        return ops.conv_taps(p, _D5, 0, 2)

    def psi_deriv(s2):
        # 1 / (2 sqrt(s^2 + eps^2)); the 2 is absorbed (scales data and
        # smoothness identically) — matches algorithms/brox._psi_deriv
        return jax.lax.rsqrt(s2 + _PSI_EPS2)

    def kernel(I0_ref, I1_ref, u_ref, v_ref, u_out, v_out):
        # scalars/masks built inside the kernel body (captured traced
        # constants are rejected by pallas_call)
        a = jnp.float32(alpha)
        g = jnp.float32(gamma)
        real = ops.real()
        I0 = I0_ref[0]
        I1 = I1_ref[0]
        # flow pinned to 0 outside the real image so the padded band never
        # couples back through shifts (shift() also patches real borders)
        u0 = jnp.where(real, u_ref[0], 0.0)
        v0 = jnp.where(real, v_ref[0], 0.0)

        # RMS-update convergence stop (mirrors algorithms/brox.py): the
        # kernel is per-pair, so the stop is naturally per-pair and
        # results are invariant to batch/chunk grouping
        stop = (
            jnp.float32(stop_eps * stop_eps * h * w)
            if stop_eps > 0
            else jnp.float32(-1.0)
        )

        def outer_body(state):
            _, _, u, v = state
            I1x = dx(I1)
            I1y = dy(I1)
            t1, t1x, t1y = ops.resample((I1, I1x, I1y), v, 0, max_disp, "cubic")
            I1w, Ix, Iy = ops.resample((t1, t1x, t1y), u, 1, max_disp, "cubic")
            Iz = I1w - I0

            def inner_body(state):
                _, _, du, dv = state
                du0, dv0 = du, dv
                # derivatives of the warped gradients and the gradient
                # residuals: constant within the outer step; recomputed
                # per inner — a D5 stencil costs ~8 VPU ops/px while a
                # plane kept live costs 384 KB at the bench geometry (the
                # kernel sits ~100 KB from the 16 MB scoped-VMEM limit)
                Ixx = dx(Ix)
                Ixy = dy(Ix)
                Iyy = dy(Iy)
                Ixz = Ix - dx(I0)
                Iyz = Iy - dy(I0)
                r_data = Iz + Ix * du + Iy * dv
                r_gx = Ixz + Ixx * du + Ixy * dv
                r_gy = Iyz + Ixy * du + Iyy * dv
                psi_d = psi_deriv(
                    r_data * r_data + g * (r_gx * r_gx + r_gy * r_gy)
                )

                U = u + du
                V = v + dv
                Ux, Uy = dx(U), dy(U)
                Vx, Vy = dx(V), dy(V)
                psi_s = psi_deriv(Ux * Ux + Uy * Uy + Vx * Vx + Vy * Vy)

                wE = 0.5 * (psi_s + ops.shift(psi_s, 1, 1))
                wW = 0.5 * (psi_s + ops.shift(psi_s, -1, 1))
                wS = 0.5 * (psi_s + ops.shift(psi_s, 1, 0))
                wN = 0.5 * (psi_s + ops.shift(psi_s, -1, 0))
                wsum = wE + wW + wS + wN

                a11 = psi_d * (Ix * Ix + g * (Ixx * Ixx + Ixy * Ixy))
                a12 = psi_d * (Ix * Iy + g * (Ixx * Ixy + Ixy * Iyy))
                a22 = psi_d * (Iy * Iy + g * (Ixy * Ixy + Iyy * Iyy))
                b1 = -psi_d * (Iz * Ix + g * (Ixz * Ixx + Iyz * Ixy))
                b2 = -psi_d * (Iz * Iy + g * (Ixz * Ixy + Iyz * Iyy))

                denom_u = a11 + a * wsum
                denom_v = a22 + a * wsum
                ru = 1.0 / denom_u if interpret else pl.reciprocal(denom_u)
                rv = 1.0 / denom_v if interpret else pl.reciprocal(denom_v)

                # NOTE (round 5): hoisting the jacobi-constant u/v part of
                # the laplacian (lap(U) = lap_c + sum w*shift(du)) was
                # tried and REVERTED: it measured 2.5% SLOWER on chip (+2
                # live planes in a kernel ~100 KB from the scoped-VMEM
                # limit) and made interpret-mode results batch-shape-
                # dependent, breaking the slab byte-identity contract.
                def jacobi_body(_, duv2):
                    du, dv = duv2
                    U = u + du
                    V = v + dv
                    lap_u = (
                        wE * ops.shift(U, 1, 1)
                        + wW * ops.shift(U, -1, 1)
                        + wS * ops.shift(U, 1, 0)
                        + wN * ops.shift(U, -1, 0)
                        - wsum * u
                    )
                    lap_v = (
                        wE * ops.shift(V, 1, 1)
                        + wW * ops.shift(V, -1, 1)
                        + wS * ops.shift(V, 1, 0)
                        + wN * ops.shift(V, -1, 0)
                        - wsum * v
                    )
                    du_new = (b1 - a12 * dv + a * lap_u) * ru
                    dv_new = (b2 - a12 * du_new + a * lap_v) * rv
                    return du_new, dv_new

                du, dv = jax.lax.fori_loop(
                    0, solver_iterations, jacobi_body, (du, dv)
                )
                # inner fixed-point stop: a step whose increment change
                # fell below the RMS threshold has converged this outer's
                # linearization (mirrors algorithms/brox.py)
                if not inner_stop:
                    return state[0] + 1, jnp.bool_(False), du, dv
                err_i = jnp.sum(
                    jnp.where(
                        real, (du - du0) ** 2 + (dv - dv0) ** 2, 0.0
                    )
                )
                return (
                    state[0] + 1,
                    jnp.logical_and(stop >= 0.0, err_i <= stop * 0.0625),
                    du,
                    dv,
                )

            def inner_cond(state):
                j, done = state[0], state[1]
                return jnp.logical_and(
                    j < inner_iterations, jnp.logical_not(done)
                )

            z = jnp.zeros((hp, wp), jnp.float32)
            fin = jax.lax.while_loop(
                inner_cond, inner_body, (jnp.int32(0), jnp.bool_(False), z, z)
            )
            du, dv = fin[2], fin[3]
            # padded-band du/dv is junk math on zero inputs — mask it out
            # of the convergence reduction
            err = jnp.sum(jnp.where(real, du * du + dv * dv, 0.0))
            # pin the increment off-image (matches the XLA path where u, v
            # simply have no padded band)
            return (
                state[0] + 1,
                jnp.logical_and(stop >= 0.0, err <= stop),
                jnp.where(real, u + du, 0.0),
                jnp.where(real, v + dv, 0.0),
            )

        def outer_cond(state):
            n, done = state[0], state[1]
            return jnp.logical_and(n < outer_iterations, jnp.logical_not(done))

        final = jax.lax.while_loop(
            outer_cond, outer_body, (jnp.int32(0), jnp.bool_(False), u0, v0)
        )
        u_out[0] = final[2]
        v_out[0] = final[3]

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=(
        "alpha", "gamma", "inner_iterations", "outer_iterations",
        "solver_iterations", "max_disp", "stop_eps", "inner_stop",
        "interpret",
    ),
)
def brox_scale_fused(
    I0: jnp.ndarray,
    I1: jnp.ndarray,
    u: jnp.ndarray,
    v: jnp.ndarray,
    *,
    alpha: float,
    gamma: float,
    inner_iterations: int,
    outer_iterations: int,
    solver_iterations: int,
    max_disp: float,
    stop_eps: float = 0.0,
    inner_stop: bool = True,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Run up to outer x inner x solver iterations of one pyramid level.
    Arrays (B, H, W) float32 (images in [0,1]); returns the updated flow.
    stop_eps > 0 enables the per-pair RMS-update outer stop (see
    BroxParams.stop_eps); 0 runs the full budget."""
    b, h, w = u.shape
    if b > _MAX_GRID_BATCH:
        # slab the batch through lax.map (NOT unrolled sub-calls: XLA
        # co-schedules independent custom-calls and sums their scoped VMEM
        # — see tvl1_fused and the round-3 notes). Per-pair kernel, so
        # slabbing is byte-identical.
        k = _MAX_GRID_BATCH
        pad = (-b) % k
        args = (I0, I1, u, v)
        if pad:
            args = tuple(
                jnp.concatenate([x, jnp.repeat(x[-1:], pad, axis=0)])
                for x in args
            )
        stacked = tuple(
            x.reshape(-1, k, x.shape[-2], x.shape[-1]) for x in args
        )

        def one_slab(xs):
            return brox_scale_fused(
                *xs,
                alpha=alpha, gamma=gamma,
                inner_iterations=inner_iterations,
                outer_iterations=outer_iterations,
                solver_iterations=solver_iterations,
                max_disp=max_disp, stop_eps=stop_eps,
                inner_stop=inner_stop, interpret=interpret,
            )

        uo, vo = jax.lax.map(one_slab, stacked)
        return uo.reshape(-1, h, w)[:b], vo.reshape(-1, h, w)[:b]

    hp = ((h + 7) // 8) * 8
    wp = ((w + 127) // 128) * 128
    if (hp, wp) != (h, w):
        pad = [(0, 0), (0, hp - h), (0, wp - w)]
        I0, I1, u, v = (jnp.pad(x, pad) for x in (I0, I1, u, v))
    kernel = _make_kernel(
        h, w, hp, wp, float(alpha), float(gamma), int(inner_iterations),
        int(outer_iterations), int(solver_iterations), float(max_disp),
        float(stop_eps), bool(inner_stop), bool(interpret),
    )
    plane = jax.ShapeDtypeStruct((b, hp, wp), jnp.float32)
    spec = pl.BlockSpec((1, hp, wp), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    # ~55 VPU ops/px/Jacobi sweep + ~150/fixed-point step + the warp sweep
    iters = outer_iterations * inner_iterations
    flops_per_px = iters * (solver_iterations * 55 + 150)
    u_o, v_o = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[spec] * 4,
        out_specs=[spec] * 2,
        out_shape=[plane] * 2,
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=flops_per_px * h * w,
            bytes_accessed=6 * b * h * w * 4,
            transcendentals=2 * h * w * iters,
        ),
    )(I0, I1, u, v)
    return u_o[:, :h, :w], v_o[:, :h, :w]


def brox_scale_fused_tiled(
    I0: jnp.ndarray,
    I1: jnp.ndarray,
    u: jnp.ndarray,
    v: jnp.ndarray,
    tile_budget: "int | None" = None,
    **kw,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """`brox_scale_fused` for ANY geometry: planes beyond VMEM split into
    overlapping spatial tiles folded into the batch grid (same scheme and
    seam semantics as tvl1_fused.tvl1_scale_fused_tiled; halo derived from
    max_disp + cubic support so warp taps stay in-tile by construction)."""
    import numpy as np

    from denseflow_tpu.kernels.tvl1_fused import _VMEM_BUDGET, plan_tiles

    budget = _VMEM_BUDGET if tile_budget is None else tile_budget
    b, h, w = u.shape
    halo = int(np.ceil(float(kw.get("max_disp", 40.0)))) + _SUPPORT
    plan = plan_tiles(h, w, halo=halo, budget_bytes=budget, planes=_PLANES)
    if plan is None:
        return brox_scale_fused(I0, I1, u, v, **kw)
    hs, ws, th, tw, hb, wb = plan
    arrs = (I0, I1, u, v)
    stacked = [
        jnp.concatenate(
            [x[:, ys:ys + th, xs:xs + tw] for ys in hs for xs in ws], axis=0
        )
        for x in arrs
    ]
    uo, vo = brox_scale_fused(*stacked, **kw)
    nw = len(ws)

    def stitch(t):
        rows = []
        for iy, ys in enumerate(hs):
            y0, y1 = hb[iy], hb[iy + 1]
            cols = []
            for ix, xs in enumerate(ws):
                k = iy * nw + ix
                x0, x1 = wb[ix], wb[ix + 1]
                cols.append(
                    t[k * b:(k + 1) * b, y0 - ys:y1 - ys, x0 - xs:x1 - xs]
                )
            rows.append(jnp.concatenate(cols, axis=2))
        return jnp.concatenate(rows, axis=1)

    return stitch(uo), stitch(vo)
