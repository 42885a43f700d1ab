"""Fused per-scale TVL1 Pallas kernel: warp sweep + primal-dual loop in VMEM.

Profiling the XLA path on a v5e chip showed the bicubic masked-shift warp —
not the 300-iteration primal-dual loop — dominating runtime: every shift in
the sweep reads and writes the (3, B, H, W) image stack through HBM. This
kernel runs one frame pair per grid step with EVERYTHING resident in VMEM:

* the 5-warp outer loop (reference: OpenCV CUDA TVL1 warps I1 and its
  gradients bicubically per warp, invoked at reference
  src/denseflow_gpu.cpp:327),
* the bicubic warp itself as a sweep of dynamic `pltpu.roll` shifts whose
  range adapts to the min/max displacement actually present in the flow
  (circular wrap corrected to replicate-clamp with border masks),
* the ~300-iteration thresholding + dual-ascent fixed point with a
  per-pair epsilon early exit (checked every `check_every` iterations).

HBM traffic per scale drops to one load of (I0, I1, I1x, I1y, u1, u2) and
one store of (u1, u2) — about 24 plane-passes less than the XLA path pays
PER ITERATION. The kernel is VPU-bound.

VMEM budget: ~20 live f32 planes (`_PLANES`); at the 256x341 bench geometry
(padded to 256x384) that is ~7.9 MB of the ~16 MB/core, and the planner
sizes tiles against a 14 MB budget so the estimate has a ~2 MB safety
margin. Geometries whose working set exceeds VMEM do NOT fall back to XLA:
`tvl1_scale_fused_tiled` splits the plane into overlapping spatial tiles
(halo sized to the warp clamp: max_disp + cubic support, discarded at
interior seams), folds the tiles into the batch grid, and stitches the
retained cores — so 360p/480p/1080p keep the VMEM-resident path at the cost
of redundant compute in the halo bands (measured ~1.2-1.6x pixels at
360-480p). Seam fidelity: a core pixel sits >= halo px from its tile edge,
so its warp taps stay inside the tile BY CONSTRUCTION (halo >= max_disp +
_SUPPORT); the TV term's influence and the per-tile epsilon stop / warp
early-exit are not strictly bounded by the halo, so seams carry
sub-epsilon differences (measured ~1e-1 px worst-case on low-texture
content where TV fill-in is strongest — tests/test_tiling.py pins this).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_GRAD_EPS = 1.1920929e-07  # numeric_limits<float>::epsilon(), OpenCV's guard
_SUPPORT = 2  # cubic kernel support radius


def _cubic_kernel(x: jnp.ndarray) -> jnp.ndarray:
    """Cubic-convolution kernel, a=-0.75 (OpenCV INTER_CUBIC), support (-2,2)."""
    a = -0.75
    ax = jnp.abs(x)
    ax2 = ax * ax
    ax3 = ax2 * ax
    inner = (a + 2.0) * ax3 - (a + 3.0) * ax2 + 1.0
    outer = a * (ax3 - 5.0 * ax2 + 8.0 * ax - 4.0)
    return jnp.where(ax < 1.0, inner, jnp.where(ax < 2.0, outer, 0.0))


_PLANES = 20  # live f32 planes in the kernel (conservative estimate)
# longest pallas grid per call: longer grids deepen Mosaic's pipelining
# and can push near-limit plane sizes out of VMEM (see tvl1_scale_fused)
_MAX_GRID_BATCH = 32
# planner budget: ~2 MB below the 16 MB/core VMEM so a modest error in the
# _PLANES estimate cannot push a planned tile past Mosaic's allocator
_VMEM_BUDGET = 14 * 1024 * 1024
# default px discarded at interior tile seams; tvl1_scale_fused_tiled
# derives the actual halo from its max_disp so warp-tap containment holds
# by construction (see module doc)
TILE_HALO = 40 + _SUPPORT


# Empirical per-plane ceiling: the largest padded plane the fused kernels
# are VALIDATED to hold at full grid depth on real hardware (the 256x384
# bench geometry). The planes x plane_bytes model alone under-estimates
# Mosaic's true stack usage — measured: 240x512 (0.49 MB planes, 20-plane
# model says 9.8 MB) OOMs the 16 MB scoped limit at 16.84 MB, while
# 256x384 (0.375 MB) fits. Planes beyond this ceiling take the tiled path.
_MAX_PLANE_PX = 256 * 384


def fits_vmem(
    h: int, w: int, budget_bytes: int = _VMEM_BUDGET, planes: int = _PLANES
) -> bool:
    """Can a fused kernel with `planes` live f32 planes hold one pair's
    working set in VMEM? (planes defaults to the TVL1 kernel's count; the
    Brox kernel passes its own.)"""
    w_pad = ((w + 127) // 128) * 128
    h_pad = ((h + 7) // 8) * 8
    return (
        planes * h_pad * w_pad * 4 <= budget_bytes
        and h_pad * w_pad <= _MAX_PLANE_PX
    )


def _axis_starts(n: int, tile: int, halo: int) -> list:
    """Start offsets of overlapping `tile`-sized windows covering [0, n).

    Consecutive windows overlap by >= 2*halo so every retained core pixel
    is >= halo px from its window's interior edges."""
    if tile >= n:
        return [0]
    step = tile - 2 * halo
    starts = list(range(0, n - tile, step))
    starts.append(n - tile)
    return starts


def plan_tiles(h: int, w: int, halo: int = TILE_HALO,
               budget_bytes: int = _VMEM_BUDGET, planes: int = _PLANES):
    """Choose a spatial tiling whose per-tile working set fits VMEM.

    Returns None when (h, w) fits untiled, else
    (h_starts, w_starts, th, tw, h_bounds, w_bounds): tile start offsets,
    tile dims (real pixels; split dims are 8/128-aligned so the kernel pads
    nothing), and the core boundaries used for stitching. Prefers splitting
    H only (cheap sublane alignment, no extra lane padding); minimizes total
    tile area (redundant halo compute)."""
    if fits_vmem(h, w, budget_bytes, planes):
        return None
    hp = -(-h // 8) * 8
    wp = -(-w // 128) * 128
    best = None
    tw = wp
    while tw >= 128:
        th_max = (
            min(budget_bytes // (planes * 4 * tw), _MAX_PLANE_PX // tw)
            // 8 * 8
        )
        th = min(hp, th_max)
        ok_h = th >= hp or th > 2 * halo + 8
        ok_w = tw >= wp or tw > 2 * halo + 8
        if th >= 8 and ok_h and ok_w:
            th_r = h if th >= hp else th
            tw_r = w if tw >= wp else tw
            hs = _axis_starts(h, th_r, halo)
            ws = _axis_starts(w, tw_r, halo)
            area = len(hs) * len(ws) * th * tw
            if best is None or area < best[0]:
                hb = [0] + [s + halo for s in hs[1:]] + [h]
                wb = [0] + [s + halo for s in ws[1:]] + [w]
                best = (area, (hs, ws, th_r, tw_r, hb, wb))
        tw -= 128
    if best is None:
        raise ValueError(
            f"no VMEM tiling for {h}x{w} (halo={halo}); raise the budget"
        )
    return best[1]


def _make_kernel(h: int, w: int, hp: int, wp: int, l_t: float, theta: float,
                 taut: float, scaled_eps: float, iterations: int, warps: int,
                 max_disp: float, check_every: int, interpret: bool):
    """Kernel over (hp, wp) planes padded up from the real (h, w) image.

    Mosaic's `tpu.dynamic_rotate` requires (8, 128)-aligned vector shapes,
    so planes are padded and a real-region mask keeps every update
    identical to the unpadded math: u (and the convergence error) are
    forced to 0 outside the real image, forward gradients are zeroed at
    the real last row/col (OpenCV's border convention), and the warp
    clamps sampling positions to the REAL image extent."""
    roll = jnp.roll if interpret else pltpu.roll
    shape = (hp, wp)

    row_i = lambda: jax.lax.broadcasted_iota(jnp.int32, shape, 0)
    col_i = lambda: jax.lax.broadcasted_iota(jnp.int32, shape, 1)

    def resample3(pa, pb, pc, disp, axis):
        """1-D cubic resample of three planes along `axis` at per-pixel
        displacement `disp`, as a sweep of whole-plane rolls. Displacement
        clamped to ±max_disp and positions clamped into the real image
        (replicate borders), matching ops/warp._resample_axis."""
        n = h if axis == 0 else w
        coords = (row_i() if axis == 0 else col_i()).astype(jnp.float32)
        in_real = coords < float(n)
        d = jnp.clip(disp, -max_disp, max_disp)
        pos = jnp.clip(coords + d, 0.0, float(n - 1))
        # padded pixels would clamp far back into the image and blow the
        # sweep range open — pin their displacement to 0
        d = jnp.where(in_real, pos - coords, 0.0)

        k_lo = jnp.floor(jnp.min(d)).astype(jnp.int32) - _SUPPORT + 1
        k_hi = jnp.ceil(jnp.max(d)).astype(jnp.int32) + _SUPPORT

        if axis == 0:
            ea_lo = jnp.broadcast_to(pa[:1, :], shape)
            eb_lo = jnp.broadcast_to(pb[:1, :], shape)
            ec_lo = jnp.broadcast_to(pc[:1, :], shape)
            ea_hi = jnp.broadcast_to(pa[h - 1:h, :], shape)
            eb_hi = jnp.broadcast_to(pb[h - 1:h, :], shape)
            ec_hi = jnp.broadcast_to(pc[h - 1:h, :], shape)
        else:
            ea_lo = jnp.broadcast_to(pa[:, :1], shape)
            eb_lo = jnp.broadcast_to(pb[:, :1], shape)
            ec_lo = jnp.broadcast_to(pc[:, :1], shape)
            ea_hi = jnp.broadcast_to(pa[:, w - 1:w], shape)
            eb_hi = jnp.broadcast_to(pb[:, w - 1:w], shape)
            ec_hi = jnp.broadcast_to(pc[:, w - 1:w], shape)

        def body(k, outs):
            oa, ob, oc = outs
            kf = k.astype(jnp.float32)
            c = _cubic_kernel(d - kf)
            # tap index t = coord + k; roll wraps, so patch the
            # out-of-image bands with the replicated edge values
            t = coords + kf
            lo_band = t < 0.0
            hi_band = t > float(n - 1)

            def tap(p, e_lo, e_hi):
                # (-k) % extent, NEVER a possibly-negative traced shift:
                # pltpu.roll miscompiles negative traced shifts on planes
                # spanning more than one tile along the axis (hardware-
                # verified round 4; zero-weight taps masked it on
                # negative-displacement content)
                s = roll(p, (-k) % (hp if axis == 0 else wp), axis)
                return jnp.where(lo_band, e_lo, jnp.where(hi_band, e_hi, s))

            oa = oa + c * tap(pa, ea_lo, ea_hi)
            ob = ob + c * tap(pb, eb_lo, eb_hi)
            oc = oc + c * tap(pc, ec_lo, ec_hi)
            return oa, ob, oc

        z = jnp.zeros(shape, jnp.float32)
        return jax.lax.fori_loop(k_lo, k_hi + 1, body, (z, z, z))

    def kernel(I0_ref, I1_ref, I1x_ref, I1y_ref, u1_ref, u2_ref,
               u1_out, u2_out):
        I0 = I0_ref[0]
        I1 = I1_ref[0]
        I1x = I1x_ref[0]
        I1y = I1y_ref[0]
        real = jnp.logical_and(row_i() < h, col_i() < w)
        gx_ok = col_i() < w - 1
        gy_ok = row_i() < h - 1

        def one_iter(state, with_err: bool, consts):
            # only 4 planes carried across the iteration loop; fi / nfi /
            # the residual reciprocal / the gradient guard are
            # WARP-CONSTANT and hoisted into warp_body (round-5 SOL pass:
            # XLA does no loop-invariant motion through lax.while_loop, so
            # inline they cost ~5 of the iteration's ~70 VPU slots; the 4
            # extra live planes stay well inside the VMEM budget)
            I1wx, I1wy, rho_c, fi, nfi, rg_masked = consts
            u1, u2, p11, p12, p21, p22, _ = state
            rho = rho_c + I1wx * u1 + I1wy * u2
            mul = jnp.where(
                rho < nfi,
                l_t,
                jnp.where(rho > fi, -l_t, -rho * rg_masked),
            )
            v1 = u1 + mul * I1wx
            v2 = u2 + mul * I1wy
            # primal: u = v + theta * div(p); pinned to 0 off-image so the
            # padded band never couples back into real pixels
            u1n = jnp.where(real, v1 + theta * _div(p11, p12), 0.0)
            u2n = jnp.where(real, v2 + theta * _div(p21, p22), 0.0)
            if with_err:
                err = jnp.sum((u1n - u1) ** 2 + (u2n - u2) ** 2)
            else:
                err = state[-1]
            # dual: p = (p + taut * grad(u)) / (1 + taut * |grad(u)|);
            # forward gradient is zero at the REAL last row/col
            g1x = jnp.where(gx_ok, _fgx(u1n), 0.0)
            g1y = jnp.where(gy_ok, _fgy(u1n), 0.0)
            g2x = jnp.where(gx_ok, _fgx(u2n), 0.0)
            g2y = jnp.where(gy_ok, _fgy(u2n), 0.0)
            n1 = 1.0 + taut * jnp.sqrt(g1x * g1x + g1y * g1y)
            n2 = 1.0 + taut * jnp.sqrt(g2x * g2x + g2y * g2y)
            r1 = 1.0 / n1 if interpret else pl.reciprocal(n1)
            r2 = 1.0 / n2 if interpret else pl.reciprocal(n2)
            p11n = (p11 + taut * g1x) * r1
            p12n = (p12 + taut * g1y) * r1
            p21n = (p21 + taut * g2x) * r2
            p22n = (p22 + taut * g2y) * r2
            return u1n, u2n, p11n, p12n, p21n, p22n, err

        def warp_body(carry):
            u1, u2, p11, p12, p21, p22 = carry
            t1, t1x, t1y = resample3(I1, I1x, I1y, u2, 0)
            I1w, I1wx, I1wy = resample3(t1, t1x, t1y, u1, 1)
            grad = I1wx * I1wx + I1wy * I1wy
            rho_c = I1w - I1wx * u1 - I1wy * u2 - I0
            fi = l_t * grad
            g = jnp.maximum(grad, _GRAD_EPS)
            rg = (1.0 / g) if interpret else pl.reciprocal(g)
            # fold the grad > eps guard into the reciprocal plane: where
            # the gradient is ~0 the thresholding step contributes 0
            rg_masked = jnp.where(grad > _GRAD_EPS, rg, 0.0)
            consts = (I1wx, I1wy, rho_c, fi, -fi, rg_masked)

            def cond(state):
                n = state[0]
                err = state[-1]
                return jnp.logical_and(n < iterations, err > scaled_eps)

            def body(state):
                n = state[0]
                s = state[1:-1] + (jnp.float32(0.0),)
                s = jax.lax.fori_loop(
                    0, check_every - 1, lambda _, st: one_iter(st, False, consts), s
                )
                s = one_iter(s, True, consts)
                return (n + check_every,) + s

            init = (jnp.int32(0), u1, u2, p11, p12, p21, p22,
                    jnp.float32(jnp.inf))
            final = jax.lax.while_loop(cond, body, init)
            # warp-level early exit: the loop stopping at its FIRST epsilon
            # check means this warp left u (nearly) unchanged — u is a fixed
            # point of the warp+iterate map, so the remaining warps would
            # no-op within the same epsilon ball the reference's per-warp
            # iteration stop already accepts. Skipping them only drops
            # sub-epsilon updates but saves their full warp sweeps.
            converged = jnp.logical_and(
                final[0] <= check_every, final[-1] <= scaled_eps
            )
            return final[1:-1], converged

        z = jnp.zeros(shape, jnp.float32)
        carry = (jnp.where(real, u1_ref[0], 0.0),
                 jnp.where(real, u2_ref[0], 0.0), z, z, z, z)

        def wcond(state):
            wi, done = state[0], state[1]
            return jnp.logical_and(wi < warps, jnp.logical_not(done))

        def wbody(state):
            wi, _, carry = state[0], state[1], state[2:]
            carry, converged = warp_body(carry)
            return (wi + 1, converged) + carry

        final = jax.lax.while_loop(
            wcond, wbody, (jnp.int32(0), jnp.bool_(False)) + carry
        )
        u1_out[0] = final[2]
        u2_out[0] = final[3]

    return kernel


def _div(p1, p2):
    """Backward divergence (adjoint of forward gradient) on 2-D planes."""
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
        "l_t", "theta", "taut", "epsilon", "iterations", "warps",
        "max_disp", "check_every", "interpret",
    ),
)
def tvl1_scale_fused(
    I0: jnp.ndarray,
    I1: jnp.ndarray,
    I1x: jnp.ndarray,
    I1y: jnp.ndarray,
    u1: jnp.ndarray,
    u2: jnp.ndarray,
    *,
    l_t: float,
    theta: float,
    taut: float,
    epsilon: float,
    iterations: int,
    warps: int,
    max_disp: float,
    check_every: int = 4,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Run all warps x iterations of one pyramid scale. Arrays (B, H, W)."""
    b, h, w = u1.shape
    # Long grids OOM scoped VMEM at near-limit plane sizes (observed:
    # b=64 at 256x384 needs 16.6M vs the 16M limit, b<=32 fits) — and
    # unrolled sub-calls fail the same way because XLA co-schedules the
    # independent custom-calls and SUMS their scoped allocations. lax.map
    # serializes by construction, so each sub-slab's pallas_call owns the
    # scoped region alone. The kernel is per-pair: byte-identical.
    if b > _MAX_GRID_BATCH:
        k = _MAX_GRID_BATCH
        pad = (-b) % k
        args = (I0, I1, I1x, I1y, u1, u2)
        if pad:
            args = tuple(
                jnp.concatenate([a, jnp.repeat(a[-1:], pad, axis=0)])
                for a in args
            )
        stacked = tuple(
            a.reshape(-1, k, a.shape[-2], a.shape[-1]) for a in args
        )

        def one_slab(xs):
            return tvl1_scale_fused(
                *xs,
                l_t=l_t, theta=theta, taut=taut, epsilon=epsilon,
                iterations=iterations, warps=warps, max_disp=max_disp,
                check_every=check_every, interpret=interpret,
            )

        u1o, u2o = jax.lax.map(one_slab, stacked)
        return (
            u1o.reshape(-1, h, w)[:b],
            u2o.reshape(-1, h, w)[:b],
        )
    # Mosaic dynamic rolls need (8, 128)-aligned plane shapes; pad and
    # crop here — the kernel masks so real-region math is unchanged.
    hp = ((h + 7) // 8) * 8
    wp = ((w + 127) // 128) * 128
    if (hp, wp) != (h, w):
        pad = [(0, 0), (0, hp - h), (0, wp - w)]
        I0, I1, I1x, I1y, u1, u2 = (
            jnp.pad(a, pad) for a in (I0, I1, I1x, I1y, u1, u2)
        )
    scaled_eps = float(epsilon * epsilon * h * w) if epsilon > 0 else -1.0
    kernel = _make_kernel(
        h, w, hp, wp, float(l_t), float(theta), float(taut), scaled_eps,
        int(iterations), int(warps), float(max_disp), int(check_every),
        bool(interpret),
    )
    plane = jax.ShapeDtypeStruct((b, hp, wp), jnp.float32)
    spec = pl.BlockSpec((1, hp, wp), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    flops_per_iter = 40 * h * w
    u1o, u2o = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[spec] * 6,
        out_specs=[spec] * 2,
        out_shape=[plane] * 2,
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=flops_per_iter * iterations * warps,
            bytes_accessed=8 * b * h * w * 4,
            transcendentals=2 * h * w * iterations,
        ),
    )(I0, I1, I1x, I1y, u1, u2)
    return u1o[:, :h, :w], u2o[:, :h, :w]


def tvl1_scale_fused_tiled(
    I0: jnp.ndarray,
    I1: jnp.ndarray,
    I1x: jnp.ndarray,
    I1y: jnp.ndarray,
    u1: jnp.ndarray,
    u2: jnp.ndarray,
    tile_budget: int = _VMEM_BUDGET,
    **kw,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """`tvl1_scale_fused` for ANY geometry: planes whose working set exceeds
    VMEM are split into overlapping spatial tiles (plan_tiles), the tiles are
    folded into the batch grid (one pallas_call, one compile), and the
    retained cores are stitched back. Each tile is solved as its own
    subproblem — border conventions apply at tile edges, which is wrong at
    interior seams but confined to the discarded halo band; the per-tile
    epsilon stop uses the tile area. Shapes static, so the tiling resolves
    entirely at trace time.

    The halo is derived from this call's max_disp (+ the cubic tap
    support), so a core pixel's warp taps are contained in its tile by
    construction even at the clamp."""
    import numpy as np

    b, h, w = u1.shape
    halo = int(np.ceil(float(kw.get("max_disp", TILE_HALO - _SUPPORT)))) + _SUPPORT
    plan = plan_tiles(h, w, halo=halo, budget_bytes=tile_budget)
    if plan is None:
        return tvl1_scale_fused(I0, I1, I1x, I1y, u1, u2, **kw)
    hs, ws, th, tw, hb, wb = plan
    arrs = (I0, I1, I1x, I1y, u1, u2)
    stacked = [
        jnp.concatenate(
            [a[:, ys:ys + th, xs:xs + tw] for ys in hs for xs in ws], axis=0
        )
        for a in arrs
    ]
    u1o, u2o = tvl1_scale_fused(*stacked, **kw)
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

    return stitch(u1o), stitch(u2o)
