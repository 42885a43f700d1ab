"""Ad-hoc profiling of the TVL1 device hot path on the real chip.

Breaks the solve down per pyramid scale and sweeps pair_batch /
check_every so kernel optimization targets the real bottleneck.
Dev tool only — not part of the test or bench surface.
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np
import scipy.ndimage as ndi

from denseflow_tpu.algorithms.tvl1 import TVL1Params, tvl1_flow, _solve_one_scale
from denseflow_tpu.ops.pyramid import build_pyramid, pyramid_shapes
from denseflow_tpu.ops.resize import resize_bilinear


def make_inputs(b, h, w, shift=2.0):
    rng = np.random.default_rng(1)
    base = ndi.gaussian_filter(rng.uniform(0, 255, (b, h + 16, w + 16)), (0, 2, 2))
    I0 = base[:, 8 : 8 + h, 8 : 8 + w].astype(np.float32)
    I1 = base[:, 8 : 8 + h, int(8 + shift) : int(8 + shift) + w].astype(np.float32)
    return jax.device_put(I0), jax.device_put(I1)


def timed(fn, *args, reps=3, inner=4):
    """Device-time per call: outputs reduced to one scalar on device so the
    tunnel D2H (which costs ~100ms for a full flow batch) stays out of the
    measurement; `inner` back-to-back dispatches amortize dispatch latency."""

    @jax.jit
    def reduced(*a):
        out = fn(*a)
        return sum(jnp.sum(x) for x in jax.tree.leaves(out))

    np.asarray(reduced(*args))  # warm/compile
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(inner):
            s = reduced(*args)
        np.asarray(s)
        best = min(best, (time.perf_counter() - t0) / inner)
    return best


def per_scale(b=16, h=256, w=341):
    p = TVL1Params()
    I0, I1 = make_inputs(b, h, w)
    shapes = pyramid_shapes(h, w, p.scale_step, p.nscales, p.min_size)
    pyr0 = build_pyramid(I0, shapes)
    pyr1 = build_pyramid(I1, shapes)
    print(f"pyramid shapes: {shapes}")

    # run the real coarse-to-fine pass, timing each scale with its real
    # incoming flow (convergence behavior depends on the init)
    inv = 1.0 / p.scale_step
    u1 = jnp.zeros((b,) + shapes[-1], jnp.float32)
    u2 = jnp.zeros_like(u1)
    total = 0.0
    for lvl in range(len(shapes) - 1, -1, -1):
        d_lvl = max(4, int(round(p.max_disp * shapes[lvl][1] / shapes[0][1])))
        step = jax.jit(
            lambda a, b_, c, d: _solve_one_scale(a, b_, c, d, p, d_lvl)
        )
        dt = timed(step, pyr0[lvl], pyr1[lvl], u1, u2)
        total += dt
        print(f"scale {lvl} {shapes[lvl]}: {dt*1e3:8.2f} ms  ({dt*1e3/b:6.2f} ms/pair)")
        u1, u2 = step(pyr0[lvl], pyr1[lvl], u1, u2)
        if lvl > 0:
            nh, nw = shapes[lvl - 1]
            u1 = resize_bilinear(u1, (nh, nw)) * inv
            u2 = resize_bilinear(u2, (nh, nw)) * inv
    print(f"sum of scales: {total*1e3:.1f} ms -> {b/total:.1f} pairs/s")

    full = jax.jit(lambda a, c: tvl1_flow(a, c, p))
    dt = timed(full, I0, I1)
    print(f"full solve:    {dt*1e3:.1f} ms -> {b/dt:.1f} pairs/s")


def batch_sweep(h=256, w=341):
    p = TVL1Params()
    for b in (8, 16, 32, 64):
        I0, I1 = make_inputs(b, h, w)
        full = jax.jit(lambda a, c: tvl1_flow(a, c, p))
        dt = timed(full, I0, I1)
        print(f"B={b:3d}: {dt*1e3:8.1f} ms -> {b/dt:7.1f} pairs/s")


if __name__ == "__main__":
    print(f"backend: {jax.default_backend()}")
    mode = sys.argv[1] if len(sys.argv) > 1 else "scale"
    if mode == "scale":
        per_scale()
    elif mode == "batch":
        batch_sweep()
