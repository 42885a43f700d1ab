"""Speed-of-light analysis of the fused TVL1 kernel (round-5 item 5).

Measures the solver at the bench geometry / pair_batch 128 with the
bench_device_only methodology (on-device checksum, best-of-N), across
configs that isolate where cycles go:

  * default            — eps early-exit active (the product config);
  * full budget        — check_every=300: every warp runs all 300
                         iterations (the reference's nominal workload);
  * warp sweep only    — iterations=1: pyramid + 5 warps, no fixed point;
  * single warp        — warps=1, full 300-iteration budget at each scale.

From (full budget, warp sweep only) the per-iteration cost falls out, and
with the kernel's ops/px/iteration count that gives achieved VPU ops/s to
set against the v5e VPU roofline. Prints a summary table; PERFORMANCE.md
records the interpretation.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def bench_cfg(tag, params, I0, I1, B, reps=3, n_rep=4):
    import jax
    import jax.numpy as jnp

    from denseflow_tpu.algorithms.tvl1 import make_tvl1_solver

    solver = make_tvl1_solver(256, 341, params)

    @jax.jit
    def checksum(a, b):
        return jnp.sum(jnp.abs(solver(a, b)))

    np.asarray(checksum(I0, I1))
    best = 0.0
    for _ in range(reps):
        t0 = time.perf_counter()
        out = None
        for _ in range(n_rep):
            out = checksum(I0, I1)
        np.asarray(out)
        dt = time.perf_counter() - t0
        best = max(best, n_rep * B / dt)
    print(f"{tag:40s} {best:8.2f} flows/s", flush=True)
    return best


def main():
    import jax
    import scipy.ndimage as ndi

    from denseflow_tpu.algorithms.tvl1 import TVL1Params
    from denseflow_tpu.ops.pyramid import pyramid_shapes
    from denseflow_tpu.utils import enable_compile_cache

    enable_compile_cache()
    B, H, W = 128, 256, 341
    rng = np.random.default_rng(1)
    base = ndi.gaussian_filter(
        rng.uniform(0, 255, (B, H + 8, W + 8)), (0, 2, 2)
    )
    I0 = jax.device_put(base[:, 4 : 4 + H, 4 : 4 + W].astype(np.uint8))
    I1 = jax.device_put(base[:, 4 : 4 + H, 6 : 6 + W].astype(np.uint8))

    p = TVL1Params()
    shapes = pyramid_shapes(H, W, p.scale_step, p.nscales, p.min_size)
    px = sum(h * w for h, w in shapes)
    print(f"pyramid {shapes}, {px} px/warp-iteration-sweep total")

    r_def = bench_cfg("default (eps exit, ce=16)", p, I0, I1, B)
    r_full = bench_cfg(
        "full budget (ce=300, no eps exit)",
        TVL1Params(check_every=300), I0, I1, B,
    )
    r_sweep = bench_cfg(
        "warp sweeps only (iterations=1)",
        TVL1Params(iterations=1), I0, I1, B,
    )
    r_w1 = bench_cfg(
        "single warp (warps=1, ce=300)",
        TVL1Params(warps=1, check_every=300), I0, I1, B,
    )

    # per-iteration cost from the full-budget vs sweep-only difference
    it_full = p.iterations * p.warps  # 1500 iteration-sweeps over pyramid
    t_full = 1.0 / r_full
    t_sweep = 1.0 / r_sweep
    t_iter = (t_full - t_sweep) / it_full  # s per iteration per pair
    ops_px = 66  # counted from kernels/tvl1_fused.one_iter (PERFORMANCE.md)
    vpu_ops = px * ops_px / max(t_iter, 1e-12)
    # v5e VPU: (8,128) lanes x 4 ALUs x ~0.94 GHz
    peak = 8 * 128 * 4 * 0.94e9
    print(f"\nper-pair full-budget wall     {t_full*1e3:7.1f} ms")
    print(f"per-pair sweeps-only wall     {t_sweep*1e3:7.1f} ms")
    print(f"=> per-iteration-sweep        {t_iter*1e6:7.2f} us "
          f"({px} px, {ops_px} ops/px)")
    print(f"achieved VPU rate             {vpu_ops/1e12:7.2f} Tops/s")
    print(f"v5e VPU roofline              {peak/1e12:7.2f} Tops/s "
          f"(8x128 lanes x 4 ALUs x 0.94 GHz)")
    print(f"fraction of roofline          {vpu_ops/peak:7.1%}")
    print(f"eps-exit speedup vs budget    {r_def/r_full:7.2f}x "
          f"(implied executed iteration fraction "
          f"{(1/r_def - t_sweep)/(1/r_full - t_sweep):.2%})")
    print(f"single-warp/full-warp ratio   {r_w1/r_full:7.2f}x")


if __name__ == "__main__":
    main()
