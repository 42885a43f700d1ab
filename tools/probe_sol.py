"""Speed-of-light analysis of the fused TVL1 kernel (round-5 item 5).

Measures the solver at the bench geometry / pair_batch 128 with the
bench_device_only methodology (on-device checksum, best-of-N), across
configs that isolate where cycles go:

  * default            — eps early-exit active (the product config);
  * full budget        — eps=0: every warp runs all 300 iterations (the
                         reference's nominal workload; eps=0 is required —
                         see the in-code note on the warp-level exit);
  * single warp        — eps=0, warps=1;
  * sweeps only        — eps=0, iterations=1 (one check_every block).

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

    # NOTE: disabling the epsilon exit requires eps=0, not just a large
    # check_every — with eps > 0 a warp whose FIRST check block converges
    # still arms the warp-level early exit and skips the remaining warps
    # (the first version of this probe missed that and reported an
    # impossible >100% of roofline).
    r_def = bench_cfg("default (eps exit)", p, I0, I1, B)
    r_full = bench_cfg(
        "TRUE full budget (eps=0, 5x300)",
        TVL1Params(epsilon=0.0, check_every=300), I0, I1, B,
    )
    r_w1 = bench_cfg(
        "single warp (eps=0, 1x300)",
        TVL1Params(epsilon=0.0, warps=1, check_every=300), I0, I1, B,
    )
    ce_blk = TVL1Params().check_every  # iterations=1 runs ONE ce block
    r_sweep = bench_cfg(
        f"sweeps only (eps=0, iterations=1->{ce_blk})",
        TVL1Params(epsilon=0.0, iterations=1), I0, I1, B,
    )

    # model t = C + W*(S + I*t_it); iterations=1 still runs one ce-block
    # (check_every iterations: the while body advances in ce-sized steps)
    t_full, t_w1, t_sweep = 1.0 / r_full, 1.0 / r_w1, 1.0 / r_sweep
    w_, it_ = p.warps, p.iterations
    s_plus = (t_full - t_w1) / (w_ - 1)          # S + 300*t_it
    c_fix = t_w1 - s_plus                         # C
    # sweeps row: C + W*(S + ce_blk*t_it) = t_sweep
    t_it = (w_ * s_plus - (t_sweep - c_fix)) / (w_ * (it_ - ce_blk))
    s_warp = s_plus - it_ * t_it
    ops_px = 66  # counted from kernels/tvl1_fused.one_iter (PERFORMANCE.md)
    vpu_ops = px * ops_px / max(t_it, 1e-12)
    # v5e VPU: (8,128) lanes x 4 ALUs x ~0.94 GHz
    peak = 8 * 128 * 4 * 0.94e9
    print(f"\nmodel: C {c_fix*1e3:.2f} ms  S {s_warp*1e3:.3f} ms/warp  "
          f"t_it {t_it*1e6:.2f} us/iteration-sweep ({px} px)")
    print(f"achieved VPU rate             {vpu_ops/1e12:7.2f} Tops/s "
          f"({ops_px} essential ops/px)")
    print(f"v5e VPU roofline              {peak/1e12:7.2f} Tops/s "
          f"(8x128 lanes x 4 ALUs x 0.94 GHz)")
    print(f"fraction of roofline          {vpu_ops/peak:7.1%}")
    print(f"eps-exit speedup vs budget    {r_def/r_full:7.2f}x")


if __name__ == "__main__":
    main()
