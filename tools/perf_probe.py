"""Probe: TVL1 param sensitivity on the real chip (pipelined dispatch —
single synchronous calls are swamped by the remote-device tunnel latency,
so each measurement queues n_rep calls and syncs once, best-of-3)."""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import time
import numpy as np
import scipy.ndimage as ndi
import jax

from denseflow_tpu.algorithms.tvl1 import TVL1Params, make_tvl1_solver
from denseflow_tpu.ops.pyramid import pyramid_shapes

H, W = 256, 341
B = 16
rng = np.random.default_rng(1)
base = ndi.gaussian_filter(rng.uniform(0, 255, (B, H + 8, W + 8)), (0, 2, 2))
I0 = jax.device_put(base[:, 4:4+H, 4:4+W].astype(np.uint8))
I1 = jax.device_put(base[:, 4:4+H, 6:6+W].astype(np.uint8))

print("pyramid shapes:", pyramid_shapes(H, W, 0.8, 5, 16))

def bench(tag, params, reps=3, n_rep=5):
    solver = make_tvl1_solver(H, W, params)
    np.asarray(solver(I0, I1))  # compile+warm
    best = 0.0
    for _ in range(reps):
        t0 = time.perf_counter()
        out = None
        for _ in range(n_rep):
            out = solver(I0, I1)
        np.asarray(out)
        dt = time.perf_counter() - t0
        best = max(best, n_rep * B / dt)
    print(f"{tag:44s} {best:8.2f} flows/s", flush=True)
    return best

import os
cfgs = os.environ.get("PROBE_SET", "a")
if cfgs == "a":
    bench("default (ce=16)", TVL1Params())
    bench("iterations=1 (warp sweep cost only)", TVL1Params(iterations=1))
    bench("warps=1 (1/5 warp sweeps)", TVL1Params(warps=1))
    bench("check_every=300 (no eps exit)", TVL1Params(check_every=300))
    bench("iterations=150", TVL1Params(iterations=150))
elif cfgs == "b":
    bench("default (ce=16)", TVL1Params())
    bench("check_every=8", TVL1Params(check_every=8))
    bench("check_every=24", TVL1Params(check_every=24))
    bench("max_disp=24", TVL1Params(max_disp=24))
    bench("scale_step=0.5 nscales=4", TVL1Params(scale_step=0.5, nscales=4))
elif cfgs == "c":
    # batch-size scaling: same per-pair work, amortized dispatch
    for bb in (8, 16, 32, 64):
        base2 = ndi.gaussian_filter(rng.uniform(0, 255, (bb, H + 8, W + 8)), (0, 2, 2))
        A = jax.device_put(base2[:, 4:4+H, 4:4+W].astype(np.uint8))
        Bm = jax.device_put(base2[:, 4:4+H, 6:6+W].astype(np.uint8))
        solver = make_tvl1_solver(H, W, TVL1Params())
        np.asarray(solver(A, Bm))
        best = 0.0
        for _ in range(3):
            t0 = time.perf_counter()
            out = None
            for _ in range(5):
                out = solver(A, Bm)
            np.asarray(out)
            best = max(best, 5 * bb / (time.perf_counter() - t0))
        print(f"pair_batch={bb:3d}  {best:8.2f} flows/s", flush=True)
    # dispatch floor: trivial solver
    p0 = TVL1Params(nscales=1, warps=1, iterations=1)
    bench("floor: nscales=1 warps=1 iters=1", p0)
elif cfgs == "d":
    # piecewise attribution of the per-pair cost
    import jax.numpy as jnp
    from denseflow_tpu.ops.pyramid import build_pyramid
    from denseflow_tpu.algorithms.tvl1 import tvl1_flow

    shapes = pyramid_shapes(H, W, 0.8, 5, 16)

    @jax.jit
    def pyr_only(a, b):
        p0 = build_pyramid(a.astype(jnp.float32), shapes)
        p1 = build_pyramid(b.astype(jnp.float32), shapes)
        return sum(x[:, 0, 0] for x in p0) + sum(x[:, 0, 0] for x in p1)

    def timeit(tag, fn, *args, n_rep=5):
        np.asarray(fn(*args))
        best = 0.0
        for _ in range(3):
            t0 = time.perf_counter()
            out = None
            for _ in range(n_rep):
                out = fn(*args)
            np.asarray(out)
            best = max(best, n_rep * B / (time.perf_counter() - t0))
        print(f"{tag:44s} {best:8.2f} flows/s  ({1000*B/best:.2f} ms/pair/...)", flush=True)
        return best

    timeit("pyramid build only (both images)", pyr_only, I0, I1)
    for k in (1, 2, 3, 4, 5):
        p = TVL1Params(nscales=k)
        f = jax.jit(lambda a, b, p=p: tvl1_flow(
            a.astype(jnp.float32), b.astype(jnp.float32), p))
        timeit(f"full solve, nscales={k}", f, I0, I1)
