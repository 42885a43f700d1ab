"""Golden fidelity ON REAL HARDWARE through the fused Pallas kernels.

The CI suite runs the goldens against the XLA oracle (CPU) and the fused
kernels through the Pallas interpreter — neither executes Mosaic's actual
hardware lowering. This harness runs the gate on the attached chip and
applies the 0.5 px EPE bar (BASELINE.json) across EVERY distinct hardware
code path (round-5 verdict items 2 + 8):

  A. the 12 checked-in synthetic warps at 96x128 (untiled, single slab);
  B. geometry sweep: the bench geometry 256x341 (untiled) and 360p
     360x480 (the spatially TILED kernels) for all three algorithms;
  C. multi-slab: pair_batch > 32 takes the lax.map slab path;
  D. width bucketing: executor-style edge-replicated width padding
     (solve at 256x384, crop to 341);
  E. tiled-vs-untiled seam drift on chip, against the documented ~1e-1 px
     contract (kernels/tvl1_fused.py module doc; CI pins it in interpret
     mode only);
  F. real content: decoded bench-video MJPG pairs vs the independent
     NumPy oracle (tests/golden/real_*.npz, tools/make_goldens.py).

It exists because round 4 caught a silent hardware-only miscompile this
way: pltpu.roll with a traced NEGATIVE shift is wrong on planes spanning
more than one tile along the rolled axis — a failure class that is
interpreter-green and appears only at multi-tile plane shapes, i.e.
exactly the geometries sections B-E cover. Run after any kernel change:

    python tools/device_goldens.py            # full gate
    python tools/device_goldens.py A B        # just those sections
"""

import glob
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

GATE = 0.5  # px, BASELINE.json north-star
ALGS = ("tvl1", "farn", "brox")

failed = []


def _check(alg, name, epe, gate=GATE):
    ok = epe < gate
    if not ok:
        failed.append((alg, name, epe))
    print(f"{alg:5s} {name:26s} EPE {epe:6.3f}  {'ok' if ok else 'FAIL'}",
          flush=True)


def _synth_pair(h, w, seed=5, dx=1.7, dy=-0.8):
    """Translated textured pair with analytic gt, any geometry."""
    from scipy import ndimage

    rng = np.random.default_rng(seed)
    m = 8
    big = ndimage.gaussian_filter(
        rng.uniform(0, 255, (h + 2 * m, w + 2 * m)), 1.8
    )
    big = (big - big.min()) / (big.max() - big.min()) * 235 + 10
    ys, xs = np.mgrid[0:h, 0:w].astype(np.float64)
    I0 = big[m : m + h, m : m + w]
    I1 = ndimage.map_coordinates(
        big, [ys - dy + m, xs - dx + m], order=3, mode="nearest"
    )
    gt = np.stack(
        [np.full((h, w), dx), np.full((h, w), dy)], axis=-1
    ).astype(np.float32)
    return (
        np.clip(I0, 0, 255).astype(np.uint8),
        np.clip(I1, 0, 255).astype(np.uint8),
        gt,
    )


def section_a():
    """Checked-in synthetic warps, 96x128 untiled."""
    from denseflow_tpu.algorithms import make_solver

    cases = sorted(glob.glob("tests/golden/tvl1_*.npz"))
    assert cases, "run from the repo root"
    solvers = {a: make_solver(a, 96, 128, None, 0) for a in ALGS}
    for f in cases:
        d = np.load(f)
        I0, I1, gt = d["I0"], d["I1"], d["gt"]
        name = os.path.basename(f)[5:-4]
        for alg, s in solvers.items():
            flow = np.asarray(s(I0[None], I1[None]))[0]
            _check(alg, name, float(np.linalg.norm(flow - gt, axis=-1).mean()))


def section_b():
    """Bench geometry (untiled) + 360p (tiled kernels), all algorithms."""
    from denseflow_tpu.algorithms import make_solver
    from denseflow_tpu.kernels.tvl1_fused import plan_tiles

    for h, w, tag in ((256, 341, "bench-256x341"), (360, 480, "tiled-360p")):
        if tag.startswith("tiled"):
            assert plan_tiles(h, w) is not None, "geometry must tile"
        I0, I1, gt = _synth_pair(h, w)
        for alg in ALGS:
            s = make_solver(alg, h, w, None, 0)
            flow = np.asarray(s(I0[None], I1[None]))[0]
            _check(alg, tag, float(np.linalg.norm(flow - gt, axis=-1).mean()))


def section_c():
    """Multi-slab: 40 pairs > _MAX_GRID_BATCH exercises lax.map slabbing.
    Gate the WORST pair so a single corrupted slab cannot hide."""
    from denseflow_tpu.algorithms import make_solver

    b, h, w = 40, 96, 128
    I0s, I1s, gts = [], [], []
    for i in range(b):
        dx, dy = 1.2 + 0.02 * i, -0.6 - 0.01 * i
        I0, I1, gt = _synth_pair(h, w, seed=10 + i, dx=dx, dy=dy)
        I0s.append(I0)
        I1s.append(I1)
        gts.append(gt)
    I0s, I1s, gts = np.stack(I0s), np.stack(I1s), np.stack(gts)
    for alg in ALGS:
        s = make_solver(alg, h, w, None, 0)
        flow = np.asarray(s(I0s, I1s))
        per_pair = np.linalg.norm(flow - gts, axis=-1).mean(axis=(1, 2))
        _check(alg, f"multi-slab-b{b} (worst pair)", float(per_pair.max()))


def section_d():
    """Width bucketing: edge-replicate 341 -> 384 (executor.upload_chunk),
    solve at the padded width, crop — real-region flow must stay in gate."""
    from denseflow_tpu.algorithms import make_solver

    h, w, wb = 256, 341, 384
    I0, I1, gt = _synth_pair(h, w)

    def pad(img):
        return np.concatenate(
            [img, np.repeat(img[:, -1:], wb - w, axis=1)], axis=1
        )

    for alg in ALGS:
        s = make_solver(alg, h, wb, None, 0)
        flow = np.asarray(s(pad(I0)[None], pad(I1)[None]))[0][:, :w]
        _check(alg, f"width-bucket-{w}->{wb}",
               float(np.linalg.norm(flow - gt, axis=-1).mean()))


def section_e():
    """Tiled vs untiled ON CHIP: force tiling with a small budget at a
    geometry the untiled kernel also handles; seam drift must respect the
    documented contract (~1e-1 px worst-case, kernels/tvl1_fused.py)."""
    import jax.numpy as jnp
    from scipy import ndimage

    from denseflow_tpu.kernels.tvl1_fused import (
        plan_tiles,
        tvl1_scale_fused,
        tvl1_scale_fused_tiled,
    )
    from denseflow_tpu.ops.derivatives import centered_gradient

    h, w, budget = 96, 300, 2 * 1024 * 1024
    plan = plan_tiles(h, w, budget_bytes=budget)
    assert plan is not None and len(plan[1]) >= 2, "w must split"
    rng = np.random.default_rng(3)
    base = ndimage.gaussian_filter(
        rng.uniform(0, 255, (h + 8, w + 8)), 1.5
    ).astype(np.float32)
    I0 = jnp.asarray(base[:h, :w][None])
    I1 = jnp.asarray(base[2 : 2 + h, 1 : 1 + w][None])
    I1x, I1y = centered_gradient(I1)
    z = jnp.zeros_like(I0)
    kw = dict(
        l_t=0.15 * 0.3, theta=0.3, taut=0.25 / 0.3, epsilon=0.01,
        iterations=30, warps=3, max_disp=12.0, check_every=4,
    )
    u1r, u2r = tvl1_scale_fused(I0, I1, I1x, I1y, z, z, **kw)
    u1t, u2t = tvl1_scale_fused_tiled(
        I0, I1, I1x, I1y, z, z, tile_budget=budget, **kw
    )
    du = np.abs(np.asarray(u1t) - np.asarray(u1r))
    dv = np.abs(np.asarray(u2t) - np.asarray(u2r))
    _check("tvl1", "seam-drift mean (<=0.05)", float(max(du.mean(), dv.mean())),
           gate=0.05)
    _check("tvl1", "seam-drift max (<=0.25)", float(max(du.max(), dv.max())),
           gate=0.25)


def section_f():
    """Real decoded MJPG content vs the independent NumPy oracle and the
    analytic pan flow (interior, occlusion bands excluded)."""
    from denseflow_tpu.algorithms import make_solver

    cases = sorted(glob.glob("tests/golden/real_*.npz"))
    if not cases:
        print("real_*.npz missing: run tools/make_goldens.py first "
              "(section F skipped)", flush=True)
        return
    m = 8
    solvers = {a: make_solver(a, 256, 341, None, 0) for a in ALGS}
    for f in cases:
        d = np.load(f)
        I0, I1 = d["I0"], d["I1"]
        oracle, gt = d["oracle"], d["gt"]
        name = os.path.basename(f)[:-4]
        for alg, s in solvers.items():
            flow = np.asarray(s(I0[None], I1[None]))[0]
            epe_o = float(
                np.linalg.norm(
                    (flow - oracle)[m:-m, m:-m], axis=-1
                ).mean()
            )
            epe_g = float(
                np.linalg.norm((flow - gt)[m:-m, m:-m], axis=-1).mean()
            )
            _check(alg, f"{name} vs oracle", epe_o)
            _check(alg, f"{name} vs analytic", epe_g)


def main() -> None:
    from denseflow_tpu.utils import enable_compile_cache

    enable_compile_cache()
    sections = {
        "A": section_a, "B": section_b, "C": section_c,
        "D": section_d, "E": section_e, "F": section_f,
    }
    want = [a.upper() for a in sys.argv[1:]] or list(sections)
    for key in want:
        print(f"--- section {key} ---", flush=True)
        sections[key]()
    if failed:
        print(f"\n{len(failed)} case(s) over their gate:")
        for alg, name, epe in failed:
            print(f"  {alg} {name}: {epe:.3f}")
        sys.exit(1)
    print("\nall cases within gate on hardware")


if __name__ == "__main__":
    main()
