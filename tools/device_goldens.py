"""Golden fidelity ON REAL HARDWARE through the fused Pallas kernels.

The CI suite runs the goldens against the XLA oracle (CPU) and the fused
kernels through the Pallas interpreter — neither executes Mosaic's actual
hardware lowering. This harness runs every golden case through all three
fused solvers on the attached chip and applies the same 0.5 px EPE gate.

It exists because round 4 caught a silent hardware-only miscompile this
way: pltpu.roll with a traced NEGATIVE shift is wrong on planes spanning
more than one tile along the rolled axis, which corrupted every solver
for positive-displacement motion while leaving the (negative-u) bench
content and all CPU tests green. Run after any kernel change:

    python tools/device_goldens.py
"""

import glob
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

GATE = 0.5  # px, BASELINE.json north-star


def main() -> None:
    from denseflow_tpu.utils import enable_compile_cache

    enable_compile_cache()
    from denseflow_tpu.algorithms import make_solver

    cases = sorted(glob.glob("tests/golden/tvl1_*.npz"))
    assert cases, "run from the repo root"
    solvers = {a: make_solver(a, 96, 128, None, 0) for a in ("tvl1", "farn", "brox")}
    failed = []
    for f in cases:
        d = np.load(f)
        I0, I1, gt = d["I0"], d["I1"], d["gt"]
        name = os.path.basename(f)[5:-4]
        for alg, s in solvers.items():
            flow = np.asarray(s(I0[None], I1[None]))[0]
            epe = float(np.linalg.norm(flow - gt, axis=-1).mean())
            ok = epe < GATE
            if not ok:
                failed.append((alg, name, epe))
            print(f"{alg:5s} {name:12s} EPE {epe:6.3f}  {'ok' if ok else 'FAIL'}")
    if failed:
        print(f"\n{len(failed)} case(s) over the {GATE} px gate")
        sys.exit(1)
    print(f"\nall cases under {GATE} px on hardware")


if __name__ == "__main__":
    main()
