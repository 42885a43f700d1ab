"""Flow algorithm registry.

Maps the reference's algorithm names (reference tools/denseflow.cpp:11,
src/denseflow_gpu.cpp:285-304) to batched TPU solvers:

* ``tvl1`` — Zach/Pock/Bischof TV-L1 primal-dual (default)
* ``farn`` — Farneback polynomial expansion
* ``brox`` — Brox 2004 variational (inputs scaled to [0,1])
* ``nv``   — hardware-ASIC flow in the reference; here a fast approximate
  TVL1 preset (fewer scales/iterations), as SURVEY.md §2.2 N4 prescribes.
"""

from __future__ import annotations

from typing import Callable

from denseflow_tpu.algorithms.tvl1 import TVL1Params, make_tvl1_solver
from denseflow_tpu.algorithms.farneback import FarnebackParams, make_farneback_solver
from denseflow_tpu.algorithms.brox import BroxParams, make_brox_solver


# Solver-hyperparameter presets (--preset): the reference hardcodes each
# algorithm's hyperparameters at its create site (SURVEY.md §2.2); here the
# defaults reproduce those exactly and presets offer documented speed/quality
# trades on top.
#   default  — reference-exact hyperparameters
#   fast     — ~2-3x faster, small EPE cost (fewer warps/iterations/levels)
#   quality  — tighter convergence than the reference
_PRESETS = {
    "tvl1": {
        "default": TVL1Params(),
        "fast": TVL1Params(warps=3, iterations=120, nscales=4),
        "quality": TVL1Params(epsilon=0.005, iterations=500),
    },
    "nv": {
        # Fast approximate mode standing in for the NVIDIA ASIC path:
        # fewer warps/iterations, same formulation (SURVEY.md §2.2 N4).
        "default": TVL1Params(warps=2, iterations=60, nscales=4),
        "fast": TVL1Params(warps=1, iterations=30, nscales=3),
        "quality": TVL1Params(warps=3, iterations=120, nscales=4),
    },
    "farn": {
        "default": FarnebackParams(),
        "fast": FarnebackParams(num_iters=5, num_levels=4),
        "quality": FarnebackParams(num_iters=15),
    },
    "brox": {
        "default": BroxParams(),
        "fast": BroxParams(outer_iterations=30),
        "quality": BroxParams(outer_iterations=120),
    },
}


def solver_params(algorithm: str, preset: str | None = None):
    """Resolve (algorithm, preset) -> the solver's parameter dataclass."""
    if algorithm not in _PRESETS:
        raise ValueError(f"{algorithm} not supported!")
    table = _PRESETS[algorithm]
    key = preset or "default"
    if key not in table:
        raise ValueError(
            f"unknown preset {preset!r} (choose from {sorted(table)})"
        )
    return table[key]


def make_solver(
    algorithm: str,
    height: int,
    width: int,
    preset: str | None = None,
    max_disp: int = 0,
) -> Callable:
    """Return a jit-compiled batched solver f(I0_u8, I1_u8) -> (B,H,W,2) f32.

    I0/I1 are uint8 gray (B, H, W); the solver handles dtype conversion with
    each algorithm's own convention (TVL1/Farneback work in 0..255,
    Brox in [0,1] — reference src/denseflow_gpu.cpp:331-333).

    max_disp > 0 overrides the solver's finest-level displacement clamp
    (the px radius the TPU-native masked-shift warp can track; the
    reference's CUDA warp is an unclamped texture fetch, so raising this
    recovers its unbounded-motion semantics at proportional warp-sweep
    cost). 0 keeps each algorithm's default (40 px).
    """
    import dataclasses

    params = solver_params(algorithm, preset)
    if max_disp > 0:
        params = dataclasses.replace(params, max_disp=int(max_disp))
    if algorithm in ("tvl1", "nv"):
        return make_tvl1_solver(height, width, params)
    if algorithm == "farn":
        return make_farneback_solver(height, width, params)
    return make_brox_solver(height, width, params)
