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


def make_solver(algorithm: str, height: int, width: int, preset: str | None = None) -> Callable:
    """Return a jit-compiled batched solver f(I0_u8, I1_u8) -> (B,H,W,2) f32.

    I0/I1 are uint8 gray (B, H, W); the solver handles dtype conversion with
    each algorithm's own convention (TVL1/Farneback work in 0..255,
    Brox in [0,1] — reference src/denseflow_gpu.cpp:331-333).
    """
    if algorithm == "tvl1":
        return make_tvl1_solver(height, width, TVL1Params())
    if algorithm == "nv":
        # Fast approximate mode standing in for the NVIDIA ASIC path:
        # fewer warps/iterations, same formulation.
        return make_tvl1_solver(
            height, width, TVL1Params(warps=2, iterations=60, nscales=4)
        )
    if algorithm == "farn":
        return make_farneback_solver(height, width, FarnebackParams())
    if algorithm == "brox":
        return make_brox_solver(height, width, BroxParams())
    raise ValueError(f"{algorithm} not supported!")
