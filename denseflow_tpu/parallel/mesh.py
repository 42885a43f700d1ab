"""Device-mesh sharding of frame-pair batches.

The workload is embarrassingly parallel over frame pairs (the reference
shares nothing between pairs, reference src/denseflow_gpu.cpp:313-341), so
the natural mesh is a single `pairs` axis: a batch of B pairs is sharded
B/N per chip, the solver runs under jit with NamedSharding constraints, and
XLA inserts no collectives at all — every chip solves its shard locally.
This replaces the reference's "run one process per GPU by hand" story
(reference README.md:11, setDevice(0) at src/denseflow_gpu.cpp:482).
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

PAIRS_AXIS = "pairs"


def make_mesh(n_devices: Optional[int] = None, devices: Optional[Sequence] = None) -> Mesh:
    """1-D mesh over the pair-batch axis."""
    if devices is None:
        devices = jax.devices()
        if n_devices is not None:
            devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (PAIRS_AXIS,))


def shard_batch(mesh: Mesh, batch: jax.Array) -> jax.Array:
    """Place a (B, ...) batch with B sharded across the mesh."""
    sharding = NamedSharding(mesh, P(PAIRS_AXIS))
    return jax.device_put(batch, sharding)


def sharded_solver(mesh: Mesh, solver: Callable) -> Callable:
    """Wrap a batched solver f(I0, I1) -> flow so inputs/outputs are sharded
    over the pairs axis. B must be divisible by the mesh size."""
    spec = NamedSharding(mesh, P(PAIRS_AXIS))

    def run(I0: jax.Array, I1: jax.Array) -> jax.Array:
        I0 = jax.device_put(I0, spec)
        I1 = jax.device_put(I1, spec)
        return jax.jit(solver, in_shardings=(spec, spec), out_shardings=spec)(I0, I1)

    return run
