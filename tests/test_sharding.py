"""Multi-device sharding tests on the 8-device virtual CPU mesh
(SURVEY.md §4: distributed tests without a real pod)."""

import jax
import numpy as np
import pytest

from denseflow_tpu.algorithms.tvl1 import TVL1Params, make_tvl1_solver
from denseflow_tpu.parallel import make_mesh, shard_batch, sharded_solver


@pytest.fixture(scope="module")
def eight_devices():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    return jax.devices()[:8]


def _pairs(b, h, w, seed=0):
    rng = np.random.default_rng(seed)
    import scipy.ndimage as ndi

    base = ndi.gaussian_filter(rng.uniform(0, 255, (b, h + 8, w + 8)), (0, 2, 2))
    I0 = base[:, 4 : 4 + h, 4 : 4 + w].astype(np.uint8)
    I1 = base[:, 4 : 4 + h, 5 : 5 + w].astype(np.uint8)  # 1px shift
    return I0, I1


def test_mesh_shards_batch(eight_devices):
    mesh = make_mesh(8)
    I0, _ = _pairs(16, 32, 40)
    x = shard_batch(mesh, jax.numpy.asarray(I0))
    assert len(x.sharding.device_set) == 8
    assert x.addressable_shards[0].data.shape == (2, 32, 40)


def test_sharded_solve_matches_single_device(eight_devices):
    """Union of per-shard outputs == single-device run (pairs independent)."""
    h, w = 32, 40
    # epsilon=0 disables the early exit so per-shard convergence coupling
    # cannot differ from the single-device run
    params = TVL1Params(nscales=2, warps=2, iterations=30, epsilon=0.0)
    solver = make_tvl1_solver(h, w, params)
    I0, I1 = _pairs(8, h, w)

    single = np.asarray(solver(I0, I1))

    mesh = make_mesh(8)
    run = sharded_solver(mesh, solver)
    sharded = np.asarray(run(I0, I1))
    # tolerance covers cross-device reduction-order FP noise compounded
    # over the solver iterations (measured max ~5e-4)
    np.testing.assert_allclose(sharded, single, atol=2e-3)


def test_sharded_solve_uses_all_devices(eight_devices):
    h, w = 32, 40
    params = TVL1Params(nscales=2, warps=1, iterations=10)
    solver = make_tvl1_solver(h, w, params)
    I0, I1 = _pairs(8, h, w)
    mesh = make_mesh(8)
    run = sharded_solver(mesh, solver)
    out = run(I0, I1)
    assert len(out.sharding.device_set) == 8


def test_allreduce_counters_single_process():
    from denseflow_tpu.parallel.distributed import allreduce_counters
    from denseflow_tpu.utils import Counters

    c = Counters()
    c.add_videos(2)
    c.add_frames(100)
    c.add_flows(98)
    assert allreduce_counters(c) == (2, 100, 98)
