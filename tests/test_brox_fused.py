"""Fused Brox Pallas kernel (kernels/brox_fused.py) vs the XLA oracle path.

Runs the TPU kernel through the Pallas interpreter on CPU (the same gate
style as the fused TVL1 suite): the fused level solve must match
algorithms/brox._solve_level's pure-XLA result, the slab path must be
byte-identical to direct sub-calls, and the full pyramid solve must track
a known translation.
"""

import dataclasses

import numpy as np
import pytest

import jax.numpy as jnp

from denseflow_tpu.algorithms.brox import BroxParams, _solve_level, brox_flow
from denseflow_tpu.kernels.brox_fused import (
    _MAX_GRID_BATCH,
    brox_scale_fused,
)

# reduced iteration counts: the kernel's control flow is identical at any
# count and full 77x10x10 through the interpreter is minutes per plane
FAST = BroxParams(
    inner_iterations=3, outer_iterations=4, solver_iterations=4,
    use_pallas="off",
)


def _smooth_pair(b, h, w, dx=1.3, dy=-0.7, seed=5):
    import scipy.ndimage as ndi

    rng = np.random.default_rng(seed)
    base = ndi.gaussian_filter(
        rng.uniform(0.0, 1.0, (b, h + 8, w + 8)), (0, 2.0, 2.0)
    ).astype(np.float32)
    I0 = base[:, 4 : 4 + h, 4 : 4 + w]
    # integer-offset pair is fine for equivalence tests
    I1 = base[:, 4 + int(round(dy)) : 4 + int(round(dy)) + h,
              4 + int(round(dx)) : 4 + int(round(dx)) + w]
    return jnp.asarray(I0), jnp.asarray(I1)


class TestLevelEquivalence:
    @pytest.mark.parametrize("hw", [(40, 56), (30, 45)])
    def test_fused_matches_xla(self, hw):
        h, w = hw
        I0, I1 = _smooth_pair(2, h, w)
        rng = np.random.default_rng(9)
        import scipy.ndimage as ndi

        u = jnp.asarray(
            ndi.gaussian_filter(rng.normal(0, 0.5, (2, h, w)), (0, 3, 3))
        ).astype(jnp.float32)
        v = jnp.asarray(
            ndi.gaussian_filter(rng.normal(0, 0.5, (2, h, w)), (0, 3, 3))
        ).astype(jnp.float32)
        ur, vr = _solve_level(I0, I1, u, v, FAST, max_disp=8)
        uf, vf = brox_scale_fused(
            I0, I1, u, v,
            alpha=FAST.alpha, gamma=FAST.gamma,
            inner_iterations=FAST.inner_iterations,
            outer_iterations=FAST.outer_iterations,
            solver_iterations=FAST.solver_iterations,
            max_disp=8.0, stop_eps=FAST.stop_eps, interpret=True,
        )
        du = np.abs(np.asarray(uf) - np.asarray(ur))
        dv = np.abs(np.asarray(vf) - np.asarray(vr))
        # XLA path warps via the gather formulation on CPU, the kernel via
        # the roll sweep — identical math modulo float reassociation
        assert du.mean() < 5e-3 and dv.mean() < 5e-3, (du.mean(), dv.mean())
        assert du.max() < 5e-2 and dv.max() < 5e-2, (du.max(), dv.max())

    def test_slab_path_byte_identical(self):
        b = _MAX_GRID_BATCH + 2  # forces the lax.map slab path + padding
        h, w = 24, 40
        I0, I1 = _smooth_pair(b, h, w, seed=11)
        z = jnp.zeros((b, h, w), jnp.float32)
        kw = dict(
            alpha=FAST.alpha, gamma=FAST.gamma,
            inner_iterations=2, outer_iterations=2, solver_iterations=3,
            max_disp=6.0, stop_eps=1e-3, interpret=True,
        )
        us, vs = brox_scale_fused(I0, I1, z, z, **kw)
        parts = []
        for s in range(0, b, _MAX_GRID_BATCH):
            e = min(s + _MAX_GRID_BATCH, b)
            parts.append(
                brox_scale_fused(
                    I0[s:e], I1[s:e], z[s:e], z[s:e], **kw
                )
            )
        ur = np.concatenate([np.asarray(p[0]) for p in parts])
        vr = np.concatenate([np.asarray(p[1]) for p in parts])
        np.testing.assert_array_equal(np.asarray(us), ur)
        np.testing.assert_array_equal(np.asarray(vs), vr)


class TestConvergenceStop:
    @pytest.mark.slow
    def test_stop_matches_full_budget(self):
        """stop_eps=1e-3 must land within a hair of the full iteration
        budget (the stop only fires once an outer step's RMS update is
        below 1e-3 px — remaining outers are no-ops within that ball)."""
        import scipy.ndimage as ndi
        from scipy.ndimage import map_coordinates

        dx, dy = 1.2, -0.6
        h, w = 48, 64
        rng = np.random.default_rng(7)
        base = ndi.gaussian_filter(
            rng.uniform(0, 1, (h + 16, w + 16)), 1.5
        ).astype(np.float32)
        yy, xx = np.mgrid[0:h, 0:w]
        I0 = base[8 : 8 + h, 8 : 8 + w]
        I1 = map_coordinates(
            base, [yy + 8 - dy, xx + 8 - dx], order=3, mode="nearest"
        ).astype(np.float32)
        full = dataclasses.replace(
            FAST, outer_iterations=30, stop_eps=0.0
        )
        stop = dataclasses.replace(full, stop_eps=1e-3)
        f_full = np.asarray(
            brox_flow(jnp.asarray(I0[None]), jnp.asarray(I1[None]), full)
        )
        f_stop = np.asarray(
            brox_flow(jnp.asarray(I0[None]), jnp.asarray(I1[None]), stop)
        )
        d = np.abs(f_full - f_stop)
        assert d.mean() < 5e-3 and d.max() < 5e-2, (d.mean(), d.max())


class TestFullFlow:
    @pytest.mark.slow
    def test_translation_interpret(self):
        """Full coarse-to-fine Brox through the fused kernel (interpreter)
        tracks a synthetic translation — reduced outer iterations keep the
        interpreter runtime in seconds while exercising every level."""
        import scipy.ndimage as ndi

        dx, dy = 1.7, -0.8
        h, w = 64, 80
        rng = np.random.default_rng(3)
        base = ndi.gaussian_filter(
            rng.uniform(0, 1, (h + 16, w + 16)), 1.5
        ).astype(np.float32)
        yy, xx = np.mgrid[0:h, 0:w]
        from scipy.ndimage import map_coordinates

        I0 = base[8 : 8 + h, 8 : 8 + w]
        # content moves by (+dx, +dy): I1(x) = I0(x - d), so the solver's
        # backward-warp convention recovers flow == (dx, dy)
        I1 = map_coordinates(
            base, [yy + 8 - dy, xx + 8 - dx], order=3, mode="nearest"
        ).astype(np.float32)
        p = dataclasses.replace(FAST, outer_iterations=12)
        flow = np.asarray(
            brox_flow(
                jnp.asarray(I0[None]), jnp.asarray(I1[None]), p,
                interpret=True,
            )
        )[0]
        m = 10
        core = flow[m:-m, m:-m]
        epe = np.sqrt((core[..., 0] - dx) ** 2 + (core[..., 1] - dy) ** 2)
        assert epe.mean() < 0.25, epe.mean()
