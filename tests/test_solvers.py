"""Numerical solver tests (SURVEY.md §4: known-translation EPE + the
Farneback CPU oracle)."""

import cv2
import numpy as np
import pytest
import scipy.ndimage as ndi

from denseflow_tpu.algorithms import make_solver
from denseflow_tpu.algorithms.farneback import FarnebackParams, make_farneback_solver
from denseflow_tpu.algorithms.tvl1 import TVL1Params, make_tvl1_solver


def _translated_pair(h=64, w=80, dx=1.7, dy=-0.8, seed=1):
    rng = np.random.default_rng(seed)
    base = ndi.gaussian_filter(rng.uniform(0, 255, (h + 20, w + 20)), 2.0).astype(
        np.float32
    )
    ys, xs = np.mgrid[0:h, 0:w]
    I0 = np.clip(base[10 : 10 + h, 10 : 10 + w], 0, 255).astype(np.uint8)
    I1 = np.clip(
        ndi.map_coordinates(base, [ys + 10 - dy, xs + 10 - dx], order=3), 0, 255
    ).astype(np.uint8)
    return I0, I1


def _central_epe(flow, dx, dy, margin=10):
    c = flow[margin:-margin, margin:-margin]
    return float(np.linalg.norm(c - np.array([dx, dy]), axis=-1).mean())


class TestTVL1:
    def test_subpixel_translation(self):
        dx, dy = 1.7, -0.8
        I0, I1 = _translated_pair(dx=dx, dy=dy)
        solver = make_tvl1_solver(64, 80, TVL1Params())
        flow = np.asarray(solver(I0[None], I1[None]))[0]
        assert _central_epe(flow, dx, dy) < 0.15

    def test_batch_matches_single(self):
        """Batching must be semantics-preserving up to the shared
        convergence test (pairs are independent in the reference)."""
        pairs = [_translated_pair(seed=s, dx=1.0 + s * 0.3, dy=-0.5) for s in range(3)]
        I0 = np.stack([p[0] for p in pairs])
        I1 = np.stack([p[1] for p in pairs])
        solver = make_tvl1_solver(64, 80, TVL1Params())
        batched = np.asarray(solver(I0, I1))
        for i in range(3):
            single = np.asarray(solver(I0[i : i + 1], I1[i : i + 1]))[0]
            # tolerance: the convergence test is the batch max, so pairs that
            # converge early ride along for extra (post-convergence)
            # iterations — differences stay within the epsilon ball, with
            # isolated pixels drifting a bit more across the 25 warp loops
            d = np.abs(batched[i] - single)
            assert d.mean() < 0.05
            assert d.max() < 0.3

    def test_zero_motion(self):
        I0, _ = _translated_pair()
        solver = make_tvl1_solver(64, 80, TVL1Params())
        flow = np.asarray(solver(I0[None], I0[None]))[0]
        assert np.abs(flow).max() < 0.05

    def test_fused_kernel_matches_xla_path(self):
        """The fused Pallas kernel (interpret mode on CPU) must agree with
        the pure-XLA solver, including the VMEM padding path: 64x80 pads
        to 64x128 and every pyramid level is lane-unaligned."""
        import jax.numpy as jnp

        from denseflow_tpu.algorithms.tvl1 import tvl1_flow

        dx, dy = 1.7, -0.8
        I0, I1 = _translated_pair(dx=dx, dy=dy)
        p = TVL1Params(iterations=60, use_pallas="off")
        I0f = jnp.asarray(I0[None], jnp.float32)
        I1f = jnp.asarray(I1[None], jnp.float32)
        ref = np.asarray(tvl1_flow(I0f, I1f, p))[0]
        fused = np.asarray(tvl1_flow(I0f, I1f, p, interpret=True))[0]
        d = np.abs(fused - ref)
        assert d.mean() < 0.03
        assert _central_epe(fused, dx, dy) < 0.2

    def test_fast_preset_registry(self):
        I0, I1 = _translated_pair(dx=2.0, dy=0.0)
        solver = make_solver("nv", 64, 80)
        flow = np.asarray(solver(I0[None], I1[None]))[0]
        assert _central_epe(flow, 2.0, 0.0) < 0.4


class TestFarneback:
    def test_matches_cv2_oracle(self):
        I0, I1 = _translated_pair(h=96, w=128, dx=2.3, dy=-1.6)
        ref = cv2.calcOpticalFlowFarneback(I0, I1, None, 0.5, 5, 13, 10, 5, 1.1, 0)
        solver = make_farneback_solver(96, 128, FarnebackParams())
        ours = np.asarray(solver(I0[None], I1[None]))[0]
        epe = np.linalg.norm(ours - ref, axis=-1)
        assert epe[10:-10, 10:-10].mean() < 0.02
        assert epe.mean() < 0.05

    def test_translation(self):
        dx, dy = 2.3, -1.6
        I0, I1 = _translated_pair(h=96, w=128, dx=dx, dy=dy)
        solver = make_farneback_solver(96, 128, FarnebackParams())
        flow = np.asarray(solver(I0[None], I1[None]))[0]
        assert _central_epe(flow, dx, dy, margin=12) < 0.2


class TestBrox:
    @pytest.mark.slow
    def test_translation(self):
        from denseflow_tpu.algorithms.brox import BroxParams, make_brox_solver

        dx, dy = 1.7, -0.8
        I0, I1 = _translated_pair(dx=dx, dy=dy)
        solver = make_brox_solver(64, 80, BroxParams())
        flow = np.asarray(solver(I0[None], I1[None]))[0]
        assert _central_epe(flow, dx, dy) < 0.2
