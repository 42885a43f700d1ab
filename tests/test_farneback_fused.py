"""Fused Farneback level kernel (kernels/farneback_fused.py) vs the XLA
oracle — interpret mode on CPU, same gate style as the fused TVL1/Brox
suites."""

import dataclasses

import numpy as np
import pytest

import jax.numpy as jnp

from denseflow_tpu.algorithms.farneback import (
    FarnebackParams,
    _border_scale,
    _box_blur_planes,
    farneback_flow,
    poly_expand,
    solve_flow,
    update_matrices,
)
from denseflow_tpu.kernels.farneback_fused import (
    _MAX_GRID_BATCH,
    farneback_level_fused,
)

P = FarnebackParams(use_pallas="off")


def _smooth(b, h, w, seed=5, lo=0.0, hi=255.0):
    import scipy.ndimage as ndi

    rng = np.random.default_rng(seed)
    return jnp.asarray(
        ndi.gaussian_filter(
            rng.uniform(lo, hi, (b, h, w)), (0, 1.5, 1.5)
        ).astype(np.float32)
    )


def _xla_level(R0, R1, flow, h, w, p, d):
    bscale = _border_scale(h, w)
    M = update_matrices(R0, R1, flow, bscale, d)
    for it in range(p.num_iters):
        flow = solve_flow(_box_blur_planes(M, p.win_size))
        if it < p.num_iters - 1:
            M = update_matrices(R0, R1, flow, bscale, d)
    return flow


class TestLevelEquivalence:
    @pytest.mark.parametrize("hw", [(40, 56), (30, 45)])
    def test_fused_matches_xla(self, hw):
        """A TRANSLATED pair, so the iterated flow stays locally smooth:
        the XLA oracle warps via the 2-D gather while the kernel uses the
        axis-sequential roll sweep, and the two only coincide for flow
        that is ~constant within the kernel support (ops/warp.py module
        doc) — unrelated random frames would produce a chaotic flow field
        and a legitimate formulation gap, not a kernel bug."""
        h, w = hw
        import scipy.ndimage as ndi

        rng = np.random.default_rng(1)
        base = ndi.gaussian_filter(
            rng.uniform(0, 255, (2, h + 8, w + 8)), (0, 1.5, 1.5)
        ).astype(np.float32)
        I0 = jnp.asarray(base[:, 4 : 4 + h, 4 : 4 + w])
        I1 = jnp.asarray(base[:, 3 : 3 + h, 6 : 6 + w])
        R0 = poly_expand(I0, P.poly_n, P.poly_sigma)
        R1 = poly_expand(I1, P.poly_n, P.poly_sigma)
        rng = np.random.default_rng(9)
        flow = jnp.asarray(
            ndi.gaussian_filter(
                rng.normal(0, 0.3, (2, h, w, 2)), (0, 4, 4, 0)
            ).astype(np.float32)
        )
        ref = np.asarray(_xla_level(R0, R1, flow, h, w, P, 8))
        uf, vf = farneback_level_fused(
            jnp.moveaxis(R0, -1, -3),
            jnp.moveaxis(R1, -1, -3),
            flow[..., 0],
            flow[..., 1],
            win_size=P.win_size,
            num_iters=P.num_iters,
            max_disp=8.0,
            interpret=True,
        )
        du = np.abs(np.asarray(uf) - ref[..., 0])
        dv = np.abs(np.asarray(vf) - ref[..., 1])
        # XLA warps via the gather formulation on CPU, the kernel via the
        # roll sweep — identical math modulo float reassociation
        assert du.mean() < 5e-3 and dv.mean() < 5e-3, (du.mean(), dv.mean())
        assert du.max() < 5e-2 and dv.max() < 5e-2, (du.max(), dv.max())

    def test_slab_path_byte_identical(self):
        b = _MAX_GRID_BATCH + 2
        h, w = 24, 40
        I0 = _smooth(b, h, w, seed=3)
        I1 = _smooth(b, h, w, seed=4)
        R0 = jnp.moveaxis(poly_expand(I0, P.poly_n, P.poly_sigma), -1, -3)
        R1 = jnp.moveaxis(poly_expand(I1, P.poly_n, P.poly_sigma), -1, -3)
        z = jnp.zeros((b, h, w), jnp.float32)
        kw = dict(win_size=9, num_iters=3, max_disp=6.0, interpret=True)
        us, vs = farneback_level_fused(R0, R1, z, z, **kw)
        parts = []
        for s in range(0, b, _MAX_GRID_BATCH):
            e = min(s + _MAX_GRID_BATCH, b)
            parts.append(
                farneback_level_fused(
                    R0[s:e], R1[s:e], z[s:e], z[s:e], **kw
                )
            )
        ur = np.concatenate([np.asarray(p[0]) for p in parts])
        vr = np.concatenate([np.asarray(p[1]) for p in parts])
        np.testing.assert_array_equal(np.asarray(us), ur)
        np.testing.assert_array_equal(np.asarray(vs), vr)


class TestConvergenceStop:
    def test_stop_matches_full_budget(self):
        """stop_eps=1e-3 (default) must land within a hair of the full
        numIters budget — the stop only fires when an iteration's RMS
        update is already below 1e-3 px."""
        import scipy.ndimage as ndi
        from scipy.ndimage import map_coordinates

        dx, dy = 1.8, -1.1
        h, w = 64, 96
        rng = np.random.default_rng(5)
        base = ndi.gaussian_filter(
            rng.uniform(0, 255, (h + 16, w + 16)), 1.5
        ).astype(np.float32)
        yy, xx = np.mgrid[0:h, 0:w]
        I0 = jnp.asarray(base[8 : 8 + h, 8 : 8 + w][None])
        I1 = jnp.asarray(
            map_coordinates(
                base, [yy + 8 - dy, xx + 8 - dx], order=3, mode="nearest"
            ).astype(np.float32)[None]
        )
        full = dataclasses.replace(P, stop_eps=0.0)
        stop = dataclasses.replace(P, stop_eps=1e-3)
        f_full = np.asarray(farneback_flow(I0, I1, full))
        f_stop = np.asarray(farneback_flow(I0, I1, stop))
        d = np.abs(f_full - f_stop)
        assert d.mean() < 5e-3 and d.max() < 5e-2, (d.mean(), d.max())


class TestFullFlow:
    def test_translation_interpret(self):
        """Full coarse-to-fine Farneback through the fused kernel tracks a
        synthetic translation (central region, generous margin)."""
        import scipy.ndimage as ndi
        from scipy.ndimage import map_coordinates

        dx, dy = 2.3, -1.6
        h, w = 96, 128
        rng = np.random.default_rng(3)
        base = ndi.gaussian_filter(
            rng.uniform(0, 255, (h + 16, w + 16)), 1.5
        ).astype(np.float32)
        yy, xx = np.mgrid[0:h, 0:w]
        I0 = base[8 : 8 + h, 8 : 8 + w]
        I1 = map_coordinates(
            base, [yy + 8 - dy, xx + 8 - dx], order=3, mode="nearest"
        ).astype(np.float32)
        flow = np.asarray(
            farneback_flow(
                jnp.asarray(I0[None]), jnp.asarray(I1[None]), P,
                interpret=True,
            )
        )[0]
        m = 12
        core = flow[m:-m, m:-m]
        epe = np.sqrt((core[..., 0] - dx) ** 2 + (core[..., 1] - dy) ** 2)
        assert epe.mean() < 0.2, epe.mean()


class TestPolyExpandFused:
    def test_matches_xla_poly_expand(self):
        """round 5: the fused VMEM poly expansion must match the XLA conv
        chain (incl. the REPLICATE border — the round's one real bug was
        padding with reflect101 here) on direct and slab-path batches."""
        import jax.numpy as jnp

        from denseflow_tpu.kernels.farneback_fused import (
            _MAX_GRID_BATCH,
            poly_expand_fused,
        )

        rng = np.random.default_rng(7)
        for b, h, w in [(2, 40, 56), (_MAX_GRID_BATCH + 2, 24, 40)]:
            img = jnp.asarray(
                rng.uniform(0, 255, (b, h, w)).astype(np.float32)
            )
            ref = np.moveaxis(
                np.asarray(poly_expand(img, P.poly_n, P.poly_sigma)), -1, 1
            )
            got = np.asarray(
                poly_expand_fused(
                    img, P.poly_n, P.poly_sigma, interpret=True
                )
            )
            d = np.abs(ref - got)
            assert d.max() < 1e-3 and d.mean() < 1e-5, (b, d.max())
