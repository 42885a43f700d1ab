"""Spatial tiling of the fused TVL1 kernel (kernels/tvl1_fused.py).

Geometries whose working set exceeds VMEM keep the fused path by splitting
the plane into overlapping tiles (halo discarded at interior seams) folded
into the batch grid. These tests check the planner's invariants and that
tiled == untiled within seam tolerance (verdict round 1, item 4)."""

import numpy as np
import pytest

from denseflow_tpu.kernels.tvl1_fused import (
    TILE_HALO,
    _axis_starts,
    fits_vmem,
    plan_tiles,
    tvl1_scale_fused,
    tvl1_scale_fused_tiled,
)


class TestPlanner:
    @pytest.mark.parametrize(
        "h,w", [(360, 480), (480, 640), (720, 1280), (1080, 1920), (541, 973)]
    )
    def test_invariants(self, h, w):
        plan = plan_tiles(h, w)
        assert plan is not None  # all exceed the default budget
        hs, ws, th, tw, hb, wb = plan
        # tiles stay inside the image and fit VMEM
        assert all(0 <= s <= h - th for s in hs)
        assert all(0 <= s <= w - tw for s in ws)
        assert fits_vmem(th, tw)
        # cores partition [0, n) and each core pixel is >= halo from the
        # interior edges of the tile it is taken from
        assert hb[0] == 0 and hb[-1] == h and wb[0] == 0 and wb[-1] == w
        assert all(a < b for a, b in zip(hb, hb[1:]))
        assert all(a < b for a, b in zip(wb, wb[1:]))
        for i, s in enumerate(hs):
            lo, hi = hb[i], hb[i + 1]
            assert lo >= s and hi <= s + th
            if i > 0:
                assert lo - s >= TILE_HALO
            if i < len(hs) - 1:
                assert (s + th) - hi >= TILE_HALO
        for j, s in enumerate(ws):
            lo, hi = wb[j], wb[j + 1]
            assert lo >= s and hi <= s + tw
            if j > 0:
                assert lo - s >= TILE_HALO
            if j < len(ws) - 1:
                assert (s + tw) - hi >= TILE_HALO

    def test_small_fits_untiled(self):
        assert plan_tiles(256, 341) is None
        assert plan_tiles(64, 80) is None

    def test_narrow_tall_geometry_plans(self):
        """w <= 128 with huge h must tile along H (ADVICE r2: the planner
        used to stop at tw=256 and raise for narrow-but-tall planes)."""
        plan = plan_tiles(40000, 120)
        assert plan is not None
        hs, ws, th, tw, hb, wb = plan
        assert len(ws) == 1 and len(hs) > 1
        assert fits_vmem(th, tw)
        assert hb[0] == 0 and hb[-1] == 40000

    def test_axis_starts_cover(self):
        for n, tile, halo in [(300, 256, 40), (640, 256, 40), (480, 280, 40)]:
            starts = _axis_starts(n, tile, halo)
            assert starts[0] == 0 and starts[-1] == n - tile
            assert all(b - a <= tile - 2 * halo for a, b in zip(starts, starts[1:]))


class TestTiledKernel:
    def test_tiled_matches_untiled(self):
        """Forced tiling (tiny budget) on an unaligned plane must agree
        with the untiled kernel away from seams — run through the Pallas
        interpreter so the TPU kernel's exact math is exercised on CPU."""
        import jax.numpy as jnp

        h, w, budget = 96, 300, 2 * 1024 * 1024
        plan = plan_tiles(h, w, budget_bytes=budget)
        assert plan is not None and len(plan[1]) >= 2  # w really splits
        rng = np.random.default_rng(3)
        import scipy.ndimage as ndi

        base = ndi.gaussian_filter(
            rng.uniform(0, 255, (h + 8, w + 8)), 1.5
        ).astype(np.float32)
        I0 = jnp.asarray(base[:h, :w][None])
        I1 = jnp.asarray(base[2 : 2 + h, 1 : 1 + w][None])
        from denseflow_tpu.ops.derivatives import centered_gradient

        I1x, I1y = centered_gradient(I1)
        z = jnp.zeros_like(I0)
        kw = dict(
            l_t=0.15 * 0.3, theta=0.3, taut=0.25 / 0.3, epsilon=0.01,
            iterations=30, warps=3, max_disp=12.0, check_every=4,
            interpret=True,
        )
        u1r, u2r = tvl1_scale_fused(I0, I1, I1x, I1y, z, z, **kw)
        u1t, u2t = tvl1_scale_fused_tiled(
            I0, I1, I1x, I1y, z, z, tile_budget=budget, **kw
        )
        du = np.abs(np.asarray(u1t) - np.asarray(u1r))
        dv = np.abs(np.asarray(u2t) - np.asarray(u2r))
        # seams introduce only sub-epsilon differences for in-halo motion
        assert du.mean() < 0.02 and dv.mean() < 0.02
        assert du.max() < 0.25 and dv.max() < 0.25

    @pytest.mark.parametrize("b", [33, 64])
    def test_slab_path_matches_small_batch(self, b):
        """b > _MAX_GRID_BATCH takes the lax.map slab path (pad to a
        multiple of 32, map, crop). The kernel is per-pair, so slabbed
        results must be BYTE-identical to solving the same pairs in
        <=32-sized direct calls (ADVICE r3: pair_batch 64-128 is the
        recommended config and this path had no direct test). b=33
        exercises the non-multiple-of-32 padding."""
        import jax.numpy as jnp

        from denseflow_tpu.kernels.tvl1_fused import _MAX_GRID_BATCH

        assert b > _MAX_GRID_BATCH
        h, w = 24, 40
        rng = np.random.default_rng(11)
        import scipy.ndimage as ndi

        base = ndi.gaussian_filter(
            rng.uniform(0, 255, (b, h + 4, w + 4)), (0, 1.5, 1.5)
        ).astype(np.float32)
        I0 = jnp.asarray(base[:, :h, :w])
        I1 = jnp.asarray(base[:, 2 : 2 + h, 1 : 1 + w])
        from denseflow_tpu.ops.derivatives import centered_gradient

        I1x, I1y = centered_gradient(I1)
        z = jnp.zeros_like(I0)
        kw = dict(
            l_t=0.15 * 0.3, theta=0.3, taut=0.25 / 0.3, epsilon=0.01,
            iterations=20, warps=2, max_disp=8.0, check_every=4,
            interpret=True,
        )
        u1s, u2s = tvl1_scale_fused(I0, I1, I1x, I1y, z, z, **kw)
        # reference: the same pairs through <=32-pair direct calls
        parts = []
        for s in range(0, b, _MAX_GRID_BATCH):
            e = min(s + _MAX_GRID_BATCH, b)
            parts.append(
                tvl1_scale_fused(
                    I0[s:e], I1[s:e], I1x[s:e], I1y[s:e], z[s:e], z[s:e],
                    **kw,
                )
            )
        u1r = np.concatenate([np.asarray(p[0]) for p in parts])
        u2r = np.concatenate([np.asarray(p[1]) for p in parts])
        np.testing.assert_array_equal(np.asarray(u1s), u1r)
        np.testing.assert_array_equal(np.asarray(u2s), u2r)

    def test_tiled_matches_untiled_low_texture(self):
        """Low-texture content is the worst case for seams: the TV term
        fills flow in from far away, and its influence is NOT bounded by
        the warp halo (ADVICE r2). Pin the seam deviation there too."""
        import jax.numpy as jnp

        h, w, budget = 96, 300, 2 * 1024 * 1024
        rng = np.random.default_rng(7)
        import scipy.ndimage as ndi

        # almost flat: heavy blur + tiny amplitude over a dim ramp
        base = ndi.gaussian_filter(
            rng.uniform(0, 12, (h + 8, w + 8)), 6.0
        ).astype(np.float32) + np.linspace(0, 30, w + 8, dtype=np.float32)
        I0 = jnp.asarray(base[:h, :w][None])
        I1 = jnp.asarray(base[2 : 2 + h, 1 : 1 + w][None])
        from denseflow_tpu.ops.derivatives import centered_gradient

        I1x, I1y = centered_gradient(I1)
        z = jnp.zeros_like(I0)
        kw = dict(
            l_t=0.15 * 0.3, theta=0.3, taut=0.25 / 0.3, epsilon=0.01,
            iterations=30, warps=3, max_disp=12.0, check_every=4,
            interpret=True,
        )
        u1r, u2r = tvl1_scale_fused(I0, I1, I1x, I1y, z, z, **kw)
        u1t, u2t = tvl1_scale_fused_tiled(
            I0, I1, I1x, I1y, z, z, tile_budget=budget, **kw
        )
        du = np.abs(np.asarray(u1t) - np.asarray(u1r))
        dv = np.abs(np.asarray(u2t) - np.asarray(u2r))
        assert du.mean() < 0.05 and dv.mean() < 0.05
        assert du.max() < 0.5 and dv.max() < 0.5
