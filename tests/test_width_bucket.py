"""Width bucketing (config.width_bucket): solve at a padded width, crop
host-side — caps XLA compiles on mixed-resolution lists (round-3 verdict
item 5). Opt-in because right-border flow can differ slightly from the
exact-width solve."""

import numpy as np
import pytest

from denseflow_tpu.executor import DeviceExecutor


def _frames(n, h, w, seed=0):
    import scipy.ndimage as ndi

    rng = np.random.default_rng(seed)
    base = ndi.gaussian_filter(rng.uniform(0, 255, (n, h + 8, w + 8)), (0, 2, 2))
    return np.clip(base[:, 4 : 4 + h, 4 : 4 + w], 0, 255).astype(np.uint8)


class TestWidthBucket:
    @pytest.mark.parametrize("save_type", ["jpg", "h5"])
    def test_payload_shape_and_interior_match(self, save_type):
        """Bucketed vs exact-width solve: identical payload shapes; the
        flat right-pad perturbs flow near the right border, and the
        epsilon stop (whose area now includes padded columns) shifts
        stopping times, so the interior carries SUB-EPSILON drift —
        measured ~1.3 quantized levels (~0.2 px) mean on the left half vs
        ~10 levels in the right pad band. Both are documented opt-in
        trade-offs (config.width_bucket)."""
        h, w = 64, 150  # not a multiple of the bucket
        frames = _frames(10, h, w, seed=2)
        exact = DeviceExecutor("tvl1", h, w, 1, 20, save_type, 4, 64)
        buck = DeviceExecutor(
            "tvl1", h, w, 1, 20, save_type, 4, 64, width_bucket=64,
        )
        assert buck.width == 192 and buck.w_real == w
        pe = exact.run_chunk(frames.copy(), 10)
        pb = buck.run_chunk(frames.copy(), 10)
        if save_type == "jpg":
            assert pb[0].shape == pe[0].shape == (9, h, w)
            d = np.abs(
                pe[0][:, :, : w // 2].astype(int)
                - pb[0][:, :, : w // 2].astype(int)
            )
            # ~0.4 px at bound=20 (255 levels over +-20 px)
            assert d.mean() < 2.5, d.mean()
        else:
            assert pb.shape == pe.shape == (9, h, w, 2)
            d = np.abs(pe[:, :, : w // 2] - pb[:, :, : w // 2])
            assert d.mean() < 0.4, d.mean()

    def test_same_padded_geometry_shares_solver_shape(self):
        """Two real widths in one bucket solve at the same padded width —
        the compile-cache key (the solver geometry) coincides."""
        a = DeviceExecutor("tvl1", 48, 59, 1, 20, "jpg", 4, 64, width_bucket=32)
        b = DeviceExecutor("tvl1", 48, 52, 1, 20, "jpg", 4, 64, width_bucket=32)
        assert a.width == b.width == 64

    def test_cli_flag_validation(self):
        from denseflow_tpu.cli import main

        assert main(["x.avi", "--widthBucket=-1"]) == 1
