"""Wire codec (wire.py): lossless round-trip + executor integration.

The codec halves device-link bytes for smooth payloads (4-bit deltas +
sparse exception fixups) and must be exactly lossless — the e2e
byte-identity suites depend on it being a no-op semantically."""

import numpy as np
import pytest

from denseflow_tpu.wire import pack_rows, packed_width, unpack_rows


def _np(t):
    import jax

    return jax.tree.map(np.asarray, t)


def roundtrip(q, exc_cap=1024):
    ok, raw0, packed, ei, ev = _np(pack_rows(q, exc_cap))
    assert ok.all(), "expected packable"
    return unpack_rows(raw0, packed, q.shape[-1], ei, ev)


class TestRoundTrip:
    def test_smooth_round_trips(self, rng):
        q = np.cumsum(rng.integers(-7, 8, (4, 2, 33, 341)), axis=-1).astype(
            np.uint8
        )
        ok, raw0, packed, ei, ev = _np(pack_rows(q))
        assert ok.shape == (4,) and ok.all()
        assert (ei == -1).all()  # no violations at all
        assert packed.shape[-1] == packed_width(341)
        assert (unpack_rows(raw0, packed, 341, ei, ev) == q).all()

    def test_sparse_violations_corrected(self, rng):
        q = np.cumsum(rng.integers(-7, 8, (2, 2, 16, 101)), axis=-1).astype(
            np.uint8
        )
        # inject big jumps (delta overflow) at scattered positions,
        # including two in the same row
        q[0, 0, 3, 40:] += 100
        q[0, 0, 3, 70:] += 201  # second violation in the same row
        q[1, 1, 15, 100] += 50  # last column
        q[0, 1, 0, 1] += 77  # first delta of the array
        out = roundtrip(q)
        assert (out == q).all()

    def test_cap_overflow_flags_not_ok(self, rng):
        q = rng.integers(0, 256, (2, 2, 16, 64), dtype=np.uint8)
        ok, *_ = _np(pack_rows(q, exc_cap=16))
        assert not ok.any()

    def test_per_pair_flags(self, rng):
        smooth = np.cumsum(rng.integers(-7, 8, (1, 2, 16, 64)), axis=-1)
        noisy = rng.integers(0, 256, (1, 2, 16, 64))
        q = np.concatenate([smooth, noisy]).astype(np.uint8)
        ok, *_ = _np(pack_rows(q, exc_cap=16))
        assert list(ok) == [True, False]

    @pytest.mark.parametrize("w", [1, 2, 3, 8, 127, 340, 341])
    def test_widths(self, rng, w):
        q = np.cumsum(rng.integers(-7, 8, (2, 3, w)), axis=-1).astype(np.uint8)
        assert (roundtrip(q) == q).all()

    def test_mod256_wraparound_deltas(self):
        # 250 -> 253 -> 0 -> 3 crosses the wrap: deltas are +3 mod 256
        q = np.array([[[250, 253, 0, 3, 252, 251]]], dtype=np.uint8)
        assert (roundtrip(q) == q).all()

    def test_full_random_exact_with_big_cap(self, rng):
        # every delta may violate; with cap >= n_deltas decode is still exact
        q = rng.integers(0, 256, (2, 1, 8, 33), dtype=np.uint8)
        out = roundtrip(q, exc_cap=8 * 32)
        assert (out == q).all()


class TestExecutorIntegration:
    def _run(self, wire_pack, save_type="jpg"):
        from denseflow_tpu.executor import DeviceExecutor
        import scipy.ndimage as ndi

        rng = np.random.default_rng(3)
        n, h, w = 13, 48, 64
        base = ndi.gaussian_filter(
            rng.uniform(0, 255, (n, h + 8, w + 8)), (0, 2, 2)
        )
        frames = np.clip(base[:, 4 : 4 + h, 4 : 4 + w], 0, 255).astype(np.uint8)
        ex = DeviceExecutor(
            algorithm="nv", height=h, width=w, step=1, bound=20,
            save_type=save_type, pair_batch=4, chunk_capacity=16,
            preset="fast", n_devices=1, wire_pack=wire_pack,
        )
        return ex.run_chunk(frames, n)

    @pytest.mark.parametrize("save_type", ["jpg", "png"])
    def test_packed_matches_unpacked(self, save_type):
        a = self._run(True, save_type)
        b = self._run(False, save_type)
        for x, y in zip(
            a if isinstance(a, tuple) else (a,),
            b if isinstance(b, tuple) else (b,),
        ):
            assert x.shape == y.shape
            assert (x == y).all()

    def test_tail_clamp_offsets(self):
        # 14 frames, step 1 -> 13 pairs over batches of 4: the last batch
        # clamps its start back to 9 and yields only its final pair
        from denseflow_tpu.executor import DeviceExecutor
        import scipy.ndimage as ndi

        rng = np.random.default_rng(4)
        h, w = 40, 56
        base = ndi.gaussian_filter(rng.uniform(0, 255, (14, h + 8, w + 8)), (0, 2, 2))
        frames = np.clip(base[:, 4 : 4 + h, 4 : 4 + w], 0, 255).astype(np.uint8)
        ex = DeviceExecutor(
            algorithm="nv", height=h, width=w, step=1, bound=20,
            save_type="jpg", pair_batch=4, chunk_capacity=16,
            preset="fast", n_devices=1,
        )
        full_x, full_y = ex.run_chunk(frames, 14)
        assert full_x.shape[0] == 13
        # pairwise reference: each pair solved alone must match the batched
        # tail-clamped output (per-pair independence)
        for i in (8, 9, 12):
            one_x, one_y = ex.run_chunk(frames[i : i + 2].copy(), 2)
            assert (one_x[0] == full_x[i]).all()
            assert (one_y[0] == full_y[i]).all()
