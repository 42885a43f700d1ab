"""Wire codec (wire.py v2): lossless round-trip + executor integration.

The chunk-level codec cuts device-link bytes ~3.3x for quantized flow
(2-bit row deltas + sparse exception fixups, one buffer per chunk) and
must be exactly lossless — the e2e byte-identity suites depend on it being
a no-op semantically. The native C++ decoder and the NumPy fallback must
agree bit-for-bit."""

import numpy as np
import pytest

from denseflow_tpu.wire import (
    EXC_CAP,
    buffer_size,
    codes_width,
    pack_chunk,
    pack_chunk_v3,
    unpack_chunk,
    unpack_chunk_v3,
    v3_max_size,
)


def _pack(q, exc_cap=EXC_CAP):
    return np.asarray(pack_chunk(q, exc_cap))


def roundtrip(q, exc_cap=EXC_CAP, expect_ok=True):
    m, c, h, w = q.shape
    buf = _pack(q, exc_cap)
    assert buf.shape == (buffer_size(m, c, h, w, exc_cap),)
    flags, out = unpack_chunk(buf, m, c, h, w, exc_cap)
    if expect_ok:
        assert flags.all(), "expected packable"
    return flags, out


class TestRoundTrip:
    def test_smooth_round_trips(self, rng):
        # piecewise-constant-ish: deltas in {-1, 0, +1} everywhere
        q = np.cumsum(
            rng.choice([0, 0, 0, 1, 255], (4, 2, 33, 341)).astype(np.uint8),
            axis=-1,
            dtype=np.uint8,
        )
        flags, out = roundtrip(q)
        assert flags.shape == (4,)
        assert (out == q).all()

    def test_sparse_violations_corrected(self, rng):
        q = np.cumsum(
            rng.choice([0, 0, 1, 255], (2, 2, 16, 101)).astype(np.uint8),
            axis=-1,
            dtype=np.uint8,
        )
        # big jumps (2-bit escapes) at scattered positions
        q[0, 0, 3, 40:] += np.uint8(100)
        q[0, 0, 3, 70:] += np.uint8(201)  # second escape in the same row
        q[1, 1, 15, 100] += np.uint8(50)  # last column
        q[0, 1, 0, 1] += np.uint8(77)  # first delta of the array
        flags, out = roundtrip(q)
        assert (out == q).all()

    def test_cap_overflow_flags_not_ok(self, rng):
        q = rng.integers(0, 256, (2, 2, 16, 64), dtype=np.uint8)
        flags, _ = roundtrip(q, exc_cap=16, expect_ok=False)
        assert not flags.any()

    def test_per_pair_flags(self, rng):
        smooth = np.zeros((1, 2, 16, 64), np.uint8) + 7
        noisy = rng.integers(0, 256, (1, 2, 16, 64), dtype=np.uint8)
        q = np.concatenate([smooth, noisy])
        flags, out = roundtrip(q, exc_cap=16, expect_ok=False)
        assert list(flags) == [True, False]
        assert (out[0] == q[0]).all()  # ok pair still decodes exactly

    @pytest.mark.parametrize("w", [1, 2, 3, 4, 5, 8, 127, 340, 341])
    def test_widths(self, rng, w):
        q = np.cumsum(
            rng.choice([0, 1, 255], (2, 3, w)).astype(np.uint8),
            axis=-1,
            dtype=np.uint8,
        ).reshape(2, 1, 3, w)
        assert codes_width(w) == (w - 1 + 3) // 4
        flags, out = roundtrip(q)
        assert (out == q).all()

    def test_mod256_wraparound_deltas(self):
        # 250 -> 251 -> 252 -> ... -> 0 -> 1 crosses the wrap with +1 codes
        q = (np.arange(250, 262, dtype=np.int32) % 256).astype(np.uint8)
        q = q.reshape(1, 1, 1, 12)
        flags, out = roundtrip(q)
        assert (out == q).all()

    def test_full_random_exact_with_big_cap(self, rng):
        # every delta may escape; with cap >= n_deltas decode is still exact
        q = rng.integers(0, 256, (2, 1, 8, 33), dtype=np.uint8)
        flags, out = roundtrip(q, exc_cap=8 * 32)
        assert flags.all()
        assert (out == q).all()

    def test_native_matches_numpy(self, rng):
        from denseflow_tpu import native

        if not (native.available() and native.has_wire()):
            pytest.skip("native wire decoder not built")
        q = np.cumsum(
            rng.choice([0, 0, 1, 255], (6, 2, 48, 131)).astype(np.uint8),
            axis=-1,
            dtype=np.uint8,
        )
        q[1, 0, 7, 90:] += np.uint8(123)  # one escape
        q[4] = rng.integers(0, 256, (2, 48, 131))  # overflow pair
        buf = _pack(q, 64)
        f_np, q_np = unpack_chunk(buf, 6, 2, 48, 131, 64)
        f_nat, q_nat = native.wire_unpack(buf, 6, 2, 48, 131, 64)
        assert (f_np == f_nat).all()
        for p in range(6):
            if f_np[p]:
                assert (q_np[p] == q[p]).all()
                assert (q_nat[p] == q[p]).all()


def roundtrip_v3(q, exc_cap=EXC_CAP, expect_ok=True):
    import jax

    m, c, h, w = q.shape
    buf, used = jax.jit(lambda x: pack_chunk_v3(x, exc_cap))(q)
    used = int(used)
    assert used <= v3_max_size(m, c, h, w, exc_cap)
    flags, out = unpack_chunk_v3(np.asarray(buf)[:used], m, c, h, w, exc_cap)
    if expect_ok:
        assert flags.all(), "expected packable"
        assert (out == q).all()
    return flags, out, used


class TestRoundTripV3:
    """v3 (sparse-group) codec: same lossless contract as v2, plus the
    used-prefix length accounting the executor's bucketed transfer needs."""

    def test_smooth_round_trips_and_shrinks(self, rng):
        q = np.cumsum(
            rng.choice([0] * 8 + [1, 255], (4, 2, 33, 341)).astype(np.uint8),
            axis=-1,
            dtype=np.uint8,
        )
        _, _, used = roundtrip_v3(q)
        # ~20% nonzero deltas must pack well below v2's flat 2 bits/px
        assert used < buffer_size(4, 2, 33, 341) // 2

    def test_sparse_violations_corrected(self, rng):
        q = np.cumsum(
            rng.choice([0, 0, 1, 255], (2, 2, 16, 101)).astype(np.uint8),
            axis=-1,
            dtype=np.uint8,
        )
        q[0, 0, 3, 40:] += np.uint8(100)
        q[0, 0, 3, 70:] += np.uint8(201)
        q[1, 1, 15, 100] += np.uint8(50)
        q[0, 1, 0, 1] += np.uint8(77)
        roundtrip_v3(q)

    def test_per_pair_flags(self, rng):
        smooth = np.zeros((1, 2, 16, 64), np.uint8) + 7
        noisy = rng.integers(0, 256, (1, 2, 16, 64), dtype=np.uint8)
        q = np.concatenate([smooth, noisy])
        flags, out, _ = roundtrip_v3(q, exc_cap=16, expect_ok=False)
        assert list(flags) == [True, False]
        assert (out[0] == q[0]).all()

    @pytest.mark.parametrize("w", [1, 2, 3, 4, 5, 8, 127, 340, 341])
    def test_widths(self, rng, w):
        q = np.cumsum(
            rng.choice([0, 1, 255], (2, 3, w)).astype(np.uint8),
            axis=-1,
            dtype=np.uint8,
        ).reshape(2, 1, 3, w)
        roundtrip_v3(q)

    def test_mod256_wraparound_deltas(self):
        q = (np.arange(250, 262, dtype=np.int32) % 256).astype(np.uint8)
        roundtrip_v3(q.reshape(1, 1, 1, 12))

    def test_full_random_exact_with_big_cap(self, rng):
        q = rng.integers(0, 256, (2, 1, 8, 33), dtype=np.uint8)
        roundtrip_v3(q, exc_cap=8 * 32)

    def test_native_matches_numpy(self, rng):
        from denseflow_tpu import native

        if not (native.available() and native.has_wire_v3()):
            pytest.skip("native wire v3 decoder not built")
        import jax

        q = np.cumsum(
            rng.choice([0, 0, 1, 255], (6, 2, 48, 131)).astype(np.uint8),
            axis=-1,
            dtype=np.uint8,
        )
        q[1, 0, 7, 90:] += np.uint8(123)
        q[4] = rng.integers(0, 256, (2, 48, 131))  # overflow pair
        buf, used = jax.jit(lambda x: pack_chunk_v3(x, 64))(q)
        buf = np.asarray(buf)[: int(used)]
        f_np, q_np = unpack_chunk_v3(buf, 6, 2, 48, 131, 64)
        f_nat, q_nat = native.wire_unpack_v3(buf, 6, 2, 48, 131, 64)
        assert (f_np == f_nat).all()
        for p in range(6):
            if f_np[p]:
                assert (q_np[p] == q[p]).all()
                assert (q_nat[p] == q[p]).all()


class TestRoundTripV4:
    """v4 LOSSLESS float32 codec (the h5 wire path, round 5): bit-exact
    for any bit pattern including NaN/Inf/denormals/-0.0."""

    def _roundtrip(self, flow):
        import jax
        from denseflow_tpu.wire import (
            pack_chunk_v4, unpack_chunk_v4, v4_max_size,
        )

        m, h, w, _ = flow.shape
        buf, used = jax.jit(pack_chunk_v4)(flow)
        buf, used = np.asarray(buf), int(used)
        assert buf.shape == (v4_max_size(m, h, w),)
        assert used <= buf.shape[0]
        out = unpack_chunk_v4(buf[:used], m, h, w)
        assert out.dtype == np.float32 and out.shape == flow.shape
        assert np.array_equal(
            flow.view(np.uint32), out.view(np.uint32)
        ), "v4 must be bit-exact"
        return used

    def test_noise_round_trips(self, rng):
        flow = rng.normal(0, 3, (5, 20, 31, 2)).astype(np.float32)
        self._roundtrip(flow)

    def test_special_values(self, rng):
        flow = rng.normal(0, 1, (2, 8, 9, 2)).astype(np.float32)
        flow[0, 0, 0, 0] = np.inf
        flow[0, 0, 1, 0] = -np.inf
        flow[0, 1, 0, 1] = np.nan
        flow[0, 1, 1, 1] = -0.0
        flow[1, 0, 0, 0] = 1e-42  # denormal
        flow[1, 0, 1, 0] = np.float32(3.4e38)
        self._roundtrip(flow)

    def test_single_column(self, rng):
        flow = rng.normal(0, 2, (3, 6, 1, 2)).astype(np.float32)
        self._roundtrip(flow)

    def test_constant_field_compresses(self, rng):
        flow = np.full((4, 32, 48, 2), -2.5, np.float32)
        used = self._roundtrip(flow)
        # constant rows: only header+seeds+bitmaps; far below raw
        assert used < flow.nbytes / 10

    def test_width_not_multiple_of_groups(self, rng):
        for w in (4, 5, 6, 7):
            flow = rng.normal(0, 2, (2, 7, w, 2)).astype(np.float32)
            self._roundtrip(flow)


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

    @pytest.mark.parametrize("save_type", ["jpg", "png", "h5"])
    def test_packed_matches_unpacked(self, save_type):
        # h5 exercises the v4 float codec (round 5): the wire pack must be
        # a bit-exact no-op on the emitted float32 datasets
        a = self._run(True, save_type)
        b = self._run(False, save_type)
        for x, y in zip(
            a if isinstance(a, tuple) else (a,),
            b if isinstance(b, tuple) else (b,),
        ):
            assert x.shape == y.shape and x.dtype == y.dtype
            assert x.tobytes() == y.tobytes()

    def test_tail_fetch_on_underprediction(self, monkeypatch):
        # the executor starts the D2H of a PREDICTED prefix at dispatch;
        # when the real used length exceeds it, collect must fetch the
        # tail and still decode exactly. Force a hopeless prediction.
        from denseflow_tpu.executor import DeviceExecutor
        import scipy.ndimage as ndi

        rng = np.random.default_rng(9)
        n, h, w = 9, 48, 64
        base = ndi.gaussian_filter(
            rng.uniform(0, 255, (n, h + 8, w + 8)), (0, 2, 2)
        )
        frames = np.clip(base[:, 4 : 4 + h, 4 : 4 + w], 0, 255).astype(np.uint8)

        import denseflow_tpu.executor as exmod

        def run(sabotage):
            ex = DeviceExecutor(
                algorithm="nv", height=h, width=w, step=1, bound=20,
                save_type="jpg", pair_batch=4, chunk_capacity=16,
                preset="fast", n_devices=1, wire_pack=True,
            )
            if sabotage:
                # a 256-byte prediction at 64-byte quantum is far below
                # any real used length -> the tail branch must fire
                monkeypatch.setattr(exmod, "_PREFIX_QUANTUM", 64)
                monkeypatch.setattr(
                    ex, "_predict_used", lambda mb: 256, raising=False
                )
            return ex.run_chunk(frames, n)

        good_x, good_y = run(False)
        tail_x, tail_y = run(True)
        assert (good_x == tail_x).all() and (good_y == tail_y).all()

    def test_bucket_padding_sliced_off(self):
        # 14 frames, step 1 -> 13 pairs, bucketed up to 16 with repeated
        # last-frame padding: padded pairs must be sliced off, and each
        # pair must match its stand-alone solve (per-pair independence)
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
        for i in (8, 9, 12):
            one_x, one_y = ex.run_chunk(frames[i : i + 2].copy(), 2)
            assert (one_x[0] == full_x[i]).all()
            assert (one_y[0] == full_y[i]).all()
