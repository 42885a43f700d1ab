"""Device executor: turns decoded frame chunks into quantized flow payloads.

This is the TPU-side replacement for the reference's compute thread
(reference src/denseflow_gpu.cpp:282-394), re-designed for XLA and for a
slow host<->device link:

* one jit-compiled **fused chunk step** per (geometry, save_type, pair
  bucket): solve every frame pair of a resident chunk (`lax.map` over
  pair-batch slabs bounds the solver workspace), quantize on device, and
  entropy-pack the whole chunk's payload into ONE 1-D uint8 wire buffer
  (wire.py) — so a chunk costs a single device->host transfer. Measured on
  the remote-chip tunnel each transfer call costs ~27 ms flat + bytes at
  ~35-40 MB/s; per-sub-batch multi-leaf transfers were the round-2
  throughput ceiling;
* the chunk's frames are uploaded to HBM **once**, raw — the transport
  compresses host->device traffic, so packing frames would be wasted work
  (the reference uploads each frame pair separately,
  src/denseflow_gpu.cpp:317-318);
* chunk PAIR counts are bucketed to pair_batch * 2^k so XLA compiles a
  handful of programs per video geometry instead of one per chunk; padded
  pairs repeat the last frame (zero flow, compresses to nothing) and are
  sliced off on the host;
* the raw quantized payload stays resident on device alongside the wire
  buffer; it is only fetched when a pair overflows the codec's exception
  channel (flag False) — the exact-losslessness escape hatch;
* with more than one local device, pairs are **data-parallel over a 1-D
  `pairs` mesh** via `shard_map`: the chunk is replicated to every chip
  (cheap — uint8 frames), each chip solves and packs its own contiguous
  mb/N sub-range (no collectives — pairs share nothing, reference
  src/denseflow_gpu.cpp:313-341), and the per-shard wire buffers
  concatenate along the transfer axis. Replaces the reference's hardcoded
  single device (setDevice(0), src/denseflow_gpu.cpp:482). Per-pair
  convergence freezing makes results byte-identical to the single-device
  path (see algorithms/tvl1.py).

Pair indexing matches the reference (src/denseflow_gpu.cpp:315-316):
a = step>0 ? i : i-step, b = step>0 ? i+step : i, flow computed a -> b.
"""

from __future__ import annotations

from functools import lru_cache
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from denseflow_tpu.algorithms import make_solver
from denseflow_tpu.quantize import quantize_flow_pair, quantize_flow_png
from denseflow_tpu.wire import (
    EXC_CAP,
    pack_chunk_v3_sorted,
    pack_chunk_v4,
    unpack_chunk_v3_fast,
    unpack_chunk_v4_fast,
    v3_fixed_size,
    v4_fixed_size,
)

# Prefix-transfer granularity: v3 transfer sizes are rounded up to this, so
# a handful of slice programs cover every chunk (content-dependent lengths
# would otherwise compile one program per distinct byte count).
_PREFIX_QUANTUM = 512 * 1024


class WireStats:
    """Process-wide device-link byte counters (advisory, for bench/profiling
    attribution — the reference prints only end-to-end fps,
    src/denseflow_gpu.cpp:492-496, leaving the link invisible)."""

    def __init__(self) -> None:
        import threading

        self._lock = threading.Lock()
        self.reset()

    def reset(self) -> None:
        self.h2d_bytes = 0
        self.h2d_calls = 0
        self.d2h_bytes = 0
        self.d2h_calls = 0

    def add_h2d(self, nbytes: int) -> None:
        with self._lock:
            self.h2d_bytes += int(nbytes)
            self.h2d_calls += 1

    def add_d2h(self, nbytes: int) -> None:
        with self._lock:
            self.d2h_bytes += int(nbytes)
            self.d2h_calls += 1

    def snapshot(self) -> dict:
        with self._lock:
            return {
                "h2d_bytes": self.h2d_bytes,
                "h2d_calls": self.h2d_calls,
                "d2h_bytes": self.d2h_bytes,
                "d2h_calls": self.d2h_calls,
            }


WIRE_STATS = WireStats()


@lru_cache(maxsize=64)
def _prefix_fn(nbytes: int):
    """Jitted `buf[:nbytes]` (static size, start 0) for prefix transfer."""
    return jax.jit(lambda b: jax.lax.dynamic_slice(b, (0,), (nbytes,)))


@lru_cache(maxsize=64)
def _tail_fn(nbytes: int):
    """Jitted `buf[start:start+nbytes]` (traced start) for the rare case
    where a chunk's used length exceeds the predicted prefix."""
    return jax.jit(
        lambda b, start: jax.lax.dynamic_slice(b, (start,), (nbytes,))
    )


def _quantize_up(n: int, cap: int) -> int:
    return min(-(-n // _PREFIX_QUANTUM) * _PREFIX_QUANTUM, cap)


class DeviceExecutor:
    """Per-(video geometry, algorithm, save_type) compiled compute step."""

    def __init__(
        self,
        algorithm: str,
        height: int,
        width: int,
        step: int,
        bound: int,
        save_type: str,
        pair_batch: int,
        chunk_capacity: int,
        preset: "str | None" = None,
        n_devices: int = 0,
        wire_pack: bool = True,
        max_disp: int = 0,
        h5_f16: bool = False,
        width_bucket: int = 0,
    ) -> None:
        self.height = height
        # width bucketing (config.width_bucket): solve at a padded width
        # so mixed-resolution lists share a handful of XLA programs; the
        # host crops payloads back to the real width
        self.w_real = width
        if width_bucket > 0:
            width = -(-width // width_bucket) * width_bucket
        self.width = width
        self.step = step
        self.bound = float(bound)
        self.save_type = save_type
        # h5 wire precision: downcast the flow to f16 ON DEVICE before
        # transfer (halves the link bytes of the raw-float worst case;
        # opt-in because it is lossy ~1e-3 relative — config.h5_dtype)
        self.h5_f16 = bool(h5_f16) and save_type == "h5"
        # channels of the quantized payload crossing the wire
        self.n_chan = {"jpg": 2, "png": 3}.get(save_type, 0)
        # the wire codec only applies to uint8 payloads (jpg/png); h5 is
        # raw float32 by contract (reference src/common.cpp:120-150).
        # Both codec versions address exceptions with a 3-byte per-pair
        # flat index, so payloads with >= 2^24 delta positions (e.g. 4K
        # png: 3*2160*3839) fall back to raw transfer.
        self.wire_pack = (
            bool(wire_pack)
            and save_type in ("jpg", "png")
            and self.n_chan * height * max(width - 1, 0) < (1 << 24)
        )
        # LOSSLESS f32 wire codec for the h5 path (wire.pack_chunk_v4,
        # round-5): disk stays bit-exact float32 (reference
        # src/common.cpp:120-150) while the link carries zigzag'd bit-space
        # deltas with sparse-group byte planes (~1.16x on real solver
        # output — entropy-bound content, see wire.py — 10x+ on smooth
        # fields, never worse than 1.032x raw). Exact for ANY bit pattern,
        # so no raw residual is kept on device and there is no fallback
        # flag. f16 wire (lossy opt-in) stays a raw transfer: its payload
        # is already half size and its low bytes are pure noise.
        self.wire_f32 = (
            bool(wire_pack) and save_type == "h5" and not self.h5_f16
        )
        devs = jax.local_devices()
        if n_devices > 0:
            devs = devs[:n_devices]
        self.n_dev = len(devs)
        self._devs = devs
        # pair-batch slab: a multiple of the mesh size so every chip gets
        # an equal share of every slab
        self.B = -(-pair_batch // self.n_dev) * self.n_dev
        self.astep = abs(step)
        # largest pair bucket (chunk_capacity is the max pairs per chunk)
        self.max_pairs = self._bucket(max(chunk_capacity, self.B))
        # the solver's effective displacement clamp (for the saturation
        # signal that drives auto-escalation — pipeline.py)
        self.max_disp_eff = max_disp if max_disp > 0 else 40
        self._solver = make_solver(algorithm, height, width, preset, max_disp)
        self._off_a = 0 if step > 0 else self.astep
        self._off_b = step if step > 0 else 0
        self._packs: dict = {}  # n_slabs -> jitted concat+pack step
        if self.n_dev == 1:
            self._sharding = None
            self._mesh = None
            self._slab = jax.jit(
                lambda frames, s: self._solve_q(frames, s, self.B)
            )
        else:
            self._mesh = Mesh(np.asarray(devs), ("pairs",))
            self._sharding = NamedSharding(self._mesh, P())  # replicated
            from jax import shard_map

            b_loc = self.B // self.n_dev

            def slab_local(frames, s):
                r = jax.lax.axis_index("pairs")
                return self._solve_q(frames, s + r * b_loc, b_loc)

            # check_vma off: the carry mixes replicated inputs with values
            # made device-varying by axis_index, which the static
            # varying-axis checker can't type through lax.while_loop
            self._slab = jax.jit(
                shard_map(
                    slab_local,
                    mesh=self._mesh,
                    in_specs=(P(), P()),
                    out_specs=(P("pairs"), P("pairs")),
                    check_vma=False,
                )
            )

    # ---------------- shape bucketing ----------------
    def _bucket(self, n: int) -> int:
        """Smallest B * 2^k >= n: a handful of compiles per geometry."""
        mb = self.B
        while mb < n:
            mb *= 2
        return mb

    def _padded_len(self, n: int) -> int:
        """Frames to upload for a chunk of n real frames."""
        m = max(n - self.astep, 0)
        return self._bucket(max(m, 1)) + self.astep

    # ---------------- compiled chunk step ----------------
    def _solve_q(self, frames: jnp.ndarray, s, n_pairs: int):
        """Solve pairs [s, s+n_pairs) of the resident (N, H, W) chunk into
        (payload, sat): the save_type's device payload ((n, 2|3, H, W)
        uint8 or flow float) plus a per-pair CLAMP-SATURATION fraction —
        the share of pixels whose flow sits at the masked-shift warp's
        displacement clamp. Near-free (one compare + reduction) and the
        signal behind auto-escalation (the reference's CUDA warp is
        unclamped, src/denseflow_gpu.cpp:327; saturation means motion the
        clamp is hiding)."""
        h, w = self.height, self.width
        I0 = jax.lax.dynamic_slice(
            frames, (s + self._off_a, 0, 0), (n_pairs, h, w)
        )
        I1 = jax.lax.dynamic_slice(
            frames, (s + self._off_b, 0, 0), (n_pairs, h, w)
        )
        flow = self._solver(I0, I1)
        thresh = jnp.float32(0.98 * self.max_disp_eff)
        sat = jnp.mean(
            (jnp.max(jnp.abs(flow), axis=-1) >= thresh).astype(jnp.float32),
            axis=(-2, -1),
        )
        if self.save_type == "h5":
            if self.h5_f16:
                return flow.astype(jnp.float16), sat
            return flow, sat  # raw float32 (n, H, W, 2)
        if self.save_type == "jpg":
            qx, qy = quantize_flow_pair(flow, self.bound)
            return jnp.stack([qx, qy], axis=1), sat  # (n, 2, H, W)
        return jnp.moveaxis(quantize_flow_png(flow), -1, 1), sat

    def _get_pack(self, n_slabs: int):
        """Jitted chunk assembly for n_slabs solved slabs: concatenate and
        (jpg/png) entropy-pack into the single wire buffer.

        Kept SEPARATE from the solver on purpose: the solver always runs
        at slab granularity (one compiled program per frames shape), so
        its floating-point behavior cannot depend on the chunk's pair
        bucket — the chunk-grouping and multi-device byte-identity
        contracts (tests/test_pipeline_e2e.py stress suite,
        tests/test_sharding.py) rely on that. This assembly step is
        integer-only (concat + bit packing), which XLA can fuse however it
        likes without being able to change a byte."""
        fn = self._packs.get(n_slabs)
        if fn is not None:
            return fn
        do_pack = self.wire_pack
        do_f32 = self.wire_f32

        if self.n_dev == 1:

            def pack_step(slabs):
                q = slabs[0] if n_slabs == 1 else jnp.concatenate(slabs)
                if do_f32:
                    # v4 lossless float codec (h5): exact for any bits, no
                    # raw residual needed
                    return pack_chunk_v4(q)
                if not do_pack:
                    return q
                # v3 (sort-based producer — the scatter pack measured
                # 0.7 s/chunk on device, 4x the solve; wire.py); only
                # buf[:used] crosses the link
                return pack_chunk_v3_sorted(q, EXC_CAP), q

            fn = jax.jit(pack_step)
        else:
            from jax import shard_map

            def pack_local(slabs):
                q = slabs[0] if n_slabs == 1 else jnp.concatenate(slabs)
                if do_f32:
                    buf, used = pack_chunk_v4(q)
                    return buf, used.reshape(1)
                if not do_pack:
                    return q
                # v3 per shard: each chip entropy-packs its own pair range
                # and reports its own used length, so the host can fetch
                # per-shard used PREFIXES instead of the fixed v2 layout
                # (round-3 verdict item 3: the multi-dev path paid ~2.6x
                # the single-dev D2H bytes)
                buf, used = pack_chunk_v3_sorted(q, EXC_CAP)
                return buf, used.reshape(1), q

            in_spec = tuple(P("pairs") for _ in range(n_slabs))
            if do_f32:
                out_spec = (P("pairs"), P("pairs"))
            elif do_pack:
                out_spec = (P("pairs"), P("pairs"), P("pairs"))
            else:
                out_spec = P("pairs")
            fn = jax.jit(
                shard_map(
                    pack_local,
                    mesh=self._mesh,
                    in_specs=(in_spec,),
                    out_specs=out_spec,
                    check_vma=False,
                )
            )
        self._packs[n_slabs] = fn
        return fn

    def _deinterleave(self, a: np.ndarray, n_slabs: int) -> np.ndarray:
        """Undo the multi-device pack's pair ordering.

        With N devices, slab j's pairs are interleaved across chips
        (chip r holds [j*B + r*B_loc, j*B + (r+1)*B_loc)); the pack step
        concatenates each chip's local slabs, so the transferred order is
        chip-major. Global pair order = transpose back to slab-major."""
        if self.n_dev == 1 or n_slabs == 1:
            return a
        b_loc = self.B // self.n_dev
        a = a.reshape((self.n_dev, n_slabs, b_loc) + a.shape[1:])
        return np.ascontiguousarray(a.swapaxes(0, 1)).reshape(
            (self.n_dev * n_slabs * b_loc,) + a.shape[3:]
        )

    # ---------------- host-side chunk I/O ----------------
    def upload_chunk(self, frames: np.ndarray) -> "jax.Array | np.ndarray":
        """Pad/bucket host-side and start the async H2D upload.

        Called from the decode stage so the wire transfer of chunk i+1
        overlaps the device solve of chunk i (the reference overlaps decode
        with compute but uploads synchronously per pair,
        src/denseflow_gpu.cpp:317-318)."""
        n = frames.shape[0]
        if n - self.astep <= 0:
            return frames
        if self.width > self.w_real:
            # edge-replicate the padded columns: the solver sees a flat
            # extension, so real-region flow matches the exact-W solve
            # away from the right border
            pad = np.repeat(frames[:, :, -1:], self.width - self.w_real, axis=2)
            frames = np.concatenate([frames, pad], axis=2)
        n_pad = self._padded_len(n)
        if n_pad > n:
            pad = np.repeat(frames[-1:], n_pad - n, axis=0)
            frames = np.concatenate([frames, pad], axis=0)
        WIRE_STATS.add_h2d(frames.nbytes)
        if self._sharding is not None:
            return jax.device_put(frames, self._sharding)
        return jax.device_put(frames)

    def dispatch_chunk(self, frames, n_frames: int) -> list:
        """Dispatch the whole chunk's compute and start the D2H copy of its
        wire buffer. Returns an opaque list for `collect_chunk`. The
        pipeline dispatches chunk i+1 before collecting chunk i, so the
        chip computes through chunk i's transfer drain.

        frames: (N', H, W) uint8, already padded/uploaded by
        `upload_chunk` (a raw np array is accepted and uploaded here as a
        fallback). n_frames: the chunk's REAL frame count incl. halo; the
        chunk has m = n_frames - |step| pairs, padded pairs are sliced off
        host-side."""
        m = n_frames - self.astep
        if m <= 0:
            return []
        if isinstance(frames, np.ndarray):
            frames = self.upload_chunk(frames)
        mb = frames.shape[0] - self.astep
        n_slabs = mb // self.B
        pairs = tuple(self._slab(frames, s) for s in range(0, mb, self.B))
        slabs = tuple(p for p, _ in pairs)
        sats = tuple(sa for _, sa in pairs)
        for sa in sats:
            sa.copy_to_host_async()
        out = self._get_pack(n_slabs)(slabs)
        if self.wire_pack or self.wire_f32:
            if self.n_dev == 1:
                # start the D2H of a PREDICTED prefix immediately — no
                # length round-trip gates the big transfer; collect fetches
                # the (rare) tail beyond the prediction separately
                if self.wire_f32:
                    # v4 payloads are huge (tens of MB/chunk) and the
                    # codec ratio is modest (~1.16x on noisy-mantissa
                    # content): the 10% prediction margin would hand back
                    # most of the compression. Fetch the exact used length
                    # first — one ~32 ms scalar round-trip per multi-
                    # second chunk transfer — and ship the exact
                    # (quantum-rounded) prefix, never a tail.
                    (buf, _), q = out, None
                    used = int(np.asarray(out[1]))
                else:
                    (buf, used), q = out
                    used.copy_to_host_async()
                total = buf.shape[0]
                if self.wire_f32:
                    pred = _quantize_up(used, total)
                else:
                    pred = _quantize_up(self._predict_used(mb), total)
                pref = buf if pred >= total else _prefix_fn(pred)(buf)
                pref.copy_to_host_async()
                return [(((buf, used, pref, pred), q), m, mb, sats)]
            # multi-device v3/v4: per-shard predicted-prefix transfers
            # (each shard's buffer lives on its own chip; slicing the
            # shard data directly keeps the transfer chip-local)
            if self.wire_f32:
                (buf, used), q = out, None
                used_host = np.asarray(used)  # exact lengths (see above)
            else:
                buf, used, q = out
                used.copy_to_host_async()
                used_host = None
            shards = self._shard_data(buf)
            total = shards[0].shape[0]
            m_loc = mb // self.n_dev
            prefs = []
            if used_host is not None:
                pred = [
                    _quantize_up(int(u), total) for u in used_host
                ]
                for sd, pr in zip(shards, pred):
                    pref = sd if pr >= total else _prefix_fn(pr)(sd)
                    pref.copy_to_host_async()
                    prefs.append(pref)
            else:
                pred = _quantize_up(self._predict_used(m_loc), total)
                for sd in shards:
                    pref = sd if pred >= total else _prefix_fn(pred)(sd)
                    pref.copy_to_host_async()
                    prefs.append(pref)
            return [(((shards, used, prefs, pred), q), m, mb, sats)]
        else:
            out.copy_to_host_async()
        return [(out, m, mb, sats)]

    @staticmethod
    def _shard_data(arr) -> list:
        """Per-device pieces of a 1-D `pairs`-sharded array, in global
        offset order."""
        shards = sorted(arr.addressable_shards, key=lambda s: s.index[0].start or 0)
        return [s.data for s in shards]

    # Bytes/pair assumed (as a multiple of the per-pair group count) when
    # no chunk of this geometry has been measured yet. Deliberately
    # GENEROUS (1.6x the codes region): decoded-video content measured
    # ~1.6 bytes/group once the 4-byte exception entries are counted, and
    # an under-prediction puts a tail-fetch round-trip on the FIRST
    # chunk's critical path every run; over-prediction costs only extra
    # prefix bytes on that one chunk before _note_used tightens it.
    _BPP_INIT_OCCUPANCY = 1.6
    # Headroom over the last measured bytes/pair: under-prediction costs a
    # second (tail) transfer round-trip, over-prediction only extra bytes.
    _BPP_MARGIN = 1.1

    def _fixed_size(self, mb: int) -> int:
        if self.wire_f32:
            return v4_fixed_size(mb, self.height, self.width)
        return v3_fixed_size(mb, self.n_chan, self.height, self.width)

    def _predict_used(self, mb: int) -> int:
        # v3 only: v4 (h5) fetches the exact used length before the big
        # transfer — its payloads are too large and its ratio too tight
        # for a 10% guess margin (dispatch_chunk)
        fixed = self._fixed_size(mb)
        bpp = getattr(self, "_bpp_est", None)
        if bpp is None:
            from denseflow_tpu.wire import _v3_geom

            _, _, _, ng, _ = _v3_geom(self.n_chan, self.height, self.width)
            bpp = self._BPP_INIT_OCCUPANCY * ng
        return int(fixed + self._BPP_MARGIN * bpp * mb)

    def _note_used(self, used: int, mb: int) -> None:
        self._bpp_est = max(used - self._fixed_size(mb), 0) / max(mb, 1)

    def collect_chunk(self, outs: list):
        """Yield (payload, pair_offset, n_pairs) per dispatched chunk.
        jpg -> (imgs_x, imgs_y) uint8 (m, H, W); png -> (m, H, W, 3) uint8;
        h5 -> (m, H, W, 2) float32."""
        for out, m, mb, _sats in outs:
            n_slabs = mb // self.B
            if not (self.wire_pack or self.wire_f32):
                arr = np.asarray(out)
                WIRE_STATS.add_d2h(arr.nbytes)
                q = self._deinterleave(arr, n_slabs)[:m]
            elif self.n_dev == 1:
                (buf_dev, used_dev, pref, pred), q_dev = out
                used = int(np.asarray(used_dev))
                self._note_used(used, mb)
                if used <= pred:
                    arr = np.asarray(pref)
                    WIRE_STATS.add_d2h(arr.nbytes)
                else:
                    tail_n = _quantize_up(used - pred, buf_dev.shape[0] - pred)
                    tail = _tail_fn(tail_n)(buf_dev, np.int32(pred))
                    arr = np.concatenate(
                        [np.asarray(pref), np.asarray(tail)[: used - pred]]
                    )
                    WIRE_STATS.add_d2h(pred + tail_n)
                if self.wire_f32:
                    q = unpack_chunk_v4_fast(arr, mb, self.height, self.width)
                else:
                    flags, q = unpack_chunk_v3_fast(
                        arr, mb, self.n_chan, self.height, self.width,
                        EXC_CAP,
                    )
                    if not flags[:m].all():
                        # a pair overflowed the codec's exception channel:
                        # fetch the exact raw payload kept on device
                        q = np.asarray(q_dev)
                        WIRE_STATS.add_d2h(q.nbytes)
                q = q[:m]
            else:
                (shards, used_dev, prefs, pred), q_dev = out
                used = np.asarray(used_dev)
                m_loc = mb // self.n_dev
                self._note_used(int(used.sum()) // self.n_dev, m_loc)
                flags_l, q_l = [], []
                for r, (sd, pref) in enumerate(zip(shards, prefs)):
                    u = int(used[r])
                    # v4 ships exact per-shard prefixes (pred is a list)
                    pr = pred[r] if isinstance(pred, list) else pred
                    if u <= pr:
                        arr = np.asarray(pref)
                        WIRE_STATS.add_d2h(arr.nbytes)
                    else:
                        tail_n = _quantize_up(u - pr, sd.shape[0] - pr)
                        tail = _tail_fn(tail_n)(sd, np.int32(pr))
                        arr = np.concatenate(
                            [np.asarray(pref), np.asarray(tail)[: u - pr]]
                        )
                        WIRE_STATS.add_d2h(pr + tail_n)
                    if self.wire_f32:
                        f_r = np.ones((m_loc,), bool)
                        q_r = unpack_chunk_v4_fast(
                            arr, m_loc, self.height, self.width
                        )
                    else:
                        f_r, q_r = unpack_chunk_v3_fast(
                            arr, m_loc, self.n_chan, self.height,
                            self.width, EXC_CAP,
                        )
                    flags_l.append(f_r)
                    q_l.append(q_r)
                flags = self._deinterleave(np.concatenate(flags_l), n_slabs)
                if flags[:m].all():
                    q = self._deinterleave(np.concatenate(q_l), n_slabs)
                else:
                    # a pair overflowed the codec's exception channel:
                    # fetch the exact raw payload kept on device
                    q = self._deinterleave(np.asarray(q_dev), n_slabs)
                    WIRE_STATS.add_d2h(q.nbytes)
                q = q[:m]
            if self.save_type == "h5":
                # disk datasets are float32 regardless of wire precision
                # (reference src/common.cpp:120-150)
                yield np.asarray(q[:, :, : self.w_real], np.float32), 0, m
            elif self.save_type == "jpg":
                q = q[..., : self.w_real]
                yield (q[:, 0], q[:, 1]), 0, m
            else:
                yield np.moveaxis(q[..., : self.w_real], 1, -1), 0, m

    def saturation_frac(self, outs: list) -> float:
        """Max per-pair clamp-saturation fraction across a dispatched
        chunk (see _solve_q). The pipeline re-dispatches a chunk through
        an escalated-clamp executor when this crosses its threshold."""
        worst = 0.0
        for _, _, _, sats in outs:
            for sa in sats:
                worst = max(worst, float(np.max(np.asarray(sa))))
        return worst

    def iter_chunk(self, frames, n_frames: int):
        """dispatch_chunk + collect_chunk in one call (single-chunk use)."""
        yield from self.collect_chunk(self.dispatch_chunk(frames, n_frames))

    def run_chunk(
        self, frames, n_frames: int
    ) -> np.ndarray | Tuple[np.ndarray, np.ndarray]:
        """Blocking form of `iter_chunk`: the whole chunk's payload at once."""
        outs = [p for p, _, _ in self.iter_chunk(frames, n_frames)]
        if not outs:
            if self.save_type == "jpg":
                e = np.empty((0, self.height, self.w_real), np.uint8)
                return e, e
            if self.save_type == "png":
                return np.empty((0, self.height, self.w_real, 3), np.uint8)
            return np.empty((0, self.height, self.w_real, 2), np.float32)
        if isinstance(outs[0], tuple):
            xs = np.concatenate([o[0] for o in outs], axis=0)
            ys = np.concatenate([o[1] for o in outs], axis=0)
            return xs, ys
        return np.concatenate(outs, axis=0)


# Serializes executor CONSTRUCTION: lru_cache does not lock the factory,
# and concurrent decode workers hitting a cold key would otherwise build
# duplicate DeviceExecutors (duplicate jit programs). Coarse single lock:
# construction is rare (once per geometry) and cheap relative to compile.
_executor_lock = __import__("threading").Lock()


@lru_cache(maxsize=64)
def _get_executor_locked(*key) -> DeviceExecutor:
    return DeviceExecutor(*key)


def get_executor(
    algorithm: str,
    height: int,
    width: int,
    step: int,
    bound: int,
    save_type: str,
    pair_batch: int,
    chunk_capacity: int,
    preset: "str | None" = None,
    n_devices: int = 0,
    wire_pack: bool = True,
    max_disp: int = 0,
    h5_f16: bool = False,
    width_bucket: int = 0,
) -> DeviceExecutor:
    key = (
        algorithm, height, width, step, bound, save_type, pair_batch,
        chunk_capacity, preset, n_devices, wire_pack, max_disp, h5_f16,
        width_bucket,
    )
    with _executor_lock:
        return _get_executor_locked(*key)
