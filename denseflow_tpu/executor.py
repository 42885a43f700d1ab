"""Device executor: turns decoded frame chunks into quantized flow payloads.

This is the TPU-side replacement for the reference's compute thread
(reference src/denseflow_gpu.cpp:282-394), re-designed for XLA:

* one jit-compiled **fused step** per (geometry, save_type): slice a batch
  of B frame pairs out of the resident chunk (`lax.dynamic_slice` — a single
  compile covers every batch offset), solve, quantize on device, and pack
  the quantized payload for the wire (wire.py) — only packed/quantized
  uint8 (jpg/png) or float32 (h5) results cross back to the host;
* the chunk's frames are uploaded to HBM **once** and all pair batches
  slice from them (the reference uploads each frame pair separately,
  src/denseflow_gpu.cpp:317-318); the final sub-batch of a chunk is
  **clamp-aligned** (its start shifts back so it stays in range) instead of
  padding the chunk past its real length, so no wasted frames cross the
  host->device link — per-pair solver independence makes the overlapping
  recomputed pairs byte-identical;
* chunk PAIR counts are bucketed to a few static sizes so XLA compiles a
  handful of programs per video geometry instead of one per chunk;
* with more than one local device, the pair batch is **data-parallel over a
  1-D `pairs` mesh** via `shard_map`: the chunk is replicated to every chip
  (cheap — uint8 frames), each chip slices and solves its own B/N sub-batch
  (no collectives — pairs share nothing, reference src/denseflow_gpu.cpp:313-341),
  and results gather on the host D2H. Replaces the reference's
  hardcoded single device (setDevice(0), src/denseflow_gpu.cpp:482).
  Per-pair convergence freezing makes results byte-identical to the
  single-device path (see algorithms/tvl1.py).

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
from denseflow_tpu.wire import pack_rows, unpack_rows

_BUCKETS = (32, 64, 128, 256, 512)


def _bucket(n: int, cap: int) -> int:
    for b in _BUCKETS:
        if n <= b:
            return min(b, cap)
    return cap


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
    ) -> None:
        self.height = height
        self.width = width
        self.step = step
        self.bound = float(bound)
        self.save_type = save_type
        # the wire codec only applies to uint8 payloads (jpg/png); h5 is
        # raw float32 by contract (reference src/common.cpp:120-150)
        self.wire_pack = bool(wire_pack) and save_type in ("jpg", "png")
        devs = jax.local_devices()
        if n_devices > 0:
            devs = devs[:n_devices]
        self.n_dev = len(devs)
        # global pair batch: a multiple of the mesh size so every chip gets
        # an equal sub-batch
        self.B = -(-pair_batch // self.n_dev) * self.n_dev
        self.astep = abs(step)
        # pair-count bucket cap (chunk_capacity is the max pairs per chunk)
        self.max_pairs = max(chunk_capacity, self.B)
        solver = make_solver(algorithm, height, width, preset)
        off_a = 0 if step > 0 else self.astep
        off_b = step if step > 0 else 0
        bound_f = self.bound
        do_pack = self.wire_pack

        def solve_slice(frames: jnp.ndarray, s, n_pairs: int):
            """Solve pairs [s, s+n_pairs) of the resident (N, H, W) chunk."""
            I0 = jax.lax.dynamic_slice(
                frames, (s + off_a, 0, 0), (n_pairs, height, width)
            )
            I1 = jax.lax.dynamic_slice(
                frames, (s + off_b, 0, 0), (n_pairs, height, width)
            )
            flow = solver(I0, I1)
            if save_type == "h5":
                return flow  # raw float32
            if save_type == "jpg":
                qx, qy = quantize_flow_pair(flow, bound_f)
                q = jnp.stack([qx, qy], axis=1)  # (B, 2, H, W)
            else:  # png
                q = jnp.moveaxis(quantize_flow_png(flow), -1, 1)  # (B, 3, H, W)
            if not do_pack:
                return q
            ok, raw0, packed, exc_idx, exc_val = pack_rows(q)
            return ok, raw0, packed, exc_idx, exc_val, q

        if self.n_dev == 1:
            self._sharding = None
            self._step = jax.jit(lambda frames, s: solve_slice(frames, s, self.B))
        else:
            # Data-parallel over pairs: chunk replicated to every chip, each
            # chip solves its own contiguous B/N sub-batch (offset by its
            # mesh coordinate); outputs concatenate along the pair axis.
            # No collectives — pairs are independent.
            from jax import shard_map

            mesh = Mesh(np.asarray(devs), ("pairs",))
            self._sharding = NamedSharding(mesh, P())  # replicated chunk
            B_local = self.B // self.n_dev

            def pair_step_local(frames: jnp.ndarray, s):
                r = jax.lax.axis_index("pairs")
                return solve_slice(frames, s + r * B_local, B_local)

            if save_type == "h5" or not do_pack:
                out_spec = P("pairs")
            else:
                out_spec = (P("pairs"),) * 6
            # check_vma off: the carry mixes replicated inputs with values
            # made device-varying by axis_index, which the static
            # varying-axis checker can't type through lax.while_loop
            self._step = jax.jit(
                shard_map(
                    pair_step_local,
                    mesh=mesh,
                    in_specs=(P(), P()),
                    out_specs=out_spec,
                    check_vma=False,
                )
            )

    def _padded_len(self, n: int) -> int:
        """Frames to upload for a chunk of n real frames: pair count
        bucketed to a few static sizes (bounds XLA recompiles), plus halo."""
        m = max(n - self.astep, 0)
        return _bucket(max(m, self.B), self.max_pairs) + self.astep

    def upload_chunk(self, frames: np.ndarray) -> "jax.Array | np.ndarray":
        """Pad/bucket host-side and start the async H2D upload.

        Called from the decode stage so the wire transfer of chunk i+1
        overlaps the device solve of chunk i (the reference overlaps decode
        with compute but uploads synchronously per pair,
        src/denseflow_gpu.cpp:317-318)."""
        n = frames.shape[0]
        if n - self.astep <= 0:
            return frames
        n_pad = self._padded_len(n)
        if n_pad > n:
            pad = np.repeat(frames[-1:], n_pad - n, axis=0)
            frames = np.concatenate([frames, pad], axis=0)
        if self._sharding is not None:
            return jax.device_put(frames, self._sharding)
        return jax.device_put(frames)

    def _collect(self, out) -> "np.ndarray | Tuple[np.ndarray, np.ndarray]":
        """Materialize one sub-batch on the host in its consumer layout."""
        if self.save_type == "h5":
            return np.asarray(out)
        if self.wire_pack:
            ok, raw0, packed, exc_idx, exc_val, q_dev = out
            if np.asarray(ok).all():
                q = unpack_rows(
                    np.asarray(raw0), np.asarray(packed), self.width,
                    np.asarray(exc_idx), np.asarray(exc_val),
                )
            else:
                # a pair's deltas overflowed 4 bits: fall back to the raw
                # payload for this sub-batch (still exact, just unpacked)
                q = np.asarray(q_dev)
        else:
            q = np.asarray(out)
        if self.save_type == "jpg":
            return q[:, 0], q[:, 1]
        return np.moveaxis(q, 1, -1)  # png: back to (B, H, W, 3)

    def dispatch_chunk(self, frames, n_frames: int) -> list:
        """Dispatch every sub-batch of a chunk asynchronously and start the
        D2H copies of the wire-format leaves. Returns an opaque list for
        `collect_chunk`. Dispatching chunk i+1 before collecting chunk i
        keeps the chip busy through chunk i's D2H drain (the pipeline's
        compute stage holds a small in-flight window of chunks).

        frames: (N', H, W) uint8, already padded/uploaded by
        `upload_chunk` (a raw np array is accepted and uploaded here as a
        fallback). n_frames: the chunk's REAL frame count incl. halo. The
        chunk has M = n_frames - |step| pairs. The last sub-batch clamps
        its start back into range instead of relying on padded frames
        (pairs recomputed in the overlap are byte-identical by per-pair
        independence)."""
        m = n_frames - self.astep
        if m <= 0:
            return []
        if isinstance(frames, np.ndarray):
            frames = self.upload_chunk(frames)

        outs = []
        for s in range(0, m, self.B):
            s_eff = min(s, max(m - self.B, 0))
            out = self._step(frames, s_eff)
            if self.wire_pack and self.save_type != "h5":
                # optimistic: transfer flag + packed form + exceptions; the
                # raw payload stays on device unless a flag comes back False
                for leaf in out[:5]:
                    leaf.copy_to_host_async()
            else:
                for leaf in jax.tree.leaves(out):
                    leaf.copy_to_host_async()
            outs.append((out, s, s_eff, m))
        return outs

    def collect_chunk(self, outs: list):
        """Yield (payload, pair_offset, n_pairs) for a dispatched chunk, in
        order, as each sub-batch's D2H lands."""
        for out, s, s_eff, m in outs:
            n = min(self.B, m - s)
            off = s - s_eff
            payload = self._collect(out)
            if isinstance(payload, tuple):
                yield (payload[0][off : off + n], payload[1][off : off + n]), s, n
            else:
                yield payload[off : off + n], s, n

    def iter_chunk(self, frames, n_frames: int):
        """dispatch_chunk + collect_chunk in one call (single-chunk use)."""
        yield from self.collect_chunk(self.dispatch_chunk(frames, n_frames))

    def run_chunk(
        self, frames, n_frames: int
    ) -> np.ndarray | Tuple[np.ndarray, np.ndarray]:
        """Blocking form of `iter_chunk`: the whole chunk's payload at once.
        jpg -> (imgs_x, imgs_y) uint8 (M, H, W); png -> (M, H, W, 3) uint8;
        h5 -> (M, H, W, 2) float32."""
        outs = [p for p, _, _ in self.iter_chunk(frames, n_frames)]
        if not outs:
            if self.save_type == "jpg":
                e = np.empty((0, self.height, self.width), np.uint8)
                return e, e
            if self.save_type == "png":
                return np.empty((0, self.height, self.width, 3), np.uint8)
            return np.empty((0, self.height, self.width, 2), np.float32)
        if isinstance(outs[0], tuple):
            xs = np.concatenate([o[0] for o in outs], axis=0)
            ys = np.concatenate([o[1] for o in outs], axis=0)
            return xs, ys
        return np.concatenate(outs, axis=0)


@lru_cache(maxsize=16)
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
) -> DeviceExecutor:
    return DeviceExecutor(
        algorithm, height, width, step, bound, save_type, pair_batch,
        chunk_capacity, preset, n_devices, wire_pack,
    )
