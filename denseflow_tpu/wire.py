"""Lossless wire codec for device->host flow payloads (v2, chunk-level).

The product runs against remote TPU chips (axon tunnels in dev, split
host/accelerator deployments in production) where the device link — not the
solver — bounds end-to-end throughput. Measured on the dev tunnel:

* D2H moves ~35-40 MB/s regardless of content (no transparent compression
  downstream) with a ~27 ms fixed cost PER TRANSFER CALL;
* H2D is transparently compressed by the transport (smooth frames move at
  >1 GB/s effective), so frames go up raw.

The reference never faces this (its GPU is on the local PCIe bus and it
downloads raw float flow per pair, reference src/denseflow_gpu.cpp:339); a
TPU-native design must keep bytes — and round trips — off the slow link.
Hence two rules implemented here:

1. **One buffer per chunk.** All wire sections (flags, seeds, codes,
   exceptions) concatenate into a single 1-D uint8 array on device, so a
   whole chunk of pairs costs ONE host transfer instead of one per leaf
   per sub-batch.
2. **2-bit row-delta entropy packing.** Quantized TV-regularized flow is
   piecewise constant: measured on solver output, >99.6 % of horizontal
   neighbor deltas are in {-1, 0, +1}. Per row, column 0 is raw and the
   W-1 deltas are 2-bit codes {0: +0, 1: +1, 2: -1, 3: escape}, packed
   four per byte. Escape positions contribute delta 0 and their true
   mod-256 delta goes to a fixed-capacity per-pair exception channel
   (3-byte flat index + 1-byte value). Decode is: expand codes, ADD the
   exception values onto the delta array, prefix-sum mod 256, seed with
   the raw column — exactly lossless.

A pair with more than EXC_CAP escapes raises its per-pair flag and the
executor falls back to fetching that chunk's raw payload (kept on device) —
the codec is exactly lossless either way.

Wire cost: ~0.25x payload bytes + 4*EXC_CAP + c*h + 1 per pair
(~52 KB/pair at 256p jpg vs 174 KB raw: ~3.3x fewer bytes on the link).

Device side (`pack_chunk`) is pure jnp inside the executor's jitted chunk
step; host side (`unpack_chunk`) has a threaded C++ fast path
(native/wire.cpp, single pass per pair) with a vectorized NumPy fallback.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

# max escape (non {-1,0,+1} delta) pixels per frame-pair before the
# executor falls back to the raw payload for the chunk
EXC_CAP = 2048

_PAD_IDX = 0xFFFFFF  # 3-byte sentinel for unused exception slots


def codes_width(w: int) -> int:
    """Packed code bytes per row of w pixels (4 two-bit codes per byte)."""
    return (w - 1 + 3) // 4


def buffer_size(m: int, c: int, h: int, w: int, exc_cap: int = EXC_CAP) -> int:
    """Total wire-buffer bytes for m pairs of (c, h, w) uint8 payload."""
    rows = c * h
    return m * (1 + rows + rows * codes_width(w) + 4 * exc_cap)


def pack_chunk(q: jnp.ndarray, exc_cap: int = EXC_CAP) -> jnp.ndarray:
    """Device-side pack of a (M, C, H, W) uint8 payload -> 1-D uint8 buffer.

    Buffer layout (sizes static given the shape; rows = C*H, n = W-1,
    cw = codes_width(W)):
      flags    M bytes          1 where the pair decodes from the wire
      raw0     M*rows           first column of every row
      codes    M*rows*cw        2-bit deltas {+0, +1, -1, escape}, 4/byte
      idx_lo   M*exc_cap        exception flat index (into the pair's
      idx_mid  M*exc_cap          (rows, n) delta array), little-endian
      idx_hi   M*exc_cap          3-byte; 0xFFFFFF pads unused slots
      exc_val  M*exc_cap        true mod-256 delta byte of the escape
    """
    m, _, _, w = q.shape
    n = w - 1
    if n <= 0:  # single-column payload: seeds only, no deltas
        pad_idx = jnp.full((3 * m * exc_cap,), 0xFF, jnp.uint8)
        return jnp.concatenate(
            [
                jnp.ones((m,), jnp.uint8),
                q[..., :1].reshape(-1),
                pad_idx,
                jnp.zeros((m * exc_cap,), jnp.uint8),
            ]
        )
    qi = q.astype(jnp.int32)
    d = (qi[..., 1:] - qi[..., :-1]) & 0xFF  # mod-256 deltas, (M,C,H,n)
    code = jnp.where(
        d == 0, 0, jnp.where(d == 1, 1, jnp.where(d == 255, 2, 3))
    ).astype(jnp.uint8)
    viol = code == 3
    viol_flat = viol.reshape(m, -1)
    ok = jnp.sum(viol_flat, axis=-1) <= exc_cap

    def one_pair(v_flat, d_flat):
        idx = jnp.flatnonzero(v_flat, size=exc_cap, fill_value=-1)
        val = d_flat[jnp.clip(idx, 0, None)].astype(jnp.uint8)
        return idx, val

    exc_idx, exc_val = jax.vmap(one_pair)(viol_flat, d.reshape(m, -1))
    idxu = jnp.where(exc_idx < 0, _PAD_IDX, exc_idx).astype(jnp.uint32)

    pad = (-n) % 4
    if pad:
        code = jnp.concatenate(
            [code, jnp.zeros(code.shape[:-1] + (pad,), jnp.uint8)], axis=-1
        )
    c4 = code.reshape(code.shape[:-1] + (code.shape[-1] // 4, 4))
    packed = (
        c4[..., 0] | (c4[..., 1] << 2) | (c4[..., 2] << 4) | (c4[..., 3] << 6)
    ).astype(jnp.uint8)

    return jnp.concatenate(
        [
            ok.astype(jnp.uint8).reshape(-1),
            q[..., :1].reshape(-1),
            packed.reshape(-1),
            (idxu & 0xFF).astype(jnp.uint8).reshape(-1),
            ((idxu >> 8) & 0xFF).astype(jnp.uint8).reshape(-1),
            ((idxu >> 16) & 0xFF).astype(jnp.uint8).reshape(-1),
            exc_val.reshape(-1),
        ]
    )


# 256-entry table: byte of 4 packed codes -> the 4 delta bytes
# (codes 0/3 -> 0, 1 -> +1, 2 -> 255 i.e. -1 mod 256)
_CODE_LUT = np.array([0, 1, 255, 0], np.uint8)[
    (np.arange(256, dtype=np.uint32)[:, None] >> (2 * np.arange(4))) & 3
]  # (256, 4) uint8


def unpack_chunk(
    buf: np.ndarray, m: int, c: int, h: int, w: int, exc_cap: int = EXC_CAP
) -> Tuple[np.ndarray, np.ndarray]:
    """Host-side exact inverse of `pack_chunk` (NumPy path).

    buf: 1-D uint8 of `buffer_size(m, c, h, w, exc_cap)` bytes.
    Returns (flags (M,) bool, q (M, C, H, W) uint8). q rows of pairs whose
    flag is False are NOT decodable from the wire (exception overflow) —
    the caller must fetch the raw payload for those.
    """
    rows, n, cw = c * h, w - 1, codes_width(w)
    o = 0
    flags = buf[o : o + m].astype(bool)
    o += m
    raw0 = buf[o : o + m * rows].reshape(m, c, h, 1)
    o += m * rows
    codes = buf[o : o + m * rows * cw].reshape(m, c, h, cw)
    o += m * rows * cw
    lo = buf[o : o + m * exc_cap].astype(np.uint32)
    o += m * exc_cap
    mid = buf[o : o + m * exc_cap].astype(np.uint32)
    o += m * exc_cap
    hi = buf[o : o + m * exc_cap].astype(np.uint32)
    o += m * exc_cap
    val = buf[o : o + m * exc_cap]
    idx = (lo | (mid << 8) | (hi << 16)).reshape(m, exc_cap)
    val = val.reshape(m, exc_cap)

    if n <= 0:
        return flags, np.broadcast_to(raw0, (m, c, h, w)).copy()

    d = _CODE_LUT[codes].reshape(m, c, h, 4 * cw)[..., :n]
    d = np.ascontiguousarray(d)
    # scatter the escapes' true deltas (escape code contributed 0)
    valid = idx != _PAD_IDX
    if valid.any():
        gidx = idx.astype(np.int64) + (
            np.arange(m, dtype=np.int64)[:, None] * (rows * n)
        )
        np.add.at(d.reshape(-1), gidx[valid], val[valid])
    cs = np.cumsum(d, axis=-1, dtype=np.uint8)  # wraps mod 256 by dtype
    out = np.empty((m, c, h, w), np.uint8)
    out[..., :1] = raw0
    out[..., 1:] = raw0 + cs  # uint8 wrap-add
    return flags, out


def unpack_chunk_fast(
    buf: np.ndarray, m: int, c: int, h: int, w: int, exc_cap: int = EXC_CAP
) -> Tuple[np.ndarray, np.ndarray]:
    """`unpack_chunk` through the native C++ tier when built (single pass
    per pair, threaded over pairs), NumPy otherwise."""
    try:
        from denseflow_tpu import native

        if native.available() and native.has_wire():
            return native.wire_unpack(buf, m, c, h, w, exc_cap)
    except Exception:
        pass
    return unpack_chunk(buf, m, c, h, w, exc_cap)
