"""Lossless wire codec for device->host flow payloads (v2 + v3, chunk-level).

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

v3 (`pack_chunk_v3` / `unpack_chunk_v3`) — sparse-group coding + used-prefix
transfer. Measured on real solver output, only ~7-17 % of horizontal deltas
are nonzero (TV regularization makes the quantized field piecewise flat with
a ±1 dither), so v2's flat 2 bits/px still pays 2 bits for runs of +0 codes.
v3 groups deltas 4-per-byte like v2 but emits a code byte ONLY for groups
with a nonzero code, guided by a 1-bit-per-group occupancy bitmap
(0.25 bits/px fixed), and moves the exception channel into the same
variable-size region (4 bytes per actual escape instead of 4*EXC_CAP
reserved per pair). The pack returns (buffer, used_len) and the executor
transfers ONLY the used prefix — measured content packs to ~0.6-1.0 bits/px
(2-3.3x fewer wire bytes than v2, ~8x fewer than raw). Decode order is
pair-major everywhere, so the host recovers section offsets from bitmap
popcounts and the per-pair exception counts alone.

Producers: `pack_chunk_v3` (scatter-based compaction — the straightforward
formulation, kept as the oracle) and `pack_chunk_v3_sorted` (sort-based,
byte-identical, what the executor runs: XLA lowers TPU scatters
near-serially and the scatter producer measured 0.71 s/chunk on a v5e —
4x the TVL1 solve — vs 0.126 s sorted). Multi-device runs pack v3 PER
SHARD under shard_map, each chip reporting its own used length so the
host fetches per-shard prefixes (executor.py). v2 is retained as a
simpler reference codec for tests.
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


# ---------------------------------------------------------------------------
# v3: sparse-group codes + variable exception section + used-prefix transfer
# ---------------------------------------------------------------------------


def _v3_geom(c: int, h: int, w: int) -> Tuple[int, int, int, int, int]:
    """(rows, n, gw, NG, bw): deltas/row n, groups/row gw, groups/pair NG,
    bitmap bytes/pair bw."""
    rows = c * h
    n = w - 1
    gw = (n + 3) // 4 if n > 0 else 0
    ng = rows * gw
    return rows, n, gw, ng, (ng + 7) // 8


def v3_fixed_size(m: int, c: int, h: int, w: int) -> int:
    """Bytes of the fixed (shape-determined) section: flags, n_exc (u16),
    seeds, group bitmap."""
    rows, _, _, _, bw = _v3_geom(c, h, w)
    return m * (1 + 2 + rows + bw)


def v3_max_size(m: int, c: int, h: int, w: int, exc_cap: int = EXC_CAP) -> int:
    """Worst-case buffer bytes (every group occupied + exc_cap escapes/pair)."""
    _, _, _, ng, _ = _v3_geom(c, h, w)
    return v3_fixed_size(m, c, h, w) + m * ng + 4 * m * exc_cap


def pack_chunk_v3(
    q: jnp.ndarray, exc_cap: int = EXC_CAP
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Device-side v3 pack of (M, C, H, W) uint8 -> (buffer, used_len).

    Buffer layout (rows = C*H, n = W-1, gw = ceil(n/4) groups per row,
    NG = rows*gw, bw = ceil(NG/8)):
      flags    M bytes      1 where the pair decodes from the wire
      n_exc    2*M          per-pair emitted exception count, planar:
                            M low bytes then M high bytes
                            (0 for overflowed pairs — their flag is 0)
      seeds    M*rows       first column of every row
      bitmap   M*bw         1 bit per group, LSB-first: group has a nonzero
                            code byte (so its byte is in the codes section)
      codes    variable     one byte (4 x 2-bit codes, v2 grammar) per
                            OCCUPIED group, pair-major order
      exc      variable     4 bytes per escape: 3-byte LE flat delta index
                            within the pair + 1-byte mod-256 delta value,
                            pair-major order
    used_len (int32 scalar) = fixed + total occupied groups + 4*total exc;
    only buffer[:used_len] carries information.
    """
    m, _, _, w = q.shape
    rows, n, gw, ng, bw = _v3_geom(*q.shape[1:])
    fixed = v3_fixed_size(m, *q.shape[1:])
    if n <= 0:  # single-column payload: seeds only
        buf = jnp.concatenate(
            [
                jnp.ones((m,), jnp.uint8),
                jnp.zeros((2 * m,), jnp.uint8),
                q[..., :1].reshape(-1),
            ]
        )
        return buf, jnp.asarray(buf.size, jnp.int32)

    qi = q.astype(jnp.int32)
    d = (qi[..., 1:] - qi[..., :-1]) & 0xFF  # (M, C, H, n) mod-256 deltas
    code = jnp.where(
        d == 0, 0, jnp.where(d == 1, 1, jnp.where(d == 255, 2, 3))
    )
    pad = 4 * gw - n
    if pad:
        code = jnp.concatenate(
            [code, jnp.zeros(code.shape[:-1] + (pad,), jnp.int32)], axis=-1
        )
    c4 = code.reshape(m, ng, 4)
    gbyte = (
        c4[..., 0] | (c4[..., 1] << 2) | (c4[..., 2] << 4) | (c4[..., 3] << 6)
    )  # (M, NG) int32
    gnz = gbyte != 0

    # bitmap, LSB-first within each byte
    bpad = 8 * bw - ng
    bits = gnz
    if bpad:
        bits = jnp.concatenate(
            [bits, jnp.zeros((m, bpad), bool)], axis=-1
        )
    b8 = bits.reshape(m, bw, 8).astype(jnp.int32)
    bitmap = jnp.sum(b8 << jnp.arange(8, dtype=jnp.int32), axis=-1).astype(
        jnp.uint8
    )

    # exceptions (escape code 3); overflowed pairs emit none. Padded tail
    # positions are code 0, never escapes, so the padded space is safe.
    esc = (code == 3).reshape(m, -1)  # (M, rows*4*gw)
    exc_cnt = jnp.sum(esc, axis=-1)
    ok = exc_cnt <= exc_cap
    emit = esc & ok[:, None]

    # global pair-major compaction offsets
    gnz_flat = gnz.reshape(-1)
    cpos = jnp.cumsum(gnz_flat) - 1
    total_nz = jnp.sum(gnz_flat)
    em_flat = emit.reshape(-1)
    epos = jnp.cumsum(em_flat) - 1
    total_exc = jnp.sum(em_flat)

    max_var = m * ng + 4 * m * exc_cap
    var = jnp.zeros((max_var,), jnp.uint8)
    # codes: scatter occupied group bytes to their compacted slots
    cdst = jnp.where(gnz_flat, cpos, max_var + 1)
    var = var.at[cdst].set(gbyte.reshape(-1).astype(jnp.uint8), mode="drop")
    # exceptions: 4-byte entries after the codes region
    # flat delta index within the pair, in the UNPADDED (rows, n) space:
    # esc above is over the padded (rows, 4*gw) space; map col -> unpadded
    gcol = jnp.arange(4 * gw)
    grow = jnp.arange(rows)
    flat_idx = (grow[:, None] * n + jnp.minimum(gcol, n - 1)[None, :]).reshape(-1)
    flat_idx = jnp.broadcast_to(flat_idx[None, :], (m, rows * 4 * gw)).reshape(-1)
    dpad = jnp.concatenate(
        [d.reshape(m, rows, n),
         jnp.zeros((m, rows, pad), jnp.int32)], axis=-1
    ) if pad else d.reshape(m, rows, n)
    vals = dpad.reshape(m, -1).reshape(-1)
    ebase = total_nz + 4 * epos
    edst = jnp.where(em_flat, ebase, max_var + 1)
    var = var.at[edst].set((flat_idx & 0xFF).astype(jnp.uint8), mode="drop")
    var = var.at[edst + 1].set(
        ((flat_idx >> 8) & 0xFF).astype(jnp.uint8), mode="drop"
    )
    var = var.at[edst + 2].set(
        ((flat_idx >> 16) & 0xFF).astype(jnp.uint8), mode="drop"
    )
    var = var.at[edst + 3].set((vals & 0xFF).astype(jnp.uint8), mode="drop")

    n_exc_emit = jnp.where(ok, exc_cnt, 0).astype(jnp.uint32)
    buf = jnp.concatenate(
        [
            ok.astype(jnp.uint8),
            (n_exc_emit & 0xFF).astype(jnp.uint8),
            ((n_exc_emit >> 8) & 0xFF).astype(jnp.uint8),
            q[..., :1].reshape(-1),
            bitmap.reshape(-1),
            var,
        ]
    )
    used = fixed + total_nz + 4 * total_exc
    return buf, used.astype(jnp.int32)


def pack_chunk_v3_sorted(
    q: jnp.ndarray, exc_cap: int = EXC_CAP
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """`pack_chunk_v3` with SORT-based stream compaction — identical wire
    bytes, different producer.

    The original pack compacts occupied group bytes and exception entries
    with `.at[].set` scatters whose update counts are the full delta space
    (~22M positions per 128-pair chunk at 256p); XLA lowers TPU scatters
    near-serially, measured ~0.7 s per chunk — 4x the solve itself. Here
    compaction is two stable key sorts (occupied-first / valid-first, flat
    position as tiebreak), which TPU runs as parallel sorting networks,
    plus one traced-offset dynamic_update_slice to butt the exception
    region against the codes prefix. Output is byte-identical (the same
    pair-major order the decoder expects)."""
    m, _, _, w = q.shape
    rows, n, gw, ng, bw = _v3_geom(*q.shape[1:])
    fixed = v3_fixed_size(m, *q.shape[1:])
    if n <= 0:  # single-column payload: seeds only
        buf = jnp.concatenate(
            [
                jnp.ones((m,), jnp.uint8),
                jnp.zeros((2 * m,), jnp.uint8),
                q[..., :1].reshape(-1),
            ]
        )
        return buf, jnp.asarray(buf.size, jnp.int32)

    qi = q.astype(jnp.int32)
    d = (qi[..., 1:] - qi[..., :-1]) & 0xFF
    code = jnp.where(
        d == 0, 0, jnp.where(d == 1, 1, jnp.where(d == 255, 2, 3))
    )
    pad = 4 * gw - n
    if pad:
        code = jnp.concatenate(
            [code, jnp.zeros(code.shape[:-1] + (pad,), jnp.int32)], axis=-1
        )
    c4 = code.reshape(m, ng, 4)
    gbyte = (
        c4[..., 0] | (c4[..., 1] << 2) | (c4[..., 2] << 4) | (c4[..., 3] << 6)
    )
    gnz = gbyte != 0

    bpad = 8 * bw - ng
    bits = gnz
    if bpad:
        bits = jnp.concatenate([bits, jnp.zeros((m, bpad), bool)], axis=-1)
    b8 = bits.reshape(m, bw, 8).astype(jnp.int32)
    bitmap = jnp.sum(b8 << jnp.arange(8, dtype=jnp.int32), axis=-1).astype(
        jnp.uint8
    )

    esc = (code == 3).reshape(m, -1)
    exc_cnt = jnp.sum(esc, axis=-1)
    ok = exc_cnt <= exc_cap

    total = m * ng
    # codes compaction: occupied groups first, in pair-major flat order
    gnz_flat = gnz.reshape(-1)
    pos = jnp.arange(total, dtype=jnp.uint32)
    ckey = jnp.where(gnz_flat, pos, pos + jnp.uint32(total))
    _, codes_sorted = jax.lax.sort_key_val(
        ckey, gbyte.reshape(-1).astype(jnp.uint8)
    )
    total_nz = jnp.sum(gnz_flat)

    # exception compaction by RANK-SELECT, no sort over the delta space
    # (a 22M-entry key/value sort measured ~84 ms per 128-pair chunk on a
    # v5e — most of the pack): per-GROUP escape counts cumsum into a
    # pair-major rank table, and each output slot j binary-searches the
    # group containing the j-th escape, resolves its in-group position
    # from the 4 code flags, and gathers the delta value directly.
    esc4 = (c4 == 3) & ok[:, None, None]  # overflowed pairs emit none
    gcnt = jnp.sum(esc4, axis=-1)
    gcum = jnp.cumsum(gcnt.reshape(-1))  # (m*ng,), pair-major
    total_exc = gcum[-1]
    exc_max = m * exc_cap
    dpad = (
        jnp.concatenate(
            [d.reshape(m, rows, n), jnp.zeros((m, rows, pad), jnp.int32)],
            axis=-1,
        )
        if pad
        else d.reshape(m, rows, n)
    )
    dflat = dpad.reshape(-1)

    j = jnp.arange(exc_max, dtype=jnp.int32)
    # method='sort' (one combined sort) measured 2.3x faster than the
    # default binary-search scan for this size on a v5e
    gidx = jnp.clip(
        jnp.searchsorted(gcum, j, side="right", method="sort"),
        0, m * ng - 1,
    )
    prev = jnp.where(gidx > 0, gcum[jnp.maximum(gidx - 1, 0)], 0)
    rank = j - prev  # 0..3 within the group (garbage past total_exc)
    eg = esc4.reshape(-1, 4)[gidx]  # (exc_max, 4)
    excl = jnp.cumsum(eg, axis=-1) - eg.astype(jnp.int32)
    k = jnp.argmax(
        eg & (excl == jnp.clip(rank, 0, 3)[:, None]), axis=-1
    )
    pair_i = gidx // ng
    gg = gidx % ng
    grow = gg // gw
    colp = (gg % gw) * 4 + k  # padded-space column
    flat_idx = (grow * n + jnp.minimum(colp, n - 1)).astype(jnp.uint32)
    vals = dflat[
        pair_i * (rows * 4 * gw) + grow * (4 * gw) + colp
    ].astype(jnp.uint32)
    e = flat_idx | ((vals & 0xFF) << 24)
    exc_bytes = jnp.stack(
        [
            (e & 0xFF).astype(jnp.uint8),
            ((e >> 8) & 0xFF).astype(jnp.uint8),
            ((e >> 16) & 0xFF).astype(jnp.uint8),
            ((e >> 24) & 0xFF).astype(jnp.uint8),
        ],
        axis=-1,
    ).reshape(-1)

    max_var = total + 4 * exc_max
    var = jnp.zeros((max_var,), jnp.uint8)
    var = jax.lax.dynamic_update_slice(var, codes_sorted, (0,))
    # butt the exception block against the codes prefix; bytes past
    # 4*total_exc inside it are stale but lie beyond used
    var = jax.lax.dynamic_update_slice(var, exc_bytes, (total_nz,))

    n_exc_emit = jnp.where(ok, exc_cnt, 0).astype(jnp.uint32)
    buf = jnp.concatenate(
        [
            ok.astype(jnp.uint8),
            (n_exc_emit & 0xFF).astype(jnp.uint8),
            ((n_exc_emit >> 8) & 0xFF).astype(jnp.uint8),
            q[..., :1].reshape(-1),
            bitmap.reshape(-1),
            var,
        ]
    )
    used = fixed + total_nz + 4 * total_exc
    return buf, used.astype(jnp.int32)


def unpack_chunk_v3(
    buf: np.ndarray, m: int, c: int, h: int, w: int, exc_cap: int = EXC_CAP
) -> Tuple[np.ndarray, np.ndarray]:
    """Host-side exact inverse of `pack_chunk_v3` on the used prefix.

    buf: 1-D uint8, at least `used_len` bytes (extra trailing bytes from
    bucketed prefix transfer are ignored). Returns (flags (M,) bool,
    q (M, C, H, W) uint8); pairs with flag False must be fetched raw."""
    rows, n, gw, ng, bw = _v3_geom(c, h, w)
    o = 0
    flags = buf[o : o + m].astype(bool)
    o += m
    n_exc = (
        buf[o : o + m].astype(np.uint32)
        | (buf[o + m : o + 2 * m].astype(np.uint32) << 8)
    )
    o += 2 * m
    raw0 = buf[o : o + m * rows].reshape(m, c, h, 1)
    o += m * rows
    if n <= 0:
        return flags, np.broadcast_to(raw0, (m, c, h, w)).copy()
    bitmap = buf[o : o + m * bw].reshape(m, bw)
    o += m * bw
    bits = np.unpackbits(bitmap, axis=1, bitorder="little")[:, :ng]
    bits = bits.astype(bool)
    total_nz = int(bits.sum())
    gbytes = np.zeros((m, ng), np.uint8)
    gbytes[bits] = buf[o : o + total_nz]
    o += total_nz
    d = _CODE_LUT[gbytes].reshape(m, rows, 4 * gw)[..., :n]
    d = np.ascontiguousarray(d)
    total_exc = int(n_exc.sum())
    if total_exc:
        eb = buf[o : o + 4 * total_exc].reshape(total_exc, 4)
        idx = (
            eb[:, 0].astype(np.int64)
            | (eb[:, 1].astype(np.int64) << 8)
            | (eb[:, 2].astype(np.int64) << 16)
        )
        pair = np.repeat(np.arange(m, dtype=np.int64), n_exc)
        flat = d.reshape(-1)
        # indices are unique per pair by construction -> plain fancy add
        flat[pair * (rows * n) + idx] += eb[:, 3]
    cs = np.cumsum(d.reshape(m, c, h, n), axis=-1, dtype=np.uint8)
    out = np.empty((m, c, h, w), np.uint8)
    out[..., :1] = raw0
    out[..., 1:] = raw0 + cs
    return flags, out


# ---------------------------------------------------------------------------
# v4: LOSSLESS float32 flow codec (the h5 wire path)
# ---------------------------------------------------------------------------
#
# The h5 save type ships raw float32 flow (disk contract: reference
# src/common.cpp:120-150), which made BASELINE config 5 the link-worst
# configuration (357 MB D2H per 500 pairs). v4 packs the float payload
# losslessly ON DEVICE:
#
#   bitcast f32 -> u32, horizontal delta in bit space (mod 2^32), zigzag,
#   split into 4 byte planes, and code EVERY plane with sparse groups-of-4:
#   a 1-bit-per-group occupancy bitmap plus the 4 literal bytes of each
#   occupied group (sort-compacted, v3's producer pattern). Column 0 of
#   every row is a raw u32 seed.
#
# No modes, no exceptions: dense planes cost 1.031x their raw size, empty
# planes 0.031x, and decode is exact for ANY bit pattern (wrap-around
# arithmetic; NaN/Inf safe). Measured on real TVL1 output at 256p the
# total is ~3.45 B/value = 1.16x — and that is close to the CONTENT's
# ceiling, not the codec's: the solver's epsilon stop (0.01) leaves
# ~20 bits/value of convergence noise in the low mantissa, putting the
# order-0 byte-plane entropy at 2.85 B/value (1.40x max for any order-0
# coder; zlib-6 on the same payload: 1.135x, BELOW this codec). On
# genuinely smooth float fields (e.g. converged synthetic content) the
# same grammar compresses 10x+. See PERFORMANCE.md "h5 wire entropy".
#
# Wire layout for (M, H, W, 2) float32, n = W-1, NG = ceil(H*n/4) groups
# per (pair, component, plane), G = M*NG, BW = ceil(G/8):
#   counts   8 * u32 LE      occupied-group count per stream (c-major,
#                            then plane k=0(LSB)..3)
#   seeds    M*2*H * u32 LE  column 0 of every row, pair-major, u then v
#   streams  8 x [bitmap BW bytes (LSB-first, pair-major group order),
#                 4*count literal group bytes (LE u32 per group)]
# used = fixed + sum(BW + 4*count).


def _v4_geom(h: int, w: int) -> Tuple[int, int]:
    """(n, ng): horizontal deltas per row, groups per (pair, comp, plane)."""
    n = w - 1
    return n, (h * n + 3) // 4 if n > 0 else 0


def v4_fixed_size(m: int, h: int, w: int) -> int:
    return 8 * 4 + m * 2 * h * 4


def v4_max_size(m: int, h: int, w: int) -> int:
    """Worst-case buffer bytes (every group of every stream occupied)."""
    _, ng = _v4_geom(h, w)
    g = m * ng
    return v4_fixed_size(m, h, w) + 8 * ((g + 7) // 8 + 4 * g)


def _u32_to_le_bytes(x: jnp.ndarray) -> jnp.ndarray:
    """(...,) uint32 -> (..., 4) uint8 little-endian."""
    return jnp.stack(
        [((x >> (8 * k)) & 0xFF).astype(jnp.uint8) for k in range(4)],
        axis=-1,
    )


def pack_chunk_v4(flow: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Device-side lossless pack of (M, H, W, 2) float32 -> (buffer, used).

    buffer is sized `v4_max_size`; only buffer[:used] carries information.
    Exact for any bit pattern (the transform is bijective mod 2^32)."""
    m, h, w, _ = flow.shape
    n, ng = _v4_geom(h, w)
    x = jnp.moveaxis(flow, -1, 1)  # (m, 2, h, w)
    xi = jax.lax.bitcast_convert_type(x, jnp.uint32)
    seeds = _u32_to_le_bytes(xi[..., 0]).reshape(-1)  # m*2*h*4
    if n <= 0:
        buf = jnp.concatenate([jnp.zeros((32,), jnp.uint8), seeds])
        return buf, jnp.asarray(buf.size, jnp.int32)

    d = xi[..., 1:] - xi[..., :-1]  # u32 wraparound
    z = (d << 1) ^ jnp.where(
        (d >> 31) != 0, jnp.uint32(0xFFFFFFFF), jnp.uint32(0)
    )  # zigzag of the signed delta, in u32 arithmetic

    g_tot = m * ng
    bw = (g_tot + 7) // 8
    pad = 4 * ng - h * n
    counts = []
    sections = []  # (bitmap_bytes, sorted_gwords_bytes) per stream
    for c in range(2):
        for k in range(4):
            p = (z[:, c] >> (8 * k)) & 0xFF  # (m, h, n) u32 in [0,255]
            flat = p.reshape(m, h * n)
            if pad:
                flat = jnp.concatenate(
                    [flat, jnp.zeros((m, pad), jnp.uint32)], axis=-1
                )
            g4 = flat.reshape(m * ng, 4)
            gword = (
                g4[:, 0] | (g4[:, 1] << 8) | (g4[:, 2] << 16)
                | (g4[:, 3] << 24)
            )  # LE u32 per group
            gnz = gword != 0
            counts.append(jnp.sum(gnz).astype(jnp.uint32))
            bpad = 8 * bw - g_tot
            bits = gnz if not bpad else jnp.concatenate(
                [gnz, jnp.zeros((bpad,), bool)]
            )
            b8 = bits.reshape(bw, 8).astype(jnp.int32)
            bitmap = jnp.sum(
                b8 << jnp.arange(8, dtype=jnp.int32), axis=-1
            ).astype(jnp.uint8)
            # occupied-first stable compaction by sort (v3's producer:
            # TPU scatters lower near-serially, sorts are parallel)
            pos = jnp.arange(g_tot, dtype=jnp.uint32)
            key = jnp.where(gnz, pos, pos + jnp.uint32(g_tot))
            _, gsorted = jax.lax.sort_key_val(key, gword)
            sections.append((bitmap, _u32_to_le_bytes(gsorted).reshape(-1)))

    header = _u32_to_le_bytes(jnp.stack(counts)).reshape(-1)
    fixed = 32 + seeds.size
    total = fixed + 8 * (bw + 4 * g_tot)
    buf = jnp.zeros((total,), jnp.uint8)
    buf = jax.lax.dynamic_update_slice(buf, header, (0,))
    buf = jax.lax.dynamic_update_slice(buf, seeds, (32,))
    # write each stream at its running (traced) offset: bitmap, then the
    # full sorted block — bytes past 4*count are stale garbage that the
    # NEXT stream's write overwrites (or that lie beyond `used`)
    off = jnp.int32(fixed)
    for cnt, (bitmap, gbytes) in zip(counts, sections):
        buf = jax.lax.dynamic_update_slice(buf, bitmap, (off,))
        off = off + bw
        buf = jax.lax.dynamic_update_slice(buf, gbytes, (off,))
        off = off + 4 * cnt.astype(jnp.int32)
    return buf, off


def unpack_chunk_v4(
    buf: np.ndarray, m: int, h: int, w: int
) -> np.ndarray:
    """Host-side exact inverse of `pack_chunk_v4` on the used prefix.

    Returns (M, H, W, 2) float32, bit-identical to the packed input."""
    n, ng = _v4_geom(h, w)
    counts = buf[:32].copy().view(np.uint32)
    seeds = (
        buf[32 : 32 + m * 2 * h * 4].copy().view(np.uint32)
        .reshape(m, 2, h)
    )
    if n <= 0:
        xi = seeds[..., None]
        return np.moveaxis(xi.view(np.float32), 1, -1).copy()
    g_tot = m * ng
    bw = (g_tot + 7) // 8
    o = 32 + m * 2 * h * 4
    z = np.zeros((m, 2, h * n), np.uint32)
    for s in range(8):
        c, k = divmod(s, 4)
        cnt = int(counts[s])
        bits = np.unpackbits(
            buf[o : o + bw], bitorder="little"
        )[:g_tot].astype(bool)
        o += bw
        gwords = buf[o : o + 4 * cnt].copy().view(np.uint32)
        o += 4 * cnt
        plane_g = np.zeros(g_tot, np.uint32)
        plane_g[bits] = gwords
        pb = plane_g.view(np.uint8).reshape(m, 4 * ng)[:, : h * n]
        z[:, c] |= pb.astype(np.uint32) << np.uint32(8 * k)
    d = (z >> np.uint32(1)) ^ (~(z & np.uint32(1)) + np.uint32(1))
    cs = np.cumsum(d.reshape(m, 2, h, n), axis=-1, dtype=np.uint32)
    xi = np.empty((m, 2, h, w), np.uint32)
    xi[..., 0] = seeds
    xi[..., 1:] = seeds[..., None] + cs
    return np.moveaxis(xi.view(np.float32), 1, -1).copy()


def unpack_chunk_v4_fast(
    buf: np.ndarray, m: int, h: int, w: int
) -> np.ndarray:
    """`unpack_chunk_v4` through the native C++ tier when built (threaded
    over pairs, ~10x the NumPy pass), NumPy otherwise."""
    try:
        from denseflow_tpu import native

        if native.available() and native.has_wire_v4():
            return native.wire_unpack_v4(buf, m, h, w)
    except Exception:
        pass
    return unpack_chunk_v4(buf, m, h, w)


def unpack_chunk_v3_fast(
    buf: np.ndarray, m: int, c: int, h: int, w: int, exc_cap: int = EXC_CAP
) -> Tuple[np.ndarray, np.ndarray]:
    """`unpack_chunk_v3` through the native C++ tier when built, NumPy
    otherwise."""
    try:
        from denseflow_tpu import native

        if native.available() and native.has_wire_v3():
            return native.wire_unpack_v3(buf, m, c, h, w, exc_cap)
    except Exception:
        pass
    return unpack_chunk_v3(buf, m, c, h, w, exc_cap)
