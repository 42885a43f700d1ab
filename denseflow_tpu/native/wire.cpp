// Native wire-codec decoder: single-pass 2-bit row-delta decode.
//
// Host-side inverse of denseflow_tpu/wire.py::pack_chunk. The NumPy
// decode path costs ~2 ms/pair at 256p (nibble expand + gather + uint8
// cumsum); this single sequential pass with an in-stride exception merge
// runs ~10x faster and threads over pairs, keeping the host CPUs free for
// decode and JPEG work. See wire.py for the buffer layout.

#include <atomic>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

namespace {

// 2-bit code -> delta byte: {0: +0, 1: +1, 2: -1 (mod 256), 3: escape(+0)}
const uint8_t kDelta[4] = {0, 1, 255, 0};

constexpr uint32_t kPadIdx = 0xFFFFFF;

template <typename Fn>
void parallel_pairs(int n, int n_threads, Fn fn) {
    if (n_threads <= 1 || n <= 1) {
        for (int i = 0; i < n; ++i) fn(i);
        return;
    }
    std::atomic<int> next(0);
    auto worker = [&]() {
        for (;;) {
            int i = next.fetch_add(1);
            if (i >= n) return;
            fn(i);
        }
    };
    std::vector<std::thread> pool;
    int k = std::min(n_threads, n);
    pool.reserve(k);
    for (int t = 0; t < k; ++t) pool.emplace_back(worker);
    for (auto& t : pool) t.join();
}

}  // namespace

extern "C" {

// buf: wire buffer (see wire.py layout). Outputs: flags (m bytes, 0/1),
// q (m*c*h*w bytes). Pairs whose flag is 0 are left unwritten in q (the
// caller falls back to the raw payload). Returns 0 on success.
int df_wire_unpack(const uint8_t* buf, int m, int c, int h, int w,
                   int exc_cap, uint8_t* flags_out, uint8_t* q_out,
                   int n_threads) {
    const int rows = c * h;
    const int n = w - 1;
    const int cw = (n + 3) / 4;
    const size_t off_flags = 0;
    const size_t off_raw0 = off_flags + (size_t)m;
    const size_t off_codes = off_raw0 + (size_t)m * rows;
    const size_t off_lo = off_codes + (size_t)m * rows * cw;
    const size_t off_mid = off_lo + (size_t)m * exc_cap;
    const size_t off_hi = off_mid + (size_t)m * exc_cap;
    const size_t off_val = off_hi + (size_t)m * exc_cap;

    memcpy(flags_out, buf + off_flags, m);

    parallel_pairs(m, n_threads, [&](int p) {
        if (!buf[off_flags + p]) return;  // exception overflow: raw fallback
        const uint8_t* raw0 = buf + off_raw0 + (size_t)p * rows;
        const uint8_t* codes = buf + off_codes + (size_t)p * rows * cw;
        const uint8_t* lo = buf + off_lo + (size_t)p * exc_cap;
        const uint8_t* mid = buf + off_mid + (size_t)p * exc_cap;
        const uint8_t* hi = buf + off_hi + (size_t)p * exc_cap;
        const uint8_t* val = buf + off_val + (size_t)p * exc_cap;
        uint8_t* out = q_out + (size_t)p * rows * w;

        // exception indices come out of the device's flatnonzero sorted
        // ascending, so a single cursor merges them into the stream
        int e = 0;
        uint32_t next_exc =
            exc_cap > 0 ? (uint32_t)lo[0] | ((uint32_t)mid[0] << 8) |
                              ((uint32_t)hi[0] << 16)
                        : kPadIdx;
        if (n <= 0) {
            for (int r = 0; r < rows; ++r) out[r] = raw0[r];
            return;
        }
        for (int r = 0; r < rows; ++r) {
            uint8_t acc = raw0[r];
            uint8_t* orow = out + (size_t)r * w;
            const uint8_t* crow = codes + (size_t)r * cw;
            orow[0] = acc;
            const uint32_t flat_base = (uint32_t)r * n;
            for (int i = 0; i < n; ++i) {
                acc = (uint8_t)(acc + kDelta[(crow[i >> 2] >> (2 * (i & 3))) & 3]);
                if (flat_base + (uint32_t)i == next_exc) {
                    acc = (uint8_t)(acc + val[e]);
                    ++e;
                    next_exc = e < exc_cap
                                   ? (uint32_t)lo[e] | ((uint32_t)mid[e] << 8) |
                                         ((uint32_t)hi[e] << 16)
                                   : kPadIdx;
                }
                orow[i + 1] = acc;
            }
        }
    });
    return 0;
}

// v3 buffer (see wire.py::pack_chunk_v3): sparse-group codes + variable
// exception section. Sections: flags m | n_exc lo m | n_exc hi m |
// seeds m*rows | bitmap m*bw | codes (1 byte per occupied group,
// pair-major) | exc (4 bytes per escape, pair-major). Per-pair section
// offsets come from bitmap popcounts and the n_exc counts, so decode is a
// cheap serial prefix pass followed by a parallel per-pair sweep.
int df_wire_unpack_v3(const uint8_t* buf, int m, int c, int h, int w,
                      int exc_cap, uint8_t* flags_out, uint8_t* q_out,
                      int n_threads) {
    (void)exc_cap;  // overflowed pairs carry flag 0 and no entries
    const int rows = c * h;
    const int n = w - 1;
    const int gw = n > 0 ? (n + 3) / 4 : 0;
    const int ng = rows * gw;
    const int bw = (ng + 7) / 8;
    const size_t off_flags = 0;
    const size_t off_exc_lo = off_flags + (size_t)m;
    const size_t off_exc_hi = off_exc_lo + (size_t)m;
    const size_t off_seeds = off_exc_hi + (size_t)m;
    const size_t off_bitmap = off_seeds + (size_t)m * rows;
    const size_t off_codes = off_bitmap + (size_t)m * bw;

    memcpy(flags_out, buf + off_flags, m);
    if (n <= 0) {
        for (int p = 0; p < m; ++p)
            for (int r = 0; r < rows; ++r)
                q_out[(size_t)p * rows + r] = buf[off_seeds + (size_t)p * rows + r];
        return 0;
    }

    // per-pair prefix offsets into the variable sections
    std::vector<size_t> code_off(m + 1), exc_off(m + 1);
    code_off[0] = 0;
    exc_off[0] = 0;
    for (int p = 0; p < m; ++p) {
        size_t pc = 0;
        const uint8_t* bm = buf + off_bitmap + (size_t)p * bw;
        for (int i = 0; i < bw; ++i) pc += __builtin_popcount(bm[i]);
        code_off[p + 1] = code_off[p] + pc;
        uint32_t ne = (uint32_t)buf[off_exc_lo + p] |
                      ((uint32_t)buf[off_exc_hi + p] << 8);
        exc_off[p + 1] = exc_off[p] + ne;
    }
    const size_t off_exc = off_codes + code_off[m];

    parallel_pairs(m, n_threads, [&](int p) {
        if (!buf[off_flags + p]) return;  // exception overflow: raw fallback
        const uint8_t* seeds = buf + off_seeds + (size_t)p * rows;
        const uint8_t* bm = buf + off_bitmap + (size_t)p * bw;
        const uint8_t* codes = buf + off_codes + code_off[p];
        const uint8_t* exc = buf + off_exc + 4 * exc_off[p];
        const size_t n_exc = exc_off[p + 1] - exc_off[p];
        uint8_t* out = q_out + (size_t)p * rows * w;

        size_t e = 0;  // escapes are emitted in ascending flat-index order
        uint32_t next_exc = n_exc > 0 ? (uint32_t)exc[0] |
                                            ((uint32_t)exc[1] << 8) |
                                            ((uint32_t)exc[2] << 16)
                                      : kPadIdx;
        size_t ci = 0;  // cursor into this pair's occupied-group bytes
        for (int r = 0; r < rows; ++r) {
            uint8_t acc = seeds[r];
            uint8_t* orow = out + (size_t)r * w;
            orow[0] = acc;
            const uint32_t flat_base = (uint32_t)r * n;
            const int gbase = r * gw;
            for (int g = 0; g < gw; ++g) {
                const int gi = gbase + g;
                uint8_t byte = 0;
                if (bm[gi >> 3] & (1u << (gi & 7))) byte = codes[ci++];
                const int i0 = 4 * g;
                const int kmax = n - i0 < 4 ? n - i0 : 4;
                for (int k = 0; k < kmax; ++k) {
                    const int i = i0 + k;
                    acc = (uint8_t)(acc + kDelta[(byte >> (2 * k)) & 3]);
                    if (flat_base + (uint32_t)i == next_exc) {
                        acc = (uint8_t)(acc + exc[4 * e + 3]);
                        ++e;
                        next_exc = e < n_exc
                                       ? (uint32_t)exc[4 * e] |
                                             ((uint32_t)exc[4 * e + 1] << 8) |
                                             ((uint32_t)exc[4 * e + 2] << 16)
                                       : kPadIdx;
                    }
                    orow[i + 1] = acc;
                }
            }
        }
    });
    return 0;
}

// v4 LOSSLESS float32 decoder (wire.py::unpack_chunk_v4). Layout:
//   counts  8 * u32 LE        occupied-group count per stream
//   seeds   m*2*h * u32 LE    column 0, pair-major, u then v
//   streams 8 x [bitmap ceil(m*ng/8) bytes LSB-first, 4*count literal
//                group bytes]  (c-major then plane k=0..3; within a
//                stream, groups are pair-major: pair p owns
//                [p*ng, (p+1)*ng))
// out: (m, h, w, 2) float32 (little-endian host assumed, as in wire.py).
// The NumPy decode measured 0.6-1.0 s per 128-pair 256p chunk — enough
// to bind the h5 path on fast link phases; this pass threads over pairs.
int df_wire_unpack_v4(const uint8_t* buf, int m, int h, int w,
                      float* out, int n_threads) {
    const int n = w - 1;
    const size_t seeds_off = 32;
    const size_t hn = (size_t)h * (n > 0 ? n : 0);
    if (n <= 0) {
        parallel_pairs(m, n_threads, [&](int p) {
            for (int c = 0; c < 2; ++c) {
                const uint8_t* sp =
                    buf + seeds_off + ((size_t)(p * 2 + c) * h) * 4;
                for (int y = 0; y < h; ++y) {
                    uint32_t v;
                    memcpy(&v, sp + 4 * (size_t)y, 4);
                    memcpy(out + ((size_t)p * h + y) * 2 + c, &v, 4);
                }
            }
        });
        return 0;
    }
    const size_t ng = (hn + 3) / 4;       // groups per (pair, comp, plane)
    const size_t g_tot = (size_t)m * ng;  // groups per stream
    const size_t bw = (g_tot + 7) / 8;    // bitmap bytes per stream
    uint32_t counts[8];
    memcpy(counts, buf, 32);

    // per-stream layout: bitmap base, codes base, and per-pair occupied-
    // group prefix (bit count before pair p's group range)
    const uint8_t* bitmaps[8];
    const uint8_t* codes[8];
    std::vector<uint32_t> prefix((size_t)8 * m);
    {
        size_t o = seeds_off + (size_t)m * 2 * h * 4;
        for (int s = 0; s < 8; ++s) {
            bitmaps[s] = buf + o;
            o += bw;
            codes[s] = buf + o;
            o += 4 * (size_t)counts[s];
            const uint8_t* bm = bitmaps[s];
            uint32_t acc = 0;
            size_t bit = 0;  // cursor
            for (int p = 0; p < m; ++p) {
                prefix[(size_t)s * m + p] = acc;
                size_t end = (size_t)(p + 1) * ng;
                // unaligned head
                while (bit < end && (bit & 7)) {
                    acc += (bm[bit >> 3] >> (bit & 7)) & 1;
                    ++bit;
                }
                while (bit + 8 <= end) {
                    acc += __builtin_popcount(bm[bit >> 3]);
                    bit += 8;
                }
                while (bit < end) {
                    acc += (bm[bit >> 3] >> (bit & 7)) & 1;
                    ++bit;
                }
            }
        }
    }

    std::atomic<int> bad(0);
    parallel_pairs(m, n_threads, [&](int p) {
        std::vector<uint32_t> z(hn);
        for (int c = 0; c < 2; ++c) {
            std::fill(z.begin(), z.end(), 0u);
            for (int k = 0; k < 4; ++k) {
                const int s = c * 4 + k;
                const uint8_t* bm = bitmaps[s];
                const uint8_t* cp =
                    codes[s] + 4 * (size_t)prefix[(size_t)s * m + p];
                const size_t g0 = (size_t)p * ng;
                const int shift = 8 * k;
                for (size_t g = 0; g < ng; ++g) {
                    const size_t bit = g0 + g;
                    if (!((bm[bit >> 3] >> (bit & 7)) & 1)) continue;
                    const size_t base = 4 * g;
                    const size_t lim = hn - base < 4 ? hn - base : 4;
                    for (size_t j = 0; j < lim; ++j)
                        z[base + j] |= (uint32_t)cp[j] << shift;
                    cp += 4;
                }
            }
            const uint8_t* sp =
                buf + seeds_off + ((size_t)(p * 2 + c) * h) * 4;
            for (int y = 0; y < h; ++y) {
                uint32_t cur;
                memcpy(&cur, sp + 4 * (size_t)y, 4);
                float* orow = out + (((size_t)p * h + y) * w) * 2 + c;
                memcpy(orow, &cur, 4);
                const uint32_t* zr = z.data() + (size_t)y * n;
                for (int x = 0; x < n; ++x) {
                    const uint32_t zz = zr[x];
                    const uint32_t d = (zz >> 1) ^ (~(zz & 1u) + 1u);
                    cur += d;
                    memcpy(orow + 2 * (size_t)(x + 1), &cur, 4);
                }
            }
        }
    });
    return bad.load();
}

}  // extern "C"
