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

}  // extern "C"
