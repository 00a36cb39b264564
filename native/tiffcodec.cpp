// Native TIFF codec hot paths for sarpro-tpu's io/tiffio.py.
//
// The reference gets these from GDAL's C core (reference: src/io/gdal.rs
// binds libgdal; Cargo.toml:24). Our self-contained codec is numpy-vectorized
// except for the byte-serial decompressors, which live here:
//   * TIFF-variant LZW decode (MSB-first, early-change)
//   * PackBits decode
//   * horizontal-differencing predictor undo (u8/u16)
//   * multi-threaded strip decode driver (deflate via zlib is handled in
//     Python; LZW/PackBits strips decode in parallel here)
//
// Exposed as a plain C ABI consumed via ctypes — no pybind11 dependency.
//
// Build: python native/build.py  (emits sarpro_tpu/_native/tiffcodec.so)

#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <thread>
#include <vector>
#include <atomic>

#if defined(__AVX512F__)
#include <immintrin.h>
#endif

extern "C" {

// ---------------------------------------------------------------------------
// PackBits
// ---------------------------------------------------------------------------
// Returns bytes written, or -1 on overflow.
int64_t packbits_decode(const uint8_t* src, int64_t src_len,
                        uint8_t* dst, int64_t dst_cap) {
    int64_t i = 0, o = 0;
    while (i < src_len) {
        int8_t n = static_cast<int8_t>(src[i++]);
        if (n >= 0) {
            int64_t cnt = static_cast<int64_t>(n) + 1;
            if (i + cnt > src_len || o + cnt > dst_cap) return -1;
            std::memcpy(dst + o, src + i, cnt);
            i += cnt;
            o += cnt;
        } else if (n != -128) {
            int64_t cnt = 1 - static_cast<int64_t>(n);
            if (i >= src_len || o + cnt > dst_cap) return -1;
            std::memset(dst + o, src[i++], cnt);
            o += cnt;
        }
    }
    return o;
}

// ---------------------------------------------------------------------------
// TIFF LZW (MSB-first bit order, early code-size change)
// ---------------------------------------------------------------------------
namespace {
struct LzwEntry {
    int32_t prev;    // previous code (-1 for roots)
    uint8_t byte;    // last byte
    int32_t length;  // chain length
};
}  // namespace

int64_t lzw_decode(const uint8_t* src, int64_t src_len,
                   uint8_t* dst, int64_t dst_cap) {
    constexpr int32_t kClear = 256, kEoi = 257, kFirst = 258;
    std::vector<LzwEntry> table(4096);
    for (int32_t i = 0; i < 256; ++i) table[i] = {-1, static_cast<uint8_t>(i), 1};

    int32_t next_code = kFirst;
    int code_size = 9;
    int64_t bitpos = 0;
    const int64_t total_bits = src_len * 8;
    int32_t prev = -1;
    int64_t o = 0;

    auto emit = [&](int32_t code) -> int64_t {
        // write chain for `code` at dst[o..]; returns length or -1
        int32_t len = table[code].length;
        if (o + len > dst_cap) return -1;
        int64_t p = o + len;
        int32_t c = code;
        while (c >= 0) {
            dst[--p] = table[c].byte;
            c = table[c].prev;
        }
        o += len;
        return len;
    };

    while (bitpos + code_size <= total_bits) {
        // read `code_size` bits MSB-first
        int64_t byte_idx = bitpos >> 3;
        int bit_off = static_cast<int>(bitpos & 7);
        uint32_t window = 0;
        for (int b = 0; b < 4; ++b) {
            window = (window << 8) |
                     (byte_idx + b < src_len ? src[byte_idx + b] : 0);
        }
        int32_t code = static_cast<int32_t>(
            (window >> (32 - bit_off - code_size)) & ((1u << code_size) - 1));
        bitpos += code_size;

        if (code == kClear) {
            next_code = kFirst;
            code_size = 9;
            prev = -1;
            continue;
        }
        if (code == kEoi) break;

        if (prev < 0) {
            if (code >= 256) return -1;
            if (emit(code) < 0) return -1;
            prev = code;
            continue;
        }
        uint8_t first_byte;
        if (code < next_code) {
            // existing entry: first byte of chain
            int32_t c = code;
            while (table[c].prev >= 0) c = table[c].prev;
            first_byte = table[c].byte;
        } else if (code == next_code) {
            int32_t c = prev;
            while (table[c].prev >= 0) c = table[c].prev;
            first_byte = table[c].byte;
        } else {
            return -1;  // corrupt stream
        }
        // add new entry prev + first_byte
        if (next_code < 4096) {
            table[next_code] = {prev, first_byte, table[prev].length + 1};
            ++next_code;
        }
        if (code < next_code) {
            if (emit(code) < 0) return -1;
        } else {
            return -1;
        }
        if (next_code == (1 << code_size) - 1 && code_size < 12) ++code_size;
        prev = code;
    }
    return o;
}

// ---------------------------------------------------------------------------
// Horizontal predictor undo (TIFF predictor=2)
// ---------------------------------------------------------------------------
void predictor2_u8(uint8_t* data, int64_t rows, int64_t cols, int64_t samples) {
    const int64_t stride = cols * samples;
    for (int64_t r = 0; r < rows; ++r) {
        uint8_t* row = data + r * stride;
        for (int64_t i = samples; i < stride; ++i) row[i] += row[i - samples];
    }
}

void predictor2_u16(uint16_t* data, int64_t rows, int64_t cols, int64_t samples) {
    const int64_t stride = cols * samples;
    for (int64_t r = 0; r < rows; ++r) {
        uint16_t* row = data + r * stride;
        for (int64_t i = samples; i < stride; ++i) row[i] += row[i - samples];
    }
}

// ---------------------------------------------------------------------------
// Parallel strip decode: LZW(5) / PackBits(32773) / none(1)
// ---------------------------------------------------------------------------
// srcs: concatenated compressed strips; offsets/lengths per strip (into srcs);
// dst: output buffer; dst_offsets/dst_lengths per strip.
// Returns 0 on success, index+1 of the first failing strip otherwise.
int64_t decode_strips(const uint8_t* srcs,
                      const int64_t* offsets, const int64_t* lengths,
                      uint8_t* dst,
                      const int64_t* dst_offsets, const int64_t* dst_lengths,
                      int64_t n_strips, int32_t compression, int32_t n_threads) {
    std::atomic<int64_t> fail{0};
    std::atomic<int64_t> cursor{0};
    if (n_threads < 1) n_threads = 1;
    auto worker = [&]() {
        for (;;) {
            int64_t s = cursor.fetch_add(1);
            if (s >= n_strips || fail.load() != 0) return;
            const uint8_t* src = srcs + offsets[s];
            uint8_t* out = dst + dst_offsets[s];
            int64_t written;
            switch (compression) {
                case 1:  // none
                    written = lengths[s] < dst_lengths[s] ? lengths[s]
                                                          : dst_lengths[s];
                    std::memcpy(out, src, written);
                    break;
                case 5:
                    written = lzw_decode(src, lengths[s], out, dst_lengths[s]);
                    break;
                case 32773:
                    written = packbits_decode(src, lengths[s], out, dst_lengths[s]);
                    break;
                default:
                    written = -1;
            }
            if (written < 0) fail.store(s + 1);
            else if (written < dst_lengths[s]) {
                std::memset(out + written, 0, dst_lengths[s] - written);
            }
        }
    };
    std::vector<std::thread> pool;
    for (int32_t t = 0; t < n_threads; ++t) pool.emplace_back(worker);
    for (auto& th : pool) th.join();
    return fail.load();
}

// ---------------------------------------------------------------------------
// Separable box-average reduce: u16 source → f32 output
// ---------------------------------------------------------------------------
// The downsample-on-read hot path (reference: GDAL RasterIOResampled Average,
// src/io/gdal.rs:145-177). Window tables (ys/yc = per-output-row source start/
// count; xs/xc = per-output-col) are precomputed in Python from the SAME
// Pillow-style coefficient builder the device resampler uses, so host and
// device reductions share exact box boundaries. Single streaming pass over
// the source (memory-bandwidth bound); u32 column accumulator stays L2-hot.
//
// `src` points at global source row `src_row0` (chunked callers pass the
// chunk's first row); output rows [oy0, oy1) are produced into `out`, which
// holds (oy1-oy0) x out_cols floats.
namespace {

#if defined(__AVX512F__)
// Widen one 512-bit vector of 32 u16 into two u32 vectors.
static inline void widen_u16x32(__m512i v, __m512i& lo, __m512i& hi) {
    lo = _mm512_cvtepu16_epi32(_mm512_castsi512_si256(v));
    hi = _mm512_cvtepu16_epi32(_mm512_extracti64x4_epi64(v, 1));
}

// acc[0..cols) += sum of the n source rows starting at `rows0`, each
// `src_cols` apart (u32 adds: order-independent, bit-identical under any
// pass structure).
static void acc_add_rows_avx512(const uint16_t* rows0, int64_t src_cols,
                                int64_t n, uint32_t* acc) {
    int64_t x;
    int64_t r = 0;
    // 4 source rows per pass halves the L2 acc read+write traffic per
    // source byte vs 2-row passes (measured 77.1 -> 74.5 ms/band on the
    // 20000^2 -> 2048 window shape; bit-identical sums)
    for (; r + 4 <= n; r += 4) {
        const uint16_t* ra = rows0 + r * src_cols;
        const uint16_t* rb = ra + src_cols;
        const uint16_t* rc = rb + src_cols;
        const uint16_t* rd = rc + src_cols;
        for (x = 0; x + 32 <= src_cols; x += 32) {
            _mm_prefetch(reinterpret_cast<const char*>(ra + x + 1024),
                         _MM_HINT_T0);
            _mm_prefetch(reinterpret_cast<const char*>(rb + x + 1024),
                         _MM_HINT_T0);
            _mm_prefetch(reinterpret_cast<const char*>(rc + x + 1024),
                         _MM_HINT_T0);
            _mm_prefetch(reinterpret_cast<const char*>(rd + x + 1024),
                         _MM_HINT_T0);
            __m512i la, ha, lb, hb, lc, hc, ld, hd;
            widen_u16x32(_mm512_loadu_si512(ra + x), la, ha);
            widen_u16x32(_mm512_loadu_si512(rb + x), lb, hb);
            widen_u16x32(_mm512_loadu_si512(rc + x), lc, hc);
            widen_u16x32(_mm512_loadu_si512(rd + x), ld, hd);
            _mm512_storeu_si512(
                acc + x,
                _mm512_add_epi32(_mm512_loadu_si512(acc + x),
                                 _mm512_add_epi32(_mm512_add_epi32(la, lb),
                                                  _mm512_add_epi32(lc, ld))));
            _mm512_storeu_si512(
                acc + x + 16,
                _mm512_add_epi32(_mm512_loadu_si512(acc + x + 16),
                                 _mm512_add_epi32(_mm512_add_epi32(ha, hb),
                                                  _mm512_add_epi32(hc, hd))));
        }
        for (; x < src_cols; ++x)
            acc[x] += static_cast<uint32_t>(ra[x]) + rb[x] + rc[x] + rd[x];
    }
    for (; r + 2 <= n; r += 2) {
        const uint16_t* ra = rows0 + r * src_cols;
        const uint16_t* rb = ra + src_cols;
        for (x = 0; x + 32 <= src_cols; x += 32) {
            _mm_prefetch(reinterpret_cast<const char*>(ra + x + 1024),
                         _MM_HINT_T0);
            _mm_prefetch(reinterpret_cast<const char*>(rb + x + 1024),
                         _MM_HINT_T0);
            __m512i la, ha, lb, hb;
            widen_u16x32(_mm512_loadu_si512(ra + x), la, ha);
            widen_u16x32(_mm512_loadu_si512(rb + x), lb, hb);
            _mm512_storeu_si512(
                acc + x, _mm512_add_epi32(_mm512_loadu_si512(acc + x),
                                          _mm512_add_epi32(la, lb)));
            _mm512_storeu_si512(
                acc + x + 16,
                _mm512_add_epi32(_mm512_loadu_si512(acc + x + 16),
                                 _mm512_add_epi32(ha, hb)));
        }
        for (; x < src_cols; ++x)
            acc[x] += static_cast<uint32_t>(ra[x]) + rb[x];
    }
    for (; r < n; ++r) {
        const uint16_t* ra = rows0 + r * src_cols;
        for (x = 0; x + 32 <= src_cols; x += 32) {
            _mm_prefetch(reinterpret_cast<const char*>(ra + x + 1024),
                         _MM_HINT_T0);
            __m512i la, ha;
            widen_u16x32(_mm512_loadu_si512(ra + x), la, ha);
            _mm512_storeu_si512(
                acc + x, _mm512_add_epi32(_mm512_loadu_si512(acc + x), la));
            _mm512_storeu_si512(
                acc + x + 16,
                _mm512_add_epi32(_mm512_loadu_si512(acc + x + 16), ha));
        }
        for (; x < src_cols; ++x) acc[x] += ra[x];
    }
}

// acc[0..cols) = sum of the n source rows.
//
// Whole-window single pass for the common downsample windows (n <= 16):
// the inner loop reads all n rows of the window at each column block — n
// concurrent adjacent DRAM streams with the accumulator kept in two
// registers and STORED once (no RMW traffic at all). Measured on the
// 20000^2 -> 2048 shape: 56-69 ms/band vs 76 ms for the 4-row-pass
// structure and 62-66 ms for the 4-stream read-only floor probe — i.e. at
// or slightly above the floor (the ~10-stream pattern covers DRAM latency
// better than 4 spread streams). Large windows (heavy thumbnail
// reductions) fall back to chunked 4/2/1-row accumulator passes; sums are
// u32-exact either way, so the output is bit-identical.
static void vertical_acc_avx512(const uint16_t* rows0, int64_t src_cols,
                                int64_t n, uint32_t* acc) {
    int64_t x = 0;
    if (n <= 16) {
        // Shuffle-free widening: each u32 lane of a loaded vector holds an
        // (even, odd) u16 column pair as lo + hi*2^16. Accumulate the RAW
        // lanes (mod 2^32) into sRaw and the >>16 hi halves into sHi; the
        // even-column sums are then sRaw - (sHi << 16) (exact: the true
        // even sums fit u32 for any n <= 65537, and u32 arithmetic is
        // modular), odd-column sums are sHi. 3 ALU uops/row/32px (add,
        // srl, add — zero shuffle-port uops) vs the former unpacklo/hi
        // form's 4 (2 shuffle + 2 add): the p0/p5-bound issue rate drops
        // from 2.0 to 1.5 cycles/row/32px. Measured NEUTRAL on this host
        // (the loop sits at the DRAM floor in every phase sampled), so
        // the uop cut only pays when memory runs ahead of the core; kept
        // because it is strictly fewer uops. Column order is restored ONCE
        // per window: two table permutes interleave the even/odd vectors
        // at store time. Sums are bit-identical u32, as before.
        const __m512i idx0 = _mm512_setr_epi32(
            0, 16, 1, 17, 2, 18, 3, 19, 4, 20, 5, 21, 6, 22, 7, 23);
        const __m512i idx1 = _mm512_setr_epi32(
            8, 24, 9, 25, 10, 26, 11, 27, 12, 28, 13, 29, 14, 30, 15, 31);
        for (; x + 32 <= src_cols; x += 32) {
            __m512i sRaw = _mm512_setzero_si512();
            __m512i sHi = _mm512_setzero_si512();
            for (int64_t r = 0; r < n; ++r) {
                const uint16_t* p = rows0 + r * src_cols;
                _mm_prefetch(reinterpret_cast<const char*>(p + x + 1024),
                             _MM_HINT_T0);
                const __m512i v = _mm512_loadu_si512(p + x);
                sRaw = _mm512_add_epi32(sRaw, v);
                sHi = _mm512_add_epi32(sHi, _mm512_srli_epi32(v, 16));
            }
            const __m512i sEven = _mm512_sub_epi32(
                sRaw, _mm512_slli_epi32(sHi, 16));
            _mm512_storeu_si512(acc + x, _mm512_permutex2var_epi32(
                sEven, idx0, sHi));
            _mm512_storeu_si512(acc + x + 16, _mm512_permutex2var_epi32(
                sEven, idx1, sHi));
        }
        for (; x < src_cols; ++x) {
            uint32_t s = 0;
            for (int64_t r = 0; r < n; ++r) s += rows0[r * src_cols + x];
            acc[x] = s;
        }
        return;
    }
    const uint16_t* row = rows0;
    for (; x + 32 <= src_cols; x += 32) {
        _mm_prefetch(reinterpret_cast<const char*>(row + x + 1024),
                     _MM_HINT_T0);
        __m512i lo, hi;
        widen_u16x32(_mm512_loadu_si512(row + x), lo, hi);
        _mm512_storeu_si512(acc + x, lo);
        _mm512_storeu_si512(acc + x + 16, hi);
    }
    for (; x < src_cols; ++x) acc[x] = row[x];
    acc_add_rows_avx512(rows0 + src_cols, src_cols, n - 1, acc);
}
#endif  // __AVX512F__

static void vertical_acc_scalar(const uint16_t* rows0, int64_t src_cols,
                                int64_t n, uint32_t* acc) {
    const uint16_t* row = rows0;
    for (int64_t x = 0; x < src_cols; ++x) acc[x] = row[x];
    for (int64_t r = 1; r < n; ++r) {
        row = rows0 + r * src_cols;
        for (int64_t x = 0; x < src_cols; ++x) acc[x] += row[x];
    }
}

}  // namespace

extern "C++" {  // the template needs C++ linkage inside the C-ABI block
template <int B>
static void hsum_row_b(const uint32_t* acc, const int32_t* xs,
                       const int32_t* xc, int64_t out_cols, double inv_n,
                       const double* inv_m, float* orow) {
    for (int64_t ox = 0; ox < out_cols; ++ox) {
        const uint32_t* p = acc + xs[ox];
        uint32_t s = 0;
        for (int j = 0; j < B; ++j) s += p[j];  // unrolled: B is constexpr
        if (xc[ox] > B) s += p[B];
        orow[ox] = static_cast<float>(
            static_cast<double>(s) * (inv_n * inv_m[ox]));
    }
}

static void hsum_unrolled(const uint32_t* acc, const int32_t* xs,
                          const int32_t* xc, int b, int64_t out_cols,
                          double inv_n, const double* inv_m, float* orow) {
    switch (b) {
        case 1: hsum_row_b<1>(acc, xs, xc, out_cols, inv_n, inv_m, orow); break;
        case 2: hsum_row_b<2>(acc, xs, xc, out_cols, inv_n, inv_m, orow); break;
        case 3: hsum_row_b<3>(acc, xs, xc, out_cols, inv_n, inv_m, orow); break;
        case 4: hsum_row_b<4>(acc, xs, xc, out_cols, inv_n, inv_m, orow); break;
        case 5: hsum_row_b<5>(acc, xs, xc, out_cols, inv_n, inv_m, orow); break;
        case 6: hsum_row_b<6>(acc, xs, xc, out_cols, inv_n, inv_m, orow); break;
        case 7: hsum_row_b<7>(acc, xs, xc, out_cols, inv_n, inv_m, orow); break;
        case 8: hsum_row_b<8>(acc, xs, xc, out_cols, inv_n, inv_m, orow); break;
        case 9: hsum_row_b<9>(acc, xs, xc, out_cols, inv_n, inv_m, orow); break;
        case 10: hsum_row_b<10>(acc, xs, xc, out_cols, inv_n, inv_m, orow); break;
        case 11: hsum_row_b<11>(acc, xs, xc, out_cols, inv_n, inv_m, orow); break;
        case 12: hsum_row_b<12>(acc, xs, xc, out_cols, inv_n, inv_m, orow); break;
        case 13: hsum_row_b<13>(acc, xs, xc, out_cols, inv_n, inv_m, orow); break;
        case 14: hsum_row_b<14>(acc, xs, xc, out_cols, inv_n, inv_m, orow); break;
        case 15: hsum_row_b<15>(acc, xs, xc, out_cols, inv_n, inv_m, orow); break;
        default: hsum_row_b<16>(acc, xs, xc, out_cols, inv_n, inv_m, orow); break;
    }
}
}  // extern "C++"

void box_reduce_u16_f32(const uint16_t* src, int64_t src_row0,
                        int64_t src_cols,
                        float* out, int64_t oy0, int64_t oy1, int64_t out_cols,
                        const int32_t* ys, const int32_t* yc,
                        const int32_t* xs, const int32_t* xc) {
    std::vector<uint32_t> acc(static_cast<size_t>(src_cols));
    // The scale is a precomputed double product: no per-element divide (a
    // divide chain cost ~25 ms per 400 MP band); f64 a*inv_n*inv_m is within
    // 1 ulp of the a*inv_n/m chain, far under the device comparison
    // tolerance after the f32 cast.
    std::vector<double> inv_m(static_cast<size_t>(out_cols));
    int64_t max_m = 1, max_n = 1;
    int64_t xc_min = out_cols > 0 ? xc[0] : 1, xc_max = 1;
    for (int64_t ox = 0; ox < out_cols; ++ox) {
        inv_m[ox] = 1.0 / static_cast<double>(xc[ox]);
        if (xc[ox] > max_m) max_m = xc[ox];
        if (xc[ox] < xc_min) xc_min = xc[ox];
        if (xc[ox] > xc_max) xc_max = xc[ox];
    }
    for (int64_t oy = oy0; oy < oy1; ++oy)
        if (yc[oy] > max_n) max_n = yc[oy];
    // Column sums are n*65535 <= u32 max for any real n. Horizontal window
    // sums of those u32 columns need u64 once the 2-D box exceeds 65537
    // pixels (e.g. a 26544² band thumbnailed to 64 has ~415x415 windows);
    // the common downsample-on-read shapes (boxes of ~100 px) stay on the
    // faster u32 path.
    const bool wide = max_n * max_m > 65537;

    // horizontal window sums + scale for one finished accumulator row
    auto emit = [&](int64_t oy, const uint32_t* a) {
        float* orow = out + (oy - oy0) * out_cols;
        const double inv_n = 1.0 / static_cast<double>(yc[oy]);
        if (wide) {
            for (int64_t ox = 0; ox < out_cols; ++ox) {
                const uint32_t* p = a + xs[ox];
                const int64_t m = xc[ox];
                uint64_t s = 0;
                for (int64_t j = 0; j < m; ++j) s += p[j];
                orow[ox] = static_cast<float>(
                    static_cast<double>(s) * (inv_n * inv_m[ox]));
            }
        } else if (xc_min >= 1 && xc_min <= 16 && xc_max <= xc_min + 1) {
            // proportional-split windows are {B, B+1} wide: a compile-time
            // unrolled sum + one conditional tail replaces the
            // branch-per-add loop (~2.8 ms/band on the 20000->2048 shape)
            hsum_unrolled(a, xs, xc, static_cast<int>(xc_min),
                          out_cols, inv_n, inv_m.data(), orow);
        } else {
            for (int64_t ox = 0; ox < out_cols; ++ox) {
                const uint32_t* p = a + xs[ox];
                const int64_t m = xc[ox];
                uint32_t s = 0;
                for (int64_t j = 0; j < m; ++j) s += p[j];
                orow[ox] = static_cast<float>(
                    static_cast<double>(s) * (inv_n * inv_m[ox]));
            }
        }
    };

    for (int64_t oy = oy0; oy < oy1; ++oy) {
        const uint16_t* rows0 = src + (ys[oy] - src_row0) * src_cols;
#if defined(__AVX512F__)
        vertical_acc_avx512(rows0, src_cols, yc[oy], acc.data());
#else
        vertical_acc_scalar(rows0, src_cols, yc[oy], acc.data());
#endif
        emit(oy, acc.data());
    }
}

// ---------------------------------------------------------------------------
// Streaming-read bandwidth probe
// ---------------------------------------------------------------------------
// Traverses `n` u16 values with four interleaved read streams (the fastest
// single-core pattern measured on this host) and returns their sum. The
// benchmark uses this to report the host's speed-of-light for the reduce
// stage: the box reducer must read every source byte exactly once, so its
// floor is this traversal time.
// Returns a byte-fold checksum (not a u16 sum) — the value exists only to
// keep the loads alive.
// Stream-count-parametrized variant: traverses `n` u16 values with
// `streams` interleaved read streams (1/2/4/8). Bandwidth as a function of
// stream count bounds the DRAM controller's behavior for the multi-core
// projection: if 8 spread streams move no more bytes/s than 4, the
// single-core probe already saturates the channel (aggregate bandwidth
// would NOT scale with cores — the projection's "dram_fixed" model); if
// bandwidth keeps rising with stream count, the single core is
// latency-bound and extra cores would add real bandwidth ("dram_2x").
uint64_t stream_sum_u16_n(const uint16_t* src, int64_t n, int streams) {
#if defined(__AVX512F__)
    const int s = streams >= 8 ? 8 : streams >= 4 ? 4 : streams >= 2 ? 2 : 1;
    const int64_t q = (n / s) & ~31LL;
    __m512i acc[8];
    for (int k = 0; k < s; ++k) acc[k] = _mm512_setzero_si512();
    const __m512i z = _mm512_setzero_si512();
    for (int64_t i = 0; i + 32 <= q; i += 32)
        for (int k = 0; k < s; ++k)
            acc[k] = _mm512_add_epi64(
                acc[k],
                _mm512_sad_epu8(_mm512_loadu_si512(src + k * q + i), z));
    for (int k = 1; k < s; ++k) acc[0] = _mm512_add_epi64(acc[0], acc[k]);
    uint64_t tmp[8];
    _mm512_storeu_si512(tmp, acc[0]);
    uint64_t out = 0;
    for (int k = 0; k < 8; ++k) out += tmp[k];
    for (int64_t i = s * q; i < n; ++i) out += src[i];
    return out;
#else
    uint64_t out = 0;
    for (int64_t i = 0; i < n; ++i) out += src[i];
    return out;
#endif
}

uint64_t stream_sum_u16(const uint16_t* src, int64_t n) {
#if defined(__AVX512F__)
    const int64_t q = (n / 4) & ~31LL;
    __m512i a0 = _mm512_setzero_si512(), a1 = a0, a2 = a0, a3 = a0;
    const __m512i z = _mm512_setzero_si512();
    for (int64_t i = 0; i + 32 <= q; i += 32) {
        a0 = _mm512_add_epi64(a0, _mm512_sad_epu8(_mm512_loadu_si512(src + i), z));
        a1 = _mm512_add_epi64(a1, _mm512_sad_epu8(_mm512_loadu_si512(src + q + i), z));
        a2 = _mm512_add_epi64(a2, _mm512_sad_epu8(_mm512_loadu_si512(src + 2 * q + i), z));
        a3 = _mm512_add_epi64(a3, _mm512_sad_epu8(_mm512_loadu_si512(src + 3 * q + i), z));
    }
    uint64_t tmp[8];
    uint64_t s = 0;
    _mm512_storeu_si512(tmp, _mm512_add_epi64(_mm512_add_epi64(a0, a1),
                                              _mm512_add_epi64(a2, a3)));
    for (int k = 0; k < 8; ++k) s += tmp[k];
    for (int64_t i = 4 * q; i < n; ++i) s += src[i];
    return s;
#else
    uint64_t s = 0;
    for (int64_t i = 0; i < n; ++i) s += src[i];
    return s;
#endif
}

}  // extern "C"
