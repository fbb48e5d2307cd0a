// Batch canonical-Huffman table construction (host side).
//
// Re-derived from the reference semantics:
//   Moffat–Katajainen in-place code lengths: HuffmanEncoder.java:317-376
//   length limiting with bit-debt repay:     HuffmanEncoder.java:191-273
//   canonical code assignment:               HuffmanCommon.java:71-111
//   frequency normalization (slow path):     EntropyUtils.java:141-250
//
// Byte-exact with the Python implementation in kanzi_tpu/entropy/huffman.py
// (the device bit-pack kernels consume these tables; the wire must match).

#include <cstdint>
#include <cstring>
#include <algorithm>

#if defined(_MSC_VER)
#define EXPORT extern "C" __declspec(dllexport)
#else
#define EXPORT extern "C" __attribute__((visibility("default")))
#endif

namespace {

constexpr int MAX_SYMBOL_SIZE = 12;
constexpr int MAX_CHUNK_SIZE = 1 << 14;

void mk_phase1(int64_t* data, int n) {
    int s = 0, r = 0;
    for (int t = 0; t < n - 1; t++) {
        int64_t total = 0;
        for (int k = 0; k < 2; k++) {
            if (s >= n || (r < t && data[r] < data[s])) {
                total += data[r];
                data[r] = t;
                r++;
            } else {
                total += data[s];
                if (s > t) data[s] = 0;
                s++;
            }
        }
        data[t] = total;
    }
}

int mk_phase2(int64_t* data, int n) {
    if (n < 2) return 0;
    int level_top = n - 2;
    int depth = 1;
    int i = n;
    int nodes_at_level = 2;
    while (i > 0) {
        int k = level_top;
        while (k > 0 && data[k - 1] >= level_top) k--;
        int internal_ = level_top - k;
        int leaves = nodes_at_level - internal_;
        for (int j = 0; j < leaves; j++) data[--i] = depth;
        nodes_at_level = internal_ << 1;
        level_top = k;
        depth++;
    }
    return depth - 1;
}

// ranks: (freq<<8)|symbol, will be sorted; fills sizes[256]
int compute_code_lengths(int64_t* sizes, int64_t* ranks, int n) {
    std::sort(ranks, ranks + n);
    int64_t freqs[256];
    int syms[256];
    for (int i = 0; i < n; i++) {
        freqs[i] = ranks[i] >> 8;
        syms[i] = (int)(ranks[i] & 0xFF);
        if (freqs[i] == 0) return 0;
    }
    mk_phase1(freqs, n);
    int max_len = mk_phase2(freqs, n);
    for (int i = 0; i < n; i++) sizes[syms[i]] = freqs[i];
    return max_len;
}

// exact port of EntropyUtils normalize (entropy/utils.py:60-139)
void normalize_freqs(int64_t* freqs /*256*/, const int* alphabet, int count,
                     int64_t total_freq, int64_t scale) {
    if (count == 0 || total_freq == 0) return;
    if (total_freq == scale) return;
    int alpha[256];
    int asize = 0;
    int64_t sum_scaled = 0, sum_freq = 0;
    int idx_max = 0;
    for (int i = 0; i < 256; i++) {
        int64_t f = freqs[i];
        if (f == 0) continue;
        int64_t sf = f * scale;
        int64_t scaled = (sf <= total_freq) ? 1 : (sf + (total_freq >> 1)) / total_freq;
        alpha[asize++] = i;
        sum_scaled += scaled;
        freqs[i] = scaled;
        sum_freq += f;
        if (scaled > freqs[idx_max]) idx_max = i;
        if (sum_freq >= total_freq) break;
    }
    if (asize == 0) return;
    if (asize == 1) { freqs[alpha[0]] = scale; return; }
    if (sum_scaled == scale) return;
    int64_t delta = sum_scaled - scale;
    int64_t err_thr = freqs[idx_max] >> 4;
    if ((delta < 0 ? -delta : delta) <= err_thr) {
        freqs[idx_max] -= delta;
        return;
    }
    if (delta < 0) { delta += err_thr; freqs[idx_max] += err_thr; }
    else { delta -= err_thr; freqs[idx_max] -= err_thr; }
    int inc = delta > 0 ? -1 : 1;
    delta = delta < 0 ? -delta : delta;
    for (int round = 1; round < 6 && delta > 0; round++) {
        int adjustments = 0;
        for (int k = 0; k < asize; k++) {
            int idx = alpha[k];
            if (freqs[idx] <= 2) continue;
            freqs[idx] += inc;
            adjustments++;
            if (--delta == 0) break;
        }
        if (adjustments == 0) break;
    }
    freqs[idx_max] = std::max<int64_t>(freqs[idx_max] - delta, 1);
}

// HuffmanEncoder.java:191-273 debt repay; returns resulting max length
int limit_code_lengths(const int* alphabet, int count, int64_t* freqs,
                       int64_t* sizes, const int64_t* ranks_sorted) {
    int order[256];
    for (int i = 0; i < count; i++) order[i] = (int)(ranks_sorted[i] & 0xFF);
    int n = 0;
    int64_t debt = 0;
    while (n < count && sizes[order[n]] >= MAX_SYMBOL_SIZE) {
        debt += sizes[order[n]] - MAX_SYMBOL_SIZE;
        sizes[order[n]] = MAX_SYMBOL_SIZE;
        n++;
    }
    int ll[6][256];
    int ll_head[6] = {0, 0, 0, 0, 0, 0};
    int ll_tail[6] = {0, 0, 0, 0, 0, 0};
    while (n < count) {
        int idx = MAX_SYMBOL_SIZE - 1 - (int)sizes[order[n]];
        if (idx >= 6 || debt < ((int64_t)1 << idx)) break;
        ll[idx][ll_tail[idx]++] = order[n];
        n++;
    }
    int idx = 5;
    while (debt > 0 && idx >= 0) {
        if (ll_head[idx] >= ll_tail[idx] || debt < ((int64_t)1 << idx)) {
            idx--;
            continue;
        }
        int r = ll[idx][ll_head[idx]++];
        sizes[r] += 1;
        debt -= (int64_t)1 << idx;
    }
    idx = 0;
    while (debt > 0 && idx < 6) {
        if (ll_head[idx] >= ll_tail[idx]) { idx++; continue; }
        int r = ll[idx][ll_head[idx]++];
        sizes[r] += 1;
        debt -= (int64_t)1 << idx;
    }
    if (debt > 0) {
        int64_t total = 0;
        for (int i = 0; i < count; i++) total += freqs[alphabet[i]];
        normalize_freqs(freqs, alphabet, count, total, MAX_CHUNK_SIZE >> 3);
        int64_t nr[256];
        for (int i = 0; i < count; i++)
            nr[i] = (freqs[alphabet[i]] << 8) | alphabet[i];
        return compute_code_lengths(sizes, nr, count);
    }
    return MAX_SYMBOL_SIZE;
}

}  // namespace

namespace {

// one chunk's canonical table from its histogram; fills codes/sizes8 and
// the ascending alphabet; returns the alphabet size, or -1 on invalid
// (zero code length from a degenerate normalization)
int build_one_table(const int64_t* freqs0, uint16_t* codes, uint8_t* sizes8,
                    int* alphabet) {
    std::memset(codes, 0, 256 * sizeof(uint16_t));
    std::memset(sizes8, 0, 256);
    int count = 0;
    for (int i = 0; i < 256; i++)
        if (freqs0[i] > 0) alphabet[count++] = i;
    if (count == 0) return 0;
    if (count == 1) { sizes8[alphabet[0]] = 1; return 1; }
    int64_t sizes[256];
    std::memset(sizes, 0, sizeof(sizes));
    int64_t ranks[256];
    int64_t fcopy[256];
    std::memcpy(fcopy, freqs0, sizeof(fcopy));
    for (int i = 0; i < count; i++)
        ranks[i] = (freqs0[alphabet[i]] << 8) | alphabet[i];
    int max_len = compute_code_lengths(sizes, ranks, count);
    if (max_len == 0) return -1;
    if (max_len > MAX_SYMBOL_SIZE) {
        // ranks is now sorted (compute_code_lengths sorted in place)
        max_len = limit_code_lengths(alphabet, count, fcopy, sizes, ranks);
        if (max_len == 0) return -1;
    }
    if (max_len > MAX_SYMBOL_SIZE) {
        for (int i = 0; i < count; i++) {
            codes[alphabet[i]] = (uint16_t)i;
            sizes8[alphabet[i]] = 8;
        }
        return count;
    }
    // canonical codes over (length, symbol)-sorted alphabet
    int64_t keys[256];
    for (int i = 0; i < count; i++)
        keys[i] = (sizes[alphabet[i]] << 16) | alphabet[i];
    std::sort(keys, keys + count);
    int64_t code = 0;
    int cur_len = (int)(keys[0] >> 16);
    for (int i = 0; i < count; i++) {
        int s = (int)(keys[i] & 0xFFFF);
        int L = (int)(keys[i] >> 16);
        code <<= (L - cur_len);
        cur_len = L;
        codes[s] = (uint16_t)code;
        sizes8[s] = (uint8_t)L;
        code++;
    }
    return count;
}

}  // namespace

// hists (n*256 int64) -> codes (n*256 u16), sizes (n*256 u8), nsym (n i32)
// returns 0 on success, -1 if any chunk failed (invalid zero code length)
EXPORT int huffman_build_tables(const int64_t* hists, int n_chunks,
                                uint16_t* codes_out, uint8_t* sizes_out,
                                int32_t* nsym_out) {
    for (int c = 0; c < n_chunks; c++) {
        int alphabet[256];
        const int count = build_one_table(hists + (size_t)c * 256,
                                          codes_out + (size_t)c * 256,
                                          sizes_out + (size_t)c * 256,
                                          alphabet);
        if (count < 0) return -1;
        nsym_out[c] = count;
    }
    return 0;
}

// ---------------- canonical-table decode (HuffmanDecoder.java:213-345) ----
// 12-bit MSB-first window per symbol: sym = sym_lut[w], advance len_lut[w]
// bits (clamped to >= 1 so corrupt tables cannot loop).  Returns the final
// bit position; the caller checks it equals the declared stream size.

EXPORT int64_t kz_huffman_decode(const uint8_t* pay, int64_t nbits,
                                 int64_t nsym, const uint8_t* sym_lut,
                                 const uint8_t* len_lut, uint8_t* out) {
    const int64_t nbytes = (nbits + 7) >> 3;
    int64_t pos = 0;
    for (int64_t i = 0; i < nsym; i++) {
        const int64_t byte = pos >> 3;
        const int off = (int)(pos & 7);
        const uint32_t b0 = byte < nbytes ? pay[byte] : 0;
        const uint32_t b1 = byte + 1 < nbytes ? pay[byte + 1] : 0;
        const uint32_t b2 = byte + 2 < nbytes ? pay[byte + 2] : 0;
        const uint32_t w = (((b0 << 16) | (b1 << 8) | b2) >> (12 - off))
                           & 0xFFF;
        out[i] = sym_lut[w];
        const int ln = len_lut[w];
        pos += ln ? ln : 1;
    }
    return pos;
}

// ---------------- whole-block canonical decode -----------------------------
// Decodes an entire Huffman entropy payload (all chunks: alphabet header,
// ExpGolomb code-length deltas, canonical table build, 4 interleaved
// streams — HuffmanDecoder.java:213-345 / HuffmanEncoder.java:419-493 wire)
// in one native call, eliminating the per-chunk Python overhead.  The inner
// loop pulls one symbol from each of the 4 streams per iteration with
// independent bit windows, mirroring the reference decoder's ILP shape.
//
// The caller must pass a buffer with >= 8 readable bytes beyond the payload
// (zero padding; the 12-bit lookahead window may extend past a stream's
// declared end — only the first `len` bits of a window select the symbol,
// so over-read bits never change the output).
//
// Returns the final bit position, or a negative error:
//   -1 invalid table/lengths/alphabet   -2 stream size mismatch
//   -3 truncated stream (read past nbits)

namespace {

struct BitRd {
    const uint8_t* p;
    int64_t nbits;
    int64_t pos;
    bool err;
};

// n <= 32; buffer is padded, so over-read only sets err (no OOB access)
static inline uint32_t hb_read(BitRd& b, int n) {
    if (b.pos + n > b.nbits) { b.err = true; return 0; }
    const uint8_t* q = b.p + (b.pos >> 3);
    uint64_t w = ((uint64_t)q[0] << 32) | ((uint64_t)q[1] << 24)
               | ((uint64_t)q[2] << 16) | ((uint64_t)q[3] << 8) | q[4];
    uint32_t v = (uint32_t)((w >> (40 - n - (b.pos & 7)))
                            & ((n == 32) ? 0xFFFFFFFFu : ((1u << n) - 1)));
    b.pos += n;
    return v;
}

static inline int hb_bit(BitRd& b) { return (int)hb_read(b, 1); }

// LSB-first byte varint (EntropyUtils.java:259-300)
static inline int64_t hb_varint(BitRd& b) {
    uint32_t v = hb_read(b, 8);
    int64_t res = v & 0x7F;
    int shift = 7;
    while (v >= 128) {
        v = hb_read(b, 8);
        res |= (int64_t)(v & 0x7F) << shift;
        if (shift == 28) break;
        shift += 7;
    }
    return res;
}

// signed Exp-Golomb byte (ExpGolombDecoder.java:25-100).  Legal byte
// codes have k <= 7 (magnitude <= 255); reject beyond k=8 — both to flag
// the corrupt stream early and because hb_read(b, k+1) with k >= 32
// would shift out of the 32-bit mask (UB).
static inline int hb_expg_signed(BitRd& b) {
    if (hb_bit(b) == 1) return 0;
    int k = 1;
    while (!b.err && hb_bit(b) == 0) {
        if (++k > 8) { b.err = true; return 0; }
    }
    uint32_t res = hb_read(b, k + 1);
    int sgn = res & 1;
    int64_t r = (int64_t)(res >> 1) + (1 << k) - 1;
    return (int)(((r - sgn) ^ -(int64_t)sgn) & 0xFF);
}

}  // namespace

// ---------------- whole-block canonical encode -----------------------------
// Encodes an entire Huffman entropy payload (per 16 KiB chunk: histogram,
// canonical table, alphabet header, ExpGolomb code-length deltas, 4 varint
// stream sizes, 4 packed bit streams — HuffmanEncoder.java:419-493 wire)
// into `out` starting at bit 0.  Returns the total bit count, or -1 when
// `cap` bytes would overflow.  Byte-identical to the Python encoder
// (entropy/huffman.py); the caller appends (packed bytes, nbits) to its
// BitWriter.

namespace {

struct BitWr {
    uint8_t* p;
    int64_t cap;     // bytes
    int64_t pos;     // bits written
    uint64_t acc;    // pending bits, MSB-first in the low `fill` bits
    int fill;
    bool overflow;
    void put(uint64_t v, int n) {          // n <= 57
        acc = (acc << n) | (v & ((n >= 64) ? ~0ull : ((1ull << n) - 1)));
        fill += n;
        while (fill >= 8) {
            fill -= 8;
            const int64_t b = pos >> 3;
            if (b >= cap) { overflow = true; return; }
            p[b] = (uint8_t)(acc >> fill);
            pos += 8;
        }
    }
    int64_t finish() {                      // flush tail, return bit count
        const int64_t bits = pos + fill;
        if (fill > 0) {
            const int64_t b = pos >> 3;
            if (b >= cap) { overflow = true; return -1; }
            p[b] = (uint8_t)(acc << (8 - fill));
            fill = 0;
        }
        return overflow ? -1 : bits;
    }
};

// signed Exp-Golomb byte (ExpGolombEncoder.java wire; expgolomb.py tables)
static inline void wr_expg_signed(BitWr& w, int b) {
    if (b == 0) { w.put(1, 1); return; }
    const int sv = (b >= 128) ? b - 256 : b;
    const int a = sv < 0 ? -sv : sv;
    const int sgn = sv < 0 ? 1 : 0;
    int k = 0;
    while ((2 << k) <= a + 1) k++;          // k = bitlen(a+1)-1
    const int r = a - ((1 << k) - 1);
    w.put((1ull << (k + 1)) | ((uint64_t)r << 1) | (uint64_t)sgn, 2 * k + 2);
}

static inline void wr_varint(BitWr& w, uint32_t v) {
    while (v >= 128) { w.put(0x80 | (v & 0x7F), 8); v >>= 7; }
    w.put(v, 8);
}

}  // namespace

EXPORT int64_t kz_huffman_block_encode(const uint8_t* src, int64_t count,
                                       int64_t chunk_size, uint8_t* out,
                                       int64_t cap) {
    BitWr w{out, cap, 0, 0, 0, false};
    uint16_t codes[256];
    uint8_t sizes[256];
    int alphabet[256];
    for (int64_t start = 0; start < count; start += chunk_size) {
        const int64_t sz = std::min(chunk_size, count - start);
        const uint8_t* chunk = src + start;
        if (sz < 32) {
            for (int64_t i = 0; i < sz; i++) w.put(chunk[i], 8);
            continue;
        }
        int64_t freqs[256] = {0};
        for (int64_t i = 0; i < sz; i++) freqs[chunk[i]]++;
        const int n_sym = build_one_table(freqs, codes, sizes, alphabet);
        if (n_sym < 0) return -2;
        // alphabet header (EntropyUtils.java:38-74)
        if (n_sym == 256) {
            w.put(0, 1); w.put(0, 1);       // full alphabet
        } else {
            w.put(1, 1);                    // partial: presence bitmap
            uint8_t masks[32] = {0};
            for (int i = 0; i < n_sym; i++)
                masks[alphabet[i] >> 3] |= (uint8_t)(1 << (alphabet[i] & 7));
            const int last_mask = alphabet[n_sym - 1] >> 3;
            w.put((uint64_t)last_mask, 5);
            for (int m = 0; m <= last_mask; m++) w.put(masks[m], 8);
        }
        // code lengths as signed ExpGolomb deltas from 2
        int prev = 2;
        for (int i = 0; i < n_sym; i++) {
            const int L = sizes[alphabet[i]];
            wr_expg_signed(w, (L - prev) & 0xFF);
            prev = L;
        }
        if (n_sym <= 1) continue;           // single-symbol chunk: no streams
        // 4 interleaved streams: per-stream bit counts as varints, then
        // the packed code bits of each fragment
        const int64_t frag = sz / 4;
        int64_t sbits[4];
        for (int j = 0; j < 4; j++) {
            int64_t b = 0;
            const uint8_t* f = chunk + j * frag;
            for (int64_t i = 0; i < frag; i++) b += sizes[f[i]];
            sbits[j] = b;
            wr_varint(w, (uint32_t)b);
        }
        (void)sbits;
        for (int j = 0; j < 4; j++) {
            const uint8_t* f = chunk + j * frag;
            for (int64_t i = 0; i < frag; i++) {
                const uint8_t s = f[i];
                w.put(codes[s], sizes[s]);
            }
        }
        // leftover symbols as raw bytes
        for (int64_t i = 4 * frag; i < sz; i++) w.put(chunk[i], 8);
        if (w.overflow) return -1;
    }
    return w.finish();
}

EXPORT int64_t kz_huffman_block_decode(const uint8_t* pay, int64_t nbits,
                                       int64_t bitpos, int64_t count,
                                       int64_t chunk_size, uint8_t* out) {
    BitRd br{pay, nbits, bitpos, false};
    uint8_t sym_lut[1 << MAX_SYMBOL_SIZE];
    uint8_t len_lut[1 << MAX_SYMBOL_SIZE];
    int64_t start = 0;
    while (start < count) {
        const int64_t sz = std::min(chunk_size, count - start);
        if (sz < 32) {  // raw bytes
            for (int64_t i = 0; i < sz; i++)
                out[start + i] = (uint8_t)hb_read(br, 8);
            if (br.err) return -3;
            start += sz;
            continue;
        }
        // --- alphabet (EntropyUtils.java:38-122) ---
        int alphabet[256];
        int n_sym = 0;
        if (hb_bit(br) == 0) {          // full/empty
            if (hb_bit(br) == 1) return -1;  // empty alphabet
            n_sym = 256;
            for (int i = 0; i < 256; i++) alphabet[i] = i;
        } else {                        // partial: presence bitmap
            const int last_mask = (int)hb_read(br, 5);
            for (int m = 0; m <= last_mask; m++) {
                const uint32_t mask = hb_read(br, 8);
                for (int j = 0; j < 8; j++)
                    if (mask & (1u << j)) alphabet[n_sym++] = 8 * m + j;
            }
            if (n_sym == 0) return -1;
        }
        if (br.err) return -3;
        // --- code lengths: signed ExpGolomb deltas from 2 ---
        uint8_t lens[256];
        int cur = 2;
        for (int i = 0; i < n_sym; i++) {
            int d = hb_expg_signed(br);
            if (d >= 128) d -= 256;
            cur += d;
            if (cur <= 0 || cur > MAX_SYMBOL_SIZE || br.err)
                return br.err ? -3 : -1;
            lens[i] = (uint8_t)cur;
        }
        if (n_sym == 1) {
            std::memset(out + start, alphabet[0], (size_t)sz);
            start += sz;
            continue;
        }
        // --- canonical codes over (length, symbol) order ---
        // alphabet is ascending, so a counting bucket by length is the
        // (length, value) lexsort (HuffmanCommon.java:71-111)
        int buckets[MAX_SYMBOL_SIZE + 2] = {0};
        for (int i = 0; i < n_sym; i++) buckets[lens[i] + 1]++;
        for (int l = 1; l <= MAX_SYMBOL_SIZE; l++) buckets[l + 1] += buckets[l];
        int order_sym[256];
        uint8_t order_len[256];
        {
            int pos_in[MAX_SYMBOL_SIZE + 1];
            for (int l = 0; l <= MAX_SYMBOL_SIZE; l++) pos_in[l] = buckets[l];
            for (int i = 0; i < n_sym; i++) {
                const int k = pos_in[lens[i]]++;
                order_sym[k] = alphabet[i];
                order_len[k] = lens[i];
            }
        }
        std::memset(sym_lut, 7, sizeof(sym_lut));
        std::memset(len_lut, 1, sizeof(len_lut));
        {
            int64_t code = 0;
            int cur_len = order_len[0];
            for (int i = 0; i < n_sym; i++) {
                const int L = order_len[i];
                code <<= (L - cur_len);
                cur_len = L;
                if (code >= ((int64_t)1 << L)) return -1;  // over-subscribed
                const int span = 1 << (MAX_SYMBOL_SIZE - L);
                const int lo = (int)(code << (MAX_SYMBOL_SIZE - L));
                std::memset(sym_lut + lo, order_sym[i], (size_t)span);
                std::memset(len_lut + lo, L, (size_t)span);
                code++;
            }
        }
        // --- 4 interleaved streams ---
        int64_t sbits[4];
        for (int j = 0; j < 4; j++) {
            sbits[j] = hb_varint(br);
            if (sbits[j] > (int64_t)MAX_SYMBOL_SIZE * (chunk_size / 4))
                return -1;
        }
        if (br.err) return -3;
        const int64_t frag = sz / 4;
        int64_t P[4];
        P[0] = br.pos;
        for (int j = 1; j < 4; j++) P[j] = P[j - 1] + sbits[j - 1];
        if (P[3] + sbits[3] > nbits) return -3;
        uint8_t* o0 = out + start;
        uint8_t* o1 = o0 + frag;
        uint8_t* o2 = o1 + frag;
        uint8_t* o3 = o2 + frag;
        int64_t p0 = P[0], p1 = P[1], p2 = P[2], p3 = P[3];
        // corrupt streams can under-declare a stream's bit size, letting
        // its cursor walk up to 12*frag bits past its budget before the
        // post-loop mismatch check fires: clamp every window read at
        // nbits (reads then stay within the caller's 8-byte pad; the
        // clamped garbage decode is rejected by that same check)
        const int64_t pmax = nbits;
        #define HB_WIN(pp) ((uint32_t)((((uint32_t)pay[(pp) >> 3] << 16)     \
                          | ((uint32_t)pay[((pp) >> 3) + 1] << 8)            \
                          |  (uint32_t)pay[((pp) >> 3) + 2])                 \
                          >> (12 - ((pp) & 7))) & 0xFFF)
        #define HB_CLAMP(pp) ((pp) < pmax ? (pp) : pmax)
        for (int64_t i = 0; i < frag; i++) {
            const uint32_t w0 = HB_WIN(HB_CLAMP(p0));
            const uint32_t w1 = HB_WIN(HB_CLAMP(p1));
            const uint32_t w2 = HB_WIN(HB_CLAMP(p2));
            const uint32_t w3 = HB_WIN(HB_CLAMP(p3));
            o0[i] = sym_lut[w0]; p0 += len_lut[w0];
            o1[i] = sym_lut[w1]; p1 += len_lut[w1];
            o2[i] = sym_lut[w2]; p2 += len_lut[w2];
            o3[i] = sym_lut[w3]; p3 += len_lut[w3];
        }
        #undef HB_CLAMP
        #undef HB_WIN
        if (p0 - P[0] != sbits[0] || p1 - P[1] != sbits[1]
            || p2 - P[2] != sbits[2] || p3 - P[3] != sbits[3])
            return -2;
        br.pos = P[3] + sbits[3];
        // leftover symbols as raw bytes
        for (int64_t i = 4 * frag; i < sz; i++)
            out[start + i] = (uint8_t)hb_read(br, 8);
        if (br.err) return -3;
        start += sz;
    }
    return br.pos;
}
