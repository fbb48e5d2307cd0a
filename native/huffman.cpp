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

// hists (n*256 int64) -> codes (n*256 u16), sizes (n*256 u8), nsym (n i32)
// returns 0 on success, -1 if any chunk failed (invalid zero code length)
EXPORT int huffman_build_tables(const int64_t* hists, int n_chunks,
                                uint16_t* codes_out, uint8_t* sizes_out,
                                int32_t* nsym_out) {
    for (int c = 0; c < n_chunks; c++) {
        const int64_t* freqs0 = hists + (size_t)c * 256;
        uint16_t* codes = codes_out + (size_t)c * 256;
        uint8_t* sizes8 = sizes_out + (size_t)c * 256;
        std::memset(codes, 0, 256 * sizeof(uint16_t));
        std::memset(sizes8, 0, 256);
        int alphabet[256];
        int count = 0;
        for (int i = 0; i < 256; i++)
            if (freqs0[i] > 0) alphabet[count++] = i;
        nsym_out[c] = count;
        if (count == 0) continue;
        if (count == 1) { sizes8[alphabet[0]] = 1; continue; }
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
            continue;
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
