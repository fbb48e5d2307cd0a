// ROLZ (reduced-offset LZ) chunk kernels: context-keyed match tables with
// 2^logPosChecks positions per 16-bit context.  Semantics re-derived from
// K/transform/ROLZCodec.java:264-1014 (ROLZCodec1).  The Python layer owns
// the wire framing and the embedded ANS streams; these kernels tokenize one
// 16 MiB chunk into (literals, tokens, match lengths, match indexes) and
// reconstruct a chunk from those streams.

#include <cstdint>
#include <cstring>
#include <algorithm>
#include <vector>

#if defined(_MSC_VER)
#define EXPORT extern "C" __declspec(dllexport)
#else
#define EXPORT extern "C" __attribute__((visibility("default")))
#endif

typedef uint8_t u8;
typedef int32_t i32;
typedef uint32_t u32;
typedef int64_t i64;
typedef uint64_t u64;

namespace rolz {

static const i32 HASH = 200002979;
static const i32 CHUNK_SIZE = 16 * 1024 * 1024;
static const i32 HASH_MASK = ~(CHUNK_SIZE - 1);
static const i32 MAX_MATCH3 = 3 + 65535;

static inline i32 rdle32(const u8* p) { i32 v; std::memcpy(&v, p, 4); return v; }
static inline u64 rdle64(const u8* p) { u64 v; std::memcpy(&v, p, 8); return v; }

static inline i32 key1(const u8* buf, i64 idx) {
    return (i32)(buf[idx] | (buf[idx + 1] << 8));
}
static inline i32 key2(const u8* buf, i64 idx) {
    return (i32)(((i64)(rdle64(buf + idx) * (u64)HASH) >> 40) & 0xFFFF);
}
static inline i32 hash32f(const u8* buf, i64 idx) {
    return ((rdle32(buf + idx) << 8) * HASH) & HASH_MASK;
}

struct Emit {
    u8 *lit, *tk, *len, *midx;
    i64 nlit, ntk, nlen, nmidx;
    void emit_length(i32 length) {
        if (length >= (1 << 7)) {
            if (length >= (1 << 14)) {
                if (length >= (1 << 21)) len[nlen++] = (u8)(0x80 | (length >> 21));
                len[nlen++] = (u8)(0x80 | (length >> 14));
            }
            len[nlen++] = (u8)(0x80 | (length >> 7));
        }
        len[nlen++] = (u8)(length & 0x7F);
    }
};

static i32 find_match(const u8* buf, i64 chunk_start, i64 chunk_end, i64 pos,
                      i32 hash32, i32 counter, i32 base, const i32* matches,
                      i32 pos_checks, i32 mask_checks, i32 min_match) {
    i32 bestLen = 0;
    i32 bestIdx = -1;
    const i32 maxMatch = (i32)std::min((i64)MAX_MATCH3, chunk_end - pos) - 8;
    for (i32 i = counter; i > counter - pos_checks; i--) {
        i32 ref = matches[base + (i & mask_checks)];
        if ((ref & HASH_MASK) != hash32) continue;
        i64 r = (i64)(ref & ~HASH_MASK) + chunk_start;
        if (buf[r + bestLen] != buf[pos + bestLen]) continue;
        i32 n = 0;
        while (n < maxMatch) {
            const u64 diff = rdle64(buf + r + n) ^ rdle64(buf + pos + n);
            if (diff != 0) { n += (i32)(__builtin_ctzll(diff) >> 3); break; }
            n += 8;
        }
        if (n > bestLen) { bestIdx = counter - i; bestLen = n; }
    }
    return (bestLen < min_match) ? -1 : ((bestIdx << 16) | (bestLen - min_match));
}

}  // namespace rolz

using namespace rolz;

// Tokenize one chunk.  Buffers must be sized: lit >= chunk+64, tk/len/midx
// >= chunk/2.  Returns 0 on success.  out_lens: [lit, tk, len, midx].
EXPORT i32 kz_rolz1_forward_chunk(const u8* src, i64 chunk_start, i64 chunk_end,
                                  i64 src_end, i32 min_match, i32 delta,
                                  i32 log_pos_checks, i32* counters, i32* matches,
                                  u8* lit, u8* tk, u8* lenb, u8* midx,
                                  i64* out_lens) {
    const i32 pos_checks = 1 << log_pos_checks;
    const i32 mask_checks = pos_checks - 1;
    std::memset(matches, 0, sizeof(i32) * ((size_t)65536 << log_pos_checks));
    Emit E{lit, tk, lenb, midx, 0, 0, 0, 0};
    i64 srcIdx = chunk_start;
    const i64 n = std::min(src_end - chunk_start, (i64)8);
    for (i64 j = 0; j < n; j++) E.lit[E.nlit++] = src[srcIdx++];
    i64 firstLitIdx = srcIdx;
    i32 srcInc = 0;
    const bool k1 = (min_match == 3);

    while (srcIdx < chunk_end) {
        i32 key = k1 ? key1(src, srcIdx - delta) : key2(src, srcIdx - delta);
        i32 base = key << log_pos_checks;
        i32 h32 = hash32f(src, srcIdx);
        i32 counter = counters[key];
        i32 match = find_match(src, chunk_start, chunk_end, srcIdx, h32, counter,
                               base, matches, pos_checks, mask_checks, min_match);
        counters[key] = (counters[key] + 1) & mask_checks;
        matches[base + counters[key]] = h32 | (i32)(srcIdx - chunk_start);
        if (match == -1) {
            srcIdx++;
            srcIdx += (srcInc >> 6);
            srcInc++;
            continue;
        }
        {
            key = k1 ? key1(src, srcIdx + 1 - delta) : key2(src, srcIdx + 1 - delta);
            base = key << log_pos_checks;
            h32 = hash32f(src, srcIdx + 1);
            counter = counters[key];
            const i32 match2 = find_match(src, chunk_start, chunk_end, srcIdx + 1, h32,
                                          counter, base, matches, pos_checks,
                                          mask_checks, min_match);
            if (match2 >= 0 && (match2 & 0xFFFF) > (match & 0xFFFF)) {
                match = match2;
                srcIdx++;
                counters[key] = (counters[key] + 1) & mask_checks;
                matches[base + counters[key]] = h32 | (i32)(srcIdx - chunk_start);
            }
        }
        const i64 litLen = srcIdx - firstLitIdx;
        const i32 token = (litLen < 31) ? (i32)(litLen << 3) : 0xF8;
        const i32 mLen = match & 0xFFFF;
        if (mLen >= 7) {
            E.tk[E.ntk++] = (u8)(token | 0x07);
            E.emit_length(mLen - 7);
        } else {
            E.tk[E.ntk++] = (u8)(token | mLen);
        }
        if (litLen >= 31) E.emit_length((i32)(litLen - 31));
        std::memcpy(E.lit + E.nlit, src + firstLitIdx, litLen);
        E.nlit += litLen;
        E.midx[E.nmidx++] = (u8)((u32)match >> 16);
        srcIdx += mLen + min_match;
        firstLitIdx = srcIdx;
        srcInc = 0;
    }
    const i64 litLen = chunk_end - firstLitIdx;
    if (E.ntk != 0) {
        const i32 token = (litLen >= 31) ? 0xF8 : (i32)(litLen << 3);
        E.tk[E.ntk++] = (u8)token;
    }
    if (litLen >= 31) E.emit_length((i32)(litLen - 31));
    std::memcpy(E.lit + E.nlit, src + firstLitIdx, litLen);
    E.nlit += litLen;
    out_lens[0] = E.nlit;
    out_lens[1] = E.ntk;
    out_lens[2] = E.nlen;
    out_lens[3] = E.nmidx;
    return 0;
}

// Reconstruct one chunk into dst[chunk_start..chunk_end).  Returns 0 on
// success, negative on malformed streams.
EXPORT i32 kz_rolz1_inverse_chunk(u8* dst, i64 chunk_start, i64 chunk_end,
                                  i64 dst_end, i32 min_match, i32 delta,
                                  i32 log_pos_checks, i32* counters, i32* matches,
                                  const u8* lit, i64 lit_len, const u8* tk,
                                  i64 tk_len, const u8* lenb, i64 len_len,
                                  const u8* midx, i64 midx_len, i32 first_lits) {
    const i32 mask_checks = (1 << log_pos_checks) - 1;
    std::memset(matches, 0, sizeof(i32) * ((size_t)65536 << log_pos_checks));
    i64 nlit = 0, ntk = 0, nlen = 0, nmidx = 0;
    const bool k1 = (min_match == 3);
    i64 dstIdx = chunk_start;

    auto read_length = [&]() -> i32 {
        i32 next = (int8_t)lenb[nlen++];
        i32 length = next & 0x7F;
        if (next & 0x80) {
            next = (int8_t)lenb[nlen++];
            length = (length << 7) | (next & 0x7F);
            if (next & 0x80) {
                next = (int8_t)lenb[nlen++];
                length = (length << 7) | (next & 0x7F);
                if (next & 0x80) {
                    next = (int8_t)lenb[nlen++];
                    length = (length << 7) | (next & 0x7F);
                }
            }
        }
        return length;
    };

    // pre-v3 bitstreams hardcode 2 initial literals (ROLZCodec.java:853)
    const i64 n = (first_lits == 2) ? 2 : std::min(dst_end - dstIdx, (i64)first_lits);
    for (i64 j = 0; j < n; j++) dst[dstIdx++] = lit[nlit++];

    while (dstIdx < chunk_end) {
        if (ntk >= tk_len) return -1;
        const i32 token = tk[ntk++];
        i32 matchLen = token & 0x07;
        if (matchLen == 7) {
            if (nlen >= len_len) return -2;
            matchLen = read_length() + 7;
        }
        i64 litLen;
        if (token < 0xF8) litLen = token >> 3;
        else {
            if (nlen >= len_len) return -3;
            litLen = read_length() + 31;
        }
        if (litLen > 0) {
            if (nlit + litLen > lit_len || dstIdx + litLen > dst_end) return -4;
            i32 srcInc = 0;
            const i64 n0 = dstIdx - chunk_start;
            std::memcpy(dst + dstIdx, lit + nlit, litLen);
            for (i64 j = 0; j < litLen; j++) {
                const i32 key = k1 ? key1(dst, dstIdx + j - delta)
                                   : key2(dst, dstIdx + j - delta);
                counters[key] = (counters[key] + 1) & mask_checks;
                matches[(key << log_pos_checks) + counters[key]] = (i32)(n0 + j);
                j += (srcInc >> 6);
                srcInc++;
            }
            nlit += litLen;
            dstIdx += litLen;
            if (dstIdx >= chunk_end) {
                if (dstIdx == chunk_end) break;
                return -5;
            }
        }
        if (dstIdx + matchLen + min_match > dst_end) return -6;
        const i32 key = k1 ? key1(dst, dstIdx - delta) : key2(dst, dstIdx - delta);
        const i32 base = key << log_pos_checks;
        if (nmidx >= midx_len) return -7;
        const i32 matchIdx = midx[nmidx++];
        i64 ref = chunk_start + matches[base + ((counters[key] - matchIdx) & mask_checks)];
        const i64 savedIdx = dstIdx;
        i32 ml = matchLen + min_match;
        while (ml-- > 0) dst[dstIdx++] = dst[ref++];
        counters[key] = (counters[key] + 1) & mask_checks;
        matches[base + counters[key]] = (i32)(savedIdx - chunk_start);
    }
    if (ntk != tk_len || nmidx != midx_len || nlit != lit_len || nlen != len_len)
        return -8;
    return 0;
}

// ---------------- ROLZX (ROLZCodec2): adaptive binary range coder ----------
// Re-derived from K/transform/ROLZCodec.java:1016-1772.  Whole-block codec:
// [u32be count][flags][coder payload].  56-bit low/high, 16-bit adaptive
// probabilities with bit-tree contexts, 9-bit literal/match tokens.

namespace rolzx {

static const i64 TOPR = 0x00FFFFFFFFFFFFFFLL;
static const i64 MASK_0_32 = 0x00000000FFFFFFFFLL;
static const i64 MASK_0_56 = 0x00FFFFFFFFFFFFFFLL;
static const i32 LIT_CTX = 0, MATCH_CTX = 1;
static const i32 LIT_FLAG = 1, MATCH_FLAG = 0;
static const i32 LOG_POS_CHECKS2 = 5;
static const i32 MAX_MATCH2 = 3 + 255;

struct Coder {
    u8* buf;
    i64 idx, cap;
    i64 low, high, current;
    std::vector<i32> probs[2];
    i32 logSizes[2];
    i32 c1, ctx, pIdx;
    bool overflow;

    void init(i32 litLog, i32 mLog, u8* b, i64 c) {
        buf = b; cap = c; idx = 0;
        low = 0; high = TOPR; current = 0;
        probs[MATCH_CTX].assign((size_t)256 << mLog, 0xFFFF >> 1);
        probs[LIT_CTX].assign((size_t)256 << litLog, 0xFFFF >> 1);
        logSizes[MATCH_CTX] = mLog;
        logSizes[LIT_CTX] = litLog;
        c1 = 1; ctx = 0; pIdx = LIT_FLAG;
        overflow = false;
    }
    void set_ctx(i32 n, u8 c) { pIdx = n; ctx = (i32)c << logSizes[n]; }

    void enc_bit(i32 bit) {
        i32& p = probs[pIdx][ctx + c1];
        // Java uses >>> (unsigned) here: high-low may be "negative" as a
        // signed 64-bit value in the unmasked-carry state.
        const i64 split = (i64)((((u64)(high - low) >> 4) * (u64)(u32)(p >> 4)) >> 8);
        if (bit == 0) {
            low += split + 1;
            p -= (p >> 5);
            c1 += c1;
        } else {
            high = low + split;
            p -= (((p - 0xFFFF) >> 5) + 1);
            c1 += c1 + 1;
        }
        while ((((u64)(low ^ high)) >> 24) == 0) {
            if (idx + 4 > cap) { overflow = true; return; }
            const u32 v = (u32)((u64)high >> 32);
            buf[idx] = (u8)(v >> 24); buf[idx + 1] = (u8)(v >> 16);
            buf[idx + 2] = (u8)(v >> 8); buf[idx + 3] = (u8)v;
            idx += 4;
            low <<= 32;
            high = (high << 32) | MASK_0_32;
        }
    }
    void enc9(i32 val) {
        c1 = 1;
        for (i32 k = 8; k >= 0; k--) enc_bit(val & (1 << k));
    }
    void enc_bits(i32 val, i32 n) {
        c1 = 1;
        do { n--; enc_bit(val & (1 << n)); } while (n != 0);
    }
    void enc_dispose() {
        if (idx + 8 > cap) { overflow = true; return; }
        for (i32 i = 0; i < 8; i++) {
            buf[idx + i] = (u8)((u64)low >> 56);
            low <<= 8;
        }
        idx += 8;
    }

    void dec_init() {
        current = 0;
        for (i32 i = 0; i < 8; i++) current = (current << 8) | buf[idx + i];
        idx += 8;
    }
    i32 dec_bit() {
        i32& p = probs[pIdx][ctx + c1];
        const i64 mid = low + (i64)((((u64)(high - low) >> 4) * (u64)(u32)(p >> 4)) >> 8);
        i32 bit;
        if (mid >= current) {
            bit = 1;
            high = mid;
            p -= (((p - 0xFFFF) >> 5) + 1);
            c1 += c1 + 1;
        } else {
            bit = 0;
            low = mid + 1;
            p -= (p >> 5);
            c1 += c1;
        }
        while ((((u64)(low ^ high)) >> 24) == 0) {
            low = (low << 32) & MASK_0_56;
            high = ((high << 32) | MASK_0_32) & MASK_0_56;
            i64 v = 0;
            if (idx + 4 <= cap) {
                v = ((i64)buf[idx] << 24) | ((i64)buf[idx + 1] << 16) |
                    ((i64)buf[idx + 2] << 8) | (i64)buf[idx + 3];
            }
            current = ((current << 32) | v) & MASK_0_56;
            idx += 4;
        }
        return bit;
    }
    i32 dec9() {
        c1 = 1;
        for (i32 k = 0; k < 9; k++) dec_bit();
        return c1 & 0x1FF;
    }
    i32 dec_bits(i32 n) {
        c1 = 1;
        const i32 mask = (1 << n) - 1;
        do { dec_bit(); n--; } while (n != 0);
        return c1 & mask;
    }
};

static i32 find_match2(const u8* buf, i64 chunk_start, i64 chunk_end, i64 pos,
                       i32 key, i32* counters, i32* matches, i32 min_match) {
    const i32 base = key << LOG_POS_CHECKS2;
    const i32 h32 = hash32f(buf, pos);
    const i32 counter = counters[key];
    const i32 pos_checks = 1 << LOG_POS_CHECKS2;
    const i32 mask_checks = pos_checks - 1;
    i32 bestLen = 0, bestIdx = -1;
    const i32 maxMatch = (i32)std::min((i64)MAX_MATCH2, chunk_end - pos) - 8;
    for (i32 i = counter; i > counter - pos_checks; i--) {
        i32 ref = matches[base + (i & mask_checks)];
        if ((ref & HASH_MASK) != h32) continue;
        i64 r = (i64)(ref & ~HASH_MASK) + chunk_start;
        if (buf[r + bestLen] != buf[pos + bestLen]) continue;
        i32 n = 0;
        while (n < maxMatch) {
            const u64 diff = rdle64(buf + r + n) ^ rdle64(buf + pos + n);
            if (diff != 0) { n += (i32)(__builtin_ctzll(diff) >> 3); break; }
            n += 8;
        }
        if (n > bestLen) {
            bestIdx = counter - i;
            bestLen = n;
            if (bestLen == maxMatch) break;
        }
    }
    counters[key] = (counters[key] + 1) & mask_checks;
    matches[base + counters[key]] = h32 | (i32)(pos - chunk_start);
    return (bestLen < min_match) ? -1 : ((bestIdx << 16) | (bestLen - min_match));
}

}  // namespace rolzx

using namespace rolzx;

// Whole-block ROLZX encode (after the 5-byte header the caller wrote? No —
// writes the full output incl. u32be count + flags).  Returns output size
// or -1 (decline/overflow).  min_match/delta resolved by caller from dataType.
EXPORT i64 kz_rolz2_forward(const u8* src, i64 count, u8* dst, i64 cap,
                            i32 min_match, i32 delta, i32 flags) {
    if (count < 64 || cap < count) return -1;
    const i64 src_end = count - 4;
    dst[0] = (u8)((u32)count >> 24); dst[1] = (u8)(count >> 16);
    dst[2] = (u8)(count >> 8); dst[3] = (u8)count;
    dst[4] = (u8)flags;
    Coder C;
    C.init(9, LOG_POS_CHECKS2, dst + 5, cap - 5);
    std::vector<i32> counters(65536, 0);
    std::vector<i32> matches((size_t)65536 << LOG_POS_CHECKS2);
    const i64 chunk_size = std::min(count, (i64)CHUNK_SIZE);
    i64 startChunk = 0;
    i64 srcIdx = 0;
    const bool k1 = (min_match == 3);
    while (startChunk < src_end) {
        std::fill(matches.begin(), matches.end(), 0);
        const i64 endChunk = std::min(startChunk + chunk_size, src_end);
        srcIdx = startChunk;
        const i64 n = std::min(src_end - startChunk, (i64)8);
        C.set_ctx(LIT_CTX, 0);
        for (i64 j = 0; j < n; j++) {
            C.enc9((LIT_FLAG << 8) | src[srcIdx]);
            srcIdx++;
        }
        while (srcIdx < endChunk && !C.overflow) {
            C.set_ctx(LIT_CTX, src[srcIdx - 1]);
            const i32 key = k1 ? key1(src, srcIdx - delta) : key2(src, srcIdx - delta);
            const i32 match = find_match2(src, startChunk, endChunk, srcIdx, key,
                                          counters.data(), matches.data(), min_match);
            if (match < 0) {
                C.enc9((LIT_FLAG << 8) | src[srcIdx]);
                srcIdx++;
                continue;
            }
            const i32 matchLen = match & 0xFFFF;
            C.enc9((MATCH_FLAG << 8) | matchLen);
            C.set_ctx(MATCH_CTX, src[srcIdx - 1]);
            C.enc_bits((u32)match >> 16, LOG_POS_CHECKS2);
            srcIdx += matchLen + min_match;
        }
        if (C.overflow) return -1;
        startChunk = endChunk;
    }
    for (i32 i = 0; i < 4; i++, srcIdx++) {
        C.set_ctx(LIT_CTX, src[srcIdx - 1]);
        C.enc9((LIT_FLAG << 8) | src[srcIdx]);
    }
    C.enc_dispose();
    if (C.overflow) return -1;
    const i64 total = 5 + C.idx;
    return (total < count) ? total : -1;
}

// Whole-block ROLZX decode.  Returns output size or -1.
EXPORT i64 kz_rolz2_inverse(const u8* src, i64 count, u8* dst, i64 cap,
                            i32 min_match, i32 delta, i32 first_lits) {
    if (count < 13) return -1;
    const i64 szBlock = ((i64)src[0] << 24) | ((i64)src[1] << 16) |
                        ((i64)src[2] << 8) | (i64)src[3];
    if (szBlock <= 0 || szBlock > cap) return -1;
    Coder C;
    C.init(9, LOG_POS_CHECKS2, const_cast<u8*>(src) + 5, count - 5);
    C.dec_init();
    std::vector<i32> counters(65536, 0);
    std::vector<i32> matches((size_t)65536 << LOG_POS_CHECKS2);
    const i32 mask_checks = (1 << LOG_POS_CHECKS2) - 1;
    const i64 chunk_size = std::min(szBlock, (i64)CHUNK_SIZE);
    const i64 dst_end = szBlock;
    i64 startChunk = 0;
    const bool k1 = (min_match == 3);
    i64 out_index = 0;
    while (startChunk < dst_end) {
        std::fill(matches.begin(), matches.end(), 0);
        const i64 endChunk = std::min(startChunk + chunk_size, dst_end);
        i64 dstIdx = out_index;
        const i64 n = (first_lits == 2) ? 2
                      : std::min(dst_end - startChunk, (i64)first_lits);
        C.set_ctx(LIT_CTX, 0);
        for (i64 j = 0; j < n; j++) {
            const i32 val1 = C.dec9();
            if ((val1 >> 8) == MATCH_FLAG) return -1;
            dst[dstIdx++] = (u8)val1;
        }
        while (dstIdx < endChunk) {
            const i64 savedIdx = dstIdx;
            const i32 key = k1 ? key1(dst, dstIdx - delta) : key2(dst, dstIdx - delta);
            const i32 base = key << LOG_POS_CHECKS2;
            C.set_ctx(LIT_CTX, dst[dstIdx - 1]);
            const i32 val = C.dec9();
            if ((val >> 8) == LIT_FLAG) {
                dst[dstIdx++] = (u8)val;
            } else {
                const i32 matchLen = val & 0xFF;
                if (dstIdx + matchLen + 3 > dst_end) return -1;
                C.set_ctx(MATCH_CTX, dst[dstIdx - 1]);
                const i32 matchIdx = C.dec_bits(LOG_POS_CHECKS2);
                i64 ref = out_index +
                    matches[base + ((counters[key] - matchIdx) & mask_checks)];
                i32 ml = matchLen + min_match;
                while (ml-- > 0) dst[dstIdx++] = dst[ref++];
            }
            counters[key] = (counters[key] + 1) & mask_checks;
            matches[base + counters[key]] = (i32)(savedIdx - out_index);
        }
        startChunk = endChunk;
        out_index = dstIdx;
    }
    // consumed must match exactly: 5-byte header + coder bytes (incl. the
    // 8-byte dispose tail mirrored by the initial 8-byte window)
    return (5 + C.idx == count) ? out_index : -1;
}
