// Native LZ77 kernels: LZX/LZ (hash-match, token streams) and LZP
// (context-predicted match flags).  Wire format re-derived from
// K/transform/LZCodec.java:125-1288 (v6/v7 stream layout):
//   LZX: [u32le litSectionLen][u32le tokenLen][u32le distLen][mode byte]
//        [litLens+literals][tokens LLLFFMMM][distances][matchLens]
//   LZP: 4 raw bytes, then literals with 0xFC,0xFF escape and
//        0xFC + 0xFE*... + len matches (order-4 context hash, min match 64)
// Callers pass buffers padded by >=16 bytes on both sides.

#include <cstdint>
#include <cstring>
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

static inline u64 read64(const u8* p) { u64 v; std::memcpy(&v, p, 8); return v; }
static inline u32 read32(const u8* p) { u32 v; std::memcpy(&v, p, 4); return v; }
static inline void write32(u8* p, u32 v) { std::memcpy(p, &v, 4); }

static inline bool same4(const u8* a, const u8* b) { return read32(a) == read32(b); }

static inline i32 match_fwd(const u8* src, i64 srcIdx, i64 ref, i32 maxMatch) {
    i32 bestLen = 0;
    while (bestLen + 8 <= maxMatch) {
        const u64 diff = read64(src + srcIdx + bestLen) ^ read64(src + ref + bestLen);
        if (diff != 0) {
            bestLen += (i32)(__builtin_ctzll(diff) >> 3);
            break;
        }
        bestLen += 8;
    }
    return bestLen;
}

// ------------------------- LZX -------------------------

static const i32 LZX_HASH_SEED = 0x1E35A7BD;
static const i32 MAX_DISTANCE1 = (1 << 16) - 2;
static const i32 MAX_DISTANCE2 = (1 << 24) - 2;
static const i32 MIN_MATCH4 = 4;
static const i32 MIN_MATCH6 = 6;
static const i32 LZX_MAX_MATCH = 65535 + 254 + MIN_MATCH4;
static const i32 MIN_BLOCK_LENGTH = 24;

static inline i32 lzx_hash(const u8* block, i64 idx, bool extra) {
    if (extra)
        return (i32)(((read64(block + idx) << 24) * (u64)LZX_HASH_SEED) >> (64 - 19));
    return (i32)(((read64(block + idx) << 24) * (u64)LZX_HASH_SEED) >> (64 - 16));
}

static inline i64 emit_len(u8* block, i64 idx, i32 length) {
    if (length < 254) {
        block[idx] = (u8)length;
        return idx + 1;
    }
    if (length < 65536 + 254) {
        length -= 254;
        block[idx] = 254;
        block[idx + 1] = (u8)(length >> 8);
        block[idx + 2] = (u8)length;
        return idx + 3;
    }
    length -= 255;
    block[idx] = 255;
    block[idx + 1] = (u8)(length >> 16);
    block[idx + 2] = (u8)(length >> 8);
    block[idx + 3] = (u8)length;
    return idx + 4;
}

static inline i32 read_len(const u8* src, i64& idx) {
    i32 res = src[idx++];
    if (res < 254) return res;
    if (res == 254) {
        res += (src[idx] << 8);
        res += src[idx + 1];
        idx += 2;
        return res;
    }
    res += (src[idx] << 16);
    res += (src[idx + 1] << 8);
    res += src[idx + 2];
    idx += 3;
    return res;
}

// dst must have capacity >= maxEncodedLen(count) + 32 padding.
// min_match_in: 0 = auto(4), 6 for DNA. Returns encoded size or -1 (skip).
EXPORT i64 kz_lzx_forward(const u8* src, i64 count, u8* dst, i32 extra_i, i32 min_match_in) {
    const bool extra = extra_i != 0;
    if (count < MIN_BLOCK_LENGTH) return -1;
    const i32 hlog = extra ? 19 : 16;
    std::vector<i32> hashes((size_t)1 << hlog, 0);
    const i64 minBuf = count / 5 > 256 ? count / 5 : 256;
    std::vector<u8> mBuf(minBuf + 16), mLenBuf(minBuf + 16), tkBuf(minBuf + 16);

    const i64 srcEnd = count - 16 - 2;
    const i32 maxDist = (srcEnd < 4 * (i64)MAX_DISTANCE1) ? MAX_DISTANCE1 : MAX_DISTANCE2;
    dst[12] = (maxDist == MAX_DISTANCE1) ? 0 : 1;
    const i32 minMatch = (min_match_in > 0) ? min_match_in : MIN_MATCH4;
    dst[12] |= (u8)(((minMatch - 2) & 0x07) << 1);

    i64 srcIdx = 0, anchor = 0, dstIdx = 13;
    i64 mIdx = 0, mLenIdx = 0, tkIdx = 0;
    i32 repd[2] = {(i32)count, (i32)count};
    i32 repIdx = 0;
    i32 srcInc = 0;

    while (srcIdx < srcEnd) {
        i32 bestLen = 0;
        const i32 h0 = lzx_hash(src, srcIdx, extra);
        const i64 ref0 = hashes[h0];
        hashes[h0] = (i32)srcIdx;
        const i64 srcIdx1 = srcIdx + 1;
        i64 ref = srcIdx1 - repd[repIdx];
        const i64 minRef = (srcIdx - maxDist > 0) ? srcIdx - maxDist : 0;

        if ((ref > minRef) && same4(src + ref, src + srcIdx1)) {
            const i32 mm = (i32)((srcEnd - srcIdx1 < LZX_MAX_MATCH) ? srcEnd - srcIdx1 : LZX_MAX_MATCH);
            bestLen = match_fwd(src, srcIdx1, ref, mm);
        } else {
            ref = srcIdx1 - repd[repIdx ^ 1];
            if ((ref > minRef) && same4(src + ref, src + srcIdx1)) {
                const i32 mm = (i32)((srcEnd - srcIdx1 < LZX_MAX_MATCH) ? srcEnd - srcIdx1 : LZX_MAX_MATCH);
                bestLen = match_fwd(src, srcIdx1, ref, mm);
            }
        }

        if (bestLen < minMatch) {
            ref = ref0;
            if ((ref > minRef) && same4(src + ref, src + srcIdx)) {
                const i32 mm = (i32)((srcEnd - srcIdx < LZX_MAX_MATCH) ? srcEnd - srcIdx : LZX_MAX_MATCH);
                bestLen = match_fwd(src, srcIdx, ref, mm);
            }
            if (bestLen < minMatch) {
                srcIdx = srcIdx1 + (srcInc >> 6);
                srcInc++;
                repIdx = 0;
                continue;
            }
            if ((ref != srcIdx - repd[0]) && (ref != srcIdx - repd[1])) {
                const i32 h1 = lzx_hash(src, srcIdx1, extra);
                const i64 ref1 = hashes[h1];
                hashes[h1] = (i32)srcIdx1;
                if ((ref1 > minRef + 1) &&
                    same4(src + ref1 + bestLen - 3, src + srcIdx1 + bestLen - 3)) {
                    const i32 mm = (i32)((srcEnd - srcIdx1 < LZX_MAX_MATCH) ? srcEnd - srcIdx1 : LZX_MAX_MATCH);
                    const i32 bestLen1 = match_fwd(src, srcIdx1, ref1, mm);
                    if (bestLen1 >= bestLen) { ref = ref1; bestLen = bestLen1; srcIdx = srcIdx1; }
                }
                if (extra) {
                    const i64 srcIdx2 = srcIdx1 + 1;
                    const i32 h2 = lzx_hash(src, srcIdx2, extra);
                    const i64 ref2 = hashes[h2];
                    hashes[h2] = (i32)srcIdx2;
                    if ((ref2 > minRef + 2) &&
                        same4(src + ref2 + bestLen - 3, src + srcIdx2 + bestLen - 3)) {
                        const i32 mm = (i32)((srcEnd - srcIdx2 < LZX_MAX_MATCH) ? srcEnd - srcIdx2 : LZX_MAX_MATCH);
                        const i32 bestLen2 = match_fwd(src, srcIdx2, ref2, mm);
                        if (bestLen2 >= bestLen) { ref = ref2; bestLen = bestLen2; srcIdx = srcIdx2; }
                    }
                }
            }
            while ((srcIdx > anchor) && (ref > minRef) && (src[srcIdx - 1] == src[ref - 1])) {
                bestLen++; ref--; srcIdx--;
            }
            if (bestLen > LZX_MAX_MATCH) {
                ref += (bestLen - LZX_MAX_MATCH);
                srcIdx += (bestLen - LZX_MAX_MATCH);
                bestLen = LZX_MAX_MATCH;
            }
        } else {
            if ((bestLen >= LZX_MAX_MATCH) || (src[srcIdx] != src[ref - 1])) {
                srcIdx++;
                const i32 h1 = lzx_hash(src, srcIdx, extra);
                hashes[h1] = (i32)srcIdx;
            } else {
                bestLen++; ref--;
            }
        }

        srcInc = 0;
        const i32 dist = (i32)(srcIdx - ref);
        i32 token, mLenTh;
        if (dist == repd[0]) { token = 0x00; mLenTh = 3; }
        else if (dist == repd[1]) { token = 0x04; mLenTh = 3; }
        else {
            mBuf[mIdx] = (u8)(dist >> 16);
            const i32 inc1 = dist >= 65536 ? 1 : 0;
            mIdx += inc1;
            mBuf[mIdx] = (u8)(dist >> 8);
            const i32 inc2 = dist >= 256 ? 1 : 0;
            mIdx += inc2;
            mBuf[mIdx++] = (u8)dist;
            token = (inc1 + inc2 + 1) << 3;
            mLenTh = 7;
        }
        const i32 mLen = bestLen - minMatch;
        if (mLen >= mLenTh) {
            token += mLenTh;
            mLenIdx = emit_len(mLenBuf.data(), mLenIdx, mLen - mLenTh);
        } else {
            token += mLen;
        }
        repd[1] = repd[0];
        repd[0] = dist;
        repIdx = 1;
        const i64 litLen = srcIdx - anchor;
        if (litLen == 0) {
            tkBuf[tkIdx++] = (u8)token;
        } else {
            if (litLen >= 7) {
                if (litLen >= (1 << 24)) return -1;
                tkBuf[tkIdx++] = (u8)((7 << 5) | token);
                dstIdx = emit_len(dst, dstIdx, (i32)(litLen - 7));
            } else {
                tkBuf[tkIdx++] = (u8)((litLen << 5) | token);
            }
            for (i64 i = 0; i < litLen; i += 8)
                std::memcpy(dst + dstIdx + i, src + anchor + i, 8);
            dstIdx += litLen;
        }
        if (mIdx >= (i64)mBuf.size() - 24) mBuf.resize(mBuf.size() * 3 / 2);
        if (mLenIdx >= (i64)mLenBuf.size() - 8) mLenBuf.resize(mLenBuf.size() * 3 / 2);
        if (tkIdx >= (i64)tkBuf.size() - 8) tkBuf.resize(tkBuf.size() * 3 / 2);

        anchor = srcIdx + bestLen;
        while (srcIdx + 4 < anchor) {
            srcIdx += 4;
            hashes[lzx_hash(src, srcIdx - 3, extra)] = (i32)(srcIdx - 3);
            hashes[lzx_hash(src, srcIdx - 2, extra)] = (i32)(srcIdx - 2);
            hashes[lzx_hash(src, srcIdx - 1, extra)] = (i32)(srcIdx - 1);
            hashes[lzx_hash(src, srcIdx, extra)] = (i32)srcIdx;
        }
        while (++srcIdx < anchor)
            hashes[lzx_hash(src, srcIdx, extra)] = (i32)srcIdx;
    }

    const i64 litLen = count - anchor;
    if (dstIdx + litLen + tkIdx + mIdx + mLenIdx >= count) return -1;
    if (litLen >= 7) {
        tkBuf[tkIdx++] = (u8)(7 << 5);
        dstIdx = emit_len(dst, dstIdx, (i32)(litLen - 7));
    } else {
        tkBuf[tkIdx++] = (u8)(litLen << 5);
    }
    std::memcpy(dst + dstIdx, src + anchor, litLen);
    dstIdx += litLen;
    write32(dst + 0, (u32)dstIdx);
    write32(dst + 4, (u32)tkIdx);
    write32(dst + 8, (u32)mIdx);
    std::memcpy(dst + dstIdx, tkBuf.data(), tkIdx);
    dstIdx += tkIdx;
    std::memcpy(dst + dstIdx, mBuf.data(), mIdx);
    dstIdx += mIdx;
    std::memcpy(dst + dstIdx, mLenBuf.data(), mLenIdx);
    dstIdx += mLenIdx;
    return (dstIdx <= count - (count / 100)) ? dstIdx : -1;
}

// dst capacity must be dstCap (+16 padding beyond). Returns output size or -1.
EXPORT i64 kz_lzx_inverse(const u8* src, i64 count, u8* dst, i64 dstCap) {
    if (count < 13) return -1;
    const i32 tkLen = (i32)read32(src);
    const i32 mIdxLen = (i32)read32(src + 4);
    const i32 mLenLen = (i32)read32(src + 8);
    if ((tkLen < 13) || (tkLen > count) || (mIdxLen < 0) || (mLenLen < 0) ||
        (mIdxLen > count - tkLen) || (mLenLen > count - tkLen - mIdxLen))
        return -1;
    i64 tkIdx = tkLen;
    i64 mIdx = tkIdx + mIdxLen;
    i64 mLenIdx = mIdx + mLenLen;
    const i64 srcEnd = tkLen - 13;
    const i64 litEnd = tkLen;
    const i32 maxDist = ((src[12] & 1) == 0) ? MAX_DISTANCE1 : MAX_DISTANCE2;
    const i32 minMatch = ((src[12] >> 1) & 0x07) + 2;
    i64 srcIdx = 13;
    i64 dstIdx = 0;
    i32 repd0 = (i32)count;
    i32 repd1 = (i32)count;

    while (true) {
        if (tkIdx >= mIdx) return -1;
        const i32 token = src[tkIdx++];
        if (token >= 32) {
            i32 litLen;
            if (token >= 0xE0) litLen = 7 + read_len(src, srcIdx);
            else litLen = token >> 5;
            if ((litLen > dstCap - dstIdx) || (litLen > litEnd - srcIdx)) return -1;
            if (srcIdx + litLen >= srcEnd) {
                std::memcpy(dst + dstIdx, src + srcIdx, litLen);
            } else {
                for (i32 i = 0; i < litLen; i += 8)
                    std::memcpy(dst + dstIdx + i, src + srcIdx + i, 8);
            }
            srcIdx += litLen;
            dstIdx += litLen;
            if (srcIdx >= srcEnd) break;
        }
        // corrupt streams must not walk the section cursors out of the
        // buffer: indexes are bounded here, and each bounded read spills
        // at most 4 bytes into the caller's 16-byte pad
        if (mLenIdx > count || mIdx > count) return -1;
        i32 mLen, dist;
        const i32 f = token & 0x18;
        if (f == 0) {
            mLen = token & 0x03;
            mLen += (mLen == 3) ? minMatch + read_len(src, mLenIdx) : minMatch;
            dist = ((token & 0x04) == 0) ? repd0 : repd1;
        } else {
            mLen = token & 0x07;
            mLen += (mLen == 7) ? minMatch + read_len(src, mLenIdx) : minMatch;
            dist = src[mIdx++];
            if (f == 0x18) {
                dist = (dist << 8) | src[mIdx++];
                dist = (dist << 8) | src[mIdx++];
            } else if (f == 0x10) {
                dist = (dist << 8) | src[mIdx++];
            }
        }
        repd1 = repd0;
        repd0 = dist;
        const i64 mEnd = dstIdx + mLen;
        i64 ref = dstIdx - dist;
        if ((ref < 0) || (dist > maxDist) || (mEnd > dstCap)) return -1;
        if (dist >= 16) {
            do {
                std::memcpy(dst + dstIdx, dst + ref, 16);
                ref += 16;
                dstIdx += 16;
            } while (dstIdx < mEnd);
        } else {
            for (i32 i = 0; i < mLen; i++)
                dst[dstIdx + i] = dst[ref + i];
        }
        dstIdx = mEnd;
    }
    return (srcIdx == srcEnd + 13) ? dstIdx : -1;
}

// ------------------------- LZP -------------------------

static const u32 LZP_HASH_SEED = 0x7FEB352D;
static const i32 LZP_HASH_LOG = 16;
static const i32 LZP_HASH_SHIFT = 32 - LZP_HASH_LOG;
static const i32 LZP_MIN_MATCH = 64;
static const i32 LZP_MIN_BLOCK_LENGTH = 128;
static const i32 LZP_MATCH_FLAG = 0xFC;

EXPORT i64 kz_lzp_forward(const u8* src, i64 count, u8* dst, i64 dstCap) {
    if (count < LZP_MIN_BLOCK_LENGTH) return -1;
    std::vector<i32> hashes((size_t)1 << LZP_HASH_LOG, 0);
    const i64 srcEnd = count;
    const i64 dstEnd = count - (count >> 6);
    i64 srcIdx = 0, dstIdx = 0;
    std::memcpy(dst, src, 4);
    u32 ctx = read32(src);
    srcIdx += 4;
    dstIdx += 4;
    const i32 minMatch = LZP_MIN_MATCH;

    while ((srcIdx < srcEnd - minMatch) && (dstIdx < dstEnd)) {
        const u32 h = (LZP_HASH_SEED * ctx) >> LZP_HASH_SHIFT;
        const i64 ref = hashes[h];
        hashes[h] = (i32)srcIdx;
        i32 bestLen = 0;
        if ((ref != 0) && same4(src + ref + minMatch - 4, src + srcIdx + minMatch - 4)) {
            bestLen = match_fwd(src, srcIdx, ref, (i32)(srcEnd - srcIdx));
        }
        if (bestLen < minMatch) {
            const u32 val = src[srcIdx];
            ctx = (ctx << 8) | val;
            dst[dstIdx++] = src[srcIdx++];
            if ((ref != 0) && (val == LZP_MATCH_FLAG)) {
                if (dstIdx >= dstEnd) return -1;
                dst[dstIdx++] = 0xFF;
            }
            continue;
        }
        srcIdx += bestLen;
        ctx = read32(src + srcIdx - 4);
        dst[dstIdx++] = (u8)LZP_MATCH_FLAG;
        bestLen -= minMatch;
        while (bestLen >= 254) {
            bestLen -= 254;
            dst[dstIdx++] = 0xFE;
            if (dstIdx >= dstEnd) break;
        }
        if (dstIdx >= dstEnd) return -1;
        dst[dstIdx++] = (u8)bestLen;
    }

    while ((srcIdx < srcEnd) && (dstIdx < dstEnd)) {
        const u32 h = (LZP_HASH_SEED * ctx) >> LZP_HASH_SHIFT;
        const i64 ref = hashes[h];
        hashes[h] = (i32)srcIdx;
        const u32 val = src[srcIdx];
        ctx = (ctx << 8) | val;
        dst[dstIdx++] = src[srcIdx++];
        if ((ref != 0) && (val == LZP_MATCH_FLAG)) {
            if (dstIdx >= dstEnd) return -1;
            dst[dstIdx++] = 0xFF;
        }
    }
    return ((srcIdx == count) && (dstIdx < dstEnd)) ? dstIdx : -1;
}

EXPORT i64 kz_lzp_inverse(const u8* src, i64 count, u8* dst, i64 dstCap) {
    if (count < 4) return -1;
    std::vector<i32> hashes((size_t)1 << LZP_HASH_LOG, 0);
    const i64 srcEnd = count;
    i64 srcIdx = 0, dstIdx = 0;
    std::memcpy(dst, src, 4);
    u32 ctx = read32(dst);
    srcIdx += 4;
    dstIdx += 4;
    const i32 minMatch = LZP_MIN_MATCH;

    while (srcIdx < srcEnd) {
        const u32 h = (LZP_HASH_SEED * ctx) >> LZP_HASH_SHIFT;
        const i64 ref = hashes[h];
        hashes[h] = (i32)dstIdx;
        if ((ref == 0) || (src[srcIdx] != LZP_MATCH_FLAG)) {
            if (dstIdx >= dstCap) return -1;
            dst[dstIdx] = src[srcIdx];
            ctx = (ctx << 8) | dst[dstIdx];
            srcIdx++;
            dstIdx++;
            continue;
        }
        srcIdx++;
        if (srcIdx >= srcEnd) return -1;
        if (src[srcIdx] == 0xFF) {
            if (dstIdx >= dstCap) return -1;
            dst[dstIdx] = (u8)LZP_MATCH_FLAG;
            ctx = (ctx << 8) | LZP_MATCH_FLAG;
            srcIdx++;
            dstIdx++;
            continue;
        }
        i32 mLen = minMatch;
        if (src[srcIdx] == 0xFE) {
            while ((srcIdx < srcEnd) && (src[srcIdx] == 0xFE)) {
                srcIdx++;
                mLen += 254;
            }
            if (srcIdx >= srcEnd) return -1;
        }
        mLen += src[srcIdx++];
        if (dstIdx + mLen > dstCap) return -1;
        if (ref + mLen < dstIdx) {
            std::memcpy(dst + dstIdx, dst + ref, mLen);
        } else {
            for (i32 i = 0; i < mLen; i++)
                dst[dstIdx + i] = dst[ref + i];
        }
        dstIdx += mLen;
        ctx = read32(dst + dstIdx - 4);
    }
    return (srcIdx == srcEnd) ? dstIdx : -1;
}

// Emit a full LZX v7 section stream from a device-produced token list
// (ops/lz_sort): fuses adjacent same-distance tokens, extends device-capped
// matches byte-exactly into the literal gap before the next token, splits
// at 65535, and lays out the sections exactly like kz_lzx_forward.
// pos/len/dist are ascending non-overlapping tokens.  Returns the stream
// size or -1 when the block would not gain.
EXPORT i64 kz_lzx_emit_tokens(const u8* src, i64 count, const i32* pos,
                              const i32* len, const i32* dist, i64 k,
                              i32 min_match, i32 max_dist, u8* dst) {
    const i64 srcEnd = count - 16 - 2;
    const i32 minMatch = (min_match > 0) ? min_match : MIN_MATCH4;
    // mode byte bit 0 selects the distance width (LZCodec.java:584-593):
    // 0 = up to 2 distance bytes (64 KiB window), 1 = up to 3 (16 MiB)
    dst[12] = (max_dist > 0xFFFE) ? 1 : 0;
    dst[12] |= (u8)(((minMatch - 2) & 0x07) << 1);
    // splitting can add up to count/65535 segments beyond the fused tokens
    const i64 maxSeg = k + count / 65535 + 32;
    std::vector<u8> tkBuf(maxSeg), mBuf(3 * maxSeg), mLenBuf(4 * maxSeg);
    i64 dstIdx = 13, tkIdx = 0, mIdx = 0, mLenIdx = 0;
    i64 anchor = 0;
    i32 repd[2] = {(i32)count, (i32)count};
    i64 t = 0;
    while (t < k) {
        i64 p = pos[t];
        i64 l = len[t];
        const i32 d = dist[t];
        t++;
        // fuse exactly-adjacent same-distance successors (identical decode)
        while (t < k && pos[t] == p + l && dist[t] == d) {
            l += len[t];
            t++;
        }
        // byte-exact extension into the literal gap before the next token
        const i64 limit = (t < k && (i64)pos[t] < srcEnd) ? pos[t] : srcEnd;
        while (p + l < limit && src[p + l] == src[p + l - d]) l++;
        // emit (splitting long fused matches at 65535)
        while (l > 0) {
            const i64 seg = l < 65535 ? l : 65535;
            i32 token, mLenTh;
            if (d == repd[0]) { token = 0x00; mLenTh = 3; }
            else if (d == repd[1]) { token = 0x04; mLenTh = 3; }
            else {
                const i32 nb = 1 + (d >= 256 ? 1 : 0) + (d >= 65536 ? 1 : 0);
                if (nb == 3) mBuf[mIdx++] = (u8)(d >> 16);
                if (nb >= 2) mBuf[mIdx++] = (u8)(d >> 8);
                mBuf[mIdx++] = (u8)d;
                token = nb << 3;
                mLenTh = 7;
            }
            const i32 mLen = (i32)seg - minMatch;
            if (mLen >= mLenTh) {
                token += mLenTh;
                mLenIdx = emit_len(mLenBuf.data(), mLenIdx, mLen - mLenTh);
            } else {
                token += mLen;
            }
            repd[1] = repd[0];
            repd[0] = d;
            const i64 litLen = p - anchor;
            if (dstIdx + litLen + 16 >= count) return -1;
            if (litLen == 0) {
                tkBuf[tkIdx++] = (u8)token;
            } else if (litLen >= 7) {
                if (litLen >= (1 << 24)) return -1;
                tkBuf[tkIdx++] = (u8)((7 << 5) | token);
                dstIdx = emit_len(dst, dstIdx, (i32)(litLen - 7));
                std::memcpy(dst + dstIdx, src + anchor, litLen);
                dstIdx += litLen;
            } else {
                tkBuf[tkIdx++] = (u8)((litLen << 5) | token);
                std::memcpy(dst + dstIdx, src + anchor, litLen);
                dstIdx += litLen;
            }
            p += seg;
            l -= seg;
            anchor = p;
        }
    }
    const i64 litLen = count - anchor;
    if (dstIdx + litLen + tkIdx + mIdx + mLenIdx + 16 >= count) return -1;
    if (litLen >= 7) {
        tkBuf[tkIdx++] = (u8)(7 << 5);
        dstIdx = emit_len(dst, dstIdx, (i32)(litLen - 7));
    } else {
        tkBuf[tkIdx++] = (u8)(litLen << 5);
    }
    std::memcpy(dst + dstIdx, src + anchor, litLen);
    dstIdx += litLen;
    write32(dst + 0, (u32)dstIdx);
    write32(dst + 4, (u32)tkIdx);
    write32(dst + 8, (u32)mIdx);
    std::memcpy(dst + dstIdx, tkBuf.data(), tkIdx);
    dstIdx += tkIdx;
    std::memcpy(dst + dstIdx, mBuf.data(), mIdx);
    dstIdx += mIdx;
    std::memcpy(dst + dstIdx, mLenBuf.data(), mLenIdx);
    dstIdx += mLenIdx;
    return (dstIdx <= count - (count / 100)) ? dstIdx : -1;
}
