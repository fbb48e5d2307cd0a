// Native implementations of the serial adaptive binary coders
// (FPAQ, CM, TPAQ/TPAQX). These are bit-serial state machines that cannot be
// vectorized without changing the wire format, so the host runtime provides
// them in C++; the Python classes in kanzi_tpu/entropy+models are the
// executable spec and produce identical byte streams.
//
// Semantics re-derived from:
//   K/entropy/BinaryEntropyEncoder.java:41-256, BinaryEntropyDecoder.java
//   K/entropy/FPAQEncoder.java:45-239, FPAQDecoder.java
//   K/entropy/CMPredictor.java:36-187
//   K/entropy/TPAQPredictor.java:39-557, LogisticAdaptiveProbMap.java:34-92
// All arithmetic mirrors Java int (wrapping int32) exactly.

#include <cstdint>
#include <cstring>
#include <cstdlib>
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

static const u64 TOPR = 0x00FFFFFFFFFFFFFFULL;
static const u64 MASK_24_56 = 0x00FFFFFFFF000000ULL;
static const u64 MASK_0_24 = 0x0000000000FFFFFFULL;
static const u64 MASK_0_32 = 0x00000000FFFFFFFFULL;
static const u64 MASK_0_56 = 0x00FFFFFFFFFFFFFFULL;
static const i32 PSCALE = 65536;

// ---------- squash / stretch tables (K/Global.java:149-198) ----------

static const i32 INV_EXP[33] = {
    0, 8, 22, 47, 88, 160, 283, 492, 848, 1451, 2459,
    4117, 6766, 10819, 16608, 24127, 32768, 41409, 48928, 54717, 58770,
    61419, 63077, 64085, 64688, 65044, 65253, 65376, 65448, 65489, 65514,
    65528, 65536};

static i32 SQUASH_TAB[4096];
static i32 STRETCH_TAB[4096];
static bool tables_ready = false;

static void init_tables() {
    if (tables_ready) return;
    for (i32 x = -2047; x <= 2047; x++) {
        const i32 w = x & 127;
        const i32 y = (x >> 7) + 16;
        SQUASH_TAB[x + 2047] = (INV_EXP[y] * (128 - w) + INV_EXP[y + 1] * w) >> 11;
    }
    SQUASH_TAB[4095] = 4095;
    i32 pi = 0;
    for (i32 x = -2047; x <= 2047 && pi < 4096; x++) {
        i32 idx = x + 2047; if (idx < 0) idx = 0;
        const i32 i = (x >= 2048) ? 4095 : SQUASH_TAB[idx];
        while (pi <= i) STRETCH_TAB[pi++] = x;
    }
    STRETCH_TAB[4095] = 2047;
    tables_ready = true;
}

static inline i32 squash(i32 d) {
    if (d >= 2048) return 4095;
    i32 i = d + 2047;
    return SQUASH_TAB[i > 0 ? i : 0];
}

// ---------- byte sink / source ----------

struct Sink {
    u8* buf; i64 cap; i64 pos; bool overflow;
    void put(u8 b) { if (pos < cap) buf[pos++] = b; else overflow = true; }
    void put32(u32 v) { put((u8)(v >> 24)); put((u8)(v >> 16)); put((u8)(v >> 8)); put((u8)v); }
    void put56(u64 v) { for (int s = 48; s >= 0; s -= 8) put((u8)(v >> s)); }
    void varint(u32 v) { while (v >= 128) { put((u8)(0x80 | (v & 0x7F))); v >>= 7; } put((u8)v); }
};

struct Source {
    const u8* buf; i64 len; i64 pos;
    u8 get() { return pos < len ? buf[pos++] : 0; }
    u32 varint() {
        u32 value = get(); u32 res = value & 0x7F; int shift = 7;
        while (value >= 128) { value = get(); res |= ((value & 0x7F) << shift); if (shift == 28) break; shift += 7; }
        return res;
    }
    u64 get56() { u64 v = 0; for (int i = 0; i < 7; i++) v = (v << 8) | get(); return v; }
};

// ---------- predictors ----------

struct CMPred {
    i32 c1, c2, ctx, idx, runMask;
    std::vector<i32> counter1;  // [256][257]
    std::vector<i32> counter2;  // [512][17]
    CMPred() : c1(0), c2(0), ctx(1), idx(0), runMask(0),
               counter1(256 * 257), counter2(512 * 17) {
        for (int i = 0; i < 256 * 257; i++) counter1[i] = PSCALE >> 1;
        for (int i = 0; i < 512; i++) {
            for (int j = 0; j < 16; j++) counter2[i * 17 + j] = j << 12;
            counter2[i * 17 + 16] = 65535;
        }
        pc1 = counter1.data();
        pc2 = counter2.data();
    }
    i32* pc1;  // row pointers computed in get(), reused by update()
    i32* pc2;
    inline i32 get() {
        pc1 = &counter1[ctx * 257];
        const i32 p = (13 * (pc1[256] + pc1[c1]) + 6 * pc1[c2]) >> 5;
        idx = (u32)p >> 12;
        pc2 = &counter2[(ctx | runMask) * 17];
        return (p + p + 3 * (pc2[idx] + pc2[idx + 1]) + 64) >> 7;
    }
    inline void update(i32 bit) {
        // two-sided branch on purpose: the bit is biased and well-predicted;
        // a branchless (-bit & mask) form measured ~13% slower end-to-end
        // (it serializes the counter updates behind the bit's full latency).
        if (bit == 0) {
            pc1[256] -= (pc1[256] >> 2);
            pc1[c1] -= (pc1[c1] >> 4);
            pc2[idx] -= (pc2[idx] >> 6);
            pc2[idx + 1] -= (pc2[idx + 1] >> 6);
            ctx += ctx;
        } else {
            pc1[256] -= ((pc1[256] - PSCALE + 16) >> 2);
            pc1[c1] -= ((pc1[c1] - PSCALE + 16) >> 4);
            pc2[idx] -= ((pc2[idx] - PSCALE + 16) >> 6);
            pc2[idx + 1] -= ((pc2[idx + 1] - PSCALE + 16) >> 6);
            ctx += (ctx + 1);
        }
        if (ctx > 255) {
            c2 = c1; c1 = ctx & 0xFF; ctx = 1;
            runMask = (c1 == c2) ? 0x100 : 0;
        }
    }
};

// ---- TPAQ ----

static const i32 TPAQ_MAX_LENGTH = 88;
static const i32 TPAQ_HASH_SEED = 0x7FEB352D;

// state tables are passed in from Python (single source of truth in
// kanzi_tpu/models/_tpaq_tables.py) via kz_tpaq_set_tables.
static u8 TPAQ_TRANS[2][256];
static i32 TPAQ_SMAP[256];
static i32 TPAQ_MATCHPRED[88];
static bool tpaq_tables_set = false;

EXPORT void kz_tpaq_set_tables(const u8* t0, const u8* t1, const i32* smap, const i32* mpred) {
    std::memcpy(TPAQ_TRANS[0], t0, 256);
    std::memcpy(TPAQ_TRANS[1], t1, 256);
    std::memcpy(TPAQ_SMAP, smap, 256 * sizeof(i32));
    std::memcpy(TPAQ_MATCHPRED, mpred, 88 * sizeof(i32));
    tpaq_tables_set = true;
}

struct LogAPM {
    std::vector<i32> data;
    i32 index, rate;
    LogAPM(i32 n, i32 r) : data((size_t)n * 33), index(0), rate(r) {
        for (i32 j = 0; j <= 32; j++) data[j] = squash((j - 16) << 7) << 4;
        for (i32 i = 1; i < n; i++) std::memcpy(&data[(size_t)i * 33], &data[0], 33 * sizeof(i32));
    }
    inline i32 get(i32 bit, i32 pr, i32 ctx) {
        const i32 g = (-bit & 65528) + (bit << rate);
        data[index] += ((g - data[index]) >> rate);
        data[index + 1] += ((g - data[index + 1]) >> rate);
        pr = STRETCH_TAB[pr];
        index = ((pr + 2048) >> 7) + (ctx << 5) + ctx;
        const i32 w = pr & 127;
        return (data[index] * (128 - w) + data[index + 1] * w) >> 11;
    }
};

struct Mixer {
    i32 pr, skew, learnRate;
    i32 w[8], p[8];
    Mixer() : pr(2048), skew(0), learnRate(60 << 7) {
        for (int i = 0; i < 8; i++) { w[i] = 32768; p[i] = 0; }
    }
    inline void update(i32 bit) {
        const i32 err = (((bit << 12) - pr) * learnRate) >> 10;
        if (err == 0) return;
        learnRate += (((11 << 7) - learnRate) >> 31);
        skew += err;
        for (int i = 0; i < 8; i++) w[i] += ((p[i] * err) >> 12);
    }
    inline i32 get(i32 p0, i32 p1, i32 p2, i32 p3, i32 p4, i32 p5, i32 p6, i32 p7) {
        p[0]=p0; p[1]=p1; p[2]=p2; p[3]=p3; p[4]=p4; p[5]=p5; p[6]=p6; p[7]=p7;
        pr = squash((w[0]*p0 + w[1]*p1 + w[2]*p2 + w[3]*p3 + w[4]*p4 + w[5]*p5 +
                     w[6]*p6 + w[7]*p7 + skew + 65536) >> 17);
        return pr;
    }
};

static inline i32 tpaq_hash(i32 x, i32 y) {
    const i32 h = x * TPAQ_HASH_SEED ^ y * TPAQ_HASH_SEED;
    return (h >> 1) ^ (h >> 9) ^ (x >> 2) ^ (y >> 3) ^ TPAQ_HASH_SEED;
}

static inline i32 tpaq_create_ctx(i32 ctxId, i32 cx) {
    cx = cx * 987654323 + ctxId;
    cx = (cx << 16) | ((u32)cx >> 16);
    return cx * 123456791 + ctxId;
}

static i32 ilog2(i64 x) { i32 r = 0; while (x > 1) { x >>= 1; r++; } return r; }

struct TPAQPred {
    i32 pr, c0, c4, c8, bpos, pos, binCount, matchLen, matchPos, hashv;
    i32 statesMask, mixersMask, hashMask, bufferMask;
    bool extra;
    std::vector<u8> bigStates, smallStates0, smallStates1, buffer;
    std::vector<i32> hashes;
    std::vector<Mixer> mixers;
    Mixer* mixer;
    LogAPM sse0;
    LogAPM* sse1;
    i32 cp[7], ctxv[7];

    TPAQPred(bool extra_, i64 blockSize, i64 size)
        : pr(2048), c0(1), c4(0), c8(0), bpos(8), pos(0), binCount(0),
          matchLen(0), matchPos(0), hashv(0), extra(extra_),
          sse0(256, extra_ ? 6 : 7), sse1(nullptr) {
        i64 statesSize, mixersSize, hashSize, bufferSize;
        const i64 rbsz = blockSize, absz = size;
        if (rbsz >= 64 * 1024 * 1024) statesSize = 1LL << 28;
        else if (rbsz >= 16 * 1024 * 1024) statesSize = 1LL << 27;
        else if (rbsz >= 4 * 1024 * 1024) statesSize = 1LL << 26;
        else statesSize = (rbsz >= 1024 * 1024) ? 1LL << 24 : 1LL << 22;
        if (absz >= 32 * 1024 * 1024) mixersSize = 1 << 16;
        else if (absz >= 16 * 1024 * 1024) mixersSize = 1 << 15;
        else if (absz >= 8 * 1024 * 1024) mixersSize = 1 << 14;
        else if (absz >= 4 * 1024 * 1024) mixersSize = 1 << 13;
        else mixersSize = (absz >= 1024 * 1024) ? 1 << 11 : 1 << 8;
        bufferSize = (64LL * 1024 * 1024 < rbsz) ? 64LL * 1024 * 1024 : rbsz;
        const i64 mxsz = (absz < (1 << 26)) ? absz * 16 : 1LL << 30;
        hashSize = (16LL * 1024 * 1024 < mxsz) ? 16LL * 1024 * 1024 : mxsz;
        bufferSize = 1LL << ilog2(bufferSize);
        hashSize = 1LL << ilog2(hashSize);
        const int em = extra_ ? 2 : 0;
        mixersSize <<= em;
        statesSize <<= em;
        hashSize <<= em;
        if (hashSize > 1024LL * 1024 * 1024) hashSize = 1024LL * 1024 * 1024;

        bigStates.assign(statesSize, 0);
        smallStates0.assign(1 << 16, 0);
        smallStates1.assign(1 << 24, 0);
        hashes.assign(hashSize, 0);
        buffer.assign(bufferSize, 0);
        mixers.assign(mixersSize, Mixer());
        mixer = &mixers[0];
        statesMask = (i32)(statesSize - 1);
        mixersMask = (i32)((mixersSize - 1) & ~1LL);
        hashMask = (i32)(hashSize - 1);
        bufferMask = (i32)(bufferSize - 1);
        if (extra_) sse1 = new LogAPM(65536, 7);
        for (int i = 0; i < 7; i++) { cp[i] = 0; ctxv[i] = 0; }
    }
    ~TPAQPred() { delete sse1; }

    inline i32 get() { return pr; }

    void findMatch() {
        if (matchLen > 0) {
            matchLen += (i32)(((u32)(matchLen - TPAQ_MAX_LENGTH)) >> 31);
            matchPos++;
        } else {
            matchPos = hashes[hashv];
            if ((matchPos != 0) && (pos - matchPos <= bufferMask)) {
                i32 r = matchLen + 2, s = pos - r, t = matchPos - r;
                while (r <= TPAQ_MAX_LENGTH) {
                    if (buffer[(s - 1) & bufferMask] != buffer[(t - 1) & bufferMask]) break;
                    if (buffer[s & bufferMask] != buffer[t & bufferMask]) break;
                    r += 2; s -= 2; t -= 2;
                }
                matchLen = r - 2;
            }
        }
    }

    inline i32 matchPred() {
        const i32 b = buffer[matchPos & bufferMask] & 0xFF;
        if (c0 == ((b | 256) >> bpos)) {
            return (((b >> (bpos - 1)) & 1) != 0) ? TPAQ_MATCHPRED[matchLen - 1]
                                                  : -TPAQ_MATCHPRED[matchLen - 1];
        }
        matchLen = 0;
        return 0;
    }

    void update(i32 bit) {
        mixer->update(bit);
        bpos--;
        c0 = (c0 << 1) | bit;
        if (c0 > 255) {
            buffer[pos & bufferMask] = (u8)c0;
            pos++;
            c8 = (c8 << 8) | ((u32)c4 >> 24);
            c4 = (c4 << 8) | (c0 & 0xFF);
            hashv = (((hashv * TPAQ_HASH_SEED) << 4) + c4) & hashMask;
            c0 = 1;
            bpos = 8;
            binCount += ((c4 >> 7) & 1);
            mixer = &mixers[(c4 & mixersMask) | ((matchLen != 0) ? 1 : 0)];
            ctxv[0] = (c4 & 0xFF) << 8;
            ctxv[1] = (c4 & 0xFFFF) << 8;
            ctxv[2] = tpaq_create_ctx(2, c4 & 0x00FFFFFF);
            ctxv[3] = tpaq_create_ctx(3, c4);
            if (binCount < (pos >> 2)) {
                ctxv[4] = tpaq_create_ctx(ctxv[1], c4 ^ (c8 & 0xFFFF));
                ctxv[5] = (i32)((c8 & 0xF0F0F000) | ((u32)(c4 & 0xF0F0F000) >> 4));
                if (extra) {
                    const i32 h1 = ((c4 & 0x80808080) == 0) ? c4 & 0x4F4FFFFF : c4 & 0x80808080;
                    const i32 h2 = ((c8 & 0x80808080) == 0) ? c8 & 0x4F4FFFFF : c8 & 0x80808080;
                    ctxv[6] = tpaq_hash(h1 << 2, (i32)((u32)h2 >> 2));  // logical shift (v7)
                }
            } else {
                ctxv[4] = tpaq_create_ctx(TPAQ_HASH_SEED + matchLen, c4 ^ (c4 & 0x000FFFFF));
                ctxv[5] = ctxv[0] | (c8 << 16);
                if (extra)
                    ctxv[6] = tpaq_hash((i32)(c4 & 0xFFFF0000), (i32)((u32)c8 >> 16));
            }
            findMatch();
            hashes[hashv] = pos;
        }

        const i32 c = c0;
        const i32 mask = statesMask;
        const u8* table = TPAQ_TRANS[bit];
        smallStates0[cp[0]] = table[smallStates0[cp[0]]];
        smallStates1[cp[1]] = table[smallStates1[cp[1]]];
        bigStates[cp[2]] = table[bigStates[cp[2]]];
        bigStates[cp[3]] = table[bigStates[cp[3]]];
        bigStates[cp[4]] = table[bigStates[cp[4]]];
        bigStates[cp[5]] = table[bigStates[cp[5]]];
        cp[0] = ctxv[0] + c;
        const i32 p0 = TPAQ_SMAP[smallStates0[cp[0]]];
        cp[1] = ctxv[1] + c;
        const i32 p1 = TPAQ_SMAP[smallStates1[cp[1]]];
        cp[2] = (ctxv[2] + c) & mask;
        const i32 p2 = TPAQ_SMAP[bigStates[cp[2]]];
        cp[3] = (ctxv[3] + c) & mask;
        const i32 p3 = TPAQ_SMAP[bigStates[cp[3]]];
        cp[4] = (ctxv[4] + c) & mask;
        const i32 p4 = TPAQ_SMAP[bigStates[cp[4]]];
        cp[5] = (ctxv[5] ^ c) & mask;
        const i32 p5 = TPAQ_SMAP[bigStates[cp[5]]];
        // NOTE a next-bit software prefetch of all 6-7 state slots (next
        // c0 is 2c/2c+1 — byte-adjacent, one hint covers both outcomes)
        // was measured ~10% SLOWER on 4 MiB blocks: the hot state subset
        // is cache-resident and the extra prefetch uops stall this 2-wide
        // core's load ports more than the few real misses cost.
        const i32 p7 = (matchLen == 0) ? 0 : matchPred();
        i32 p;
        if (!extra) {
            p = mixer->get(p0, p1, p2, p3, p4, p5, p7, p7);
            if (binCount < (pos >> 3))
                p = (3 * sse0.get(bit, p, c0) + p) >> 2;
        } else {
            bigStates[cp[6]] = table[bigStates[cp[6]]];
            cp[6] = (ctxv[6] + c) & mask;
            const i32 p6 = TPAQ_SMAP[bigStates[cp[6]]];
            p = mixer->get(p0, p1, p2, p3, p4, p5, p6, p7);
            if (binCount < (pos >> 3)) {
                p = sse1->get(bit, p, ctxv[0] + c);
            } else {
                if (binCount >= (pos >> 2))
                    p = (3 * sse0.get(bit, p, c0) + p) >> 2;
                p = (3 * sse1->get(bit, p, ctxv[0] + c) + p) >> 2;
            }
        }
        pr = p + (i32)(((u32)(p - 2048)) >> 31);
    }
};

// ---------- generic binary coder over a predictor ----------

template <typename PRED>
static i64 bin_encode(const u8* src, i64 count, u8* dst, i64 cap, PRED& pred) {
    init_tables();
    Sink sink{dst, cap, 0, false};
    u64 low = 0, high = TOPR;
    i64 length = (count < 64) ? 64 : count;
    if (count >= (1 << 26))
        length = (count < 8LL * (1 << 26)) ? count >> 3 : count >> 4;
    std::vector<u8> buf;
    i64 startChunk = 0;
    while (startChunk < count) {
        const i64 chunk = (length < count - startChunk) ? length : count - startChunk;
        buf.clear();
        for (i64 i = startChunk; i < startChunk + chunk; i++) {
            const i32 val = src[i];
            for (int k = 7; k >= 0; k--) {
                const i32 bit = (val >> k) & 1;
                const i32 prd = pred.get();
                const u64 split = (((high - low) >> 4) * (u64)prd) >> 8;
                if (bit == 0) low += (split + 1); else high = low + split;
                pred.update(bit);
                while (__builtin_expect(((low ^ high) & MASK_24_56) == 0, 0)) {
                    const u32 v = (u32)(high >> 24);
                    buf.push_back((u8)(v >> 24)); buf.push_back((u8)(v >> 16));
                    buf.push_back((u8)(v >> 8)); buf.push_back((u8)v);
                    low = (low << 32) & MASK_0_56;
                    high = ((high << 32) | MASK_0_32) & MASK_0_56;
                }
            }
        }
        sink.varint((u32)buf.size());
        for (u8 b : buf) sink.put(b);
        startChunk += chunk;
        if (startChunk < count) sink.put56(low | MASK_0_24);
    }
    sink.put56(low | MASK_0_24);  // dispose()
    return sink.overflow ? -1 : sink.pos;
}

template <typename PRED>
static i64 bin_decode(const u8* src, i64 srcLen, u8* dst, i64 count, i64* consumed, PRED& pred) {
    init_tables();
    Source sc{src, srcLen, 0};
    u64 low = 0, high = TOPR, current = 0;
    i64 length = (count < 64) ? 64 : count;
    if (count >= (1 << 26))
        length = (count < 8LL * (1 << 26)) ? count >> 3 : count >> 4;
    i64 startChunk = 0;
    while (startChunk < count) {
        const i64 chunk = (length < count - startChunk) ? length : count - startChunk;
        const i64 sz = sc.varint();
        const i64 maxSz = ((chunk << 5) < (((i64)1 << 31) >> 3)) ? (chunk << 5) : (((i64)1 << 31) >> 3);
        if (sz > maxSz || sc.pos + 7 + sz > srcLen) return -1;
        current = sc.get56();
        const u8* payload = src + sc.pos;
        sc.pos += sz;
        i64 idx = 0;
        for (i64 i = startChunk; i < startChunk + chunk; i++) {
            i32 v = 0;
            for (int k = 0; k < 8; k++) {
                const i32 prd = pred.get();
                const u64 split = ((((high - low) >> 4) * (u64)prd) >> 8) + low;
                // branchy on purpose: the bits are biased (they compressed),
                // so speculation usually wins and breaks the serial chain;
                // a cmov version measured 1.8x SLOWER on post-BWT data.
                i32 bit;
                if (split >= current) { bit = 1; high = split; }
                else { bit = 0; low = split + 1; }
                pred.update(bit);
                while (__builtin_expect(((low ^ high) & MASK_24_56) == 0, 0)) {
                    low = (low << 32) & MASK_0_56;
                    high = ((high << 32) | MASK_0_32) & MASK_0_56;
                    if (idx + 4 > sz) {
                        current = (current << 32) & MASK_0_56;
                        idx = sz + 1;
                    } else {
                        const u64 val = ((u64)payload[idx] << 24) | ((u64)payload[idx+1] << 16) |
                                        ((u64)payload[idx+2] << 8) | (u64)payload[idx+3];
                        current = ((current << 32) | val) & MASK_0_56;
                        idx += 4;
                    }
                }
                v = (v << 1) | bit;
            }
            dst[i] = (u8)v;
            if (idx > sz) return -1;
        }
        startChunk += chunk;
    }
    if (consumed) *consumed = sc.pos;
    return count;
}

EXPORT i64 kz_cm_encode(const u8* src, i64 count, u8* dst, i64 cap) {
    CMPred p;
    return bin_encode(src, count, dst, cap, p);
}
EXPORT i64 kz_cm_decode(const u8* src, i64 srcLen, u8* dst, i64 count, i64* consumed) {
    CMPred p;
    return bin_decode(src, srcLen, dst, count, consumed, p);
}
EXPORT i64 kz_tpaq_encode(const u8* src, i64 count, u8* dst, i64 cap,
                          i32 extra, i64 blockSize, i64 size) {
    if (!tpaq_tables_set) return -2;
    init_tables();
    TPAQPred p(extra != 0, blockSize, size);
    return bin_encode(src, count, dst, cap, p);
}
EXPORT i64 kz_tpaq_decode(const u8* src, i64 srcLen, u8* dst, i64 count, i64* consumed,
                          i32 extra, i64 blockSize, i64 size) {
    if (!tpaq_tables_set) return -2;
    init_tables();
    TPAQPred p(extra != 0, blockSize, size);
    return bin_decode(src, srcLen, dst, count, consumed, p);
}

// ---------- FPAQ (its own coder: >>8 split, 4 MiB chunks, bit-tree ctx) ----

EXPORT i64 kz_fpaq_encode(const u8* src, i64 count, u8* dst, i64 cap) {
    Sink sink{dst, cap, 0, false};
    u64 low = 0, high = TOPR;
    i32 probs[4][256];
    for (int i = 0; i < 4; i++)
        for (int j = 0; j < 256; j++) probs[i][j] = PSCALE >> 1;
    const i64 CHUNK = 4 * 1024 * 1024;
    std::vector<u8> buf;
    i64 startChunk = 0;
    while (startChunk < count) {
        const i64 chunk = (CHUNK < count - startChunk) ? CHUNK : count - startChunk;
        buf.clear();
        i32* p = probs[0];
        for (i64 i = startChunk; i < startChunk + chunk; i++) {
            const i32 val = src[i];
            i32 ctx = 1;
            for (int k = 7; k >= 0; k--) {
                const i32 bit = (val >> k) & 1;
                const u64 split = (((high - low) >> 8) * (u64)p[ctx]) >> 8;
                if (bit == 0) { low += (split + 1); p[ctx] -= (p[ctx] >> 6); }
                else { high = low + split; p[ctx] -= ((p[ctx] - PSCALE + 64) >> 6); }
                while (__builtin_expect(((low ^ high) & MASK_24_56) == 0, 0)) {
                    const u32 v = (u32)(high >> 24);
                    buf.push_back((u8)(v >> 24)); buf.push_back((u8)(v >> 16));
                    buf.push_back((u8)(v >> 8)); buf.push_back((u8)v);
                    low = (low << 32) & MASK_0_56;
                    high = ((high << 32) | MASK_0_32) & MASK_0_56;
                }
                ctx = (ctx << 1) | bit;
            }
            p = probs[val >> 6];
        }
        sink.varint((u32)buf.size());
        for (u8 b : buf) sink.put(b);
        startChunk += chunk;
        if (startChunk < count) sink.put56(low | MASK_0_24);
    }
    sink.put56(low | MASK_0_24);
    return sink.overflow ? -1 : sink.pos;
}

EXPORT i64 kz_fpaq_decode(const u8* src, i64 srcLen, u8* dst, i64 count, i64* consumed) {
    Source sc{src, srcLen, 0};
    u64 low = 0, high = TOPR, current = 0;
    i32 probs[4][256];
    for (int i = 0; i < 4; i++)
        for (int j = 0; j < 256; j++) probs[i][j] = PSCALE >> 1;
    const i64 CHUNK = 4 * 1024 * 1024;
    i64 startChunk = 0;
    while (startChunk < count) {
        const i64 chunk = (CHUNK < count - startChunk) ? CHUNK : count - startChunk;
        const i64 sz = sc.varint();
        const i64 maxSz = ((chunk << 5) < (((i64)1 << 31) >> 3)) ? (chunk << 5) : (((i64)1 << 31) >> 3);
        if (sz > maxSz || sc.pos + 7 + sz > srcLen) return -1;
        current = sc.get56();
        const u8* payload = src + sc.pos;
        sc.pos += sz;
        i64 idx = 0;
        i32* p = probs[0];
        for (i64 i = startChunk; i < startChunk + chunk; i++) {
            i32 ctx = 1;
            for (int k = 0; k < 8; k++) {
                const u64 split = ((((high - low) >> 8) * (u64)p[ctx]) >> 8) + low;
                i32 bit;
                if (split >= current) {
                    bit = 1; high = split;
                    p[ctx] -= ((p[ctx] - PSCALE + 64) >> 6);
                } else {
                    bit = 0; low = split + 1;
                    p[ctx] -= (p[ctx] >> 6);
                }
                while (__builtin_expect(((low ^ high) & MASK_24_56) == 0, 0)) {
                    low = (low << 32) & MASK_0_56;
                    high = ((high << 32) | MASK_0_32) & MASK_0_56;
                    if (idx + 4 > sz) {
                        current = (current << 32) & MASK_0_56;
                        idx = sz + 1;
                    } else {
                        const u64 val = ((u64)payload[idx] << 24) | ((u64)payload[idx+1] << 16) |
                                        ((u64)payload[idx+2] << 8) | (u64)payload[idx+3];
                        current = ((current << 32) | val) & MASK_0_56;
                        idx += 4;
                    }
                }
                ctx = (ctx << 1) | bit;
            }
            dst[i] = (u8)(ctx & 0xFF);
            p = probs[(ctx & 0xFF) >> 6];
            if (idx > sz) return -1;
        }
        startChunk += chunk;
    }
    if (consumed) *consumed = sc.pos;
    return count;
}
