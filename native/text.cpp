// TEXT codec: dictionary word substitution with adaptive dictionary.
// Semantics re-derived from K/transform/TextCodec.java:31-1647.
//
// Two encodings share the analysis + dictionary machinery:
//   type 1 (bit-oriented entropy stages): escape tokens 0x0F/0x0E before a
//     varint word index (5+7+7 bits)
//   type 2 (Huffman/ANS0/Range/None): high-bit mask indexes
//     10xxxxxx / 110xxxxx xxxxxxxx / 1111xxxx.. with 0x80 = case flip,
//     literals >= 0x80 escaped with 0x0F
// The first occurrence of every word passes through as literals, so the
// decoder reconstructs the adaptive dictionary in lockstep.
// The static English dictionary is pushed from Python (kz_text_set_dict).

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

namespace textcodec {

static const i32 THRESHOLD1 = 128;
static const i32 THRESHOLD2 = THRESHOLD1 * THRESHOLD1;
static const i32 THRESHOLD3 = 64;
static const i32 THRESHOLD4 = THRESHOLD3 * 128;
static const i32 MAX_DICT_SIZE = 1 << 19;
static const i32 MAX_WORD_LENGTH = 31;
static const u8 LF = 0x0A, CR = 0x0D;
static const u8 ESCAPE_TOKEN1 = 0x0F, ESCAPE_TOKEN2 = 0x0E;
static const i32 HASH1 = 0x7FEB352D;
static const i32 HASH2 = (i32)0x846CA68B;
static const i32 MASK_NOT_TEXT = 0x80;
static const i32 MASK_CRLF = 0x40;
static const i32 MASK_XML_HTML = 0x20;
static const i32 MASK_DT = 0x0F;
static const i32 MASK_LENGTH = 0x0007FFFF;
static const u8 MASK_FLIP_CASE = 0x80;

static inline bool isLower(u8 v) { return v >= 'a' && v <= 'z'; }
static inline bool isUpper(u8 v) { return v >= 'A' && v <= 'Z'; }
static inline bool isText(u8 v) { return isLower(v | 0x20); }

static bool DELIM[256];
static bool delim_done = false;
static void init_delims() {
    if (delim_done) return;
    for (i32 i = 0; i < 256; i++) {
        bool d = (i >= ' ' && i <= '/') || (i >= ':' && i <= '?');
        switch (i) {
            case '\n': case '\t': case '\r': case '_': case '|':
            case '{': case '}': case '[': case ']': d = true; break;
            default: break;
        }
        DELIM[i] = d;
    }
    delim_done = true;
}

struct DictEntry {
    i32 hash;
    i32 pos;
    i32 data;  // (length << 24) | index
    const u8* buf;
};

// static dictionary (built once from the bytes Python pushes)
static std::vector<u8> g_dict_bytes;
static std::vector<DictEntry> g_static_dict;
static i32 g_static_words = 0;

EXPORT void kz_text_set_dict(const u8* dict, i64 len) {
    init_delims();
    g_dict_bytes.assign(dict, dict + len);
    g_static_dict.assign(1024, DictEntry{0, -1, 0, nullptr});
    u8* words = g_dict_bytes.data();
    i32 anchor = 0, h = HASH1, nbWords = 0;
    for (i64 i = 0; i < len && nbWords < 1024; i++) {
        if (!isText(words[i])) continue;
        if (isUpper(words[i])) {
            if (i > anchor) {
                g_static_dict[nbWords] = DictEntry{h, anchor, (i32)(((i - anchor) << 24) | nbWords), words};
                nbWords++;
                anchor = (i32)i;
                h = HASH1;
            }
            words[i] ^= 0x20;
        }
        h = h * HASH1 ^ (i32)words[i] * HASH2;
    }
    if (nbWords < 1024) {
        g_static_dict[nbWords] = DictEntry{h, anchor, (i32)(((len - anchor) << 24) | nbWords), words};
        nbWords++;
    }
    g_static_words = nbWords;
}

static inline bool sameWords(const u8* a, i32 ia, const u8* b, i32 ib, i32 len) {
    for (i32 k = len - 1; k >= 0; k--)
        if (a[ia + k] != b[ib + k]) return false;
    return true;
}

static i32 ilog2(i64 x) { i32 r = 0; while (x > 1) { x >>= 1; r++; } return r; }

// ---- computeStats (TextCodec.java:266-380) ----

static i32 detect_type(const i64* f0, const i64* f, i64 count);

static i32 compute_stats(const u8* block, i64 count, bool strict, bool magic_found) {
    if (!strict && magic_found) return MASK_NOT_TEXT;
    std::vector<i64> freqs(65536, 0);
    std::vector<i64> f0(256, 0);
    i32 prv = 0;
    for (i64 i = 0; i < count; i++) {
        const i32 cur = block[i];
        f0[cur]++;
        freqs[prv * 256 + cur]++;
        prv = cur;
    }
    i64 nbTextChars = f0[CR] + f0[LF];
    i64 nbASCII = 0;
    for (i32 i = 0; i < 128; i++) {
        if (isText((u8)i)) nbTextChars += f0[i];
        nbASCII += f0[i];
    }
    const i64 nbBinChars = count - nbASCII;
    bool notText = nbBinChars > (count >> 2);
    if (!notText) {
        notText = nbTextChars < (count / 4);
        if (strict)
            notText |= ((f0[0] >= (count / 100)) || ((nbASCII / 95) < (count / 100)));
        else
            notText |= (f0[32] < (count / 50));
    }
    i32 res = 0;
    if (notText)
        return res | detect_type(f0.data(), freqs.data(), count);
    if (nbBinChars <= count - count / 10) {
        const i64 f1 = f0['<'], f2 = f0['>'];
        const i64 f3 = freqs['&' * 256 + 'a'] + freqs['&' * 256 + 'g'] +
                       freqs['&' * 256 + 'l'] + freqs['&' * 256 + 'q'];
        const i64 minFreq = ((count - nbBinChars) >> 9) > 2 ? (count - nbBinChars) >> 9 : 2;
        if (f1 >= minFreq && f2 >= minFreq && f3 > 0) {
            if (f1 < f2) { if (f1 >= f2 - f2 / 100) res |= MASK_XML_HTML; }
            else if (f2 < f1) { if (f2 >= f1 - f1 / 100) res |= MASK_XML_HTML; }
            else res |= MASK_XML_HTML;
        }
    }
    if (f0[CR] != 0 && f0[CR] == f0[LF]) {
        res |= MASK_CRLF;
        for (i32 i = 0; i < 256; i++) {
            if (i != LF && freqs[CR * 256 + i] != 0) { res &= ~MASK_CRLF; break; }
            if (i != CR && freqs[i * 256 + LF] != 0) { res &= ~MASK_CRLF; break; }
        }
    }
    return res;
}

// DataType ordinals (must match kanzi_tpu.core.globals.DataType)
enum { DT_UNDEFINED = 0, DT_TEXT = 1, DT_MULTIMEDIA = 2, DT_EXE = 3, DT_NUMERIC = 4,
       DT_BASE64 = 5, DT_DNA = 6, DT_BIN = 7, DT_UTF8 = 8, DT_SMALL_ALPHABET = 9 };

static i32 detect_simple_type(const i64* f0, i64 count) {
    static const char* dna = "acgntuACGNTU";
    static const char* num = "0123456789+-*/=,.:; ";
    static const char* b64 =
        "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789+/";
    i64 sum = 0;
    for (i32 i = 0; i < 12; i++) sum += f0[(u8)dna[i]];
    if (sum > count - count / 12) return DT_DNA;
    sum = 0;
    for (i32 i = 0; i < 20; i++) sum += f0[(u8)num[i]];
    if (sum == count) return DT_NUMERIC;
    sum = (f0[0x3D] == 1) ? 1 : 0;
    for (i32 i = 0; i < 64; i++) sum += f0[(u8)b64[i]];
    if (sum == count) return DT_BASE64;
    i32 nsym = 0;
    for (i32 i = 0; i < 256; i++) nsym += (f0[i] > 0) ? 1 : 0;
    if (nsym == 256) return DT_BIN;
    if (nsym <= 4) return DT_SMALL_ALPHABET;
    return DT_UNDEFINED;
}

static i32 detect_type(const i64* f0, const i64* f, i64 count) {
    const i32 dt = detect_simple_type(f0, count);
    if (dt != DT_UNDEFINED) return MASK_NOT_TEXT | dt;
    // UTF-8 validity (TextCodec.java detectType)
    i64 sum = f0[0xC0] + f0[0xC1];
    for (i32 i = 0xF5; i <= 0xFF; i++) sum += f0[i];
    if (sum != 0) return MASK_NOT_TEXT;
    i64 sum1 = 0, sum2 = 0;
    for (i32 i = 0; i < 256; i++) {
        if (i < 0xA0 || i > 0xBF) sum1 += f[0xE0 * 256 + i];
        if (i < 0x80 || i > 0x9F) sum1 += f[0xED * 256 + i];
        if (i < 0x90 || i > 0xBF) sum1 += f[0xF0 * 256 + i];
        if (i < 0x80 || i > 0x8F) sum1 += f[0xF4 * 256 + i];
        if (i < 0x80 || i > 0xBF) {
            for (i32 j = 0xC2; j <= 0xDF; j++) sum1 += f[j * 256 + i];
            for (i32 j = 0xE1; j <= 0xEC; j++) sum1 += f[j * 256 + i];
            sum1 += f[0xF1 * 256 + i];
            sum1 += f[0xF2 * 256 + i];
            sum1 += f[0xF3 * 256 + i];
            sum1 += f[0xEE * 256 + i];
            sum1 += f[0xEF * 256 + i];
        } else {
            sum2 += f0[i];
        }
        if (sum1 != 0) return MASK_NOT_TEXT;
    }
    return (sum2 >= count / 8) ? (MASK_NOT_TEXT | DT_UTF8) : MASK_NOT_TEXT;
}

// ---- shared dictionary state ----

struct Dict {
    std::vector<DictEntry*> map;   // hash -> entry
    std::vector<DictEntry> list;
    i32 dictSize;
    i32 staticDictSize;
    i32 hashMask;

    void init(i64 count, i32 logHashSize, bool withEscapes) {
        const i32 log = (count < 1024) ? 13 :
            std::max(std::min(ilog2(count / 128), 18), 13);
        dictSize = 1 << log;
        staticDictSize = g_static_words + (withEscapes ? 2 : 0);
        hashMask = (1 << logHashSize) - 1;
        map.assign((size_t)1 << logHashSize, nullptr);
        list.assign(std::max((size_t)dictSize, (size_t)MAX_DICT_SIZE), DictEntry{0, -1, 0, nullptr});
        for (i32 i = 0; i < g_static_words && i < dictSize; i++)
            list[i] = g_static_dict[i];
        static const u8 esc2[1] = {ESCAPE_TOKEN2};
        static const u8 esc1[1] = {ESCAPE_TOKEN1};
        if (withEscapes) {
            list[g_static_words] = DictEntry{0, 0, (i32)((1 << 24) | g_static_words), esc2};
            list[g_static_words + 1] = DictEntry{0, 0, (i32)((1 << 24) | (g_static_words + 1)), esc1};
        }
        for (i32 i = 0; i < staticDictSize; i++)
            map[list[i].hash & hashMask] = &list[i];
        for (i32 i = staticDictSize; i < (i32)list.size(); i++)
            list[i] = DictEntry{0, -1, i, nullptr};
    }

    bool expand() {  // list is pre-sized to MAX_DICT_SIZE; just widen the limit
        if (dictSize >= MAX_DICT_SIZE) return false;
        dictSize <<= 1;
        return true;
    }
};

// common adaptive-dictionary update used by both encoders & decoders.
// Returns the matched entry (nullptr if none); updates words counter.
static DictEntry* lookup_or_add(Dict& D, const u8* src, i32 delimAnchor, i64 srcIdx,
                                i32 length, i32& words, bool tryFlipped,
                                bool addLen3NeedsThreshold) {
    const i32 val = src[delimAnchor + 1];
    i32 h1 = HASH1 * HASH1 ^ val * HASH2;
    i32 h2 = HASH1 * HASH1 ^ (val ^ 0x20) * HASH2;
    for (i64 i = delimAnchor + 2; i < srcIdx; i++) {
        const i32 h = (i32)src[i] * HASH2;
        h1 = h1 * HASH1 ^ h;
        h2 = h2 * HASH1 ^ h;
    }
    DictEntry* e = nullptr;
    DictEntry* e1 = D.map[h1 & D.hashMask];
    if (e1 != nullptr && e1->hash == h1 && ((u32)e1->data >> 24) == (u32)length) {
        e = e1;
    } else if (tryFlipped) {
        DictEntry* e2 = D.map[h2 & D.hashMask];
        if (e2 != nullptr && e2->hash == h2 && ((u32)e2->data >> 24) == (u32)length)
            e = e2;
    }
    if (e != nullptr && !sameWords(src, delimAnchor + 2, e->buf, e->pos + 1, length - 1))
        e = nullptr;
    if (e == nullptr) {
        const bool addOk = addLen3NeedsThreshold
            ? ((length > 3) || (length == 3 && words < THRESHOLD2))
            : ((length > 3) || (words < THRESHOLD2));
        if (addOk && e1 == nullptr) {
            DictEntry* ne = &D.list[words];
            if ((ne->data & MASK_LENGTH) >= D.staticDictSize) {
                D.map[ne->hash & D.hashMask] = nullptr;
                ne->buf = src;
                ne->pos = delimAnchor + 1;
                ne->hash = h1;
                ne->data = (length << 24) | words;
            }
            D.map[h1 & D.hashMask] = ne;
            words++;
            if (words >= D.dictSize) {
                if (!D.expand()) words = D.staticDictSize;
            }
        }
        return nullptr;
    }
    return e;
}

}  // namespace textcodec

using namespace textcodec;

// codec_type: 1 or 2.  Returns encoded length, -1 = decline (not text /
// would expand), -2 = dict not initialized.  dt_out: detected data type.
EXPORT i64 kz_text_forward(const u8* src, i64 count, u8* dst, i64 cap,
                           i32 codec_type, i64 block_size_hint, i32 extra_perf,
                           i32 magic_found, i32* dt_out) {
    if (g_static_words == 0) return -2;
    init_delims();
    *dt_out = DT_UNDEFINED;
    const bool t1 = codec_type == 1;
    const i32 mode = compute_stats(src, count, t1, magic_found != 0);
    if (mode & MASK_NOT_TEXT) {
        *dt_out = mode & MASK_DT;
        return -1;
    }
    *dt_out = DT_TEXT;
    i32 log = 13;
    if (t1) {
        if (block_size_hint >= 8)
            log = std::max(std::min(ilog2(block_size_hint / 8), 26), 13);
    } else {
        if (block_size_hint >= 32)
            log = std::max(std::min(ilog2(block_size_hint / 32), 24), 13);
    }
    log += extra_perf ? 1 : 0;

    Dict D;
    D.init(count, log, t1);
    const bool isCRLF = (mode & MASK_CRLF) != 0;
    const i64 dstEnd = count;  // max encoded length == srcLength
    const i64 dstEndM = t1 ? dstEnd - 4 : dstEnd - 3;
    i64 srcIdx = 0, dstIdx = 0, emitAnchor = 0;
    i32 words = D.staticDictSize;
    if (dstIdx >= dstEnd) return -1;
    dst[dstIdx++] = (u8)mode;
    while (srcIdx < count && src[srcIdx] == ' ') {
        if (dstIdx >= dstEnd) return -1;
        dst[dstIdx++] = ' ';
        srcIdx++;
        emitAnchor++;
    }
    if (srcIdx >= count) return -1;

    // literal emitter (escapes differ per codec type)
    auto emitSymbols = [&](i64 from, i64 to) -> bool {
        for (i64 i = from; i < to; i++) {
            const u8 cur = src[i];
            if (t1) {
                if (cur == ESCAPE_TOKEN1 || cur == ESCAPE_TOKEN2) {
                    if (dstIdx >= dstEnd) return false;
                    dst[dstIdx++] = ESCAPE_TOKEN1;
                    const i32 idx = (cur == ESCAPE_TOKEN1) ? D.staticDictSize - 1
                                                           : D.staticDictSize - 2;
                    i32 lenIdx = 2;
                    if (idx >= THRESHOLD2) lenIdx = 3;
                    else if (idx < THRESHOLD1) lenIdx = 1;
                    if (dstIdx + lenIdx >= dstEnd) return false;
                    if (idx >= THRESHOLD1) {
                        if (idx >= THRESHOLD2) dst[dstIdx++] = (u8)(0xE0 | (idx >> 14));
                        dst[dstIdx++] = (u8)(0x80 | (idx >> 7));
                        dst[dstIdx++] = (u8)(idx & 0x7F);
                    } else {
                        dst[dstIdx++] = (u8)idx;
                    }
                } else if (cur == CR) {
                    if (!isCRLF) {
                        if (dstIdx >= dstEnd) return false;
                        dst[dstIdx++] = cur;
                    }
                } else {
                    if (dstIdx >= dstEnd) return false;
                    dst[dstIdx++] = cur;
                }
            } else {
                if (cur == ESCAPE_TOKEN1) {
                    if (dstIdx >= dstEnd - 1) return false;
                    dst[dstIdx++] = ESCAPE_TOKEN1;
                    dst[dstIdx++] = ESCAPE_TOKEN1;
                } else if (cur == CR) {
                    if (!isCRLF) {
                        if (dstIdx >= dstEnd) return false;
                        dst[dstIdx++] = cur;
                    }
                } else {
                    if (cur & 0x80) {
                        if (dstIdx >= dstEnd) return false;
                        dst[dstIdx++] = ESCAPE_TOKEN1;
                    }
                    if (dstIdx >= dstEnd) return false;
                    dst[dstIdx++] = cur;
                }
            }
        }
        return true;
    };

    i64 delimAnchor = isText(src[srcIdx]) ? srcIdx - 1 : srcIdx;
    bool res = true;
    while (srcIdx < count) {
        const u8 cur = src[srcIdx];
        if (isText(cur)) { srcIdx++; continue; }
        if ((srcIdx > delimAnchor + 2) && DELIM[cur]) {
            const i32 length = (i32)(srcIdx - delimAnchor - 1);
            if (length <= MAX_WORD_LENGTH) {
                DictEntry* e1before = D.map[
                    (([&]{ i32 h = HASH1 * HASH1 ^ (i32)src[delimAnchor + 1] * HASH2;
                           for (i64 i = delimAnchor + 2; i < srcIdx; i++)
                               h = h * HASH1 ^ (i32)src[i] * HASH2;
                           return h; })()) & D.hashMask];
                DictEntry* e = lookup_or_add(D, src, (i32)delimAnchor, srcIdx, length,
                                             words, true, true);
                if (e != nullptr) {
                    if (emitAnchor != delimAnchor || src[delimAnchor] != ' ') {
                        if (!emitSymbols(emitAnchor, delimAnchor + 1)) { res = false; break; }
                    }
                    if (dstIdx >= dstEndM) { res = false; break; }
                    const i32 widx = e->data & MASK_LENGTH;
                    if (t1) {
                        dst[dstIdx++] = (e == e1before) ? ESCAPE_TOKEN1 : ESCAPE_TOKEN2;
                        if (widx >= THRESHOLD1) {
                            if (widx >= THRESHOLD2) dst[dstIdx++] = (u8)(0xE0 | (widx >> 14));
                            dst[dstIdx++] = (u8)(0x80 | (widx >> 7));
                            dst[dstIdx++] = (u8)(widx & 0x7F);
                        } else {
                            dst[dstIdx++] = (u8)widx;
                        }
                    } else {
                        dst[dstIdx] = MASK_FLIP_CASE;
                        dstIdx += (e == e1before) ? 0 : 1;
                        const i32 w = widx + 1;
                        if (w >= THRESHOLD3) {
                            if (w >= THRESHOLD4) {
                                dst[dstIdx++] = (u8)(0xF0 | (w >> 16));
                                dst[dstIdx++] = (u8)(w >> 8);
                                dst[dstIdx++] = (u8)w;
                            } else {
                                dst[dstIdx++] = (u8)(0xC0 | (w >> 8));
                                dst[dstIdx++] = (u8)w;
                            }
                        } else {
                            dst[dstIdx++] = (u8)(0x80 | w);
                        }
                    }
                    emitAnchor = delimAnchor + 1 + ((u32)e->data >> 24);
                }
            }
        }
        delimAnchor = srcIdx;
        srcIdx++;
    }
    if (res) {
        if (!emitSymbols(emitAnchor, count)) return -1;
        if (srcIdx != count) return -1;
        return dstIdx;
    }
    return -1;
}

// legacy != 0 selects the pre-v6 TextCodec2 word-index varint
// (TextCodec.java:1499-1519: flip bit 0x20, 5+7+7-bit index, 0-based).
EXPORT i64 kz_text_inverse(const u8* src, i64 count, u8* dst, i64 cap,
                           i32 codec_type, i64 block_size_hint, i32 extra_perf,
                           i32 legacy) {
    if (g_static_words == 0) return -2;
    init_delims();
    const bool t1 = codec_type == 1;
    i32 log = 13;
    if (t1) {
        if (block_size_hint >= 8)
            log = std::max(std::min(ilog2(block_size_hint / 8), 26), 13);
    } else {
        if (block_size_hint >= 32)
            log = std::max(std::min(ilog2(block_size_hint / 32), 24), 13);
    }
    log += extra_perf ? 1 : 0;
    Dict D;
    D.init(cap, log, t1);
    i64 srcIdx = 0, dstIdx = 0;
    const bool isCRLF = (src[srcIdx++] & MASK_CRLF) != 0;
    if (srcIdx >= count) return dstIdx;
    i64 delimAnchor = isText(src[srcIdx]) ? srcIdx - 1 : srcIdx;
    i32 words = D.staticDictSize;
    bool wordRun = false;
    while (srcIdx < count && dstIdx < cap) {
        u8 cur = src[srcIdx];
        if (isText(cur)) {
            dst[dstIdx++] = cur;
            srcIdx++;
            continue;
        }
        if ((srcIdx > delimAnchor + 3) && DELIM[cur]) {
            const i32 length = (i32)(srcIdx - delimAnchor - 1);
            if (length <= MAX_WORD_LENGTH) {
                // decoder-side add: only the straight hash is checked
                lookup_or_add(D, src, (i32)delimAnchor, srcIdx, length, words,
                              false, false);
            }
        }
        srcIdx++;
        bool isWordRef;
        u8 flipMask = 0;
        i32 idx = -1;
        if (t1) {
            isWordRef = (cur == ESCAPE_TOKEN1 || cur == ESCAPE_TOKEN2);
            if (isWordRef) {
                if (srcIdx >= count) return -1;
                idx = src[srcIdx++];
                if (idx >= 128) {
                    idx &= 0x7F;
                    i32 idx2 = (int8_t)src[srcIdx++];
                    if (idx2 & 0x80) {
                        idx = ((idx & 0x1F) << 7) | (idx2 & 0x7F);
                        idx2 = src[srcIdx++] & 0x7F;
                    }
                    idx = (idx << 7) | (idx2 & 0xFF);
                    if (idx >= D.dictSize) return -1;
                }
                flipMask = (cur == ESCAPE_TOKEN2) ? 0x20 : 0;
            }
        } else if (legacy) {
            isWordRef = (cur & 0x80) != 0;
            if (isWordRef) {
                flipMask = cur & 0x20;
                idx = cur & 0x1F;
                if (cur & 0x40) {
                    if (srcIdx >= count) return -1;
                    i32 idx2 = (int8_t)src[srcIdx++];
                    if (idx2 & 0x80) {
                        idx = (idx << 7) | (idx2 & 0x7F);
                        if (srcIdx >= count) return -1;
                        idx2 = src[srcIdx++] & 0x7F;
                    }
                    idx = (idx << 7) | (idx2 & 0xFF);
                    if (idx >= D.dictSize) return -1;
                }
            }
        } else {
            isWordRef = (cur & 0x80) != 0;
            if (isWordRef) {
                if (cur == MASK_FLIP_CASE) {
                    flipMask = 0x20;
                    if (srcIdx >= count) return -1;
                    cur = src[srcIdx++];
                }
                idx = cur & 0x7F;
                if (idx >= 64) {
                    if (idx >= 112) {
                        if (srcIdx + 1 >= count) return -1;
                        idx = ((idx & 0x0F) << 16) | (src[srcIdx] << 8) | src[srcIdx + 1];
                        srcIdx += 2;
                    } else {
                        if (srcIdx >= count) return -1;
                        idx = ((idx & 0x1F) << 8) | src[srcIdx];
                        srcIdx++;
                    }
                    if (idx > D.dictSize) return -1;
                } else if (idx == 0) {
                    return -1;
                }
                idx--;
            }
        }
        if (isWordRef) {
            DictEntry& e = D.list[idx];
            const i32 length = ((u32)e.data >> 24) & 0xFF;
            if (wordRun && length > 1) {
                if (dstIdx >= cap) return -1;
                dst[dstIdx++] = ' ';
            }
            if (e.pos < 0 || dstIdx + length >= cap) return -1;
            dst[dstIdx++] = e.buf[e.pos] ^ flipMask;
            if (length > 1) {
                std::memcpy(dst + dstIdx, e.buf + e.pos + 1, length - 1);
                dstIdx += length - 1;
                wordRun = true;
                delimAnchor = srcIdx;
            } else {
                wordRun = false;
                delimAnchor = srcIdx - 1;
            }
        } else {
            if (!t1 && cur == ESCAPE_TOKEN1) {
                if (srcIdx >= count) return -1;
                dst[dstIdx++] = src[srcIdx++];
            } else {
                if (isCRLF && cur == LF) {
                    dst[dstIdx++] = CR;
                    if (dstIdx >= cap) return -1;
                }
                dst[dstIdx++] = cur;
            }
            wordRun = false;
            delimAnchor = srcIdx - 1;
        }
    }
    return (srcIdx == count) ? dstIdx : -1;
}
