// Native kernels for the serial byte transforms (SBRT, SRT).
// Semantics re-derived from K/transform/SBRT.java:34-226 and SRT.java:29-367;
// the Python classes in kanzi_tpu/transforms are the executable spec.

#include <cstdint>
#include <cstring>

#if defined(_MSC_VER)
#define EXPORT extern "C" __declspec(dllexport)
#else
#define EXPORT extern "C" __attribute__((visibility("default")))
#endif

typedef uint8_t u8;
typedef int32_t i32;
typedef int64_t i64;

// ---------------- SBRT ----------------

EXPORT void kz_sbrt_forward(const u8* src, u8* dst, i64 count, i32 mode) {
    const i32 m1 = (mode == 3) ? 0 : -1;
    const i32 m2 = (mode == 1) ? 0 : -1;
    const i32 s = (mode == 2) ? 1 : 0;
    i32 p[256], q[256], s2r[256], r2s[256];
    for (i32 i = 0; i < 256; i++) { p[i] = 0; q[i] = 0; s2r[i] = i; r2s[i] = i; }
    for (i64 i = 0; i < count; i++) {
        const i32 c = src[i];
        i32 r = s2r[c];
        dst[i] = (u8)r;
        const i32 qc = (((i32)i & m1) + (p[c] & m2)) >> s;
        p[c] = (i32)i;
        q[c] = qc;
        while ((r > 0) && (q[r2s[r - 1]] <= qc)) {
            r2s[r] = r2s[r - 1];
            s2r[r2s[r]] = r;
            r--;
        }
        r2s[r] = c;
        s2r[c] = r;
    }
}

EXPORT void kz_sbrt_inverse(const u8* src, u8* dst, i64 count, i32 mode) {
    const i32 m1 = (mode == 3) ? 0 : -1;
    const i32 m2 = (mode == 1) ? 0 : -1;
    const i32 s = (mode == 2) ? 1 : 0;
    i32 p[256], q[256], r2s[256];
    for (i32 i = 0; i < 256; i++) { p[i] = 0; q[i] = 0; r2s[i] = i; }
    for (i64 i = 0; i < count; i++) {
        i32 r = src[i];
        const i32 c = r2s[r];
        dst[i] = (u8)c;
        const i32 qc = (((i32)i & m1) + (p[c] & m2)) >> s;
        p[c] = (i32)i;
        q[c] = qc;
        while ((r > 0) && (q[r2s[r - 1]] <= qc)) {
            r2s[r] = r2s[r - 1];
            r--;
        }
        r2s[r] = c;
    }
}

// ---------------- SRT ----------------

static i32 srt_sort_symbols(const i32* freqs, u8* symbols) {
    i32 nb = 0;
    for (i32 i = 0; i < 256; i++)
        if (freqs[i] > 0) symbols[nb++] = (u8)i;
    // sort by (freq desc, value asc) — shellsort like the reference
    i32 h = 4;
    while (h < nb) h = h * 3 + 1;
    while (true) {
        h /= 3;
        for (i32 i = h; i < nb; i++) {
            const i32 t = symbols[i];
            i32 b = i - h;
            while ((b >= 0) && ((freqs[symbols[b]] < freqs[t]) ||
                                ((freqs[t] == freqs[symbols[b]]) && (t < symbols[b])))) {
                symbols[b + h] = symbols[b];
                b -= h;
            }
            symbols[b + h] = (u8)t;
        }
        if (h == 1) break;
    }
    return nb;
}

// Returns total output length (header + count), or -1 on error.
EXPORT i64 kz_srt_forward(const u8* src, i64 count, u8* dst, i64 cap) {
    i32 freqs[256], r2s[256], s2r[256], buckets[256];
    std::memset(freqs, 0, sizeof(freqs));
    i32 b = 0;
    for (i64 i = 0; i < count; i++) {
        const i32 c = src[i];
        if (freqs[c] == 0) { r2s[b] = c; s2r[c] = b; b++; }
        freqs[c]++;
    }
    u8 symbols[256];
    const i32 nb = srt_sort_symbols(freqs, symbols);
    i32 bucketPos = 0;
    for (i32 i = 0; i < nb; i++) {
        const i32 c = symbols[i];
        buckets[c] = bucketPos;
        bucketPos += freqs[c];
    }
    // header
    i64 hdr = 0;
    for (i32 i = 0; i < 256; i++) {
        i32 f = freqs[i];
        while (f >= 128) {
            if (hdr >= cap) return -1;
            dst[hdr++] = (u8)(0x80 | f);
            f >>= 7;
        }
        if (hdr >= cap) return -1;
        dst[hdr++] = (u8)f;
    }
    if (hdr + count > cap) return -1;
    u8* body = dst + hdr;
    for (i64 i = 0; i < count;) {
        const i32 c = src[i];
        i32 r = s2r[c];
        i32 p = buckets[c];
        body[p] = (u8)r;
        p++;
        if (r != 0) {
            do {
                r2s[r] = r2s[r - 1];
                s2r[r2s[r]] = r;
                r--;
            } while (r != 0);
            r2s[0] = c;
            s2r[c] = 0;
        }
        i++;
        while ((i < count) && (src[i] == c)) {
            body[p] = 0;
            p++;
            i++;
        }
        buckets[c] = p;
    }
    return hdr + count;
}

// Returns decoded length, or -1 on error.
EXPORT i64 kz_srt_inverse(const u8* src, i64 srcLen, u8* dst, i64 cap) {
    i32 freqs[256];
    i64 idx = 0;
    for (i32 i = 0; i < 256; i++) {
        if (idx >= srcLen) return -1;
        i32 val = src[idx++];
        i32 res = val & 0x7F;
        i32 shift = 7;
        while (val >= 128) {
            if (idx >= srcLen) return -1;
            val = src[idx++];
            res |= ((val & 0x7F) << shift);
            if (shift > 21) break;
            shift += 7;
        }
        freqs[i] = res;
    }
    const i64 count = srcLen - idx;
    if (count > cap) return -1;
    const u8* body = src + idx;
    u8 symbols[256];
    i32 nb = srt_sort_symbols(freqs, symbols);
    // zero-init: a corrupt stream can reference ranks/symbols the header
    // never declared — uninitialized entries here were wild indices
    i32 buckets[256] = {0}, bucketEnds[256] = {0}, r2s[256] = {0};
    i32 bucketPos = 0;
    for (i32 i = 0; i < nb; i++) {
        const i32 c = symbols[i];
        if (bucketPos < 0 || bucketPos >= count) return -1;
        r2s[body[bucketPos]] = c;
        buckets[c] = bucketPos + 1;
        bucketPos += freqs[c];
        // corrupt header: declared frequencies exceeding the body would
        // let the rank reads below run past the buffer
        if (bucketPos > count) return -1;
        bucketEnds[c] = bucketPos;
    }
    if (nb == 0) return count == 0 ? 0 : -1;
    i32 c = r2s[0];
    for (i64 i = 0; i < count; i++) {
        dst[i] = (u8)c;
        if (buckets[c] < bucketEnds[c]) {
            const i32 r = body[buckets[c]];
            buckets[c]++;
            if (r == 0) continue;
            std::memmove(r2s, r2s + 1, (size_t)r * sizeof(i32));
            r2s[r] = c;
            c = r2s[0];
        } else {
            if (nb == 1) continue;
            nb--;
            std::memmove(r2s, r2s + 1, (size_t)nb * sizeof(i32));
            c = r2s[0];
        }
    }
    return count;
}

// ---------------- ZRLT ----------------
// Zero Run-Length Transform (K/transform/ZRLT.java:32-245); the Python
// class kanzi_tpu/transforms/zrlt.py is the executable spec this mirrors.
// forward: zero run R -> binary digits of (R+1) below the MSB, one byte
// per bit; val 1..0xFD -> val+1; 0xFE/0xFF -> (0xFF, val-0xFE).

// Output must be strictly smaller than the input (total < cap), matching the
// Python spec's `total >= n -> skip`; every branch checks di+emitted >= cap.
EXPORT i64 kz_zrlt_forward(const u8* src, i64 count, u8* dst, i64 cap) {
    i64 si = 0, di = 0;
    while (si < count) {
        const u8 val = src[si];
        if (val == 0) {
            i64 run = 1;
            while (si + run < count && src[si + run] == 0) run++;
            const uint64_t v = (uint64_t)run + 1;
            int k = 63 - __builtin_clzll(v);  // floor log2 = digits below MSB
            if (di + k >= cap) return -1;     // would not shrink: skip stage
            for (int j = 0; j < k; j++)
                dst[di++] = (u8)((v >> (k - 1 - j)) & 1);
            si += run;
        } else if (val >= 0xFE) {
            if (di + 2 >= cap) return -1;
            dst[di++] = 0xFF;
            dst[di++] = (u8)(val - 0xFE);
            si++;
        } else {
            if (di + 1 >= cap) return -1;
            dst[di++] = (u8)(val + 1);
            si++;
        }
    }
    return di;
}

// inverse: maximal runs of 0/1 tokens accumulate run = 2*run + bit from
// run=1, emitting run-1 zeros; 0xFF consumes its pair byte (even a 0/1),
// a trailing pairless 0xFF emits nothing (ZRLT.java:198-201).
// Matches the Python spec's semantics exactly: a bit-run longer than 40
// digits is an invalid stream (-3, zrlt.py guards `bg_lens > 40`).
// Writes beyond `cap` are dropped but still COUNTED: the return value is
// the total decoded length, so a caller whose buffer was too small can
// retry with an exact-size buffer (the Python path builds the full output
// then truncates to count).
EXPORT i64 kz_zrlt_inverse(const u8* src, i64 count, u8* dst, i64 cap) {
    i64 si = 0, di = 0;
    while (si < count) {
        u8 val = src[si];
        if (val <= 1) {
            uint64_t run = 1;
            i64 digits = 0;
            while (si < count && (val = src[si]) <= 1) {
                run = (run << 1) | val;
                si++;
                if (++digits > 40) return -3;  // invalid stream (spec predicate)
            }
            run -= 1;
            if (di < cap) {
                i64 emit = (i64)run;
                if (emit > cap - di) emit = cap - di;
                memset(dst + di, 0, (size_t)emit);
            }
            di += (i64)run;
        } else if (val == 0xFF) {
            if (si + 1 >= count) { si = count; break; }
            if (di < cap) dst[di] = (u8)(0xFE + src[si + 1]);
            di++;
            si += 2;
        } else {
            if (di < cap) dst[di] = (u8)(val - 1);
            di++;
            si++;
        }
    }
    return di;
}
