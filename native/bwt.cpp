// BWT kernels: linear-time SA-IS suffix array construction, forward BWT with
// multi-chunk primary indexes, and the merged TPSI inverse with 8 parallel
// LF-walk chains.
//
// Interface semantics re-derived from K/transform/BWT.java:57-686 and
// DivSufSort.java:204-329 (any correct suffix array produces the identical
// BWT since the SA is unique):
//   forward: out[0] = src[n-1]; L-column skips the primary row;
//            indexes[k] = rank(suffix at k*step) + 1, step = ceil-ish(n/8)
//   inverse: counting sort into packed (next_index<<8 | byte) entries,
//            then 1 or 8 interleaved pointer chases (BWT.java:245-374).
// The SA-IS implementation follows Nong/Zhang/Chan's induced-sorting
// algorithm (standard formulation, written fresh).

#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <thread>
#if defined(__linux__)
#include <sys/mman.h>
#endif
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

namespace {

// Generic SA-IS over an integer alphabet.  s has length n, values in [0,K).
// SA receives the suffix order.  Memory: O(n + K).
// SAIS_TB<T>: the in-text type bit (set = S-type).  Packing the type into
// the character array halves the random loads in the induce inner loops
// (one cache miss for char+type instead of two into separate arrays);
// alphabet values must stay below the bit (257 at the top level, the LMS
// name count <= n/2 < 2^30 in recursions).
template <typename T> struct sais_tb;
template <> struct sais_tb<uint16_t> { static const uint16_t bit = 0x8000; };
template <> struct sais_tb<i32> { static const i32 bit = 1 << 30; };

// run f(tid, nthreads) on `jobs` threads (f(0,1) inline when jobs <= 1)
template <typename F>
static void sais_par(i32 jobs, F&& f) {
    if (jobs <= 1) { f(0, 1); return; }
    std::vector<std::thread> ts;
    ts.reserve(jobs - 1);
    for (i32 t = 1; t < jobs; t++)
        ts.emplace_back([&f, t, jobs] { f(t, jobs); });
    f(0, jobs);
    for (auto& th : ts) th.join();
}

// The induce sweeps are inherently serial (induced entries are consumed in
// the same pass), but every other phase of SA-IS is a data-parallel scan;
// `jobs` > 1 splits those across threads — the framework's encode tasks
// pass their leftover thread budget here so a lone big block (file <=
// blockSize) still uses the whole machine, like the reference's
// multi-threaded BWT inversion does on the decode side (BWT.java:568-674).
template <typename T>
void sais_core(const T* s, i32* SA, i32 n, i32 K, i32 jobs = 1) {
    if (n == 0) return;
    if (n == 1) { SA[0] = 0; return; }
    if (n < (1 << 20)) jobs = 1;     // thread spawn not worth it
    const T TB = sais_tb<T>::bit;

    // packed text: char | (S-type ? TB : 0).  Parallel blocks: a block's
    // rightmost type is resolved by scanning forward to the first strict
    // inequality (types only depend on chars to the right up to that point).
    std::vector<T> sp(n);
    T* SPm = sp.data();
    sais_par(jobs, [&](i32 tid, i32 nt) {
        const i64 per = (n + nt - 1) / nt;
        const i64 lo = (i64)tid * per;
        const i64 hi = std::min<i64>(n, lo + per);
        if (lo >= hi) return;
        // resolve the type at hi-1 (S iff the first differing char to the
        // right is larger, or we run off the end — sentinel convention)
        bool st = true;                       // type at position q
        i64 q = hi - 1;
        while (q + 1 < n && s[q] == s[q + 1]) q++;
        if (q + 1 < n) st = s[q] < s[q + 1];
        // positions (hi-1 .. q] all share that type (equal-char run)
        SPm[hi - 1] = (T)(s[hi - 1] | (st ? TB : 0));
        for (i64 i = hi - 2; i >= lo; i--) {
            st = (s[i] < s[i + 1]) || (s[i] == s[i + 1] && st);
            SPm[i] = (T)(s[i] | (st ? TB : 0));
        }
    });
    const T* SP = sp.data();

    auto isLMS = [&](i32 i) {
        return i > 0 && (SP[i] & TB) && !(SP[i - 1] & TB);
    };

    // bucket counts are a property of the text: count ONCE, copy bounds
    // per induce pass (a per-pass recount would be a full extra sweep)
    std::vector<i32> bktHead(K + 1), bktTail(K + 1);
    {
        std::vector<std::vector<i32>> part((size_t)std::max(jobs, 1));
        sais_par(jobs, [&](i32 tid, i32 nt) {
            part[tid].assign(K + 1, 0);
            const i64 per = (n + nt - 1) / nt;
            const i64 lo = (i64)tid * per;
            const i64 hi = std::min<i64>(n, lo + per);
            for (i64 i = lo; i < hi; i++) part[tid][s[i] + 1]++;
        });
        std::vector<i32> bkt(K + 1, 0);
        for (auto& p : part)
            for (i32 i = 0; i <= K; i++) bkt[i] += p[i];
        for (i32 i = 0; i < K; i++) bkt[i + 1] += bkt[i];
        for (i32 i = 0; i <= K; i++) bktHead[i] = bkt[i];
        for (i32 i = 0; i <= K; i++) bktTail[i] = (i < K) ? bkt[i + 1] : n;
    }

    auto induce = [&](const std::vector<i32>& lms) {
        sais_par(jobs, [&](i32 tid, i32 nt) {
            const i64 per = (n + nt - 1) / nt;
            const i64 lo = (i64)tid * per;
            const i64 hi = std::min<i64>(n, lo + per);
            if (lo < hi) std::fill(SA + lo, SA + hi, -1);
        });
        // place LMS suffixes at bucket tails (in given order, from the back)
        std::vector<i32> tail(bktTail);
        for (i32 i = (i32)lms.size() - 1; i >= 0; i--) {
            const i32 p = lms[i];
            SA[--tail[SP[p] & ~TB]] = p;
        }
        // induce L
        std::vector<i32> head(bktHead);
        // virtual sentinel: the suffix at n-1 is seeded manually if L-type
        {
            const T v = SP[n - 1];
            if (!(v & TB)) SA[head[v & ~TB]++] = n - 1;
        }
        // best-effort prefetch of the packed-text word a future step will
        // need: SA[i+PF] may still be unwritten/stale, which only wastes
        // the hint — the serial loop re-reads SA[i] at use time
        const i32 PF = 24;
        for (i32 i = 0; i < n; i++) {
            if (i + PF < n) {
                const i32 f = SA[i + PF];
                if (f > 0) __builtin_prefetch(&SP[f - 1]);
            }
            const i32 j = SA[i] - 1;
            if (SA[i] > 0) {
                const T v = SP[j];                  // one random load
                if (!(v & TB)) SA[head[v & ~TB]++] = j;
            }
        }
        // induce S
        std::vector<i32> tail2(bktTail);
        for (i32 i = n - 1; i >= 0; i--) {
            if (i - PF >= 0) {
                const i32 f = SA[i - PF];
                if (f > 0) __builtin_prefetch(&SP[f - 1]);
            }
            const i32 j = SA[i] - 1;
            if (SA[i] > 0) {
                const T v = SP[j];
                if (v & TB) SA[--tail2[v & ~TB]] = j;
            }
        }
    };

    // collect LMS positions in text order (block-parallel, spliced in order)
    std::vector<i32> lmsPos;
    {
        std::vector<std::vector<i32>> part((size_t)std::max(jobs, 1));
        sais_par(jobs, [&](i32 tid, i32 nt) {
            const i64 per = (n + nt - 1) / nt;
            const i64 lo = std::max<i64>(1, (i64)tid * per);
            const i64 hi = std::min<i64>(n, (i64)(tid + 1) * per);
            for (i64 i = lo; i < hi; i++)
                if (isLMS((i32)i)) part[tid].push_back((i32)i);
        });
        size_t tot = 0;
        for (auto& p : part) tot += p.size();
        lmsPos.reserve(tot);
        for (auto& p : part) lmsPos.insert(lmsPos.end(), p.begin(), p.end());
    }

    // First induction with unsorted LMS order gives LMS-substring order.
    induce(lmsPos);

    // Extract sorted LMS and name LMS substrings
    const i32 nLms = (i32)lmsPos.size();
    std::vector<i32> sortedLms;
    {
        std::vector<std::vector<i32>> part((size_t)std::max(jobs, 1));
        sais_par(jobs, [&](i32 tid, i32 nt) {
            const i64 per = (n + nt - 1) / nt;
            const i64 lo = (i64)tid * per;
            const i64 hi = std::min<i64>(n, lo + per);
            for (i64 i = lo; i < hi; i++)
                if (SA[i] > 0 && isLMS(SA[i])) part[tid].push_back(SA[i]);
        });
        sortedLms.reserve(nLms);
        for (auto& p : part)
            sortedLms.insert(sortedLms.end(), p.begin(), p.end());
    }

    if (nLms > 0) {
        // LMS-substring length per start (substring spans to the NEXT LMS
        // position inclusive): equal substrings must have equal length, so
        // compare lengths first and then packed char+type words directly —
        // no per-character isLMS probing in the compare loop
        std::vector<i32> lmsLen(nLms);
        std::vector<i32> lmsRank(n, -1);   // start pos -> index in lmsPos
        for (i32 i = 0; i < nLms; i++) {
            lmsRank[lmsPos[i]] = i;
            lmsLen[i] = (i + 1 < nLms ? lmsPos[i + 1] : n - 1) - lmsPos[i] + 1;
        }
        // adjacent-pair substring compares are independent: compute diff
        // flags in parallel, then one serial prefix-sum assigns names
        std::vector<u8> diff(nLms, 0);
        sais_par(jobs, [&](i32 tid, i32 nt) {
            const i32 per = (nLms + nt - 1) / nt;
            const i32 lo = std::max(1, tid * per);
            const i32 hi = std::min(nLms, (tid + 1) * per);
            for (i32 idx = lo; idx < hi; idx++) {
                const i32 prev = sortedLms[idx - 1];
                const i32 cur = sortedLms[idx];
                const i32 la = lmsLen[lmsRank[prev]];
                const i32 lb = lmsLen[lmsRank[cur]];
                bool d = la != lb;
                if (!d) {
                    for (i32 k = 0; k < la; k++)
                        if (SP[prev + k] != SP[cur + k]) { d = true; break; }
                }
                diff[idx] = d;
            }
        });
        std::vector<i32> name(n, -1);
        i32 counter = 0;
        for (i32 idx = 0; idx < nLms; idx++) {
            counter += diff[idx];
            name[sortedLms[idx]] = counter;
        }
        if (counter + 1 < nLms) {
            // recurse on reduced string
            std::vector<i32> s1(nLms);
            for (i32 i = 0; i < nLms; i++) s1[i] = name[lmsPos[i]];
            std::vector<i32> SA1(nLms);
            sais_core<i32>(s1.data(), SA1.data(), nLms, counter + 1, jobs);
            std::vector<i32> ordered(nLms);
            for (i32 i = 0; i < nLms; i++) ordered[i] = lmsPos[SA1[i]];
            induce(ordered);
        } else {
            induce(sortedLms);
        }
    } else {
        induce(lmsPos);
    }
}

}  // namespace

static void suffix_array_impl(const u8* src, i32* sa, i64 n, i32 jobs) {
    // SA-IS needs a unique smallest sentinel for correctness of suffix
    // (not substring) order; append one by shifting the alphabet.
    // u16 text (values 1..256 + sentinel 0): half the memory traffic of
    // an i32 copy in every induce sweep and bucket count.
    std::vector<uint16_t> s(n + 1);
    for (i64 i = 0; i < n; i++) s[i] = (uint16_t)(src[i] + 1);
    s[n] = 0;
    std::vector<i32> SA(n + 1);
    sais_core<uint16_t>(s.data(), SA.data(), (i32)(n + 1), 257, jobs);
    // drop the sentinel suffix (rank 0)
    std::memcpy(sa, SA.data() + 1, (size_t)n * sizeof(i32));
}

EXPORT void kz_suffix_array(const u8* src, i32* sa, i64 n) {
    suffix_array_impl(src, sa, n, 1);
}

// Forward BWT. dst has length n; indexes receives idxCount primary indexes.
// jobs > 1 threads the data-parallel SA-IS phases (induce sweeps stay
// serial) — used when a lone block has leftover thread budget.
EXPORT i64 kz_bwt_forward_mt(const u8* src, u8* dst, i64 n, i32* indexes,
                             i32 idxCount, i32 jobs) {
    if (n == 0) return 0;
    if (n == 1) { dst[0] = src[0]; indexes[0] = 1; return 1; }
    std::vector<i32> sa(n);
    suffix_array_impl(src, sa.data(), n, jobs < 1 ? 1 : jobs);
    const i64 st = n / idxCount;
    const i64 step = (st * idxCount != n) ? st + 1 : st;
    i64 pIdx = -1;
    for (i64 j = 0; j < n; j++) {
        const i32 s = sa[j];
        if (s % step == 0) indexes[s / step] = (i32)(j + 1);
        if (s == 0) pIdx = j;
    }
    dst[0] = src[n - 1];
    for (i64 j = 0; j < pIdx; j++)
        dst[1 + j] = src[sa[j] - 1];
    for (i64 j = pIdx + 1; j < n; j++)
        dst[j] = src[sa[j] - 1];
    indexes[0] = (i32)(pIdx + 1);
    return pIdx + 1;
}

EXPORT i64 kz_bwt_forward(const u8* src, u8* dst, i64 n, i32* indexes,
                          i32 idxCount) {
    return kz_bwt_forward_mt(src, dst, n, indexes, idxCount, 1);
}

// Inverse BWT (mergeTPSI; u32 packing for blocks up to 2^24, u40 above).
// chunks must match BWT.getBWTChunks(n) (1 if n < 256 else 8).
template <typename PK>
static bool bwt_inverse_impl(const u8* src, u8* dst, i64 n, const i32* indexes,
                             i32 chunks, i32 jobs) {
    const i64 pIdx = indexes[0];
    if (pIdx <= 0 || pIdx > n) return false;
    // >= 256 entries so the 0xFF chain-start marker ((0xFF<<8)|val0) can
    // never index past the table if a corrupt stream consumes it early
    std::vector<PK> data((size_t)std::max<i64>(n, 256));
    i64 b[256] = {0};
    for (i64 i = 0; i < n; i++) b[src[i]]++;
    i64 sum = 0;
    for (i32 i = 0; i < 256; i++) { const i64 t = b[i]; b[i] = sum; sum += t; }
    const i32 val0 = src[0];
    data[b[val0]] = (PK)((PK)0xFF << 8) | (PK)val0;
    b[val0]++;
    for (i64 i = 1; i < pIdx; i++) {
        const i32 val = src[i];
        data[b[val]] = ((PK)(i - 1) << 8) | (PK)val;
        b[val]++;
    }
    for (i64 i = pIdx; i < n; i++) {
        const i32 val = src[i];
        data[b[val]] = ((PK)i << 8) | (PK)val;
        b[val]++;
    }
    if (chunks != 8) {
        i64 t = pIdx - 1;
        for (i64 i = 0; i < n; i++) {
            const PK ptr = data[t];
            dst[i] = (u8)ptr;
            t = (i64)(ptr >> 8);
        }
        return true;
    }
    const i64 ckSize = ((n & 7) == 0) ? n >> 3 : (n >> 3) + 1;
    i64 t0[8];
    for (i32 k = 0; k < 8; k++) {
        t0[k] = (i64)indexes[k] - 1;
        if (t0[k] < 0 || t0[k] >= n) return false;
    }
    // interleave each worker's chains (memory-level parallelism within a
    // thread, thread-level parallelism across cores — BWT.java:568-674)
    auto walk = [&](i32 kfirst, i32 kstep) {
        i64 t[8], len[8];
        i32 nc = 0;
        for (i32 k = kfirst; k < 8; k += kstep) {
            t[nc] = t0[k];
            len[nc] = (k < 7) ? ckSize : n - ckSize * 7;
            nc++;
        }
        for (i64 m = 0; ; m++) {
            bool any = false;
            i32 c = 0;
            for (i32 k = kfirst; k < 8; k += kstep, c++) {
                if (m >= len[c]) continue;
                any = true;
                const PK ptr = data[t[c]];
                dst[m + ckSize * k] = (u8)ptr;
                t[c] = (i64)(ptr >> 8);
            }
            if (!any) break;
        }
    };
    if (jobs <= 1) {
        walk(0, 1);
    } else {
        if (jobs > 8) jobs = 8;
        std::vector<std::thread> ths;
        for (i32 j = 1; j < jobs; j++)
            ths.emplace_back(walk, j, jobs);
        walk(0, jobs);
        for (auto& th : ths) th.join();
    }
    return true;
}

// Big-block inverse (n >= 2^24): 5-byte packed entries ((idx << 8) | val in
// 40 bits — 1.6x less footprint/traffic than the u64 packing) and the 8
// independent LF chains split across threads (the reference parallelizes its
// big-block inversion the same way: BWT.java:568-674 InverseBiPSIv2Task).
static inline u64 rd40(const u8* a, i64 t) {
    u64 v;
    std::memcpy(&v, a + t * 5, 8);          // little-endian, 3 bytes slack
    return v & 0xFFFFFFFFFFull;
}

static bool bwt_inverse_big(const u8* src, u8* dst, i64 n,
                            const i32* indexes, i32 chunks, i32 jobs) {
    const i64 pIdx = indexes[0];
    if (pIdx <= 0 || pIdx > n) return false;
    std::vector<u8> data((size_t)n * 5 + 8);
    u8* d = data.data();
#if defined(__linux__)
    // the walk is a random pointer chase over the whole table: 2 MiB pages
    // cut the TLB miss per step (madvise-mode THP needs the hint)
    madvise((void*)(((uintptr_t)d + 4095) & ~(uintptr_t)4095),
            data.size() & ~(size_t)4095, MADV_HUGEPAGE);
#endif
    i64 b[256] = {0};
    for (i64 i = 0; i < n; i++) b[src[i]]++;
    i64 sum = 0;
    for (i32 i = 0; i < 256; i++) { const i64 t = b[i]; b[i] = sum; sum += t; }
    auto wr40 = [d](i64 j, u64 v) { std::memcpy(d + j * 5, &v, 5); };
    const i32 val0 = src[0];
    wr40(b[val0], ((u64)0xFF << 8) | (u64)val0);
    b[val0]++;
    for (i64 i = 1; i < pIdx; i++) {
        const i32 val = src[i];
        wr40(b[val], ((u64)(i - 1) << 8) | (u64)val);
        b[val]++;
    }
    for (i64 i = pIdx; i < n; i++) {
        const i32 val = src[i];
        wr40(b[val], ((u64)i << 8) | (u64)val);
        b[val]++;
    }
    if (jobs < 1) jobs = 1;
    if (jobs > 8) jobs = 8;
    // Optional bigram step table (the biPSIv2 idea, re-derived): follow the
    // psi chain two hops at build time so the walk emits TWO bytes per
    // dependent cache miss; the build's second hop is an independent
    // (overlappable) read stream, unlike the walk's serial chain.  Measured
    // on this dev VM the conversion pass costs more than it saves (the
    // virtualized memory system saturates at ~8 outstanding misses either
    // way), so it is opt-in for hardware with deeper memory parallelism.
    const char* env = std::getenv("KANZI_TPU_BWT_BIGRAM");
    const bool bigram = env && env[0] == '1';
    std::vector<u8> data2;
    u8* d2 = nullptr;
    if (bigram) {
        data2.resize((size_t)n * 6 + 8);
        d2 = data2.data();
        auto build2 = [&](i64 lo, i64 hi) {
            for (i64 t = lo; t < hi; t++) {
                const u64 e = rd40(d, t);
                const u64 e2 = rd40(d, (i64)(e >> 8));
                const u64 v = ((e2 >> 8) << 16) | ((e2 & 0xFF) << 8)
                    | (e & 0xFF);
                std::memcpy(d2 + t * 6, &v, 6);
            }
        };
        std::vector<std::thread> ths;
        const i64 per = n / jobs;
        for (i32 j = 1; j < jobs; j++)
            ths.emplace_back(build2, per * j,
                             (j == jobs - 1) ? n : per * (j + 1));
        build2(0, jobs == 1 ? n : per);
        for (auto& th : ths) th.join();
    }
    auto rd48 = [d2](i64 t) {
        u64 v;
        std::memcpy(&v, d2 + t * 6, 8);
        return v & 0xFFFFFFFFFFFFull;
    };
    if (chunks != 8) {
        i64 t = pIdx - 1;
        if (bigram) {
            i64 i = 0;
            for (; i + 1 < n; i += 2) {
                const u64 e = rd48(t);
                dst[i] = (u8)e;
                dst[i + 1] = (u8)(e >> 8);
                t = (i64)(e >> 16);
            }
            if (i < n) dst[i] = (u8)rd48(t);
        } else {
            for (i64 i = 0; i < n; i++) {
                const u64 e = rd40(d, t);
                dst[i] = (u8)e;
                t = (i64)(e >> 8);
            }
        }
        return true;
    }
    const i64 ckSize = ((n & 7) == 0) ? n >> 3 : (n >> 3) + 1;
    i64 t0[8];
    for (i32 k = 0; k < 8; k++) {
        t0[k] = (i64)indexes[k] - 1;
        if (t0[k] < 0 || t0[k] >= n) return false;
    }
    // each worker interleaves its own chains (memory-level parallelism
    // within a thread, thread-level parallelism across cores)
    auto walk = [&](i32 kfirst, i32 kstep) {
        i64 t[8], len[8];
        i32 nc = 0;
        for (i32 k = kfirst; k < 8; k += kstep) {
            t[nc] = t0[k];
            len[nc] = (k < 7) ? ckSize : n - ckSize * 7;
            nc++;
        }
        const i64 mstep = bigram ? 2 : 1;
        i64 m = 0;
        for (bool any = true; any; m += mstep) {
            any = false;
            i32 c = 0;
            for (i32 k = kfirst; k < 8; k += kstep, c++) {
                if (m >= len[c]) continue;
                any = true;
                if (bigram) {
                    const u64 e = rd48(t[c]);
                    dst[m + ckSize * k] = (u8)e;
                    if (m + 1 < len[c])
                        dst[m + 1 + ckSize * k] = (u8)(e >> 8);
                    t[c] = (i64)(e >> 16);
                } else {
                    const u64 e = rd40(d, t[c]);
                    dst[m + ckSize * k] = (u8)e;
                    t[c] = (i64)(e >> 8);
                }
            }
        }
    };
    if (jobs == 1) {
        walk(0, 1);
    } else {
        std::vector<std::thread> ths;
        for (i32 j = 1; j < jobs; j++)
            ths.emplace_back(walk, j, jobs);
        walk(0, jobs);
        for (auto& th : ths) th.join();
    }
    return true;
}

EXPORT i32 kz_bwt_inverse_mt(const u8* src, u8* dst, i64 n,
                             const i32* indexes, i32 chunks, i32 jobs) {
    if (n == 0) return 1;
    if (n == 1) { dst[0] = src[0]; return 1; }
    bool ok;
    if (n <= ((i64)1 << 24))   // u32 packs (idx<<8)|val for idx <= 2^24-1
        ok = bwt_inverse_impl<u32>(src, dst, n, indexes, chunks, jobs);
    else
        ok = bwt_inverse_big(src, dst, n, indexes, chunks, jobs);
    return ok ? 1 : 0;
}

EXPORT i32 kz_bwt_inverse(const u8* src, u8* dst, i64 n, const i32* indexes, i32 chunks) {
    return kz_bwt_inverse_mt(src, dst, n, indexes, chunks, 1);
}
