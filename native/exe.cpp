// EXE codec: x86 and ARM64 branch-target rewriting (relative -> absolute).
// Semantics re-derived from K/transform/EXECodec.java:35-1013 (v4+ format):
//   output: [arch byte X86=0x40|ARM64=0x20][u32le codeStart][u32le codeEnd]
//           [pre-code raw][rewritten code][tail raw]
//   x86: E8/E9 and 0x0F 0x8x with sign byte 00/FF become opcode + big-endian
//        (absoluteAddr ^ 0xF0F0F0F0); 0x9B escapes literals
//   arm64: B/BL offsets become absolute (addr>>2) in the opcode
// Architecture detected via PE/ELF/Mach-O headers or jump histograms.

#include <cstdint>
#include <cstring>
#include <algorithm>

#if defined(_MSC_VER)
#define EXPORT extern "C" __declspec(dllexport)
#else
#define EXPORT extern "C" __attribute__((visibility("default")))
#endif

typedef uint8_t u8;
typedef int16_t i16;
typedef int32_t i32;
typedef uint32_t u32;
typedef int64_t i64;
typedef uint64_t u64;

namespace exec {

static const u8 X86_MASK_JUMP = 0xFE;
static const u8 X86_INSTRUCTION_JUMP = 0xE8;
static const u8 X86_INSTRUCTION_JCC = 0x80;
static const u8 X86_TWO_BYTE_PREFIX = 0x0F;
static const u8 X86_MASK_JCC = 0xF0;
static const u8 X86_ESCAPE = 0x9B;
static const i32 NOT_EXE = 0x80;
static const i32 X86 = 0x40;
static const i32 ARM64 = 0x20;
static const i32 X86_ADDR_MASK = (1 << 24) - 1;
static const i32 MASK_ADDRESS = (i32)0xF0F0F0F0;
static const i32 ARM_B_ADDR_MASK = (1 << 26) - 1;
static const i32 ARM_B_OPCODE_MASK = (i32)(0xFFFFFFFF ^ ARM_B_ADDR_MASK);
static const i32 ARM_B_ADDR_SGN_MASK = 1 << 25;
static const i32 ARM_OPCODE_B = 0x14000000;
static const i32 ARM_OPCODE_BL = (i32)0x94000000;
static const i32 ARM_CB_ADDR_MASK = 0x00FFFFE0;
static const i32 ARM_CB_OPCODE_MASK = 0x7F000000;
static const i32 ARM_OPCODE_CBZ = 0x34000000;
static const i32 ARM_OPCODE_CBNZ = 0x3500000;
static const i64 MIN_BLOCK_SIZE = 4096;
static const i64 MAX_BLOCK_SIZE = (1LL << 28) - 1;

static inline i32 rdle32(const u8* p) { i32 v; std::memcpy(&v, p, 4); return v; }
static inline i16 rdle16(const u8* p) { i16 v; std::memcpy(&v, p, 2); return v; }
static inline i64 rdle64(const u8* p) { i64 v; std::memcpy(&v, p, 8); return v; }
static inline i32 rdbe32(const u8* p) {
    return ((i32)p[0] << 24) | ((i32)p[1] << 16) | ((i32)p[2] << 8) | (i32)p[3];
}
static inline i16 rdbe16(const u8* p) { return (i16)(((i32)p[0] << 8) | p[1]); }
static inline i64 rdbe64(const u8* p) {
    i64 v = 0; for (int i = 0; i < 8; i++) v = (v << 8) | p[i]; return v;
}
static inline void wrle32(u8* p, i32 v) { std::memcpy(p, &v, 4); }
static inline void wrbe32(u8* p, i32 v) {
    p[0] = (u8)((u32)v >> 24); p[1] = (u8)(v >> 16); p[2] = (u8)(v >> 8); p[3] = (u8)v;
}

struct Ctx {
    i64 codeStart, codeEnd;
    i32 arch;
};

static bool set_code_range(Ctx& C, i64 count, i64 rangeStart, i64 rangeLength,
                           bool updateStart) {
    if (rangeStart < 0 || rangeLength < 0 || rangeStart > count ||
        rangeLength > count - rangeStart)
        return false;
    const i64 absStart = rangeStart;
    const i64 absEnd = absStart + rangeLength;
    if (absEnd < absStart || absEnd > 0x7FFFFFFFLL) return false;
    if (updateStart || C.codeStart == 0) C.codeStart = absStart;
    C.codeEnd = absEnd;
    return true;
}

// Magic numbers needed here
static const i32 MG_WIN = 0x4D5A;
static const i32 MG_ELF = 0x7F454C46;
static const i32 MG_MAC32 = (i32)0xFEEDFACE, MG_MAC_C32 = (i32)0xCEFAEDFE;
static const i32 MG_MAC64 = (i32)0xFEEDFACF, MG_MAC_C64 = (i32)0xCFFAEDFE;
static const i32 WIN_PE = 0x00004550;

static bool parse_header(Ctx& C, const u8* src, i64 count) {
    if (count < 4) return false;
    const i32 key = rdbe32(src);
    const i32 key16 = (i32)((u32)key >> 16);
    if (key16 == MG_WIN) {
        if (count >= 64) {
            C.arch = rdle32(src + 18);
            const i32 posPE = rdle32(src + 60);
            if (posPE > 0 && posPE <= count - 48 && rdle32(src + posPE) == WIN_PE) {
                if (!set_code_range(C, count, rdle32(src + posPE + 44),
                                    rdle32(src + posPE + 28), true))
                    return false;
                C.arch = rdle16(src + posPE + 4) & 0xFFFF;
            }
            return true;
        }
    } else if (key == MG_ELF) {
        const bool le = src[5] == 1;
        if (count >= 64) {
            C.codeStart = 0;
            auto r16 = [&](i64 o) { return le ? (i32)(rdle16(src + o) & 0xFFFF)
                                              : (i32)(rdbe16(src + o) & 0xFFFF); };
            auto r32 = [&](i64 o) { return le ? rdle32(src + o) : rdbe32(src + o); };
            auto r64 = [&](i64 o) { return le ? rdle64(src + o) : rdbe64(src + o); };
            if (src[4] == 2) {  // 64 bits
                const i32 nbEntries = r16(0x3C);
                const i32 szEntry = r16(0x3A);
                const i64 posSection = r64(0x28);
                if (szEntry <= 0 || posSection < 0 || posSection > count - 0x28)
                    return false;
                for (i32 i = 0; i < nbEntries; i++) {
                    const i64 entry = posSection + (i64)i * szEntry;
                    if (entry < 0 || entry > count - 0x28) return false;
                    const i32 typeSection = r32(entry + 4);
                    const i64 offSection = r64(entry + 0x18);
                    const i64 lenSection = r64(entry + 0x20);
                    if (typeSection == 1 && lenSection >= 64)
                        if (!set_code_range(C, count, offSection, lenSection, false))
                            return false;
                }
            } else {  // 32 bits
                const i32 nbEntries = r16(0x30);
                const i32 szEntry = r16(0x2E);
                const i64 posSection = r32(0x20);
                if (szEntry <= 0 || posSection < 0 || posSection > count - 0x18)
                    return false;
                for (i32 i = 0; i < nbEntries; i++) {
                    const i64 entry = posSection + (i64)i * szEntry;
                    if (entry < 0 || entry > count - 0x18) return false;
                    const i32 typeSection = r32(entry + 4);
                    const i64 offSection = (u32)r32(entry + 0x10);
                    const i64 lenSection = (u32)r32(entry + 0x14);
                    if (typeSection == 1 && lenSection >= 64)
                        if (!set_code_range(C, count, offSection, lenSection, false))
                            return false;
                }
            }
            C.arch = rdle16(src + 18) & 0xFFFF;
            C.codeStart = std::min(C.codeStart, count);
            C.codeEnd = std::min(C.codeEnd, count);
            return true;
        }
    } else if (key == MG_MAC32 || key == MG_MAC_C32 || key == MG_MAC64 || key == MG_MAC_C64) {
        const bool is64 = (key == MG_MAC64) || (key == MG_MAC_C64);
        C.codeStart = 0;
        if (count >= 64) {
            if (rdle32(src + 12) != 0x02) return false;  // MH_EXECUTE
            C.arch = rdle32(src + 4);
            const i32 nbCmds = rdle32(src + 0x10);
            i64 pos = is64 ? 0x20 : 0x1C;
            i32 cmd = 0;
            while (cmd < nbCmds) {
                if (pos > count - 8) return false;
                const i32 ldCmd = rdle32(src + pos);
                const i32 szCmd = rdle32(src + pos + 4);
                const i32 szSegHdr = is64 ? 0x48 : 0x38;
                if (szCmd < 8 || szCmd > count - pos) return false;
                if (ldCmd == 0x01 || ldCmd == 0x19) {
                    if (pos > count - 14 || pos > count - szSegHdr) return false;
                    const u64 nameSeg = (u64)rdbe64(src + pos + 8) >> 16;
                    if (nameSeg == 0x5F5F54455854ULL) {  // "__TEXT"
                        const i64 posSection = pos + szSegHdr;
                        const i32 minSz = is64 ? 0x38 : 0x30;
                        if (posSection > count - minSz) return false;
                        const u64 nameSect = (u64)rdbe64(src + posSection) >> 16;
                        if (nameSect == 0x5F5F74657874ULL) {  // "__text"
                            if (is64) {
                                if (!set_code_range(C, count, rdle64(src + posSection + 0x30),
                                                    (u32)rdle32(src + posSection + 0x28), true))
                                    return false;
                            } else {
                                if (!set_code_range(C, count, (u32)rdle32(src + posSection + 0x2C),
                                                    (u32)rdle32(src + posSection + 0x28), true))
                                    return false;
                            }
                            break;
                        }
                    }
                }
                cmd++;
                pos += szCmd;
            }
            C.codeStart = std::min(C.codeStart, count);
            C.codeEnd = std::min(C.codeEnd, count);
            return true;
        }
    }
    return false;
}

// DataType ordinals matching kanzi_tpu.core.globals.DataType
enum { DT_UNDEFINED = 0, DT_BIN = 7 };

static i32 detect_simple_type(const i64* f0, i64 count) {
    static const char* dna = "acgntuACGNTU";
    static const char* num = "0123456789+-*/=,.:; ";
    static const char* b64 =
        "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789+/";
    i64 sum = 0;
    for (i32 i = 0; i < 12; i++) sum += f0[(u8)dna[i]];
    if (sum > count - count / 12) return 6;
    sum = 0;
    for (i32 i = 0; i < 20; i++) sum += f0[(u8)num[i]];
    if (sum == count) return 4;
    sum = (f0[0x3D] == 1) ? 1 : 0;
    for (i32 i = 0; i < 64; i++) sum += f0[(u8)b64[i]];
    if (sum == count) return 5;
    i32 nsym = 0;
    for (i32 i = 0; i < 256; i++) nsym += (f0[i] > 0) ? 1 : 0;
    if (nsym == 256) return 7;
    if (nsym <= 4) return 9;
    return 0;
}

static i32 detect_type(Ctx& C, const u8* src, i64 count) {
    C.arch = 0;
    const bool parsed = parse_header(C, src, count);
    if (parsed) {
        if (C.codeStart < 0 || C.codeStart > count || C.codeEnd < C.codeStart ||
            C.codeEnd > count)
            return NOT_EXE | DT_UNDEFINED;
        switch (C.arch) {
            case 0x03: case 0x3E: case 0x014C: case 0x8664: case 0x1000007:
                return X86;
            case 0xB7: case 0xAA64: case 0x100000C:
                return ARM64;
            default: break;
        }
    }
    if (C.codeStart < 0 || C.codeStart > count || C.codeEnd < C.codeStart ||
        C.codeEnd > count)
        return NOT_EXE | DT_UNDEFINED;
    if (count <= 0) return NOT_EXE | DT_UNDEFINED;
    i64 jumpsX86 = 0, jumpsARM64 = 0;
    i64 histo[256] = {0};
    for (i64 i = 0; i < count; i++) {
        histo[src[i]]++;
        if ((i + 4 < count) && ((src[i] & X86_MASK_JUMP) == X86_INSTRUCTION_JUMP)) {
            const i32 b = src[i + 4];
            if (b == 0 || b == 0xFF) jumpsX86++;
        } else if (src[i] == X86_TWO_BYTE_PREFIX && i + 1 < count) {
            i64 j = i + 1;
            if ((src[j] == 0x38 || src[j] == 0x3A) && j + 1 < count) j++;
            if ((src[j] & X86_MASK_JCC) == X86_INSTRUCTION_JCC) { jumpsX86++; i = j; }
            else i = j;
        }
        if ((i & 3) != 0 || i + 4 > count) continue;
        const i32 instr = rdle32(src + i);
        const i32 op1 = instr & ARM_B_OPCODE_MASK;
        const i32 op2 = instr & ARM_CB_OPCODE_MASK;
        if (op1 == ARM_OPCODE_B || op1 == ARM_OPCODE_BL || op2 == ARM_OPCODE_CBZ ||
            op2 == ARM_OPCODE_CBNZ)
            jumpsARM64++;
    }
    const i32 dt = detect_simple_type(histo, count);
    if (dt != DT_BIN) return NOT_EXE | dt;
    i64 smallVals = 0;
    for (i32 i = 0; i < 16; i++) smallVals += histo[i];
    if (histo[0] < count / 10 || smallVals > count / 2 || histo[255] < count / 100)
        return NOT_EXE | dt;
    if (jumpsX86 >= count / 200) return X86;
    if (jumpsARM64 >= count / 200) return ARM64;
    return NOT_EXE | dt;
}

}  // namespace exec

using namespace exec;

// Returns encoded size, -1 decline. dt_out = detected data type ordinal
// (negative = none).  dst cap must be >= count + count/8 + 32.
EXPORT i64 kz_exe_forward(const u8* src, i64 count, u8* dst, i64 cap, i32* dt_out) {
    *dt_out = -1;
    if (count < MIN_BLOCK_SIZE || count > MAX_BLOCK_SIZE) return -1;
    Ctx C{0, count, 0};
    C.codeStart = 0;
    C.codeEnd = count;
    const i32 mode = detect_type(C, src, count);
    if (mode & NOT_EXE) {
        *dt_out = mode & 0x0F;
        return -1;
    }
    *dt_out = 3;  // EXE
    const i64 dstLen = cap;
    if (mode == X86) {
        dst[0] = (u8)X86;
        i64 srcIdx = C.codeStart;
        i64 dstIdx = 9;
        const i64 dstEnd = dstLen - 5;
        bool boundaryReached = false;
        i64 matches = 0;
        if (C.codeStart > 0) {
            std::memcpy(dst + dstIdx, src, C.codeStart);
            dstIdx += C.codeStart;
        }
        while (srcIdx < C.codeEnd && dstIdx < dstEnd) {
            if (src[srcIdx] == X86_TWO_BYTE_PREFIX) {
                if (srcIdx + 1 >= C.codeEnd) { boundaryReached = true; break; }
                if ((src[srcIdx + 1] & X86_MASK_JCC) == X86_INSTRUCTION_JCC) {
                    if (srcIdx + 5 >= C.codeEnd) { boundaryReached = true; break; }
                }
                dst[dstIdx++] = src[srcIdx++];
                if ((src[srcIdx] & X86_MASK_JCC) != X86_INSTRUCTION_JCC) {
                    if (src[srcIdx] == X86_ESCAPE) dst[dstIdx++] = X86_ESCAPE;
                    dst[dstIdx++] = src[srcIdx++];
                    continue;
                }
                if (srcIdx + 4 >= C.codeEnd) { boundaryReached = true; break; }
            } else if ((src[srcIdx] & X86_MASK_JUMP) != X86_INSTRUCTION_JUMP) {
                if (src[srcIdx] == X86_ESCAPE) dst[dstIdx++] = X86_ESCAPE;
                dst[dstIdx++] = src[srcIdx++];
                continue;
            } else if (srcIdx + 4 >= C.codeEnd) {
                boundaryReached = true;
                break;
            }
            const i32 sgn = src[srcIdx + 4];
            const i32 offset = rdle32(src + srcIdx + 1);
            if ((sgn != 0 && sgn != 0xFF) || (offset == (i32)0xFF000000)) {
                dst[dstIdx++] = X86_ESCAPE;
                dst[dstIdx++] = src[srcIdx++];
                continue;
            }
            const i32 addr = (i32)srcIdx + ((sgn == 0) ? offset : -((-offset) & X86_ADDR_MASK));
            dst[dstIdx++] = src[srcIdx++];
            wrbe32(dst + dstIdx, addr ^ MASK_ADDRESS);
            srcIdx += 4;
            dstIdx += 4;
            matches++;
        }
        if (matches < 16 || (srcIdx < C.codeEnd && !boundaryReached)) return -1;
        if (dstIdx + (count - srcIdx) > dstEnd) return -1;
        wrle32(dst + 1, (i32)C.codeStart);
        wrle32(dst + 5, (i32)dstIdx);
        std::memcpy(dst + dstIdx, src + srcIdx, count - srcIdx);
        dstIdx += count - srcIdx;
        if (dstIdx > count + count / 50) return -1;
        return dstIdx;
    }
    // ARM64
    dst[0] = (u8)ARM64;
    i64 srcIdx = C.codeStart;
    i64 dstIdx = 9;
    const i64 dstEnd = dstLen - 8;
    i64 matches = 0;
    if (C.codeStart > 0) {
        std::memcpy(dst + dstIdx, src, C.codeStart);
        dstIdx += C.codeStart;
    }
    while (srcIdx + 4 <= C.codeEnd && dstIdx < dstEnd) {
        const i32 instr = rdle32(src + srcIdx);
        const i32 op1 = instr & ARM_B_OPCODE_MASK;
        const bool isBL = (op1 == ARM_OPCODE_B) || (op1 == ARM_OPCODE_BL);
        if (!isBL) {
            std::memcpy(dst + dstIdx, src + srcIdx, 4);
            srcIdx += 4;
            dstIdx += 4;
            continue;
        }
        const i32 offset = instr & ARM_B_ADDR_MASK;
        const i32 sgn = instr & ARM_B_ADDR_SGN_MASK;
        i32 addr = (i32)srcIdx + 4 * ((sgn == 0) ? offset : (ARM_B_OPCODE_MASK | offset));
        if (addr < 0) addr = 0;
        const i32 val = op1 | ((u32)addr >> 2);
        if (addr == 0) {
            wrle32(dst + dstIdx, val);
            std::memcpy(dst + dstIdx + 4, src + srcIdx, 4);
            srcIdx += 4;
            dstIdx += 8;
            continue;
        }
        wrle32(dst + dstIdx, val);
        srcIdx += 4;
        dstIdx += 4;
        matches++;
    }
    if (matches < 16 || (srcIdx + 4 <= C.codeEnd && dstIdx >= dstEnd)) return -1;
    if (dstIdx + (count - srcIdx) > dstEnd) return -1;
    wrle32(dst + 1, (i32)C.codeStart);
    wrle32(dst + 5, (i32)dstIdx);
    std::memcpy(dst + dstIdx, src + srcIdx, count - srcIdx);
    dstIdx += count - srcIdx;
    if (dstIdx > count + count / 50) return -1;
    return dstIdx;
}

EXPORT i64 kz_exe_inverse(const u8* src, i64 count, u8* dst, i64 cap) {
    if (count < 9) return -1;
    const u8 mode = src[0];
    const i64 end = count;
    i64 srcIdx = 9;
    i64 dstIdx = 0;
    const i64 codeStart = rdle32(src + 1);
    const i64 codeEnd = rdle32(src + 5);
    if (codeStart < 0 || codeEnd < srcIdx || codeEnd > end ||
        codeStart > codeEnd - 9 || codeStart > cap)
        return -1;
    if (mode == X86) {
        if (codeStart > 0) {
            std::memcpy(dst, src + 9, codeStart);
            srcIdx += codeStart;
            dstIdx += codeStart;
        }
        while (srcIdx < codeEnd) {
            if (src[srcIdx] == X86_TWO_BYTE_PREFIX) {
                if (srcIdx + 1 >= codeEnd) {
                    if (dstIdx >= cap) return -1;
                    dst[dstIdx++] = src[srcIdx++];
                    break;
                }
                if (dstIdx >= cap) return -1;
                dst[dstIdx++] = src[srcIdx++];
                if ((src[srcIdx] & X86_MASK_JCC) != X86_INSTRUCTION_JCC) {
                    if (src[srcIdx] == X86_ESCAPE) {
                        srcIdx++;
                        if (srcIdx >= codeEnd) return -1;
                    }
                    if (dstIdx >= cap) return -1;
                    dst[dstIdx++] = src[srcIdx++];
                    continue;
                }
            } else if ((src[srcIdx] & X86_MASK_JUMP) != X86_INSTRUCTION_JUMP) {
                if (src[srcIdx] == X86_ESCAPE) {
                    srcIdx++;
                    if (srcIdx >= codeEnd) return -1;
                }
                if (dstIdx >= cap) return -1;
                dst[dstIdx++] = src[srcIdx++];
                continue;
            }
            if (srcIdx + 4 >= codeEnd) return -1;
            if (dstIdx + 5 > cap) return -1;
            const i32 addr = rdbe32(src + srcIdx + 1) ^ MASK_ADDRESS;
            const i64 offset = (i64)addr - dstIdx;
            const i32 enc = (offset >= 0) ? (i32)offset : -(i32)((-offset) & X86_ADDR_MASK);
            dst[dstIdx++] = src[srcIdx++];
            wrle32(dst + dstIdx, enc);
            srcIdx += 4;
            dstIdx += 4;
        }
        if (dstIdx + (end - srcIdx) > cap) return -1;
        std::memcpy(dst + dstIdx, src + srcIdx, end - srcIdx);
        return dstIdx + (end - srcIdx);
    }
    if (mode != ARM64) return -1;
    if (codeStart > 0) {
        std::memcpy(dst, src + 9, codeStart);
        dstIdx += codeStart;
        srcIdx += codeStart;
    }
    while (srcIdx < codeEnd) {
        if (srcIdx + 4 > codeEnd) return -1;
        if (dstIdx + 4 > cap) return -1;
        const i32 instr = rdle32(src + srcIdx);
        const i32 op1 = instr & ARM_B_OPCODE_MASK;
        const bool isBL = (op1 == ARM_OPCODE_B) || (op1 == ARM_OPCODE_BL);
        if (!isBL) {
            std::memcpy(dst + dstIdx, src + srcIdx, 4);
            srcIdx += 4;
            dstIdx += 4;
            continue;
        }
        const i32 addr = (instr & ARM_B_ADDR_MASK) << 2;
        const i32 offset = (i32)((addr - dstIdx) >> 2);
        const i32 val = op1 | (offset & ARM_B_ADDR_MASK);
        if (addr == 0) {
            if (srcIdx + 8 > codeEnd) return -1;
            std::memcpy(dst + dstIdx, src + srcIdx + 4, 4);
            srcIdx += 8;
            dstIdx += 4;
            continue;
        }
        wrle32(dst + dstIdx, val);
        srcIdx += 4;
        dstIdx += 4;
    }
    if (dstIdx + (end - srcIdx) > cap) return -1;
    std::memcpy(dst + dstIdx, src + srcIdx, end - srcIdx);
    return dstIdx + (end - srcIdx);
}
