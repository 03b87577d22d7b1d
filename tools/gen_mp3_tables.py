#!/usr/bin/env python3
"""Layer III decode tables, transcribed from the public ISO 11172-3 /
ISO 13818-3 specifications (Annex B tables), with structural
validators that must all pass before the Scala emission runs:

 - every Huffman table must be a COMPLETE prefix code (Kraft sum
   exactly 1, no codeword a prefix of another) — a property of the
   true spec tables that catches transcription slips;
 - the synthesis window D (Table 3-B.3) must unbake to a SYMMETRIC
   prototype (h[n] = (-1)^(n//64) * D[n], h[n] == h[512-n]) with
   smooth second differences, and the analysis/synthesis cascade it
   defines must reconstruct a test signal to near-PR quality;
 - every scalefactor-band table must be strictly increasing and end
   exactly at 576 (long) / 192 (short).

No MP3 encoder or decoder exists in this container, so these tables
cannot be probed out of a system library the way the VP8/T.4 tables
were (tools/gen_vp8_tables.py, tools/gen_t4_tables.py); the
validators above are the conformance gate, and FIXTURES.md records
what remains externally unpinned.
"""
import math, sys

# --- synthesis window D (ISO 11172-3 Table 3-B.3), stored as the
# spec's values scaled by 2^16 (every table entry is n/65536).
# First half 0..255 plus center 256; the back half is rebuilt from the
# symmetric prototype h[n] = (-1)^(n//64) D[n], h[512-n] = h[n].
D_HALF = [
    # 0..31
    0, -1, -1, -1, -1, -1, -1, -2, -2, -2, -2, -3, -3, -4, -4, -5,
    -5, -6, -7, -7, -8, -9, -10, -11, -13, -14, -16, -17, -19, -21, -24, -26,
    # 32..63
    -29, -31, -35, -38, -41, -45, -49, -53, -58, -63, -68, -73,
    -79, -85, -91, -97, -104, -111, -117, -125, -132, -139, -147, -154,
    -161, -169, -176, -183, -190, -196, -202, -208,
    # 64..95
    213, 218, 222, 225, 227, 228, 228, 227, 224, 221, 215, 208,
    200, 189, 177, 163, 146, 127, 106, 83, 57, 29, -2, -36,
    -72, -111, -153, -197, -244, -294, -347, -401,
    # 96..127
    -459, -519, -581, -645, -711, -779, -848, -919, -991, -1064, -1137, -1210,
    -1283, -1356, -1428, -1498, -1567, -1634, -1698, -1759, -1817, -1870,
    -1919, -1962, -2001, -2032, -2057, -2075, -2085, -2087, -2080, -2063,
    # 128..159
    2037, 2000, 1952, 1893, 1822, 1739, 1644, 1535, 1414, 1280, 1131, 970,
    794, 605, 402, 185, -45, -288, -545, -814, -1095, -1388,
    -1692, -2006, -2330, -2663, -3004, -3351, -3705, -4063, -4425, -4788,
    # 160..191
    -5153, -5517, -5879, -6237, -6589, -6935, -7271, -7597, -7910, -8209,
    -8491, -8755, -8998, -9219, -9416, -9585, -9727, -9838, -9916, -9959,
    -9966, -9935, -9863, -9750, -9592, -9389, -9139, -8840, -8492, -8092,
    -7640, -7134,
    # 192..223
    6574, 5959, 5288, 4561, 3776, 2935, 2037, 1082, 70, -998, -2122, -3300,
    -4533, -5818, -7154, -8540, -9975, -11455, -12980, -14548, -16155, -17799,
    -19478, -21189, -22929, -24694, -26482, -28289, -30112, -31947,
    -33791, -35640,
    # 224..255
    -37489, -39336, -41176, -43006, -44821, -46617, -48390, -50137,
    -51853, -53534, -55178, -56778, -58333, -59838, -61289, -62684,
    -64019, -65290, -66494, -67629, -68692, -69679, -70590, -71420,
    -72169, -72835, -73415, -73908, -74313, -74630, -74856, -74992,
]
D_CENTER = 75038

def build_window():
    h = [0.0] * 513
    for n in range(256):
        h[n] = ((-1) ** (n // 64)) * D_HALF[n]
    h[256] = ((-1) ** 4) * D_CENTER
    for n in range(257, 513):
        h[n] = h[512 - n]
    D = [((-1) ** (n // 64)) * h[n] for n in range(512)]
    return h, D

def validate_window(h, D):
    errs = []
    # anchors at the 32-strides, from the printed spec table
    anchors = {0: 0, 32: -29, 64: 213, 96: -459, 128: 2037, 160: -5153,
               192: 6574, 224: -37489, 256: 75038, 288: 37489, 320: 6574,
               352: 5153, 384: 2037, 416: 459, 448: 213, 480: 29}
    for i, v in anchors.items():
        if D[i] != v:
            errs.append(f"anchor D[{i}] = {D[i]} != {v}")
    # prototype smoothness: normalized second difference bounded
    for n in range(2, 511):
        d2 = abs(h[n-1] - 2*h[n] + h[n+1])
        scale = max(60.0, abs(h[n]) * 0.2)
        if d2 > scale:
            errs.append(f"rough prototype at h[{n}]: {h[n-1]},{h[n]},{h[n+1]}")
    # near-perfect-reconstruction: run the ISO analysis filterbank
    # (window C = D/32, same prototype) against the synthesis bank and
    # measure reconstruction SNR of a broadband test signal
    Dn = [d / 65536.0 for d in D]
    Cn = [d / 32.0 for d in Dn]
    x = [math.sin(0.031 * t) + 0.5 * math.sin(0.31 * t + 1.0)
         + 0.25 * math.sin(1.7 * t + 2.0) for t in range(4096)]
    # analysis (ISO 11172-3 §3-A.1): X buffer of 512, window by C,
    # partial Y[64], matrix M[i][k] = cos((2i+1)(k-16)pi/64) -> S[32]
    X = [0.0] * 512
    V = [0.0] * 1024
    out = []
    nb = len(x) // 32
    for b in range(nb):
        blk = x[b*32:(b+1)*32]
        X = blk[::-1] + X[:-32]
        Z = [X[i] * Cn[i] for i in range(512)]
        Y = [sum(Z[i + 64*j] for j in range(8)) for i in range(64)]
        S = [sum(math.cos((2*i+1)*(k-16)*math.pi/64.0) * Y[k]
                 for k in range(64)) for i in range(32)]
        # synthesis (§3-A.2): V fifo shift, N[i][k]=cos((16+i)(2k+1)pi/64)
        V = [0.0] * 64 + V[:-64]
        for i in range(64):
            V[i] = sum(math.cos((16+i)*(2*k+1)*math.pi/64.0) * S[k]
                       for k in range(32))
        U = [0.0] * 512
        for j in range(8):
            for i in range(32):
                U[64*j+i] = V[128*j+i]
                U[64*j+32+i] = V[128*j+96+i]
        W = [U[i] * Dn[i] for i in range(512)]
        out.extend(sum(W[j + 32*i] for i in range(16)) for j in range(32))
    # the cascade delays the signal by 481 samples and scales by 1.0
    delay = 481
    n0 = 1024  # skip warmup
    err = 0.0; sig = 0.0
    for t in range(n0, len(out) - 64):
        e = out[t] - x[t - delay]
        err += e * e
        sig += x[t - delay] ** 2
    snr = 10 * math.log10(sig / err) if err > 0 else 999
    print(f"  filterbank reconstruction SNR = {snr:.1f} dB (delay {delay})")
    if snr < 80:
        errs.append(f"near-PR failed: SNR {snr:.1f} dB < 80")
    return errs

if __name__ == "__main__":
    h, D = build_window()
    errs = validate_window(h, D)
    for e in errs[:30]:
        print("WINDOW ERR:", e)
    print("window errors:", len(errs))

# --- scalefactor band boundaries (ISO 11172-3 Table B.8; ISO 13818-3
# Annex B for the LSF rates; MPEG-2.5 8/11.025/12 kHz extensions as
# shipped in the public dist10-era tables). Keyed by exact sample
# rate. 23 long boundaries (22 bands) ending at 576; 14 short
# boundaries (13 bands) ending at 192.
SFB_LONG = {
    44100: [0,4,8,12,16,20,24,30,36,44,52,62,74,90,110,134,162,196,238,288,342,418,576],
    48000: [0,4,8,12,16,20,24,30,36,42,50,60,72,88,106,128,156,190,230,276,330,384,576],
    32000: [0,4,8,12,16,20,24,30,36,44,54,66,82,102,126,156,194,240,296,364,448,550,576],
    22050: [0,6,12,18,24,30,36,44,54,66,80,96,116,140,168,200,238,284,336,396,464,522,576],
    24000: [0,6,12,18,24,30,36,44,54,66,80,96,114,136,162,194,232,278,332,394,464,540,576],
    16000: [0,6,12,18,24,30,36,44,54,66,80,96,116,140,168,200,238,284,336,396,464,522,576],
    11025: [0,6,12,18,24,30,36,44,54,66,80,96,116,140,168,200,238,284,336,396,464,522,576],
    12000: [0,6,12,18,24,30,36,44,54,66,80,96,116,140,168,200,238,284,336,396,464,522,576],
    8000:  [0,12,24,36,48,60,72,88,108,132,160,192,232,280,336,400,476,566,568,570,572,574,576],
}
SFB_SHORT = {
    44100: [0,4,8,12,16,22,30,40,52,66,84,106,136,192],
    48000: [0,4,8,12,16,22,28,38,50,64,80,100,126,192],
    32000: [0,4,8,12,16,22,30,42,58,78,104,138,180,192],
    22050: [0,4,8,12,18,24,32,42,56,74,100,132,174,192],
    24000: [0,4,8,12,18,26,36,48,62,80,104,136,180,192],
    16000: [0,4,8,12,18,26,36,48,62,80,104,134,174,192],
    11025: [0,4,8,12,18,24,32,42,56,74,100,132,174,192],
    12000: [0,4,8,12,18,26,36,48,62,80,104,136,180,192],
    8000:  [0,8,16,24,36,52,72,96,124,160,162,164,166,192],
}

# pretab (Table B.6): per-long-band pre-emphasis added when preflag set
PRETAB = [0,0,0,0,0,0,0,0,0,0,0,1,1,1,1,2,2,3,3,3,2,0]

# MPEG-1 scalefactor code lengths (Table B.5): slen1/slen2 indexed by
# the 4-bit scalefac_compress
SLEN1 = [0,0,0,0,3,1,1,1,2,2,2,3,3,3,4,4]
SLEN2 = [0,1,2,3,0,1,2,3,1,2,3,1,2,3,2,3]

def validate_sfb():
    errs = []
    for rate, t in SFB_LONG.items():
        if len(t) != 23 or t[0] != 0 or t[-1] != 576:
            errs.append(f"long {rate}: bad shape")
        if any(a >= b for a, b in zip(t, t[1:])):
            errs.append(f"long {rate}: not increasing")
    for rate, t in SFB_SHORT.items():
        if len(t) != 14 or t[0] != 0 or t[-1] != 192:
            errs.append(f"short {rate}: bad shape")
        if any(a >= b for a, b in zip(t, t[1:])):
            errs.append(f"short {rate}: not increasing")
    if len(PRETAB) != 22: errs.append("pretab length")
    return errs

if __name__ == "__main__":
    errs2 = validate_sfb()
    for e in errs2: print("SFB ERR:", e)
    print("sfb errors:", len(errs2))

# --- Layer III Huffman code tables (ISO 11172-3 Table B.7).
# Entries are (x, y, hlen, hcod) in row-major (x, y) order; hcod is
# the integer value of the code's hlen bits. Tables 4 and 14 do not
# exist; tables 17-23 reuse table 16's codes and 25-31 reuse table
# 24's, with different linbits. Each table must be a COMPLETE prefix
# code — the validator enforces Kraft == 1 and prefix-freeness.
HUFF = {}
HUFF[1] = [
    (0,0,1,0b1),(0,1,3,0b001),(1,0,2,0b01),(1,1,3,0b000)]
HUFF[2] = [
    (0,0,1,0b1),(0,1,3,0b010),(0,2,6,0b000001),
    (1,0,3,0b011),(1,1,3,0b001),(1,2,5,0b00001),
    (2,0,5,0b00011),(2,1,5,0b00010),(2,2,6,0b000000)]
HUFF[3] = [
    (0,0,2,0b11),(0,1,2,0b10),(0,2,6,0b000001),
    (1,0,3,0b001),(1,1,2,0b01),(1,2,5,0b00001),
    (2,0,5,0b00011),(2,1,5,0b00010),(2,2,6,0b000000)]
HUFF[5] = [
    (0,0,1,0b1),(0,1,3,0b010),(0,2,6,0b000110),(0,3,7,0b0000101),
    (1,0,3,0b011),(1,1,3,0b001),(1,2,6,0b000100),(1,3,7,0b0000100),
    (2,0,6,0b000111),(2,1,6,0b000101),(2,2,7,0b0000111),(2,3,8,0b00000001),
    (3,0,7,0b0000110),(3,1,6,0b000001),(3,2,7,0b0000001),(3,3,8,0b00000000)]
HUFF[6] = [
    (0,0,3,0b111),(0,1,3,0b011),(0,2,5,0b00101),(0,3,7,0b0000001),
    (1,0,3,0b110),(1,1,2,0b10),(1,2,4,0b0011),(1,3,5,0b00010),
    (2,0,4,0b0101),(2,1,4,0b0100),(2,2,5,0b00100),(2,3,6,0b000011),
    (3,0,6,0b000001),(3,1,5,0b00011),(3,2,6,0b000010),(3,3,7,0b0000000)]
HUFF[7] = [
    (0,0,1,0b1),(0,1,3,0b010),(0,2,6,0b001010),(0,3,8,0b00010011),
    (0,4,8,0b00010000),(0,5,9,0b000001010),
    (1,0,3,0b011),(1,1,4,0b0011),(1,2,6,0b000111),(1,3,7,0b0001010),
    (1,4,7,0b0000101),(1,5,8,0b00000011),
    (2,0,6,0b001011),(2,1,5,0b00100),(2,2,7,0b0001101),(2,3,8,0b00010001),
    (2,4,8,0b00001000),(2,5,9,0b000000100),
    (3,0,7,0b0001100),(3,1,7,0b0001011),(3,2,8,0b00010010),
    (3,3,9,0b000001111),(3,4,9,0b000001011),(3,5,9,0b000000010),
    (4,0,7,0b0000111),(4,1,7,0b0000110),(4,2,8,0b00001001),
    (4,3,9,0b000001110),(4,4,9,0b000000011),(4,5,10,0b0000000001),
    (5,0,8,0b00000110),(5,1,8,0b00000100),(5,2,9,0b000000101),
    (5,3,10,0b0000000011),(5,4,10,0b0000000010),(5,5,10,0b0000000000)]
HUFF[8] = [
    (0,0,2,0b11),(0,1,3,0b100),(0,2,6,0b000110),(0,3,8,0b00010010),
    (0,4,8,0b00001100),(0,5,9,0b000000101),
    (1,0,3,0b101),(1,1,2,0b01),(1,2,4,0b0010),(1,3,8,0b00010000),
    (1,4,8,0b00001001),(1,5,8,0b00000011),
    (2,0,6,0b000111),(2,1,4,0b0011),(2,2,6,0b000101),(2,3,8,0b00001110),
    (2,4,8,0b00000111),(2,5,9,0b000000011),
    (3,0,8,0b00010011),(3,1,8,0b00010001),(3,2,8,0b00001111),
    (3,3,9,0b000001101),(3,4,9,0b000001010),(3,5,10,0b0000000100),
    (4,0,8,0b00001101),(4,1,7,0b0000101),(4,2,8,0b00001000),
    (4,3,9,0b000001011),(4,4,10,0b0000000101),(4,5,10,0b0000000001),
    (5,0,9,0b000001100),(5,1,8,0b00000100),(5,2,9,0b000000100),
    (5,3,9,0b000000001),(5,4,11,0b00000000001),(5,5,11,0b00000000000)]
HUFF[9] = [
    (0,0,3,0b111),(0,1,3,0b101),(0,2,5,0b01001),(0,3,6,0b001110),
    (0,4,8,0b00001111),(0,5,9,0b000000111),
    (1,0,3,0b110),(1,1,3,0b100),(1,2,4,0b0101),(1,3,5,0b00101),
    (1,4,6,0b000110),(1,5,8,0b00000111),
    (2,0,4,0b0111),(2,1,4,0b0110),(2,2,5,0b01000),(2,3,6,0b001000),
    (2,4,7,0b0001000),(2,5,8,0b00000101),
    (3,0,6,0b001111),(3,1,5,0b00110),(3,2,6,0b001001),(3,3,7,0b0001010),
    (3,4,7,0b0000101),(3,5,8,0b00000001),
    (4,0,7,0b0001011),(4,1,6,0b000111),(4,2,7,0b0001001),(4,3,7,0b0000110),
    (4,4,8,0b00000100),(4,5,9,0b000000001),
    (5,0,8,0b00001110),(5,1,7,0b0000100),(5,2,8,0b00000110),
    (5,3,8,0b00000010),(5,4,9,0b000000110),(5,5,9,0b000000000)]

def validate_huff(name, entries, xlen, ylen):
    errs = []
    if len(entries) != xlen * ylen:
        errs.append(f"{name}: {len(entries)} entries, want {xlen*ylen}")
    seen = {}
    for (x, y, l, c) in entries:
        if c >= (1 << l):
            errs.append(f"{name}: ({x},{y}) code wider than hlen")
        bits = format(c, f"0{l}b")
        if bits in seen:
            errs.append(f"{name}: duplicate code {bits} at ({x},{y}) and {seen[bits]}")
        seen[bits] = (x, y)
    codes = sorted(seen.keys())
    for i in range(len(codes) - 1):
        if codes[i + 1].startswith(codes[i]):
            errs.append(f"{name}: {codes[i]} is a prefix of {codes[i+1]}")
    kraft = sum(2 ** -l for (_, _, l, _) in entries)
    if abs(kraft - 1.0) > 1e-12:
        errs.append(f"{name}: Kraft sum {kraft} != 1 (off by {(1-kraft)*1024:+.3f}/1024)")
    return errs

if __name__ == "__main__":
    dims = {1:(2,2),2:(3,3),3:(3,3),5:(4,4),6:(4,4),7:(6,6),8:(6,6),9:(6,6)}
    total = 0
    for t, (xl, yl) in sorted(dims.items()):
        if t not in HUFF: continue
        es = validate_huff(f"t{t}", HUFF[t], xl, yl)
        for e in es: print("HUFF ERR:", e)
        total += len(es)
    print("huff errors so far:", total)

HUFF[10] = [
    (0,0,1,0b1),(0,1,3,0b010),(0,2,6,0b001010),(0,3,8,0b00010111),
    (0,4,9,0b000100011),(0,5,9,0b000011110),(0,6,9,0b000001100),
    (0,7,10,0b0000010001),
    (1,0,3,0b011),(1,1,4,0b0011),(1,2,6,0b001000),(1,3,7,0b0001100),
    (1,4,8,0b00010010),(1,5,9,0b000010101),(1,6,8,0b00001100),
    (1,7,8,0b00000111),
    (2,0,6,0b001011),(2,1,6,0b001001),(2,2,7,0b0001111),(2,3,8,0b00010101),
    (2,4,9,0b000100000),(2,5,10,0b0000101000),(2,6,9,0b000010011),
    (2,7,9,0b000000110),
    (3,0,7,0b0001110),(3,1,7,0b0001101),(3,2,8,0b00010110),
    (3,3,9,0b000100010),(3,4,10,0b0000101110),(3,5,10,0b0000010111),
    (3,6,9,0b000010010),(3,7,10,0b0000000111),
    (4,0,8,0b00010100),(4,1,8,0b00010011),(4,2,9,0b000100001),
    (4,3,10,0b0000101111),(4,4,10,0b0000101101),(4,5,10,0b0000010110),
    (4,6,10,0b0000001001),(4,7,10,0b0000000101),
    (5,0,9,0b000011111),(5,1,9,0b000001101),(5,2,10,0b0000101001),
    (5,3,10,0b0000101100),(5,4,11,0b00000010101),(5,5,11,0b00000010100),
    (5,6,10,0b0000000011),(5,7,11,0b00000000011),
    (6,0,8,0b00001110),(6,1,8,0b00001101),(6,2,9,0b000001010),
    (6,3,10,0b0000001011),(6,4,10,0b0000010000),(6,5,10,0b0000000110),
    (6,6,11,0b00000000101),(6,7,11,0b00000000001),
    (7,0,9,0b000001001),(7,1,8,0b00001000),(7,2,9,0b000000111),
    (7,3,10,0b0000001000),(7,4,10,0b0000000100),(7,5,11,0b00000000100),
    (7,6,11,0b00000000010),(7,7,11,0b00000000000)]

# Tables 11, 12, 13, 15 and the linbits families 16-23 / 24-31 are NOT
# shipped: their 64-256 entries could not be transcribed to the
# Kraft==1 + prefix-free bar in this container (no spec text on disk,
# and no system MP3 library to probe them out of the way the VP8 /
# T.4 tables were extracted — tools/gen_vp8_tables.py precedent).
# The decoder REJECTS (returns null for) any granule selecting an
# unshipped table rather than risking silently-wrong PCM; FIXTURES.md
# records this as the externally-unpinned remainder.

# count1 region tables (Table B.7, tables A and B): quadruples
# (v,w,x,y) keyed by v*8+w*4+x*2+y.
COUNT1A = [
    (0b0000,1,0b1),   (0b0001,4,0b0101),(0b0010,4,0b0100),(0b0011,5,0b00101),
    (0b0100,4,0b0110),(0b0101,6,0b000101),(0b0110,5,0b00100),(0b0111,6,0b000100),
    (0b1000,4,0b0111),(0b1001,5,0b00011),(0b1010,5,0b00110),(0b1011,6,0b000000),
    (0b1100,5,0b00111),(0b1101,6,0b000010),(0b1110,6,0b000011),(0b1111,6,0b000001)]
# table B: every quadruple is the 4-bit one's complement of its index
COUNT1B = [(i, 4, (~i) & 0xF) for i in range(16)]

# --- MPEG-2 LSF scalefactor machinery (ISO 13818-3 §2.4.3.2): the
# 9-bit scalefac_compress decomposes into four slens and a band
# partition (nr_of_sfb) chosen by range and block shape.
# Partition rows: (normal, short, mixed) for each of the 3 ranges of
# the non-intensity branch, then the 3 ranges of the intensity branch.
LSF_NR_OF_SFB = {
    "n0": ([6,5,5,5],  [9,9,9,9],   [6,9,9,9]),
    "n1": ([6,5,7,3],  [9,9,12,6],  [6,9,12,6]),
    "n2": ([11,10,0,0],[18,18,0,0], [15,18,0,0]),
    "i0": ([7,7,7,0],  [12,12,12,0],[6,15,12,0]),
    "i1": ([6,6,6,3],  [12,9,9,6],  [6,12,9,6]),
    "i2": ([8,8,5,0],  [15,12,9,0], [6,18,9,0]),
}

def validate_count1():
    errs = []
    errs += validate_huff("count1A", [(i, 0, l, c) for (i, l, c) in COUNT1A], 16, 1)
    errs += validate_huff("count1B", [(i, 0, l, c) for (i, l, c) in COUNT1B], 16, 1)
    # LSF partitions: scalefactor count must match the long/short band
    # structure they index (21+ long bands / 12*3 short rows at most;
    # the LSF tables address sfbs beyond the 21/12 of MPEG-1 — slots
    # above the band count carry zero-width bands by spec)
    for k, (n, s, m) in LSF_NR_OF_SFB.items():
        for part in (n, s, m):
            if len(part) != 4 or any(p < 0 for p in part):
                errs.append(f"lsf {k}: bad partition {part}")
    return errs

if __name__ == "__main__":
    es = validate_huff("t10", HUFF[10], 8, 8) + validate_count1()
    for e in es: print("ERR:", e)
    print("t10+count1+lsf errors:", len(es))

# --- Scala emission -------------------------------------------------
def emit_scala(path):
    h, D = build_window()
    lines = []
    a = lines.append
    a("package graft.functions")
    a("")
    a("/** Layer III decode tables, generated by tools/gen_mp3_tables.py")
    a("  * from the public ISO 11172-3 / ISO 13818-3 Annex B tables and")
    a("  * validated there (complete prefix codes, symmetric near-PR")
    a("  * synthesis prototype, band tables ending at 576/192). Do not")
    a("  * edit by hand — regenerate. Tables 11/12/13/15 and the 16-31")
    a("  * linbits families are deliberately ABSENT (see the generator")
    a("  * header and FIXTURES.md): the decoder rejects granules that")
    a("  * select them rather than risk silently-wrong PCM. */")
    a("object Mp3Tables {")
    a("")
    a("  /** Synthesis window D (Table 3-B.3), exact n/65536 values. */")
    a("  val SynthWindow: Array[Double] = Array[Int](")
    for i in range(0, 512, 16):
        row = ", ".join(str(D[j]) for j in range(i, i + 16))
        a(f"    {row}{',' if i + 16 < 512 else ''}")
    a("  ).map(_ / 65536.0)")
    a("")
    a("  /** Long-block scalefactor band boundaries by sample rate. */")
    a("  val SfbLong: Map[Int, Array[Int]] = Map(")
    for r in sorted(SFB_LONG):
        a(f"    {r} -> Array({', '.join(map(str, SFB_LONG[r]))}),")
    a("  )")
    a("")
    a("  /** Short-block scalefactor band boundaries by sample rate. */")
    a("  val SfbShort: Map[Int, Array[Int]] = Map(")
    for r in sorted(SFB_SHORT):
        a(f"    {r} -> Array({', '.join(map(str, SFB_SHORT[r]))}),")
    a("  )")
    a("")
    a("  val Pretab: Array[Int] = Array(" + ", ".join(map(str, PRETAB)) + ")")
    a("  val Slen1: Array[Int] = Array(" + ", ".join(map(str, SLEN1)) + ")")
    a("  val Slen2: Array[Int] = Array(" + ", ".join(map(str, SLEN2)) + ")")
    a("")
    a("  /** Big-values Huffman tables: id -> (xlen, ylen, entries); an")
    a("    * entry at index x*ylen+y packs hlen<<16 | hcod. */")
    a("  val Huff: Map[Int, (Int, Int, Array[Int])] = Map(")
    dims = {1:(2,2),2:(3,3),3:(3,3),5:(4,4),6:(4,4),7:(6,6),8:(6,6),9:(6,6),10:(8,8)}
    for t in sorted(HUFF):
        xl, yl = dims[t]
        packed = [0] * (xl * yl)
        for (x, y, l, c) in HUFF[t]:
            packed[x * yl + y] = (l << 16) | c
        a(f"    {t} -> (({xl}, {yl}, Array(")
        for i in range(0, len(packed), 12):
            row = ", ".join(str(v) for v in packed[i:i+12])
            a(f"      {row}{',' if i + 12 < len(packed) else ''}")
        a("    ))),")
    a("  )")
    a("")
    a("  /** count1 quadruple tables A and B: hlen<<16 | hcod by the")
    a("    * 4-bit (v,w,x,y) index. */")
    c1a = [0]*16
    for (i, l, c) in COUNT1A: c1a[i] = (l << 16) | c
    c1b = [0]*16
    for (i, l, c) in COUNT1B: c1b[i] = (l << 16) | c
    a("  val Count1A: Array[Int] = Array(" + ", ".join(map(str, c1a)) + ")")
    a("  val Count1B: Array[Int] = Array(" + ", ".join(map(str, c1b)) + ")")
    a("")
    a("  /** LSF scalefactor band partitions (ISO 13818-3 2.4.3.2):")
    a("    * rows n0/n1/n2 (non-intensity ranges) and i0/i1/i2")
    a("    * (intensity), each (normal, short, mixed). */")
    a("  val LsfNrOfSfb: Map[String, (Array[Int], Array[Int], Array[Int])] = Map(")
    for k in ("n0","n1","n2","i0","i1","i2"):
        n, s, m = LSF_NR_OF_SFB[k]
        a(f'    "{k}" -> ((Array({", ".join(map(str,n))}), '
          f'Array({", ".join(map(str,s))}), Array({", ".join(map(str,m))}))),')
    a("  )")
    a("}")
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")
    print("wrote", path, len(lines), "lines")

if __name__ == "__main__":
    all_errs = (validate_window(*build_window()) + validate_sfb()
                + validate_count1())
    dims = {1:(2,2),2:(3,3),3:(3,3),5:(4,4),6:(4,4),7:(6,6),8:(6,6),9:(6,6),10:(8,8)}
    for t, (xl, yl) in sorted(dims.items()):
        all_errs += validate_huff(f"t{t}", HUFF[t], xl, yl)
    if all_errs:
        print("VALIDATION FAILED:", all_errs)
        sys.exit(1)
    emit_scala("src/main/scala/graft/functions/Mp3Tables.scala")
