#!/usr/bin/env python3
"""Generate EXTERNAL WebP conformance fixtures with the system libwebp
(an independent, real-world codec — the same role DuckDB plays for SQL).

Run once (committed outputs live in src/test/resources/external/):
    python3 tools/gen_webp_fixtures.py

For every generated file this writes:
  <name>.webp          encoder output of system libwebp
  <name>.rgba          the RGBA the fixture encodes (lossless inputs) or
                       libwebp's own decode (lossy), 4*w*h bytes row-major
  <name>.yuv           (lossy only) libwebp's YUV420 decode: w*h luma
                       bytes, then ceil(w/2)*ceil(h/2) U bytes, then V —
                       the RFC 6386 output planes, pre-upsampling
  <name>.meta          one line: "w h"

Environment seen at generation time: libwebp 1.2.4
(/usr/lib/x86_64-linux-gnu/libwebp.so.7.1.5, Debian). VP8/VP8L decode
is bit-exact by spec, so any conformant decoder must reproduce these
bytes exactly.
"""
import ctypes, os, hashlib

LIB = ctypes.CDLL("/usr/lib/x86_64-linux-gnu/libwebp.so.7")
OUT = os.path.join(os.path.dirname(__file__), "..",
                   "src", "test", "resources", "external")

LIB.WebPEncodeLosslessRGBA.restype = ctypes.c_size_t
LIB.WebPEncodeRGB.restype = ctypes.c_size_t
LIB.WebPEncodeRGB.argtypes = [ctypes.c_char_p, ctypes.c_int, ctypes.c_int,
                              ctypes.c_int, ctypes.c_float,
                              ctypes.POINTER(ctypes.POINTER(ctypes.c_ubyte))]
LIB.WebPDecodeRGBA.restype = ctypes.POINTER(ctypes.c_ubyte)
LIB.WebPDecodeYUV.restype = ctypes.POINTER(ctypes.c_ubyte)


def mix(i):  # deterministic byte noise (no RNG state to pin)
    x = (i * 2654435761) & 0xFFFFFFFF
    x ^= x >> 15
    x = (x * 2246822519) & 0xFFFFFFFF
    x ^= x >> 13
    return x & 0xFF


def gradient_rgba(w, h):
    px = bytearray()
    for y in range(h):
        for x in range(w):
            px += bytes((min(255, x * 8), min(255, y * 8),
                         (x * 3 + y * 5) % 256, 255))
    return bytes(px)


def palette_rgba(w, h):
    cols = [(255, 0, 0, 255), (0, 255, 0, 255), (0, 0, 255, 255),
            (255, 255, 0, 128), (0, 0, 0, 0)]
    px = bytearray()
    for y in range(h):
        for x in range(w):
            px += bytes(cols[(x // 3 + y // 2) % len(cols)])
    return bytes(px)


def noise_rgba(w, h, opaque=True):
    px = bytearray()
    for i in range(w * h):
        px += bytes((mix(4 * i), mix(4 * i + 1), mix(4 * i + 2),
                     255 if opaque else mix(4 * i + 3)))
    return bytes(px)


def smooth_rgb(w, h):
    px = bytearray()
    for y in range(h):
        for x in range(w):
            r = (x * 255) // max(1, w - 1)
            g = (y * 255) // max(1, h - 1)
            b = 128 + (50 if (x // 8 + y // 8) % 2 == 0 else -50)
            px += bytes((r, g, b))
    return bytes(px)


def detail_rgb(w, h):
    px = bytearray()
    for y in range(h):
        for x in range(w):
            edge = 255 if (x % 7 == 0 or y % 5 == 0) else 0
            px += bytes(((edge + mix(3 * (y * w + x))) // 2,
                         (x * y) % 256,
                         mix(3 * (y * w + x) + 2)))
    return bytes(px)


def write(name, **files):
    for ext, data in files.items():
        with open(os.path.join(OUT, f"{name}.{ext}"), "wb") as f:
            f.write(data)


def lossless(name, rgba, w, h):
    out = ctypes.POINTER(ctypes.c_ubyte)()
    n = LIB.WebPEncodeLosslessRGBA(rgba, w, h, 4 * w, ctypes.byref(out))
    assert n > 0
    enc = bytes(out[i] for i in range(n))
    # self-check: libwebp round-trips its own file to the input
    ww = ctypes.c_int(); hh = ctypes.c_int()
    p = LIB.WebPDecodeRGBA(enc, n, ctypes.byref(ww), ctypes.byref(hh))
    dec = bytes(p[i] for i in range(w * h * 4))
    assert (ww.value, hh.value) == (w, h) and dec == rgba, name
    write(name, webp=enc, rgba=rgba, meta=f"{w} {h}".encode())
    print(f"{name}: {n}B lossless {w}x{h} rgba_md5="
          f"{hashlib.md5(rgba).hexdigest()}")


def lossy(name, rgb, w, h, q):
    out = ctypes.POINTER(ctypes.c_ubyte)()
    n = LIB.WebPEncodeRGB(rgb, w, h, 3 * w, ctypes.c_float(q),
                          ctypes.byref(out))
    assert n > 0
    enc = bytes(out[i] for i in range(n))
    ww = ctypes.c_int(); hh = ctypes.c_int()
    p = LIB.WebPDecodeRGBA(enc, n, ctypes.byref(ww), ctypes.byref(hh))
    rgba = bytes(p[i] for i in range(w * h * 4))
    u = ctypes.POINTER(ctypes.c_ubyte)(); v = ctypes.POINTER(ctypes.c_ubyte)()
    stride = ctypes.c_int(); uvs = ctypes.c_int()
    yp = LIB.WebPDecodeYUV(enc, n, ctypes.byref(ww), ctypes.byref(hh),
                           ctypes.byref(u), ctypes.byref(v),
                           ctypes.byref(stride), ctypes.byref(uvs))
    uw, uh = (w + 1) // 2, (h + 1) // 2
    yuv = bytes(yp[r * stride.value + c] for r in range(h)
                for c in range(w))
    yuv += bytes(u[r * uvs.value + c] for r in range(uh) for c in range(uw))
    yuv += bytes(v[r * uvs.value + c] for r in range(uh) for c in range(uw))
    write(name, webp=enc, rgba=rgba, yuv=yuv, meta=f"{w} {h}".encode())
    print(f"{name}: {n}B lossy q{q} {w}x{h} yuv_md5="
          f"{hashlib.md5(yuv).hexdigest()}")


if __name__ == "__main__":
    os.makedirs(OUT, exist_ok=True)
    lossless("vp8l_gradient", gradient_rgba(33, 17), 33, 17)
    lossless("vp8l_palette", palette_rgba(29, 23), 29, 23)
    lossless("vp8l_noise", noise_rgba(24, 24), 24, 24)
    lossless("vp8l_alpha_noise", noise_rgba(21, 19, opaque=False), 21, 19)
    lossy("vp8_smooth", smooth_rgb(48, 32), 48, 32, 75.0)
    lossy("vp8_tiny", smooth_rgb(16, 16), 16, 16, 20.0)
    lossy("vp8_detail", detail_rgb(80, 48), 80, 48, 90.0)
    lossy("vp8_odd", smooth_rgb(37, 21), 37, 21, 60.0)
