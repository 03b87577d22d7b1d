#!/usr/bin/env python3
"""Generate animated-WebP conformance fixtures: ANIM/ANMF containers
assembled per the public WebP container spec (RFC 9649) around REAL
system-libwebp frame payloads (lossless VP8L and lossy VP8+ALPH chunks
extracted from single-image encodes), plus the expected composited
canvases.

Frame pixel truth comes from libwebp's own decode of each frame file;
the inter-frame COMPOSITING contract (blend / dispose) is the
container spec's alpha-blend formula fixed to exact integer arithmetic
(documented in Webp.decodeAnimation and mirrored here):

    wS = Sa*255;  wD = Da*(255-Sa);  denom = wS + wD
    outA = (denom + 127) // 255
    out.rgb = (Sr*wS + Dr*wD + denom//2) // denom   (0 if denom == 0)

Outputs <name>.webp, <name>.frames (concatenated w*h*4 RGBA canvases),
<name>.meta ("w h nframes") into src/test/resources/external/.
"""
import ctypes, os, struct

LIB = ctypes.CDLL("/usr/lib/x86_64-linux-gnu/libwebp.so.7")
LIB.WebPEncodeLosslessRGBA.restype = ctypes.c_size_t
LIB.WebPEncodeRGBA.restype = ctypes.c_size_t
LIB.WebPEncodeRGBA.argtypes = [ctypes.c_char_p, ctypes.c_int, ctypes.c_int,
                               ctypes.c_int, ctypes.c_float,
                               ctypes.POINTER(ctypes.POINTER(ctypes.c_ubyte))]
LIB.WebPDecodeRGBA.restype = ctypes.POINTER(ctypes.c_ubyte)

OUT = os.path.join(os.path.dirname(__file__), "..",
                   "src", "test", "resources", "external")


def chunks_of(data):
    """image chunks (ALPH/VP8/VP8L) of a single-image webp file."""
    out = []
    off = 12
    while off + 8 <= len(data):
        tag = data[off:off + 4]
        size = struct.unpack("<I", data[off + 4:off + 8])[0]
        if tag in (b"ALPH", b"VP8 ", b"VP8L"):
            out.append(data[off:off + 8 + size + (size & 1)])
        off += 8 + size + (size & 1)
    return out


LIB.WebPDecodeYUV.restype = ctypes.POINTER(ctypes.c_ubyte)


def enc_frame(rgba, w, h, lossy=None):
    out = ctypes.POINTER(ctypes.c_ubyte)()
    if lossy is None:
        n = LIB.WebPEncodeLosslessRGBA(rgba, w, h, 4 * w, ctypes.byref(out))
    else:
        n = LIB.WebPEncodeRGBA(rgba, w, h, 4 * w, ctypes.c_float(lossy),
                               ctypes.byref(out))
    assert n > 0
    enc = bytes(out[i] for i in range(n))
    ww = ctypes.c_int(); hh = ctypes.c_int()
    p = LIB.WebPDecodeRGBA(enc, n, ctypes.byref(ww), ctypes.byref(hh))
    dec = bytes(p[i] for i in range(w * h * 4))
    if lossy is not None:
        # frame truth for LOSSY frames: libwebp's (byte-exact) YUV
        # planes + the engine's DOCUMENTED RGB policy (nearest chroma +
        # integer JFIF) + the losslessly-coded alpha from the RGBA
        # decode -- pins the full in-engine chain, not libwebp's fancy
        # upsampler
        u = ctypes.POINTER(ctypes.c_ubyte)(); v = ctypes.POINTER(ctypes.c_ubyte)()
        st = ctypes.c_int(); uvs = ctypes.c_int()
        yp = LIB.WebPDecodeYUV(enc, n, ctypes.byref(ww), ctypes.byref(hh),
                               ctypes.byref(u), ctypes.byref(v),
                               ctypes.byref(st), ctypes.byref(uvs))
        px = bytearray()
        for yy in range(h):
            for xx in range(w):
                Y = yp[yy * st.value + xx]
                cb = u[(yy >> 1) * uvs.value + (xx >> 1)] - 128
                cr = v[(yy >> 1) * uvs.value + (xx >> 1)] - 128
                def cl(z):
                    return 0 if z < 0 else (255 if z > 255 else z)
                px += bytes((
                    cl(Y + ((91881 * cr + 32768) >> 16)),
                    cl(Y - ((22554 * cb + 46802 * cr + 32768) >> 16)),
                    cl(Y + ((116130 * cb + 32768) >> 16)),
                    dec[(yy * w + xx) * 4 + 3]))
        dec = bytes(px)
    return enc, dec


def chunk(tag, payload):
    pad = b"\x00" if len(payload) & 1 else b""
    return tag + struct.pack("<I", len(payload)) + payload + pad


def build_anim(canvas_w, canvas_h, frames):
    """frames: list of (x, y, w, h, file_bytes, blend, dispose)."""
    body = b""
    # VP8X: flags (animation|alpha), canvas w-1/h-1 as 24-bit LE
    flags = 0x02 | 0x10
    vp8x = struct.pack("<I", flags)[:4]
    vp8x += struct.pack("<I", canvas_w - 1)[:3]
    vp8x += struct.pack("<I", canvas_h - 1)[:3]
    body += chunk(b"VP8X", vp8x)
    # ANIM: bg color BGRA (transparent black), loop count 0
    body += chunk(b"ANIM", struct.pack("<IH", 0, 0))
    for (x, y, w, h, fbytes, blend, dispose) in frames:
        hdr = b""
        hdr += struct.pack("<I", x // 2)[:3]
        hdr += struct.pack("<I", y // 2)[:3]
        hdr += struct.pack("<I", w - 1)[:3]
        hdr += struct.pack("<I", h - 1)[:3]
        hdr += struct.pack("<I", 40)[:3]  # duration ms
        hdr += bytes([(0 if blend else 2) | (1 if dispose else 0)])
        payload = hdr + b"".join(chunks_of(fbytes))
        body += chunk(b"ANMF", payload)
    riff = b"WEBP" + body
    return b"RIFF" + struct.pack("<I", len(riff)) + riff


def composite(canvas_w, canvas_h, frames, decoded):
    canvas = bytearray(canvas_w * canvas_h * 4)
    snaps = b""
    for (x0, y0, w, h, _, blend, dispose), dec in zip(frames, decoded):
        for yy in range(h):
            for xx in range(w):
                si = (yy * w + xx) * 4
                di = ((y0 + yy) * canvas_w + (x0 + xx)) * 4
                sr, sg, sb, sa = dec[si:si + 4]
                if not blend:
                    canvas[di:di + 4] = bytes((sr, sg, sb, sa))
                else:
                    dr, dg, db, da = canvas[di:di + 4]
                    wS = sa * 255
                    wD = da * (255 - sa)
                    denom = wS + wD
                    outa = (denom + 127) // 255
                    if denom == 0:
                        canvas[di:di + 4] = b"\x00\x00\x00\x00"
                    else:
                        canvas[di:di + 4] = bytes((
                            (sr * wS + dr * wD + denom // 2) // denom,
                            (sg * wS + dg * wD + denom // 2) // denom,
                            (sb * wS + db * wD + denom // 2) // denom,
                            outa))
        snaps += bytes(canvas)
        if dispose:
            for yy in range(h):
                di = ((y0 + yy) * canvas_w + x0) * 4
                canvas[di:di + 4 * w] = b"\x00" * (4 * w)
    return snaps


def mix(i):
    x = (i * 2654435761) & 0xFFFFFFFF
    x ^= x >> 15
    return (x * 2246822519 & 0xFFFFFFFF) >> 8 & 0xFF


def grad(w, h, seed, alpha=255):
    return bytes(v for i in range(w * h)
                 for v in (mix(seed + 3 * i), (i * 5 + seed) % 256,
                           mix(seed + 3 * i + 2), alpha))


def main():
    # fixture 1: lossless frames, canvas 32x24 — full-canvas base, a
    # blended translucent overlay, an overwrite frame with dispose
    f0, d0 = enc_frame(grad(32, 24, 1), 32, 24)
    f1, d1 = enc_frame(grad(16, 12, 77, alpha=128), 16, 12)
    f2, d2 = enc_frame(grad(12, 8, 200), 12, 8)
    frames1 = [(0, 0, 32, 24, f0, False, False),
               (8, 6, 16, 12, f1, True, False),
               (4, 2, 12, 8, f2, False, True)]
    anim1 = build_anim(32, 24, frames1)
    snaps1 = composite(32, 24, frames1, [d0, d1, d2])
    # fixture 2: LOSSY frames (VP8 + lossless ALPH), odd canvas 22x18
    g0, e0 = enc_frame(grad(22, 18, 9), 22, 18, lossy=80.0)
    g1, e1 = enc_frame(grad(10, 8, 55, alpha=160), 10, 8, lossy=60.0)
    frames2 = [(0, 0, 22, 18, g0, False, False),
               (6, 4, 10, 8, g1, True, False)]
    anim2 = build_anim(22, 18, frames2)
    snaps2 = composite(22, 18, frames2, [e0, e1])
    for name, data, snaps, meta in (
            ("anim_lossless", anim1, snaps1, "32 24 3"),
            ("anim_lossy", anim2, snaps2, "22 18 2")):
        open(os.path.join(OUT, f"{name}.webp"), "wb").write(data)
        open(os.path.join(OUT, f"{name}.frames"), "wb").write(snaps)
        open(os.path.join(OUT, f"{name}.meta"), "w").write(meta)
        print(f"{name}: {len(data)}B, {len(snaps)}B expected")


if __name__ == "__main__":
    main()
