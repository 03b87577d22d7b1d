#!/usr/bin/env python3
"""Embed the external lossy-WebP conformance fixtures (and their
libwebp-decoded expected planes) as a main-source object, so the
declared query webp_lossy_pixels can decode REAL foreign-encoder bytes
and the oracle can replay the pinned expected planes. Provenance:
src/test/resources/external/* (see tools/gen_webp_fixtures.py and the
CPython test-suite python.webp); expected alpha for python.webp is the
PNG fixture's tRNS alpha (cwebp encodes alpha losslessly)."""
import base64, os, struct, zlib

R = os.path.join(os.path.dirname(__file__), "..", "src", "test",
                 "resources", "external")
OUT = os.path.join(os.path.dirname(__file__), "..", "src", "main",
                   "scala", "graft", "operators", "Vp8Fixtures.scala")

NAMES = ["vp8_tiny", "vp8_smooth", "vp8_odd", "vp8_detail", "python_webp"]


def png_alpha():
    d = open(os.path.join(R, "python.png"), "rb").read()
    i = 8; chunks = []
    while i < len(d):
        ln = struct.unpack(">I", d[i:i+4])[0]
        chunks.append((d[i+4:i+8].decode(), d[i+8:i+8+ln]))
        i += 12 + ln
    plte = [c for t, c in chunks if t == "PLTE"][0]
    trns = [c for t, c in chunks if t == "tRNS"][0]
    idat = b"".join(c for t, c in chunks if t == "IDAT")
    raw = zlib.decompress(idat)
    out = []
    prev = [0]*16
    pos = 0
    for y in range(16):
        f = raw[pos]; pos += 1
        line = list(raw[pos:pos+16]); pos += 16
        rec = []
        for x in range(16):
            a = rec[x-1] if x > 0 else 0
            b = prev[x]
            c = prev[x-1] if x > 0 else 0
            v = line[x]
            if f == 1: v += a
            elif f == 2: v += b
            elif f == 3: v += (a+b)//2
            elif f == 4:
                p = a+b-c
                pa, pb, pc = abs(p-a), abs(p-b), abs(p-c)
                v += a if pa <= pb and pa <= pc else (b if pb <= pc else c)
            rec.append(v & 0xff)
        out.append(rec); prev = rec
    return bytes(trns[v] if v < len(trns) else 255
                 for row in out for v in row)


def b64lines(name, data):
    b = base64.b64encode(data).decode()
    lines = [f'  private val {name}: String =']
    for i in range(0, len(b), 72):
        sep = " +" if i + 72 < len(b) else ""
        lines.append(f'    "{b[i:i+72]}"{sep}')
    return "\n".join(lines)


parts = []
entries = []
for idx, n in enumerate(NAMES):
    src = "python.webp" if n == "python_webp" else f"{n}.webp"
    f = open(os.path.join(R, src), "rb").read()
    yuv = open(os.path.join(R, f"{n}.yuv"), "rb").read()
    w, h = open(os.path.join(R, f"{n}.meta")).read().split()
    exp = yuv
    if n == "python_webp":
        exp = yuv + png_alpha()
    parts.append(b64lines(f"file{idx}", f))
    parts.append(b64lines(f"exp{idx}", exp))
    entries.append(f"    {idx} -> Fixture({w}, {h}, file{idx}, exp{idx})")

body = f"""package graft.operators

/** EXTERNAL lossy-WebP conformance fixtures embedded for the declared
  * query surface: four system-libwebp encodes of known pixels plus
  * CPython's python.webp (VP8X + VP8L-coded ALPH + VP8), with the
  * EXPECTED planes pinned from libwebp's own decode (and, for the
  * alpha plane, the sibling PNG's tRNS alpha — cwebp encodes alpha
  * losslessly, so the two independent encoders must agree exactly).
  * Regenerate with tools/gen_vp8_fixtures_scala.py. Expected layout:
  * Y (w×h) ++ U ++ V (ceil(w/2)×ceil(h/2) each) [++ A (w×h)]. */
object Vp8Fixtures {{

  final case class Fixture(
      w: Int, h: Int, fileB64: String, expectedB64: String) {{
    lazy val file: Array[Byte] =
      java.util.Base64.getDecoder.decode(fileB64)
    lazy val expected: Array[Byte] =
      java.util.Base64.getDecoder.decode(expectedB64)
  }}

{chr(10).join(parts)}

  val byId: Map[Int, Fixture] = Map(
{",".join(chr(10) + e for e in entries).lstrip(chr(10))})

  def fileFor(id: Long): Array[Byte] =
    byId((id % byId.size).toInt).file

  /** Expected rows (plane, pos, v) for one fixture id — the oracle's
    * source of truth (pinned external bytes, not engine output). */
  def expectedRows(id: Long): Seq[(Int, Int, Int)] = {{
    val f = byId((id % byId.size).toInt)
    val cw = (f.w + 1) / 2; val ch = (f.h + 1) / 2
    val sizes = Seq(0 -> f.w * f.h, 1 -> cw * ch, 2 -> cw * ch) ++
      (if (f.expected.length > f.w * f.h + 2 * cw * ch)
        Seq(3 -> f.w * f.h) else Seq.empty)
    var off = 0
    sizes.flatMap {{ case (plane, n) =>
      val rows = (0 until n).map(i =>
        (plane, i, f.expected(off + i) & 0xff))
      off += n
      rows
    }}
  }}
}}
"""
open(OUT, "w").write(body)
print(f"wrote {OUT} ({os.path.getsize(OUT)} bytes)")
