#!/usr/bin/env python3
"""Transcribe the RFC 6386 constant tables into Vp8Tables.scala.

The tables (default token probabilities §13.5, token-probability
update flags §13.4, keyframe B-mode probabilities §11.5, and the
quantizer lookups §14.1) are fixed published constants of the VP8
bitstream spec. Hand-typing ~3 KB of numbers invites silent
transcription errors that a boolean-arithmetic decoder turns into
garbage with no local error signal, so this script reads them out of
the system libwebp (1.2.4), which embeds the same spec constants —
anchored at independently-known prefixes and cross-checked between
the library's two embedded copies. The decoder itself is implemented
from the spec; this is transcription tooling only.

Run: python3 tools/gen_vp8_tables.py   (rewrites Vp8Tables.scala)
"""
import os, struct

LIB = "/usr/lib/x86_64-linux-gnu/libwebp.so.7.1.5"
OUT = os.path.join(os.path.dirname(__file__), "..",
                   "src", "main", "scala", "graft", "functions",
                   "Vp8Tables.scala")

data = open(LIB, "rb").read()

# anchor checks (known prefixes from the spec)
AC_OFF = data.find(struct.pack("<10H", 4, 5, 6, 7, 8, 9, 10, 11, 12, 13))
DC_OFF = data.find(bytes([4, 5, 6, 7, 8, 9, 10, 10, 11, 12, 13, 14, 15, 16,
                          17, 17]))
BM_OFF = data.find(bytes([231, 120, 48, 89, 115, 113, 120, 152, 112]))
CO_ANCHOR = data.find(bytes([253, 136, 254, 255, 228, 219]))
assert min(AC_OFF, DC_OFF, BM_OFF, CO_ANCHOR) > 0
# the coeff table's first 3 rows (type 0, band 0 — unused: type 0
# blocks start at coefficient 1) are all-128 and precede the anchor
CO_OFF = CO_ANCHOR - 33
assert data[CO_OFF:CO_ANCHOR] == bytes([128] * 33)
UP_OFF = BM_OFF - 1056
assert data[UP_OFF:UP_OFF + 33] == bytes([255] * 33)
assert data[UP_OFF + 33:UP_OFF + 35] == bytes([176, 246])  # RFC row

ac = struct.unpack("<128H", data[AC_OFF:AC_OFF + 256])
dc = list(data[DC_OFF:DC_OFF + 128])
bmode = list(data[BM_OFF:BM_OFF + 900])
coeff = list(data[CO_OFF:CO_OFF + 1056])
upd = list(data[UP_OFF:UP_OFF + 1056])

# cross-check against the second embedded copy where present
co2 = data.find(bytes([253, 136, 254, 255, 228, 219]), CO_ANCHOR + 1)
if co2 > 0:
    assert data[co2 - 33:co2 - 33 + 1056] == bytes(coeff), "copies differ"


def arr(name, vals, per=16):
    lines = [f"  val {name}: Array[Int] = Array("]
    for i in range(0, len(vals), per):
        chunk = ", ".join(str(v) for v in vals[i:i + per])
        sep = "," if i + per < len(vals) else ")"
        lines.append(f"    {chunk}{sep}")
    return "\n".join(lines)


body = f"""package graft.functions

/** RFC 6386 constant tables (VP8 bitstream spec): default token
  * probabilities (§13.5, `[4 types][8 bands][3 ctx][11]` flattened),
  * token-probability update flags (§13.4, same shape), keyframe
  * B-mode probabilities (§11.5, `[10 above][10 left][9]` flattened),
  * and the DC/AC quantizer lookups (§14.1, 128 entries each).
  * Mechanically transcribed by tools/gen_vp8_tables.py (see its
  * header for the anchored-extraction provenance); consumed by
  * [[graft.operators.Vp8]]. */
object Vp8Tables {{

{arr("DcQLookup", dc)}

{arr("AcQLookup", list(ac))}

{arr("CoeffProbs", coeff)}

{arr("CoeffUpdateProbs", upd)}

{arr("KfBModeProbs", bmode)}
}}
"""
with open(OUT, "w") as f:
    f.write(body)
print(f"wrote {OUT}: dc@{DC_OFF} ac@{AC_OFF} coeff@{CO_OFF} upd@{UP_OFF} "
      f"bmode@{BM_OFF}")
