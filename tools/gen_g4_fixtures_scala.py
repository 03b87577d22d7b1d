#!/usr/bin/env python3
"""Embed the external CCITT G4 conformance fixtures (libtiff-encoded
files + their exact bit rasters) as a main-source object for the
declared query tiff_g4_pixels. Provenance: tools/gen_t4_tables.py
(system libtiff 4.x G4 encoder, deterministic patterns)."""
import base64, os

R = os.path.join(os.path.dirname(__file__), "..", "src", "test",
                 "resources", "external")
OUT = os.path.join(os.path.dirname(__file__), "..", "src", "main",
                   "scala", "graft", "operators", "G4Fixtures.scala")
NAMES = [("g4_text", 200, 120), ("g4_diag", 64, 64),
         ("g4_multistrip", 96, 60), ("g4_allwhite", 40, 10),
         ("g4_checker", 33, 21)]


def b64lines(name, data):
    # ONE literal per field: a chained "+" of hundreds of fragments
    # overflows the scala compiler's dependency traverser stack
    b = base64.b64encode(data).decode()
    return f'  private val {name}: String =\n    "{b}"' 


parts, entries = [], []
for idx, (n, w, h) in enumerate(NAMES):
    f = open(os.path.join(R, f"{n}.tif"), "rb").read()
    bits = open(os.path.join(R, f"{n}.bits"), "rb").read()
    parts.append(b64lines(f"file{idx}", f))
    parts.append(b64lines(f"bits{idx}", bits))
    entries.append(f"    {idx} -> Fixture({w}, {h}, file{idx}, bits{idx})")

body = f"""package graft.operators

/** EXTERNAL CCITT Group 4 conformance fixtures embedded for the
  * declared query surface: five system-libtiff G4 encodes (text-like
  * runs, diagonals, multi-strip, all-white, checker) with their EXACT
  * bit rasters pinned at generation time. Regenerate with
  * tools/gen_g4_fixtures_scala.py. */
object G4Fixtures {{

  final case class Fixture(
      w: Int, h: Int, fileB64: String, bitsB64: String) {{
    lazy val file: Array[Byte] =
      java.util.Base64.getDecoder.decode(fileB64)
    lazy val bits: Array[Byte] =
      java.util.Base64.getDecoder.decode(bitsB64)
  }}

{chr(10).join(parts)}

  val byId: Map[Int, Fixture] = Map(
{",".join(chr(10) + e for e in entries).lstrip(chr(10))})

  def fileFor(id: Long): Array[Byte] =
    byId((id % byId.size).toInt).file

  /** Expected (pos, bit) rows for the oracle — pinned external data. */
  def expectedRows(id: Long): Seq[(Int, Int)] = {{
    val f = byId((id % byId.size).toInt)
    f.bits.indices.map(i => (i, f.bits(i).toInt))
  }}
}}
"""
open(OUT, "w").write(body)
print(f"wrote {OUT} ({os.path.getsize(OUT)} bytes)")
