#!/usr/bin/env python3
"""Embed the animated-WebP conformance fixtures (container bytes +
expected composited canvases) for the declared query webp_anim_frames.
Provenance: tools/gen_anim_webp.py (real libwebp frame payloads)."""
import base64, os

R = os.path.join(os.path.dirname(__file__), "..", "src", "test",
                 "resources", "external")
OUT = os.path.join(os.path.dirname(__file__), "..", "src", "main",
                   "scala", "graft", "operators", "AnimWebpFixtures.scala")
NAMES = ["anim_lossless", "anim_lossy"]

parts, entries = [], []
for idx, n in enumerate(NAMES):
    f = open(os.path.join(R, f"{n}.webp"), "rb").read()
    exp = open(os.path.join(R, f"{n}.frames"), "rb").read()
    w, h, nf = open(os.path.join(R, f"{n}.meta")).read().split()
    fb = base64.b64encode(f).decode()
    eb = base64.b64encode(exp).decode()
    parts.append(f'  private val file{idx}: String =\n    "{fb}"')
    parts.append(f'  private val exp{idx}: String =\n    "{eb}"')
    entries.append(f"    {idx} -> Fixture({w}, {h}, {nf}, file{idx}, exp{idx})")

body = f"""package graft.operators

/** Animated-WebP conformance fixtures embedded for the declared query
  * surface: ANIM/ANMF containers around REAL libwebp frame payloads,
  * with the expected composited canvases pinned at generation time
  * (tools/gen_anim_webp.py; regenerate the embedding with
  * tools/gen_anim_fixtures_scala.py). */
object AnimWebpFixtures {{

  final case class Fixture(w: Int, h: Int, nFrames: Int,
      fileB64: String, expectedB64: String) {{
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

  /** Expected (frame, pos, v) rows over the composited RGBA canvases
    * — the oracle's pinned external source of truth. */
  def expectedRows(id: Long): Seq[(Int, Int, Int)] = {{
    val f = byId((id % byId.size).toInt)
    val per = f.w * f.h * 4
    (0 until f.nFrames).flatMap {{ fr =>
      (0 until per).map(i => (fr, i, f.expected(fr * per + i) & 0xff))
    }}
  }}
}}
"""
open(OUT, "w").write(body)
print(f"wrote {OUT} ({os.path.getsize(OUT)} bytes)")
