package graft.operators

/** Subtitle parsing (SRT + WebVTT) — captions are how video-text
  * pairs are mined: the cue text is the transcript a multimodal
  * pipeline aligns against frames. Both wire formats:
  *
  *  - SRT: numbered blocks, `HH:MM:SS,mmm --> HH:MM:SS,mmm` timing
  *    lines (comma decimal), text until a blank line;
  *  - WebVTT: the `WEBVTT` magic, dot-decimal timings with optional
  *    cue ids and settings after the arrow, `NOTE`/`STYLE` blocks
  *    skipped, and the hour field optional (`MM:SS.mmm`).
  *
  * Timings become integer milliseconds. A malformed timing line
  * fails the FILE (a subtitle file with one corrupt cue has usually
  * lost sync everywhere — the validator stance every codec here
  * takes). Dirty input → None, never a throw. */
object Subtitles {

  final case class Cue(idx: Int, startMs: Long, endMs: Long, text: String)

  private val MaxCues = 65536

  def parse(raw: String): Option[Vector[Cue]] = {
    try {
      if (raw == null || raw.trim.isEmpty) return None
      val norm = raw.replace("\r\n", "\n")
      if (norm.startsWith("WEBVTT")) parseVtt(norm) else parseSrt(norm)
    } catch { case _: Exception => None }
  }

  /** `HH:MM:SS,mmm` (SRT) or `[HH:]MM:SS.mmm` (VTT) → ms. */
  private def time(s: String, comma: Boolean): Option[Long] = {
    val t = s.trim
    val sep = if (comma) ',' else '.'
    val parts = t.split(':')
    if (parts.length < 2 || parts.length > 3) return None
    val last = parts.last.split(java.util.regex.Pattern.quote(sep.toString))
    if (last.length != 2 || last(1).length != 3) return None
    try {
      val h = if (parts.length == 3) parts(0).toLong else 0L
      val m = parts(if (parts.length == 3) 1 else 0).toLong
      val sec = last(0).toLong
      val ms = last(1).toLong
      if (h < 0 || m < 0 || m > 59 || sec < 0 || sec > 59) None
      else Some(((h * 60 + m) * 60 + sec) * 1000 + ms)
    } catch { case _: NumberFormatException => None }
  }

  private def timingLine(line: String, comma: Boolean)
      : Option[(Long, Long)] = {
    val arrow = line.indexOf("-->")
    if (arrow < 0) return None
    val lhs = line.substring(0, arrow)
    // VTT allows cue settings after the end time: take the first token
    val rhsAll = line.substring(arrow + 3).trim
    val rhs = rhsAll.split("\\s+")(0)
    for {
      a <- time(lhs, comma)
      b <- time(rhs, comma)
      if b >= a
    } yield (a, b)
  }

  private def blocks(norm: String): Iterator[Seq[String]] =
    norm.split("\n\n+").iterator
      .map(_.split("\n").toSeq.filter(_.nonEmpty))
      .filter(_.nonEmpty)

  private def parseSrt(norm: String): Option[Vector[Cue]] = {
    val out = Vector.newBuilder[Cue]
    var n = 0
    blocks(norm).foreach { block =>
      // block: index line, timing line, text+
      if (block.length < 2) return None
      if (!block.head.trim.forall(_.isDigit)) return None
      val idx = block.head.trim.toInt
      val (a, b) = timingLine(block(1), comma = true).getOrElse(return None)
      out += Cue(idx, a, b, block.drop(2).mkString("\n"))
      n += 1
      if (n > MaxCues) return None
    }
    val v = out.result()
    if (v.isEmpty) None else Some(v)
  }

  private def parseVtt(norm: String): Option[Vector[Cue]] = {
    val out = Vector.newBuilder[Cue]
    var n = 0
    var first = true
    blocks(norm).foreach { block =>
      if (first) {
        // the WEBVTT header block (may carry metadata lines)
        if (!block.head.startsWith("WEBVTT")) return None
        first = false
      } else if (block.head.startsWith("NOTE") ||
        block.head.startsWith("STYLE") || block.head.startsWith("REGION")) {
        () // comment/style blocks skipped
      } else {
        // optional id line before the timing line
        val timingAt = if (block.head.contains("-->")) 0 else 1
        if (timingAt >= block.length) return None
        val (a, b) = timingLine(block(timingAt), comma = false)
          .getOrElse(return None)
        n += 1
        out += Cue(n, a, b, block.drop(timingAt + 1).mkString("\n"))
        if (n > MaxCues) return None
      }
    }
    val v = out.result()
    if (v.isEmpty) None else Some(v)
  }

  // ---------------------------------------------------------------- writers

  private def fmt(ms: Long, comma: Boolean): String = {
    val sep = if (comma) "," else "."
    f"${ms / 3600000}%02d:${ms / 60000 % 60}%02d:${ms / 1000 % 60}%02d$sep${ms % 1000}%03d"
  }

  /** An SRT file from cues. */
  def srt(cues: Seq[(Long, Long, String)]): String =
    cues.zipWithIndex.map { case ((a, b, text), i) =>
      s"${i + 1}\n${fmt(a, comma = true)} --> ${fmt(b, comma = true)}\n$text"
    }.mkString("", "\n\n", "\n")

  /** A WebVTT file from cues (with a NOTE block and cue settings so
    * the reader's skip paths are exercised). */
  def vtt(cues: Seq[(Long, Long, String)]): String = {
    val body = cues.zipWithIndex.map { case ((a, b, text), i) =>
      s"cue-${i + 1}\n${fmt(a, comma = false)} --> " +
        s"${fmt(b, comma = false)} align:start\n$text"
    }.mkString("\n\n")
    s"WEBVTT\n\nNOTE generated fixture\n\n$body\n"
  }
}
