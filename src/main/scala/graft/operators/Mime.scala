package graft.operators

/** Internet-message (RFC 5322) + MIME (RFC 2045/2046/2047) parsing —
  * mailing-list archives are a classic pretraining corpus, and every
  * message in one needs the same four steps before its text is
  * usable: header unfolding, encoded-word subject decoding,
  * transfer-encoding reversal (base64 / quoted-printable), and
  * multipart traversal to the text parts.
  *
  *  - headers: CRLF or LF line grammar, continuation-line UNFOLDING
  *    (a header split across lines rejoins before parsing), names
  *    case-insensitive;
  *  - RFC 2047 encoded-words in Subject/From/To: `=?charset?B?...?=`
  *    (base64) and `=?charset?Q?...?=` (Q: `_` = space, `=XX` hex),
  *    adjacent encoded-words joined without separating space, as the
  *    RFC requires;
  *  - bodies: `base64` (JDK MIME decoder — tolerates line breaks),
  *    `quoted-printable` (`=XX` hex + soft `=\n` line breaks),
  *    7bit/8bit/binary passthrough;
  *  - multipart: boundary split (`--boundary` ... `--boundary--`),
  *    parts parsed recursively (depth-capped), `text` is the
  *    newline-join of every text/plain leaf's decoded body — the
  *    field a data pipeline keeps.
  *
  * Dirty bytes → None, never a throw. */
object Mime {

  final case class Message(
      from: String, to: String, subject: String, date: String,
      contentType: String, nParts: Int, text: String)

  private val MaxDepth = 8
  private val MaxParts = 256

  def parse(raw: String): Option[Message] = {
    try {
      if (raw == null || raw.isEmpty) return None
      val (headers, body) = splitMessage(raw).getOrElse(return None)
      def h(name: String): String = headers.getOrElse(name, "")
      val ct0 = h("content-type")
      val ct = if (ct0.isEmpty) "text/plain" else ct0
      val parts = new scala.collection.mutable.ArrayBuffer[String]()
      var count = 0
      def walk(ctype: String, cte: String, content: String,
          depth: Int): Unit = {
        if (depth > MaxDepth || count > MaxParts) throw new RuntimeException
        count += 1
        val mediaType = ctype.split(";")(0).trim.toLowerCase
        if (mediaType.startsWith("multipart/")) {
          val boundary = param(ctype, "boundary").getOrElse(
            throw new RuntimeException)
          splitParts(content, boundary).foreach { partRaw =>
            val (ph, pb) = splitMessage(partRaw).getOrElse(
              throw new RuntimeException)
            walk(ph.getOrElse("content-type", "text/plain"),
              ph.getOrElse("content-transfer-encoding", "7bit"),
              pb, depth + 1)
          }
        } else if (mediaType == "text/plain" || (mediaType.isEmpty && depth == 0)) {
          parts += decodeBody(content, cte)
        }
        // non-text leaves (text/html, images, ...) are counted, not kept
      }
      walk(ct, h("content-transfer-encoding") match {
        case "" => "7bit"
        case v => v
      }, body, 0)
      Some(Message(
        decodeWords(h("from")), decodeWords(h("to")),
        decodeWords(h("subject")), h("date"),
        ct.split(";")(0).trim.toLowerCase, count,
        parts.mkString("\n")))
    } catch { case _: Exception => None }
  }

  /** Headers (unfolded, lowercased names) + body. None if no blank
    * separator line exists. */
  private def splitMessage(raw: String)
      : Option[(Map[String, String], String)] = {
    val norm = raw.replace("\r\n", "\n")
    val sep = norm.indexOf("\n\n")
    val (head, body) =
      if (sep < 0) {
        if (!norm.endsWith("\n")) return None // headers only, unterminated
        (norm, "")
      } else (norm.substring(0, sep), norm.substring(sep + 2))
    val headers = scala.collection.mutable.LinkedHashMap[String, String]()
    var current: String = null
    var value: StringBuilder = null
    def commit(): Unit =
      if (current != null) {
        headers(current.toLowerCase(java.util.Locale.ROOT)) =
          value.toString.trim
      }
    head.linesIterator.foreach { line =>
      if (line.startsWith(" ") || line.startsWith("\t")) {
        if (current == null) return None // continuation before any header
        value.append(' ').append(line.trim)
      } else {
        commit()
        val colon = line.indexOf(':')
        if (colon <= 0) return None
        current = line.substring(0, colon).trim
        value = new StringBuilder(line.substring(colon + 1))
      }
    }
    commit()
    Some((headers.toMap, body))
  }

  /** `name=value` parameter from a structured header value
    * (quoted or bare). */
  private def param(headerValue: String, name: String): Option[String] =
    headerValue.split(";").iterator.map(_.trim).collectFirst {
      case p if p.toLowerCase.startsWith(name + "=") =>
        val v = p.substring(name.length + 1).trim
        if (v.startsWith("\"") && v.endsWith("\"") && v.length >= 2)
          v.substring(1, v.length - 1)
        else v
    }

  /** Bodies of the parts between `--boundary` delimiters. */
  private def splitParts(content: String, boundary: String): Vector[String] = {
    val delim = "--" + boundary
    val lines = content.split("\n", -1)
    val parts = Vector.newBuilder[String]
    var cur: StringBuilder = null
    var done = false
    lines.foreach { line =>
      if (!done) {
        if (line == delim + "--") {
          if (cur != null) parts += cur.toString
          done = true
        } else if (line == delim) {
          if (cur != null) parts += cur.toString
          cur = new StringBuilder
        } else if (cur != null) {
          if (cur.nonEmpty) cur.append('\n')
          cur.append(line)
        } // preamble before the first delimiter is dropped, per RFC
      }
    }
    if (!done) throw new RuntimeException // missing close delimiter
    parts.result()
  }

  /** Reverse a Content-Transfer-Encoding. */
  def decodeBody(content: String, cte: String): String =
    cte.trim.toLowerCase(java.util.Locale.ROOT) match {
      case "base64" =>
        new String(java.util.Base64.getMimeDecoder.decode(content), "UTF-8")
      case "quoted-printable" => decodeQp(content)
      case _ => content // 7bit / 8bit / binary
    }

  /** Quoted-printable: `=XX` hex escapes and soft `=\n` breaks. */
  def decodeQp(s: String): String = new String(qpBytes(s), "UTF-8")

  /** The byte-level QP decode (encoded-words apply their own
    * charset to these bytes). */
  def qpBytes(s: String): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '=') {
        if (i + 1 < s.length && s.charAt(i + 1) == '\n') i += 2 // soft break
        else if (i + 2 < s.length) {
          val hi = Character.digit(s.charAt(i + 1), 16)
          val lo = Character.digit(s.charAt(i + 2), 16)
          if (hi < 0 || lo < 0) throw new RuntimeException
          out.write(hi * 16 + lo)
          i += 3
        } else throw new RuntimeException
      } else {
        val bs = c.toString.getBytes("UTF-8")
        out.write(bs, 0, bs.length)
        i += 1
      }
    }
    out.toByteArray
  }

  /** RFC 2047 encoded-words in a header value; adjacent words join
    * without the intervening whitespace. */
  def decodeWords(v: String): String = {
    if (!v.contains("=?")) return v
    val word = "=\\?([^?]+)\\?([BbQq])\\?([^?]*)\\?=".r
    // first decode each word, then drop whitespace BETWEEN two words
    val betweenCollapsed = word.replaceAllIn(
      v.replaceAll("\\?=\\s+=\\?", "?==?"), m => {
        val charset = m.group(1)
        val enc = m.group(2).toUpperCase
        val payload = m.group(3)
        val bytes =
          if (enc == "B") java.util.Base64.getMimeDecoder.decode(payload)
          else qpBytes(payload.replace("_", " ")) // charset applied below
        scala.util.matching.Regex.quoteReplacement(
          new String(bytes, charset))
      })
    betweenCollapsed
  }

  /** Split an mbox file into messages (`From ` separator lines). */
  def mboxMessages(mbox: String): Vector[String] = {
    if (mbox == null || !mbox.startsWith("From ")) return Vector.empty
    val out = Vector.newBuilder[String]
    var cur = new StringBuilder
    var first = true
    mbox.replace("\r\n", "\n").linesIterator.foreach { line =>
      if (line.startsWith("From ")) {
        if (!first) out += cur.toString
        cur = new StringBuilder
        first = false
      } else {
        if (cur.nonEmpty) cur.append('\n')
        cur.append(line)
      }
    }
    if (!first) out += cur.toString
    out.result()
  }
}
