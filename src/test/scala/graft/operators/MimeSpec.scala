package graft.operators

import graft.SparkTestBase

/** RFC 5322 / MIME parsing: unfolding, encoded words, both transfer
  * encodings, multipart traversal, mbox splitting, rejection. */
class MimeSpec extends SparkTestBase {

  test("header unfolding rejoins continuation lines; names are " +
    "case-insensitive") {
    val m = Mime.parse(
      "FROM: a@x.com\nSubject: part one\n  and two\nTo: b@y.com\n\nbody\n")
      .getOrElse(fail("did not parse"))
    assert(m.from == "a@x.com")
    assert(m.subject == "part one and two")
    assert(m.text == "body\n")
  }

  test("RFC 2047 encoded words: B and Q forms decode, adjacent words " +
    "join without the intervening whitespace, underscores are spaces") {
    assert(Mime.decodeWords("=?UTF-8?B?UsOpc3Vtw6k=?=") == "Résumé")
    assert(Mime.decodeWords("=?UTF-8?Q?caf=C3=A9_x?=") == "café x")
    assert(Mime.decodeWords("=?UTF-8?Q?one_?=   =?UTF-8?Q?two?=") ==
      "one two")
    assert(Mime.decodeWords("plain stays") == "plain stays")
    // ISO-8859-1 charset honored (é = 0xE9 single byte)
    assert(Mime.decodeWords("=?ISO-8859-1?Q?caf=E9?=") == "café")
  }

  test("quoted-printable reverses =XX and soft breaks; base64 bodies " +
    "decode through line breaks") {
    assert(Mime.decodeQp("a=C3=A9b=\ncd") == "aébcd")
    assert(Mime.decodeBody("cGFydCB0\nZXh0IDQ=", "base64") == "part text 4")
    assert(Mime.decodeBody("as is", "7bit") == "as is")
  }

  test("multipart traversal keeps text/plain leaves, counts all " +
    "parts, drops preamble, requires the close delimiter") {
    val m = Mime.parse(new String(MediaFixtures.emlMediaFor(4L), "UTF-8"))
      .getOrElse(fail("fixture did not parse"))
    assert(m.contentType == "multipart/mixed")
    assert(m.nParts == 3)
    assert(m.text == "part text 4")
    assert(m.subject == "part one 4")
    // a multipart without its close delimiter rejects
    val raw = new String(MediaFixtures.emlMediaFor(4L), "UTF-8")
    assert(Mime.parse(raw.replace("--b4--", "")).isEmpty)
  }

  test("fixtures follow the closed forms the oracle re-derives") {
    for (id <- 0L to 8L) {
      val m = Mime.parse(new String(MediaFixtures.emlMediaFor(id), "UTF-8"))
        .getOrElse(fail(s"id=$id"))
      assert(m.from == s"user$id@example.com")
      (id % 3) match {
        case 0 =>
          assert(m.subject == s"Résumé $id")
          assert(m.text == s"corps é $id ligne" && m.nParts == 1)
        case 1 =>
          assert(m.subject == s"part one $id")
          assert(m.text == s"part text $id" && m.nParts == 3)
        case _ =>
          assert(m.subject == s"plain subject $id")
          assert(m.text == s"plain body $id" && m.nParts == 1)
      }
    }
  }

  test("mbox splits on From_ lines; junk rejects cleanly") {
    val mbox = "From a@x Thu Jan  1\nSubject: s1\n\nb1\n" +
      "From b@y Thu Jan  1\nSubject: s2\n\nb2"
    val msgs = Mime.mboxMessages(mbox)
    assert(msgs.length == 2)
    assert(Mime.parse(msgs(0)).get.subject == "s1")
    assert(Mime.parse(msgs(1)).get.text == "b2")
    assert(Mime.mboxMessages("not an mbox").isEmpty)
    assert(Mime.parse(null).isEmpty)
    assert(Mime.parse("no colon here and no blank sep").isEmpty)
    assert(Mime.parse(" leading continuation\n\nx").isEmpty)
  }
}
