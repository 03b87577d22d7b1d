package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** PII scrub: each detector hits its shape and nothing else, the
  * fixed replacement order keeps detectors from claiming each other's
  * spans, replacement is global, and the DataFrame surface accounts
  * on the pre-redaction text. */
class TextCleanSpec extends SparkTestBase {
  import spark.implicits._

  private def redactOne(s: String): String =
    Seq((s)).toDF("text").select(TextClean.redact(col("text"))).head()
      .getString(0)

  test("each detector redacts its shape: email, grouped phone, " +
    "nnn-nn-nnnn id, IPv4") {
    assert(redactOne("mail bob.smith+x@sub.example.org now") ==
      "mail <EMAIL> now")
    assert(redactOne("call +44-207-946-0958 today") ==
      "call <PHONE> today")
    assert(redactOne("ssn 123-45-6789 leaked") == "ssn <ID> leaked")
    assert(redactOne("host 192.168.0.1 down") == "host <IP> down")
  }

  test("replacement is global and mixed text redacts every category") {
    assert(redactOne("a@b.co then c@d.org") == "<EMAIL> then <EMAIL>")
    val mixed = "x a@b.co +1-555-123-4567 111-22-3333 10.0.0.1 y"
    assert(redactOne(mixed) == "x <EMAIL> <PHONE> <ID> <IP> y")
  }

  test("detectors do not claim each other's spans: the id pattern " +
    "cannot fire inside a phone (3-3-4 never contains 3-2-4), and " +
    "digits inside an email belong to the email") {
    // counted independently on the raw text: the phone yields no id hit
    val phone = "+1-555-123-4567"
    val nId = Seq(phone).toDF("text")
      .select(TextClean.countMatches(col("text"), TextClean.IdPattern))
      .head().getInt(0)
    assert(nId == 0)
    // an address with digits and dots stays one email, not an IP
    assert(redactOne("user123@h4.example.com") == "<EMAIL>")
  }

  test("no false positives on plain prose, bare numbers, or version " +
    "strings") {
    val clean = "the 3 quick foxes ran 12.5 km in 1.2.3 releases at 5-10%"
    assert(redactOne(clean) == clean)
  }

  test("redactPii replaces the text column and accounts per category " +
    "on the ORIGINAL text") {
    val df = Seq(
      (1L, "reach a@b.co or c@d.io at 10.0.0.1"),
      (2L, "nothing sensitive here")).toDF("doc_id", "text")
    val out = TextClean.redactPii(df, "text").orderBy("doc_id").collect()
    assert(out(0).getAs[String]("text") ==
      "reach <EMAIL> or <EMAIL> at <IP>")
    assert(out(0).getAs[Int]("n_email") == 2 &&
      out(0).getAs[Int]("n_ip") == 1 &&
      out(0).getAs[Int]("n_phone") == 0 && out(0).getAs[Int]("n_id") == 0)
    assert(out(1).getAs[String]("text") == "nothing sensitive here")
    assert(out(1).getAs[Int]("n_email") == 0)
  }

  test("the scrub is a map-only projection: no exchange, no UDF in " +
    "the plan") {
    val docs = spark.range(100).selectExpr("id AS doc_id",
      "concat('u', id, '@x.org says hi') AS text")
    val plan = TextClean.redactPii(docs, "text")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
    assert(!plan.contains("BatchEvalPython") && !plan.contains("UDF"),
      plan)
  }
}
