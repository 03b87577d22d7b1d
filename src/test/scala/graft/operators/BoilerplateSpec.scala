package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** Line-level boilerplate removal: the corpus-native strip and the
  * frozen map-only strip must agree row-for-row, line order must
  * survive reassembly, and the map form must run unchanged on a
  * stream. */
class BoilerplateSpec extends SparkTestBase {
  import spark.implicits._

  private def corpus = Seq(
    (0L, "HEADER\nalpha beta\nmid one\nFOOTER"),
    (1L, "HEADER\ngamma delta\nFOOTER"),
    (2L, "HEADER\nalpha beta\nFOOTER"),
    (3L, "HEADER\nFOOTER"), // nothing but boilerplate
    (4L, "HEADER\nepsilon\nmid two\nFOOTER"),
    (5L, "solo page without template lines")
  ).toDF("doc_id", "text")

  test("lineDocFreq counts DISTINCT documents (a line repeated inside " +
    "one doc counts once)") {
    val df = Seq((0L, "x\nx\ny"), (1L, "x\nz")).toDF("doc_id", "text")
    val got = Boilerplate.lineDocFreq(df, "doc_id", "text")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("x" -> 2L, "y" -> 1L, "z" -> 1L))
  }

  test("strip removes exactly the >= minDocs lines, preserves original " +
    "line order, and keeps all-boilerplate docs with empty text") {
    val got = Boilerplate.strip(corpus, "doc_id", "text", minDocs = 5)
      .orderBy("id").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    // HEADER and FOOTER appear in 5 docs; every other line is unique
    assert(got.toSeq == Seq(
      0L -> "alpha beta\nmid one",
      1L -> "gamma delta",
      2L -> "alpha beta",
      3L -> "",
      4L -> "epsilon\nmid two",
      5L -> "solo page without template lines"))
  }

  test("the frozen split agrees with the corpus-native form row for " +
    "row, and the set is bounded + deterministic") {
    val set = Boilerplate.boilerplateSet(corpus, "doc_id", "text",
      minDocs = 5)
    assert(set.toSeq == Seq("FOOTER", "HEADER")) // ndocs tie → line asc
    val viaSet = Boilerplate.stripWithSet(corpus, "text", set)
      .select(col("doc_id").as("id"), col("text"))
      .orderBy("id").collect().map(r => r.getLong(0) -> r.getString(1))
    val native = Boilerplate.strip(corpus, "doc_id", "text", minDocs = 5)
      .orderBy("id").collect().map(r => r.getLong(0) -> r.getString(1))
    assert(viaSet.toSeq == native.toSeq)
    // the maxLines bound truncates at the deterministic boundary
    val capped = Boilerplate.boilerplateSet(corpus, "doc_id", "text",
      minDocs = 5, maxLines = 1)
    assert(capped.toSeq == Seq("FOOTER"))
  }

  test("stripWithSet over a file stream == batch (pure map: no join, " +
    "no shuffle, no state)") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft-bp-stream").toString
    corpus.repartition(3).write.mode("overwrite").parquet(dir)
    val batchSrc = spark.read.parquet(dir)
    val set = Boilerplate.boilerplateSet(batchSrc, "doc_id", "text", 5)
    val want = Boilerplate.stripWithSet(batchSrc, "text", set)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val stream = spark.readStream.schema(batchSrc.schema)
      .option("maxFilesPerTrigger", "1").parquet(dir)
    val q = Boilerplate.stripWithSet(stream, "text", set)
      .writeStream.format("memory").queryName("bp_eq")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val got = spark.table("bp_eq").collect()
        .map(r => (r.getLong(0), r.getString(1))).toSet
      assert(got == want && got.size == 6)
    } finally q.stop()
  }

  test("stripWithSet plans as a pure projection — no Exchange, no " +
    "Join, no Aggregate") {
    val plan = Boilerplate.stripWithSet(corpus, "text",
        Array("HEADER", "FOOTER"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange") && !plan.contains("Join") &&
      !plan.contains("Aggregate"), plan)
  }

  test("c4Filter: every line rule and every page rule fires, the " +
    "verdict column splits the corpus, and the plan is map-only") {
    val pages = Seq(
      // 3 good lines → kept page
      (0L, "one two three.\nfour five six!\nseven eight nine?"),
      // good lines but a { page marker → dropped page
      (1L, "one two three.\nfour five six.\nseven eight nine.\nvar x = {"),
      // lorem ipsum page → dropped
      (2L, "one two three.\nfour five six.\nseven eight nine.\nLorem Ipsum."),
      // no terminal punctuation → 0 kept lines
      (3L, "one two three\nfour five six\nseven eight nine"),
      // too few words / javascript mention lines drop; 3 good survive
      (4L, "ok.\nuses JavaScript here today.\na b c.\nd e f.\ng h i.\"")
    ).toDF("doc_id", "text")
    val got = TextClean.c4Filter(pages, "text")
      .select("doc_id", "n_lines", "n_kept", "keep", "text")
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getBoolean(3), r.getString(4)))
    assert(got(0) == ((0L, 3L, 3L, true,
      "one two three.\nfour five six!\nseven eight nine?")))
    assert(!got(1)._4 && got(1)._3 == 3L) // kept lines but { kills page
    assert(!got(2)._4) // lorem ipsum (case-insensitive) kills page
    assert(got(3) == ((3L, 3L, 0L, false, "")))
    assert(got(4) == ((4L, 5L, 3L, true, "a b c.\nd e f.\ng h i.\"")))
    val plan = TextClean.c4Filter(pages, "text")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange") && !plan.contains("Join") &&
      !plan.contains("Aggregate"), plan)
  }

  test("c4Filter over a file stream == batch (map-only ingest gate)") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft-c4-stream").toString
    val pages = spark.range(0, 60).selectExpr("id AS doc_id",
      "CASE WHEN id % 4 = 0 THEN 'short\nno punct here' " +
        "ELSE concat('alpha beta gamma ', id, '.\ndelta eps zeta.\n',\n" +
        "  'eta theta iota!') END AS text")
    pages.repartition(3).write.mode("overwrite").parquet(dir)
    val batchSrc = spark.read.parquet(dir)
    val want = TextClean.c4Filter(batchSrc, "text")
      .select("doc_id", "n_kept", "keep").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet
    val stream = spark.readStream.schema(batchSrc.schema)
      .option("maxFilesPerTrigger", "1").parquet(dir)
    val q = TextClean.c4Filter(stream, "text")
      .select("doc_id", "n_kept", "keep")
      .writeStream.format("memory").queryName("c4_eq")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val got = spark.table("c4_eq").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet
      assert(got == want && got.size == 60)
      assert(want.exists(_._3) && want.exists(!_._3))
    } finally q.stop()
  }
}
