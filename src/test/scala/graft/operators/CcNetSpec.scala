package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** CCNet perplexity buckets: terciles must actually split each
  * language ~1/3-1/3-1/3, labeling must be monotone in bits, and the
  * frozen-threshold form must label a file stream row-for-row like
  * the batch call. */
class CcNetSpec extends SparkTestBase {

  private lazy val docs = spark.read
    .parquet("/root/testdata/sf0.001/documents.parquet")
    .select("doc_id", "text", "lang")

  test("terciles split each language into ~equal buckets and labels " +
    "are monotone in bits_per_token") {
    val m = LmScore.model(docs, "text", vocabSize = 25)
    val out = CcNet.perplexityBuckets(docs, "doc_id", "text", "lang", m)
      .collect()
    assert(out.length == docs.count())
    val byLang = out.groupBy(_.getString(1))
    byLang.foreach { case (lang, rows) =>
      val n = rows.length
      val h = rows.count(_.getString(3) == "head")
      val mid = rows.count(_.getString(3) == "middle")
      val t = rows.count(_.getString(3) == "tail")
      assert(h + mid + t == n)
      // quantile_cont terciles: each bucket within ±2 of n/3 (ties can
      // shift the boundary by the tied run, not more on this corpus)
      Seq(h, mid, t).foreach { c =>
        assert(math.abs(c - n / 3.0) <= 2.0 + n * 0.02, s"$lang: $h/$mid/$t")
      }
      // monotone: every head bits <= every middle bits <= every tail
      def bits(b: String) = rows.filter(_.getString(3) == b)
        .map(_.getDouble(2))
      if (bits("head").nonEmpty && bits("middle").nonEmpty)
        assert(bits("head").max <= bits("middle").min)
      if (bits("middle").nonEmpty && bits("tail").nonEmpty)
        assert(bits("middle").max <= bits("tail").min)
    }
  }

  test("bucket() under frozen thresholds labels a file stream " +
    "row-for-row like the batch call") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft-ccnet-stream").toString
    docs.repartition(3).write.mode("overwrite").parquet(dir)
    val batchSrc = spark.read.parquet(dir)
    val m = LmScore.model(batchSrc, "text", vocabSize = 25)
    val th = CcNet.pplThresholds(batchSrc, "text", "lang", m)
    val want = CcNet.bucket(batchSrc, "doc_id", "text", "lang", m, th)
      .collect()
      .map(r => (r.getLong(0), r.getDouble(2), r.getString(3))).toSet
    val stream = spark.readStream.schema(batchSrc.schema)
      .option("maxFilesPerTrigger", "1").parquet(dir)
    val q = CcNet.bucket(stream, "doc_id", "text", "lang", m, th)
      .writeStream.format("memory").queryName("ccnet_eq")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val got = spark.table("ccnet_eq").collect()
        .map(r => (r.getLong(0), r.getDouble(2), r.getString(3))).toSet
      assert(got == want)
      assert(want.map(_._3) == Set("head", "middle", "tail"))
    } finally q.stop()
  }
}
