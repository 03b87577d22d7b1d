package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Temperature mixing: hand-computed α-share targets, the α=0 / α=1
  * endpoints, determinism under repartitioning, the exact/threshold
  * agreement at full keep, and the parameter contract. */
class DataMixSpec extends SparkTestBase {
  import spark.implicits._

  // 12 a / 4 b / 4 c — a skewed three-domain corpus
  private def corpus = ((0 until 12).map(i => (i.toLong, "a")) ++
    (12 until 16).map(i => (i.toLong, "b")) ++
    (16 until 20).map(i => (i.toLong, "c"))).toDF("doc_id", "dom")

  test("exact form hits the hand-computed per-group targets") {
    // alpha=0.5: shares sqrt(12):sqrt(4):sqrt(4) = 3.4641:2:2
    // totalOut=10, denom=7.4641 -> k_a=floor(4.6412)=4, k_b=k_c=2
    val out = DataMix.temperatureMixExact(corpus, "doc_id", "dom", 0.5, 10)
    val sizes = out.groupBy("dom").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(sizes == Map("a" -> 4L, "b" -> 2L, "c" -> 2L), sizes)
  }

  test("alpha=1 preserves the natural mix; alpha=0 flattens to uniform") {
    val natural = DataMix.temperatureMixExact(corpus, "doc_id", "dom", 1.0, 10)
      .groupBy("dom").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // shares 12:4:4 of 10 -> 6 / 2 / 2
    assert(natural == Map("a" -> 6L, "b" -> 2L, "c" -> 2L), natural)
    val flat = DataMix.temperatureMixExact(corpus, "doc_id", "dom", 0.0, 9)
      .groupBy("dom").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(flat == Map("a" -> 3L, "b" -> 3L, "c" -> 3L), flat)
  }

  test("membership is content-addressed: identical rows across " +
    "repartitionings, and k_g lowest-mix docs win") {
    val once = DataMix.temperatureMixExact(corpus, "doc_id", "dom", 0.5, 10)
      .select("doc_id").as[Long].collect().sorted
    val again = DataMix.temperatureMixExact(
        corpus.repartition(7), "doc_id", "dom", 0.5, 10)
      .select("doc_id").as[Long].collect().sorted
    assert(once.sameElements(again), s"${once.toSeq} vs ${again.toSeq}")
  }

  test("totalOut >= corpus keeps everything in BOTH forms (targets cap " +
    "at n_g, threshold reaches P)") {
    val exact = DataMix.temperatureMixExact(corpus, "doc_id", "dom", 0.5, 100)
    val fast = DataMix.temperatureMix(corpus, "doc_id", "dom", 0.5, 100)
    assert(exact.count() == 20 && fast.count() == 20)
  }

  test("threshold form is a strict subset of the corpus and " +
    "deterministic") {
    val kept = DataMix.temperatureMix(corpus, "doc_id", "dom", 0.5, 10)
      .select("doc_id").as[Long].collect().sorted
    val again = DataMix.temperatureMix(
        corpus.repartition(5), "doc_id", "dom", 0.5, 10)
      .select("doc_id").as[Long].collect().sorted
    assert(kept.sameElements(again))
    assert(kept.length < 20 && kept.toSet.subsetOf((0L until 20L).toSet))
  }

  test("domainDivergence matches the hand-computed unigram KL") {
    // corpus: a=2 b=2 c=1 (N=5); g1 = {a:2, b:1}, g2 = {b:1, c:1}
    val docs = Seq(("g1", "a a b"), ("g2", "b c")).toDF("dom", "text")
    val out = DataMix.domainDivergence(docs, "dom", "text")
      .orderBy("dom").collect()
    def l2(x: Double) = math.log(x) / math.log(2.0)
    val kl1 = 2.0 / 3 * l2((2.0 / 3) / (2.0 / 5)) +
      1.0 / 3 * l2((1.0 / 3) / (2.0 / 5))
    val kl2 = 0.5 * l2(0.5 / (2.0 / 5)) + 0.5 * l2(0.5 / (1.0 / 5))
    assert(out(0).getString(0) == "g1" && out(0).getLong(1) == 2L)
    assert(math.abs(out(0).getDouble(2) - kl1) < 1e-6, out(0))
    assert(math.abs(out(1).getDouble(2) - kl2) < 1e-6, out(1))
  }

  test("a domain distributed exactly like the corpus has zero KL") {
    val docs = Seq(("g1", "a a b"), ("g2", "a a b")).toDF("dom", "text")
    val out = DataMix.domainDivergence(docs, "dom", "text").collect()
    assert(out.length == 2 && out.forall(r => r.getDouble(2) == 0.0),
      out.mkString(", "))
  }

  test("domainDivergence leaves no cached-plan entry behind — the " +
    "count-table boundary is a localCheckpoint whose blocks die with " +
    "the result, not a driver-lifetime CacheManager registration") {
    spark.catalog.clearCache()
    val docs = Seq(("g1", "a a b"), ("g2", "b c")).toDF("dom", "text")
    DataMix.domainDivergence(docs, "dom", "text").collect()
    assert(org.apache.spark.sql.graftshim.Shim.cacheIsEmpty(spark),
      "domainDivergence registered a cached plan it never releases")
  }

  test("parameter contract") {
    intercept[IllegalArgumentException] {
      DataMix.temperatureMixExact(corpus, "doc_id", "dom", 1.5, 10)
    }
    intercept[IllegalArgumentException] {
      DataMix.temperatureMix(corpus, "doc_id", "dom", 0.5, 0)
    }
  }

  test("applyMix over a file stream == batch under batch-fit " +
    "thresholds — the mix stage streams like cleanWithSet and the " +
    "frozen LM (map-only under a stream-static broadcast)") {
    import org.apache.spark.sql.functions.col
    val dir = java.nio.file.Files
      .createTempDirectory("graft-mix-stream").toString
    val docs = spark.range(0, 400).selectExpr("id AS doc_id",
      "CASE WHEN id % 7 < 4 THEN 'web' WHEN id % 7 < 6 THEN 'code' " +
        "ELSE 'wiki' END AS dom")
    docs.repartition(4).write.mode("overwrite").parquet(dir)
    val batchSrc = spark.read.parquet(dir)
    // thresholds frozen on the batch snapshot (the reference corpus)
    val th = DataMix.mixThresholds(batchSrc, "dom", 0.5, 200)
    val want = DataMix.applyMix(batchSrc, "doc_id", "dom", th)
      .select("doc_id", "dom").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    val stream = spark.readStream.schema(batchSrc.schema)
      .option("maxFilesPerTrigger", "1").parquet(dir)
    val q = DataMix.applyMix(stream, "doc_id", "dom", th)
      .select("doc_id", "dom")
      .writeStream.format("memory").queryName("mix_eq")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val got = spark.table("mix_eq").collect()
        .map(r => (r.getLong(0), r.getString(1))).toSet
      assert(got == want && got.nonEmpty && got.size < 400)
      // and batch temperatureMix is the same composition end-to-end
      val direct = DataMix.temperatureMix(batchSrc, "doc_id", "dom", 0.5, 200)
        .select("doc_id", "dom").collect()
        .map(r => (r.getLong(0), r.getString(1))).toSet
      assert(direct == want)
    } finally q.stop()
  }
}
