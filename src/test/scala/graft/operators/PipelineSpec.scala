package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** End-to-end behavior of the composed pretraining pipeline on a
  * hand-built corpus where every stage's effect is known exactly. */
class PipelineSpec extends SparkTestBase {
  import spark.implicits._

  // corpus: 1-2 are post-scrub duplicates (emails differ pre-scrub!),
  // 3 is contaminated (shares the benchmark's 5-grams), 4 is junk the
  // gate drops (no stopwords), 5-8 are clean keepers
  private val good = "the quick brown fox jumps over the lazy dog " +
    "and runs far away to the deep green forest tonight with joy"
  private def corpus = Seq(
    (1L, "the dup page mail alice@a.com", "en"),
    (2L, "the dup page mail bob@b.org", "en"),
    (3L, s"leaked eval question one two three four five end", "en"),
    (4L, "alpha beta gamma delta epsilon zeta eta theta", "en"),
    (5L, good, "en"),
    (6L, good.replace("quick", "quiet"), "en"),
    (7L, good.replace("quick", "quaint"), "fr"),
    (8L, good.replace("quick", "quilted"), "fr")
  ).toDF("doc_id", "text", "lang")

  private val bench = Seq(
    "question one two three four five",
    "totally unrelated benchmark prompt here")
  private def gateCfg = Pipeline.GateConfig(minTokens = 4,
    maxTokens = 100, minDistinctRatio = 0.3, minStopwords = 1,
    minMeanWordLen = 1.0, maxMeanWordLen = 10.0,
    maxTopBigramFrac = 0.9, maxBitsPerToken = 1e9)

  private def model = LmScore.model(
    TextClean.redactPii(corpus, "text"), "text", vocabSize = 1024)

  test("cleaned: scrub enables the dedup (1-2 identical only after " +
    "redaction), decontamination drops the benchmark leak, the gate " +
    "drops the stopword-free doc, and survivors keep their columns") {
    val out = Pipeline.cleaned(corpus, "doc_id", "text",
      Decontaminate.benchmarkShingles(
        bench.zipWithIndex.map { case (t, i) => (i.toLong, t) }
          .toDF("doc_id", "text"), "doc_id", "text", 5),
      shingleN = 5, minHits = 2, model, gateCfg)
    assert(out.columns.toSeq == Seq("doc_id", "text", "lang"))
    val rows = out.orderBy("doc_id").collect()
    // 2 gone (dup of 1 post-scrub), 3 gone (contaminated: shares the
    // 5-grams "question one two three four" + "one two three four
    // five"), 4 gone (no stopwords)
    assert(rows.map(_.getLong(0)).toSeq == Seq(1L, 5L, 6L, 7L, 8L),
      rows.mkString("; "))
    assert(rows.head.getString(1) == "the dup page mail <EMAIL>")
  }

  test("pretrain packs the mixed survivors at exact global offsets " +
    "(every sequence filled to seqLen except the last; offsets " +
    "contiguous in doc order)") {
    val out = Pipeline.pretrain(corpus, "doc_id", "text", "lang",
      Seq("question one two three four", "one two three four five"),
      shingleN = 5, minHits = 2, model, gateCfg,
      alpha = 0.5, totalOut = 100, seqLen = 7)
      .orderBy("doc_id", "seq_id").collect()
    // totalOut >= corpus → mix keeps all 5 cleaned docs: 5 + 21*4
    // tokens = 89 = 12 seqs of 7 + one of 5
    val bySeq = out.groupBy(_.getLong(1)).view
      .mapValues(_.map(_.getLong(3)).sum).toMap
    assert(bySeq.keys.max == 12L && bySeq(12L) == 5L, bySeq)
    assert((0L to 11L).forall(bySeq(_) == 7L), bySeq)
    // per-doc coverage: n_toks sums to the doc's token count
    val byDoc = out.groupBy(_.getLong(0)).view
      .mapValues(_.map(_.getLong(3)).sum).toMap
    assert(byDoc == Map(1L -> 5L, 5L -> 21L, 6L -> 21L, 7L -> 21L,
      8L -> 21L), byDoc)
  }

  test("the mix stage subsamples inside the pipeline: a tight " +
    "totalOut keeps a strict, deterministic subset") {
    val packed = Pipeline.pretrain(corpus, "doc_id", "text", "lang",
      Seq.empty[String] :+ "no shingle matches this benchmark x y",
      shingleN = 5, minHits = 1, model, gateCfg,
      alpha = 0.5, totalOut = 2, seqLen = 7)
    val docs = packed.select("doc_id").distinct()
      .as[Long].collect().toSet
    val again = Pipeline.pretrain(corpus, "doc_id", "text", "lang",
      Seq.empty[String] :+ "no shingle matches this benchmark x y",
      shingleN = 5, minHits = 1, model, gateCfg,
      alpha = 0.5, totalOut = 2, seqLen = 7)
      .select("doc_id").distinct().as[Long].collect().toSet
    assert(docs == again, "mix membership must be content-addressed")
    assert(docs.nonEmpty && docs.size < 5, docs)
  }

  test("ingestFilter over a file stream == batch — the map-only " +
    "ingest half (scrub -> set-decontaminate -> gate -> threshold " +
    "mix) filters a streaming crawl exactly as it filters a batch " +
    "table, under a model and thresholds frozen on the batch " +
    "snapshot") {
    import org.apache.spark.sql.functions.col
    val dir = java.nio.file.Files
      .createTempDirectory("graft-ingest-stream").toString
    corpus.repartition(2).write.mode("overwrite").parquet(dir)
    val batchSrc = spark.read.parquet(dir)
    val m = model
    val th = DataMix.mixThresholds(
      Pipeline.ingestGate(batchSrc, "text", bench, 5, 1, m, gateCfg),
      "lang", 0.5, 6)
    def f(df: org.apache.spark.sql.DataFrame) =
      Pipeline.ingestFilter(df, "doc_id", "text", "lang",
        bench, 5, 1, m, gateCfg, th)
    val want = f(batchSrc).select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    // the stages actually fire: the contaminated doc and the junk doc
    // are gone, survivors carry the SCRUBBED text
    assert(!want.exists(_._1 == 3L) && !want.exists(_._1 == 4L))
    assert(want.nonEmpty)
    assert(want.filter(t => t._1 == 1L || t._1 == 2L)
      .forall(_._2.endsWith("<EMAIL>")))
    val stream = spark.readStream.schema(batchSrc.schema)
      .option("maxFilesPerTrigger", "1").parquet(dir)
    val q = f(stream).select("doc_id", "text")
      .writeStream.format("memory").queryName("ingest_eq")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val got = spark.table("ingest_eq").collect()
        .map(r => (r.getLong(0), r.getString(1))).toSet
      assert(got == want)
    } finally q.stop()
  }

  test("no cached relations survive the pipeline (the clean-corpus " +
    "boundary is a checkpoint, not an unreleased persist)") {
    val before = spark.sparkContext.getPersistentRDDs.size
    Pipeline.pretrain(corpus, "doc_id", "text", "lang",
      Seq("question one two three four"), shingleN = 5, minHits = 1,
      model, gateCfg, alpha = 0.5, totalOut = 100, seqLen = 7).count()
    assert(spark.sharedState.cacheManager.isEmpty,
      "pipeline must not leave CacheManager entries")
    val after = spark.sparkContext.getPersistentRDDs.size
    // one run leaves at most its OWN checkpoint blocks pending GC:
    // the clean-corpus boundary, the (tiny, eager) mixThresholds
    // table, and (r17) the model fitter's vocabulary-sized counts
    // materialization — all reclaimed by the ContextCleaner, never
    // CacheManager registrations
    assert(after <= before + 4,
      s"checkpoint RDDs must be reclaimable: $before -> $after")
  }
}
