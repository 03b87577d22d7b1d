package graft.operators

import graft.SparkTestBase

class QualityGateSpec extends SparkTestBase {
  import spark.implicits._

  private def m(docs: org.apache.spark.sql.DataFrame) =
    LmScore.model(docs, "text", vocabSize = 1024)

  test("every signal matches a hand computation on a tiny corpus, " +
    "and keep is their conjunction") {
    val docs = Seq(
      // 6 tokens, all distinct, 1 stopword, mean len 20/6, no repeat
      (1L, "the quick brown fox jumps high"),
      // heavy bigram repetition: "go go" appears 4x of 5 bigrams
      (2L, "go go go go go stop"),
      // no stopwords at all
      (3L, "alpha beta gamma delta epsilon zeta")
    ).toDF("doc_id", "text")
    val out = QualityGate.gate(docs, "doc_id", "text", m(docs),
        minTokens = 2, maxTokens = 100, minDistinctRatio = 0.4,
        minStopwords = 1, minMeanWordLen = 1.0, maxMeanWordLen = 10.0,
        maxTopBigramFrac = 0.5, maxBitsPerToken = 1e9)
      .orderBy("doc_id").collect()
    val r1 = out(0)
    assert(r1.getLong(1) == 6L) // n_tokens
    assert(r1.getDouble(2) == 1.0) // distinct_ratio
    assert(r1.getLong(3) == 1L) // n_stopwords ("the")
    assert(r1.getDouble(4) == math.rint(25.0 / 6 * 1e6) / 1e6, r1) // mean_word_len
    assert(r1.getDouble(5) == 0.2) // "quick brown" etc all unique: 1/5
    assert(r1.getBoolean(7), r1) // keep
    val r2 = out(1)
    assert(r2.getLong(1) == 6L)
    assert(r2.getDouble(2) == math.rint(2.0 / 6 * 1e6) / 1e6) // go, stop
    assert(r2.getDouble(5) == 0.8) // "go go" 4 of 5 bigrams
    assert(!r2.getBoolean(7), "bigram repetition + distinct ratio drop it")
    val r3 = out(2)
    assert(r3.getLong(3) == 0L)
    assert(!r3.getBoolean(7), "no stopwords drops it")
  }

  test("edge shapes: a 1-token doc has zero bigram fraction and is " +
    "droppable only by the token bound; thresholds compare on the " +
    "rounded values (boundary docs keep deterministically)") {
    val docs = Seq((1L, "word"), (2L, "the the")).toDF("doc_id", "text")
    val out = QualityGate.gate(docs, "doc_id", "text", m(docs),
        minTokens = 1, maxTokens = 10, minDistinctRatio = 0.5,
        minStopwords = 0, minMeanWordLen = 1.0, maxMeanWordLen = 10.0,
        maxTopBigramFrac = 1.0, maxBitsPerToken = 1e9)
      .orderBy("doc_id").collect()
    assert(out(0).getDouble(5) == 0.0 && out(0).getBoolean(7))
    // "the the": distinct_ratio 0.5 lands EXACTLY on the threshold —
    // rounded-value comparison keeps it on both engines
    assert(out(1).getDouble(2) == 0.5 && out(1).getBoolean(7))
  }

  test("the gate's LM term equals lm_quality's full-vocabulary score " +
    "when the frozen model covers the whole vocabulary") {
    val docs = Seq((1L, "a b c a"), (2L, "c c d")).toDF("doc_id", "text")
    val viaGate = QualityGate.gate(docs, "doc_id", "text", m(docs))
      .select("doc_id", "bits_per_token").orderBy("doc_id").collect()
    val viaScore = LmScore.score(docs, "doc_id", "text")
      .select("doc_id", "bits_per_token").orderBy("doc_id").collect()
    assert(viaGate.map(_.getDouble(1)).toSeq ==
      viaScore.map(_.getDouble(1)).toSeq)
  }

  test("gateBigram's LM term equals scoreBigram's full-formula score " +
    "under covering budgets, and the non-LM signals match gate()") {
    val docs = Seq((1L, "the cat sat on the mat with a hat"),
      (2L, "the the the the the and and and and and"),
      (3L, "a b c d e f g h i j")).toDF("doc_id", "text")
    val bm = LmScore.bigramModel(docs, "text", 1024, 4096)
    val viaGate = QualityGate.gateBigram(docs, "doc_id", "text", bm,
        minTokens = 2, minDistinctRatio = 0.1, minMeanWordLen = 1.0,
        maxTopBigramFrac = 1.0)
      .orderBy("doc_id").collect()
    val viaScore = LmScore.scoreBigram(docs, "doc_id", "text")
      .orderBy("doc_id").collect()
    viaGate.zip(viaScore).foreach { case (g, sc) =>
      assert(math.abs(g.getDouble(6) - sc.getDouble(2)) < 1e-6,
        s"doc ${g.getLong(0)}")
    }
    val um = m(docs)
    val uni = QualityGate.gate(docs, "doc_id", "text", um,
        minTokens = 2, minDistinctRatio = 0.1, minMeanWordLen = 1.0,
        maxTopBigramFrac = 1.0)
      .orderBy("doc_id").collect()
    viaGate.zip(uni).foreach { case (b, u) =>
      (1 to 5).foreach(i => assert(b.get(i) == u.get(i),
        s"non-LM signal $i diverged"))
    }
  }

  test("gate over a file stream == batch under a batch-fit frozen " +
    "model — all six signals and the conjunction are per-row maps, " +
    "so the SAME call gates a streaming ingest") {
    import org.apache.spark.sql.functions.col
    val dir = java.nio.file.Files
      .createTempDirectory("graft-gate-stream").toString
    val docs = spark.range(0, 120).selectExpr("id AS doc_id",
      "CASE WHEN id % 5 = 0 THEN 'the the the the the' " +
        "ELSE concat('the quick doc ', id, ' talks about topic ', " +
        "id % 7, ' and more') END AS text")
    docs.repartition(3).write.mode("overwrite").parquet(dir)
    val batchSrc = spark.read.parquet(dir)
    val model = m(batchSrc)
    def g(df: org.apache.spark.sql.DataFrame) =
      QualityGate.gate(df, "doc_id", "text", model,
        minTokens = 3, minDistinctRatio = 0.5, maxTopBigramFrac = 0.5)
    val want = g(batchSrc).collect()
      .map(r => (r.getLong(0), r.getDouble(6), r.getBoolean(7))).toSet
    val stream = spark.readStream.schema(batchSrc.schema)
      .option("maxFilesPerTrigger", "1").parquet(dir)
    val q = g(stream)
      .writeStream.format("memory").queryName("gate_eq")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val got = spark.table("gate_eq").collect()
        .map(r => (r.getLong(0), r.getDouble(6), r.getBoolean(7))).toSet
      assert(got == want && got.size == 120)
      // the thresholds actually split this corpus both ways
      assert(want.exists(_._3) && want.exists(!_._3))
    } finally q.stop()
  }

  test("parameter contract: stopwords are validated (they are spliced " +
    "into an expression) and token bounds sanity-checked") {
    val docs = Seq((1L, "a")).toDF("doc_id", "text")
    val model = m(docs)
    intercept[IllegalArgumentException] {
      QualityGate.gate(docs, "doc_id", "text", model,
        stopwords = Seq("bad') OR ('1"))
    }
    intercept[IllegalArgumentException] {
      QualityGate.gate(docs, "doc_id", "text", model,
        minTokens = 10, maxTokens = 5)
    }
  }
}
