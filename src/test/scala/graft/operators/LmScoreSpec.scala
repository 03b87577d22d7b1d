package graft.operators

import graft.SparkTestBase

/** Corpus-native add-k unigram scoring: hand-computed probabilities,
  * the typical-vs-atypical ordering the filter relies on, and the
  * parameter contract. */
class LmScoreSpec extends SparkTestBase {
  import spark.implicits._

  test("bits_per_token matches the hand-computed add-k model") {
    // corpus: a=2 b=2 c=1 -> N=5, V=3, k=0.5 -> denom 6.5
    val docs = Seq((1L, "a a b"), (2L, "b c")).toDF("doc_id", "text")
    val out = LmScore.score(docs, "doc_id", "text")
      .orderBy("doc_id").collect()
    def lp(c: Double) = -(math.log((c + 0.5) / 6.5) / math.log(2.0))
    val d1 = (2 * lp(2) + lp(2)) / 3
    val d2 = (lp(2) + lp(1)) / 2
    assert(out(0).getLong(1) == 3L && out(1).getLong(1) == 2L)
    assert(math.abs(out(0).getDouble(2) - d1) < 1e-6)
    assert(math.abs(out(1).getDouble(2) - d2) < 1e-6)
  }

  test("documents of rare tokens score strictly higher than " +
    "corpus-typical documents — the filterable signal") {
    val typical = (1 to 20).map(i => (i.toLong, "the cat sat on the mat"))
    val weird = Seq((99L, "zqx vbn plm wkj"))
    val out = LmScore.score((typical ++ weird).toDF("doc_id", "text"),
        "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val typicalMax = typical.map(t => out(t._1)).max
    assert(out(99L) > typicalMax + 1.0,
      s"weird=${out(99L)} typicalMax=$typicalMax")
  }

  test("smoothing must be positive") {
    val docs = Seq((1L, "a")).toDF("doc_id", "text")
    intercept[IllegalArgumentException] {
      LmScore.score(docs, "doc_id", "text", k = 0.0)
    }
    intercept[IllegalArgumentException] {
      LmScore.model(docs, "text", vocabSize = 0)
    }
  }

  test("a full-vocabulary frozen model reproduces score() on every " +
    "document") {
    val docs = Seq((1L, "a a b"), (2L, "b c"), (3L, "c a b"))
      .toDF("doc_id", "text")
    val exact = LmScore.score(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val m = LmScore.model(docs, "text", vocabSize = 100)
    val frozen = LmScore.scoreWithModel(docs, "doc_id", "text", m)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(frozen.keySet == exact.keySet)
    frozen.foreach { case (id, (nt, bpt)) =>
      assert(nt == exact(id)._1)
      assert(math.abs(bpt - exact(id)._2) < 1e-6, s"doc $id: $bpt vs ${exact(id)._2}")
    }
  }

  test("a truncated vocabulary only raises bits (OOV scores at the " +
    "add-k floor — the conservative direction for a filter)") {
    val docs = Seq((1L, "a a b"), (2L, "b c"), (3L, "c a b"))
      .toDF("doc_id", "text")
    val full = LmScore.scoreWithModel(docs, "doc_id", "text",
        LmScore.model(docs, "text", 100))
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val cut = LmScore.scoreWithModel(docs, "doc_id", "text",
        LmScore.model(docs, "text", 2)) // vocab {a, b}; c is OOV
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(cut(1L) == full(1L)) // doc 1 fully in-vocab
    assert(cut(2L) > full(2L) && cut(3L) > full(3L), s"$cut vs $full")
  }

  test("bigram bits_per_token matches the hand-computed add-k " +
    "conditionals (unigram first token, bigram continuations, " +
    "single-token docs)") {
    // corpus: a=2 b=2 c=1 d=1 -> N=6, V=4; pairs: (a,a) (a,b) (b,c)
    val docs = Seq((1L, "a a b"), (2L, "b c"), (3L, "d"))
      .toDF("doc_id", "text")
    val out = LmScore.scoreBigram(docs, "doc_id", "text")
      .orderBy("doc_id").collect()
    def lg(x: Double) = math.log(x) / math.log(2.0)
    def uni(c: Double) = -lg((c + 0.5) / (6.0 + 0.5 * 4))
    def bi(cb: Double, cp: Double) = -lg((cb + 0.5) / (cp + 0.5 * 4))
    val d1 = (uni(2) + bi(1, 2) + bi(1, 2)) / 3 // a | (a,a) | (a,b)
    val d2 = (uni(2) + bi(1, 2)) / 2 // b | (b,c)
    val d3 = uni(1) / 1 // single token: unigram leg only
    assert(out.map(_.getLong(1)).toSeq == Seq(3L, 2L, 1L))
    assert(math.abs(out(0).getDouble(2) - d1) < 1e-6)
    assert(math.abs(out(1).getDouble(2) - d2) < 1e-6)
    assert(math.abs(out(2).getDouble(2) - d3) < 1e-6)
  }

  test("token_bigrams keeps multiplicity (unlike ngram_shingles) and " +
    "is callable from verbatim SQL; short rows explode to nothing") {
    graft.Graft.init(spark)
    val got = spark.sql("SELECT token_bigrams('a b a b a') AS bg").head()
      .getSeq[String](0)
    assert(got == Seq("a b", "b a", "a b", "b a")) // repeats preserved
    assert(spark.sql("SELECT size(token_bigrams('solo')) AS n")
      .head().getInt(0) == 0)
    assert(spark.sql("SELECT token_bigrams(CAST(NULL AS STRING)) AS bg")
      .head().isNullAt(0))
  }

  test("the bigram model separates scrambled word order the unigram " +
    "model cannot see — the order-sensitive signal") {
    // same token multiset per doc, so unigram bits are identical; the
    // scrambled doc's (a,a)/(b,b) continuations are corpus-rare
    val natural = (1 to 20).map(i => (i.toLong, "a b a b"))
    val scrambled = Seq((99L, "a a b b"))
    val docs = (natural ++ scrambled).toDF("doc_id", "text")
    val u = LmScore.score(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(math.abs(u(99L) - u(1L)) < 1e-9) // unigram is blind to order
    val b = LmScore.scoreBigram(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(b(99L) > b(1L) + 0.5, s"scrambled=${b(99L)} natural=${b(1L)}")
  }

  test("a full-budget frozen bigram model reproduces scoreBigram() on " +
    "every document; truncated budgets only raise bits") {
    val docs = Seq((1L, "a a b"), (2L, "b c"), (3L, "c a b"), (4L, "d"))
      .toDF("doc_id", "text")
    val exact = LmScore.scoreBigram(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2)))
      .toMap
    val m = LmScore.bigramModel(docs, "text", 100, 100)
    val frozen = LmScore.scoreWithBigramModel(docs, "doc_id", "text", m)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2)))
      .toMap
    assert(frozen.keySet == exact.keySet)
    frozen.foreach { case (id, (nt, bpt)) =>
      assert(nt == exact(id)._1)
      assert(math.abs(bpt - exact(id)._2) < 1e-6,
        s"doc $id: $bpt vs ${exact(id)._2}")
    }
    // dropped counts only lower p — bits never decrease
    val cut = LmScore.scoreWithBigramModel(docs, "doc_id", "text",
        LmScore.bigramModel(docs, "text", 2, 2))
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    cut.foreach { case (id, bpt) =>
      assert(bpt >= exact(id)._2 - 1e-9, s"doc $id: $bpt < ${exact(id)._2}")
    }
    assert(cut.exists { case (id, bpt) => bpt > exact(id)._2 + 1e-6 })
  }

  test("frozen-bigram scoring runs on a structured stream (pure map, " +
    "no state), streamed == batch") {
    val docs = Seq((1L, "a a b"), (2L, "b c"), (3L, "c a b"))
      .toDF("doc_id", "text")
    val m = LmScore.bigramModel(docs, "text", 2, 2)
    val want = LmScore.scoreWithBigramModel(docs, "doc_id", "text", m)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val dir = java.nio.file.Files
      .createTempDirectory("graft-lm-bi-stream").toString
    docs.coalesce(2).write.mode("overwrite").parquet(s"$dir/in")
    val src = spark.readStream.schema(docs.schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$dir/in")
    val q = LmScore.scoreWithBigramModel(src, "doc_id", "text", m)
      .writeStream.format("memory").queryName("lm_bi_stream")
      .outputMode("append").start()
    q.processAllAvailable(); q.stop()
    val got = spark.table("lm_bi_stream")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got == want && got.nonEmpty)
  }

  test("frozen-model scoring runs on a structured stream (pure map, " +
    "no state), streamed == batch") {
    val docs = Seq((1L, "a a b"), (2L, "b c"), (3L, "c a b"))
      .toDF("doc_id", "text")
    val m = LmScore.model(docs, "text", vocabSize = 2)
    val want = LmScore.scoreWithModel(docs, "doc_id", "text", m)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val dir = java.nio.file.Files
      .createTempDirectory("graft-lm-stream").toString
    docs.coalesce(2).write.mode("overwrite").parquet(s"$dir/in")
    val src = spark.readStream.schema(docs.schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$dir/in")
    val q = LmScore.scoreWithModel(src, "doc_id", "text", m)
      .writeStream.format("memory").queryName("lm_stream")
      .outputMode("append").start()
    q.processAllAvailable(); q.stop()
    val got = spark.table("lm_stream")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got == want && got.nonEmpty)
  }
}
