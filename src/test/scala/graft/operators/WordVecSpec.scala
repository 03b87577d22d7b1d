package graft.operators

import org.apache.spark.sql.functions._

import graft.{SparkTestBase, TextEncoder}

/** The learned (model-as-parquet) text encoder: PPMI random-indexing
  * training determinism, the four deployment forms' bit-parity
  * (broadcast join / frozen map / codegen expression / mapPartitions
  * seam), and that the learned space is semantically real — words
  * sharing contexts land near each other, which the hashing encoder
  * can never do. */
class WordVecSpec extends SparkTestBase {
  import spark.implicits._

  // two topics with disjoint vocabulary plus shared stopwords, enough
  // repetition for co-occurrence statistics
  private lazy val corpus = {
    val cats = Seq(
      "the fluffy cat purrs on the warm mat",
      "a cat chases the small mouse all day",
      "the kitten purrs and chases its tail",
      "my fluffy kitten sleeps on the warm mat",
      "the cat and the kitten share the mat",
      "a small mouse fears the fluffy cat")
    val market = Seq(
      "the stock market rallies on strong earnings",
      "traders sell shares when the market drops",
      "strong earnings lift the stock price today",
      "the traders watch the market open with coffee",
      "shares of the stock rally after earnings",
      "the market price drops and traders sell")
    (cats ++ market).zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
  }

  private lazy val model =
    WordVec.train(corpus, "text", dim = 32, window = 2, minCount = 2,
      maxVocab = 1000)

  test("training is bit-deterministic: two independent runs produce " +
    "identical models (long-quantized PPMI + associative long sums)") {
    val a = model.orderBy("word").collect()
    val b = WordVec.train(corpus, "text", dim = 32, window = 2,
      minCount = 2, maxVocab = 1000).orderBy("word").collect()
    assert(a.length == b.length && a.length > 10)
    a.zip(b).foreach { case (x, y) =>
      assert(x.getString(0) == y.getString(0))
      assert(x.getSeq[Float](1) == y.getSeq[Float](1),
        s"vectors differ for ${x.getString(0)}")
    }
  }

  test("model vectors are L2-normalized and vocabulary respects " +
    "minCount") {
    val rows = model.collect()
    rows.foreach { r =>
      val v = r.getSeq[Float](1)
      val n = math.sqrt(v.map(x => x.toDouble * x.toDouble).sum)
      assert(math.abs(n - 1.0) < 1e-5, s"${r.getString(0)} norm $n")
    }
    // 'fears' appears once in the corpus -> below minCount
    assert(!rows.map(_.getString(0)).contains("fears"))
  }

  test("deployment-form parity: join form == frozen doubles exactly; " +
    "expression == mapPartitions seam exactly; OOV-only text is " +
    "null/absent everywhere") {
    val ref = WordVec.modelRef(model)
    val enc = MeanPoolEncoder(ref)
    val withOov = corpus.union(
      Seq((99L, "zzz qqq xyzzy")).toDF("doc_id", "text"))

    // join form (array<double>) vs frozen double pooling
    val joined = WordVec.encodeJoin(withOov, "doc_id", "text", model)
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(!joined.contains(99L), "OOV-only doc must drop from the join form")
    corpus.collect().foreach { r =>
      val d = enc.encodeToDoubles(r.getString(1))
      assert(joined(r.getLong(0)) == d.toSeq,
        s"join vs frozen mismatch for doc ${r.getLong(0)}")
    }
    assert(enc.encodeToDoubles("zzz qqq xyzzy") == null)

    // codegen expression vs the mapPartitions seam (both float faces)
    val viaExpr = withOov
      .select(col("doc_id"), WordVec.embed(ref, col("text")).as("v"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) null else r.getSeq[Float](1))).toMap
    val viaSeam = TextEncoder
      .encodeColumn(withOov, "text", "v", enc)
      .select("doc_id", "v")
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) null else r.getSeq[Float](1))).toMap
    assert(viaExpr == viaSeam)
    assert(viaExpr(99L) == null)
    assert(viaExpr(0L) != null)
  }

  test("the learned space is semantic: a cat-topic query ranks every " +
    "cat document above every market document (the hashing encoder " +
    "has no such structure)") {
    val enc = MeanPoolEncoder(WordVec.modelRef(model))
    val q = enc.encodeToDoubles("kitten purrs mat")
    val encoded = WordVec.encodeJoin(corpus, "doc_id", "text", model)
    val scored = encoded
      .select(col("doc_id"),
        graft.Graft.cosineSim(col("vec"), lit(q)).as("s"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val catMin = (0L to 5L).map(scored).min
    val mktMax = (6L to 11L).map(scored).max
    assert(catMin > mktMax,
      s"cat docs must outrank market docs: catMin=$catMin mktMax=$mktMax")
  }

  test("the learned encoder drops into the F1 index workflow and the " +
    "S6 search path end to end: index with MeanPoolEncoder, search an " +
    "indexed text, self-match ranks first with score 1.0") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft-wv-wf").toString
    val enc = WordVec.encoder(model)
    val docs = corpus
      .selectExpr("lpad(CAST(doc_id AS STRING), 6, '0') AS uid",
        "text", "CAST(NULL AS STRING) AS tags")
    val idx = Workflows.indexTextWorkflow(docs, "text", dir, enc)
    assert(idx.count() == 12)
    val hits = Workflows.searchWorkflow(idx, enc,
      "the kitten purrs and chases its tail", 3).collect()
    assert(hits.nonEmpty)
    assert(hits.head.getAs[String]("uid") == "000002", hits.mkString(";"))
    assert(math.abs(hits.head.getAs[Double]("score") - 1.0) < 1e-6)
  }

  test("frozen encode on a STRUCTURED STREAM == batch, row for row " +
    "(the wordvec_embed expression is a stateless map — the streaming " +
    "deployment form)") {
    val ref = WordVec.modelRef(model)
    val dir = java.nio.file.Files
      .createTempDirectory("graft-wv-stream").toString
    corpus.coalesce(2).write.mode("overwrite").parquet(s"$dir/in")
    val src = spark.readStream.schema(corpus.schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$dir/in")
    val q = src.select(col("doc_id"), WordVec.embed(ref, col("text")).as("v"))
      .writeStream.format("memory").queryName("wv_stream")
      .outputMode("append").start()
    q.processAllAvailable(); q.stop()
    val streamed = spark.table("wv_stream").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    val batch = corpus
      .select(col("doc_id"), WordVec.embed(ref, col("text")).as("v"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    assert(streamed == batch && streamed.size == 12)
  }

  test("save/load round-trips the model; registerSql binds the model " +
    "in SQL and re-registering rebinds") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft-wordvec").toString
    WordVec.save(model, s"$dir/m")
    val loaded = WordVec.load(spark, s"$dir/m")
    assert(loaded.orderBy("word").collect().toSeq ==
      model.orderBy("word").collect().toSeq)

    WordVec.registerSql(spark, WordVec.modelRef(loaded))
    corpus.createOrReplaceTempView("wv_corpus")
    val viaSql = spark.sql(
      "SELECT doc_id, wordvec_embed(text) AS v FROM wv_corpus")
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    val enc = MeanPoolEncoder(WordVec.modelRef(loaded))
    assert(viaSql(0L) == enc("the fluffy cat purrs on the warm mat").toSeq)

    // rebinding with a single-word model must change the output
    val tiny = Seq(("cat", Array.fill(32)(1.0f / math.sqrt(32).toFloat)))
      .toDF("word", "vec")
    WordVec.registerSql(spark, WordVec.modelRef(tiny))
    val rebound = spark.sql(
      "SELECT wordvec_embed('cat cat') AS v").head().getSeq[Float](0)
    assert(rebound == Array.fill(32)(1.0f / math.sqrt(32).toFloat).toSeq)
  }
}
