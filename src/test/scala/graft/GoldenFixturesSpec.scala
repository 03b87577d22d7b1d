package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.operators.Workflows

/** Ports the reference's recorded ("golden") outputs — FIXTURES.md. */
class GoldenFixturesSpec extends SparkTestBase {
  import spark.implicits._

  /** The 6-sentence news corpus (test_weaviate.py:255-262,
    * 01_simple.ipynb cell 7). */
  val corpus = Seq(
    "US tops 5 million confirmed virus cases",
    "Canada's last fully intact ice shelf has suddenly collapsed, " +
      "forming a Manhattan-sized iceberg",
    "Beijing mobilises invasion craft along coast as Taiwan tensions escalate",
    "The National Park Service warns against sacrificing slower friends " +
      "in a bear attack",
    "Maine man wins $1M from $25 lottery ticket",
    "Make huge profits without work, earn up to $100,000 a day")

  test("L3 golden aggregate row: count=6, min=39, max=94, sum=387 " +
    "(01_simple.ipynb:482)") {
    val df = corpus.zipWithIndex
      .map { case (text, i) => (i.toLong, text, text.length.toLong) }
      .toDF("uid", "text", "length")
    val row = df.agg(
      count(lit(1)).as("cnt"), min("length"), max("length"), sum("length"))
      .head()
    assert(row.getLong(0) == 6L)
    assert(row.getLong(1) == 39L)
    assert(row.getLong(2) == 94L)
    assert(row.getLong(3) == 387L)
  }

  test("8-query relevance table: every query hits its recorded top-1 doc " +
    "(01_simple.ipynb cells 7-9)") {
    // topic-direction vectors: docs get basis directions; queries get
    // vectors leaning toward their recorded answer with cross-topic
    // noise — the deterministic offline stand-in for the notebook's
    // sentence-transformer geometry (FIXTURES.md §1.1)
    val dim = 6
    def doc(i: Int) = { val a = Array.fill(dim)(0f); a(i) = 1f; a }
    def query(main: Int, noise: Seq[(Int, Float)]) = {
      val a = Array.fill(dim)(0f); a(main) = 0.8f
      noise.foreach { case (i, w) => a(i) = w }; a
    }
    val expectations = Seq( // query name, vector, expected top-1 docid
      ("feel good story", query(4, Seq(5 -> 0.2f)), 4L),
      ("climate change", query(1, Seq(0 -> 0.1f)), 1L),
      ("public health story", query(0, Seq(4 -> 0.2f)), 0L),
      ("war", query(2, Seq(1 -> 0.1f)), 2L),
      ("wildlife", query(3, Seq(1 -> 0.2f)), 3L),
      ("asia", query(2, Seq(5 -> 0.1f)), 2L),
      ("lucky", query(4, Seq(3 -> 0.1f)), 4L),
      ("dishonest junk", query(5, Seq(4 -> 0.2f)), 5L))
    val index = corpus.indices
      .map(i => (i.toLong, doc(i), corpus(i))).toDF("docid", "vector", "text")
    expectations.foreach { case (name, qv, expected) =>
      val top = operators.Knn.search(index, "vector", "docid", qv, 1)
        .select("docid").head().getLong(0)
      assert(top == expected, s"query '$name' expected doc $expected got $top")
    }
  }

  test("index + search workflows compose end-to-end (README.md:30-43)") {
    // deterministic stand-in encoder: one basis direction per topic
    // (FIXTURES.md note: offline replacement for sentence-transformers)
    def enc(text: String): Array[Float] = {
      val a = Array.fill(64)(0f)
      a(math.floorMod(text.split(" ").head.hashCode, 64)) = 1f
      a
    }
    val docs = corpus.zipWithIndex
      .map { case (t, i) => (i.toString, enc(t), t) }
      .toDF("uid", "vector", "text")
    val dir = Files.createTempDirectory("wf").toString
    val idx = Workflows.indexWorkflow(docs, dir)
    assert(idx.count() == 6)
    val hits = Workflows.searchWorkflow(idx, enc, corpus(4), 1)
    assert(hits.select("uid").head().getString(0) == "4")
  }

  test("image corpus end-to-end: REAL pixel decode -> real features -> " +
    "vector index -> self-match search (no stub in the path)") {
    import org.apache.spark.sql.functions.col
    // 20 pixel-bearing PNGs + 20 DC-only JPEGs in one binary column
    val ids = spark.range(40).select(col("id").as("doc_id"))
    val media = ids.withColumn("media",
      org.apache.spark.sql.functions.when(col("doc_id") % 2 === 0,
        org.apache.spark.sql.graftshim.Shim.column(
          functions.PixelMediaBytes(
            org.apache.spark.sql.graftshim.Shim.expression(
              col("doc_id")))))
        .otherwise(org.apache.spark.sql.graftshim.Shim.column(
          functions.JpegPixelMediaBytes(
            org.apache.spark.sql.graftshim.Shim.expression(
              col("doc_id"))))))
    val feats = operators.Multimodal.extractFeatures(media, "media", 16)
      .select(col("doc_id").cast("string").as("uid"),
        col("features").as("vector"))
    val dir = Files.createTempDirectory("wf-img").toString
    val idx = Workflows.indexWorkflow(feats, dir)
    assert(idx.count() == 40)
    // every image's own histogram must self-match at score 1.0
    Seq(6L, 7L).foreach { probe =>
      val qv = feats.filter(col("uid") === probe.toString)
        .select("vector").head().getSeq[Float](0).toArray
      val top = idx.search(qv, 1).head()
      assert(top.getAs[String]("uid") == probe.toString, s"probe $probe")
      assert(math.abs(top.getAs[Double]("score") - 1.0) < 1e-9)
    }
  }
}
