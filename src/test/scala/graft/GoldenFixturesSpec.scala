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
}
