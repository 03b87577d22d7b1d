package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Passage chunking: window arithmetic, overlap reconstruction, and
  * the no-shuffle plan contract. */
class TextChunkSpec extends SparkTestBase {
  import spark.implicits._

  test("windows tile the document with the requested overlap") {
    val doc = (1 to 100).map(i => s"t$i").mkString(" ")
    val out = TextChunk.chunk(Seq((1L, doc)).toDF("doc_id", "text"),
        "doc_id", "text", size = 40, overlap = 10)
      .orderBy("chunk_id").collect()
    // stride 30 over 100 tokens: starts 0,30,60 (a 4th window at 90
    // would add no tokens beyond [60,100) and must not exist)
    assert(out.length == 3)
    assert(out.map(_.getAs[Int]("n_chunk_tokens")).toSeq == Seq(40, 40, 40))
    val chunks = out.map(_.getAs[String]("chunk"))
    assert(chunks(0).startsWith("t1 ") && chunks(1).startsWith("t31 "))
    assert(chunks(2).endsWith(" t100"))
    // consecutive chunks share exactly `overlap` tokens
    val w0 = chunks(0).split(" "); val w1 = chunks(1).split(" ")
    assert(w0.takeRight(10).sameElements(w1.take(10)))
  }

  test("a document shorter than one window yields exactly one chunk " +
    "equal to itself") {
    val out = TextChunk.chunk(Seq((1L, "a b c")).toDF("doc_id", "text"),
      "doc_id", "text", size = 40, overlap = 10).collect()
    assert(out.length == 1 && out.head.getAs[String]("chunk") == "a b c"
      && out.head.getAs[Int]("n_chunk_tokens") == 3)
  }

  test("every token of every document appears in some chunk (no loss)") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .filter(col("doc_id") < 50)
    val chunked = TextChunk.chunk(docs, "doc_id", "text",
      size = 20, overlap = 5)
    val reTok = chunked.filter(col("chunk_id") === 0)
      .union(chunked.filter(col("chunk_id") > 0))
    // token counts: sum over chunks - overlap tokens double-counted
    val orig = docs.select(sum(size(split(col("text"), " ")))).head().getLong(0)
    val perDoc = chunked.groupBy("doc_id")
      .agg(sum("n_chunk_tokens").as("tok"), count(lit(1)).as("nc"))
      .select(sum(col("tok") - (col("nc") - 1) * 5)).head().getLong(0)
    assert(perDoc == orig, s"chunk tokens $perDoc vs original $orig")
  }

  test("chunking is a map-side transform: no exchange in the plan") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
    val plan = TextChunk.chunk(docs, "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }
}
