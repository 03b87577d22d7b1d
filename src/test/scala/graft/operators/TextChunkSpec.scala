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

  /** Local reference packer: lay docs end to end in id order, emit
    * every (doc, sequence) overlap. */
  private def packRef(docs: Seq[(Long, String)], seqLen: Int)
      : Seq[(Long, Long, Long, Long)] = {
    var off = 0L
    docs.sortBy(_._1).flatMap { case (id, text) =>
      val n = text.split(" ", -1).length.toLong
      val rows = (off / seqLen to (off + n - 1) / seqLen).map { k =>
        val from = math.max(0L, k * seqLen - off)
        val nt = math.min((k + 1) * seqLen, off + n) -
          math.max(k * seqLen, off)
        (id, k, from, nt)
      }
      off += n
      rows
    }
  }

  test("packSequences matches the reference packer and conserves " +
    "every token exactly once") {
    val rnd = new scala.util.Random(7)
    val docs = (0L until 200L).map(i =>
      (i, (0 until 1 + rnd.nextInt(40)).map(j => s"w$j").mkString(" ")))
    val out = TextChunk.packSequences(
        docs.toDF("doc_id", "text"), "doc_id", "text", seqLen = 64)
      .orderBy("doc_id", "seq_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSeq
    assert(out == packRef(docs, 64))
    // conservation: per-doc n_toks sums to the doc's token count, and
    // per-sequence sums hit seqLen exactly (except the final sequence)
    val totalToks = docs.map(_._2.split(" ", -1).length.toLong).sum
    assert(out.map(_._4).sum == totalToks)
    val perSeq = out.groupBy(_._2).view.mapValues(_.map(_._4).sum).toMap
    val lastSeq = perSeq.keys.max
    perSeq.foreach { case (k, s) =>
      assert(k == lastSeq || s == 64L, s"seq $k holds $s tokens")
    }
  }

  test("packSequences is bucket-invariant: sparse ids and any bucket " +
    "count land every doc at the same global offset") {
    val docs = Seq(3L, 900L, 901L, 50000L, 123456789L)
      .map(i => (i, (0 until (i % 37 + 1).toInt).map(_ => "x")
        .mkString(" ")))
    val expected = packRef(docs, 32)
    Seq(1, 7, 32).foreach { b =>
      val out = TextChunk.packSequences(
          docs.toDF("doc_id", "text"), "doc_id", "text", 32, buckets = b)
        .orderBy("doc_id", "seq_id")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3))).toSeq
      assert(out == expected, s"buckets=$b")
    }
  }

  test("packSequences boundary cases: a doc ending exactly on a " +
    "sequence boundary, and a doc spanning several sequences") {
    // doc 0: 64 tokens = exactly sequence 0; doc 1: 200 tokens spans
    // sequences 1..4 (offsets 64..263)
    val docs = Seq(
      (0L, (1 to 64).map(_ => "a").mkString(" ")),
      (1L, (1 to 200).map(_ => "b").mkString(" ")))
    val out = TextChunk.packSequences(
        docs.toDF("doc_id", "text"), "doc_id", "text", 64)
      .orderBy("doc_id", "seq_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSeq
    assert(out == Seq((0L, 0L, 0L, 64L), (1L, 1L, 0L, 64L),
      (1L, 2L, 64L, 64L), (1L, 3L, 128L, 64L), (1L, 4L, 192L, 8L)))
  }

  test("packSequences leaves no cached-plan entry behind — the " +
    "(id, n) boundary is a localCheckpoint whose blocks die with the " +
    "result, not a driver-lifetime CacheManager registration") {
    spark.catalog.clearCache()
    val docs = spark.range(100)
      .selectExpr("id AS doc_id", "'a b c d e' AS text")
    TextChunk.packSequences(docs, "doc_id", "text", 7).collect()
    assert(org.apache.spark.sql.graftshim.Shim.cacheIsEmpty(spark),
      "packSequences registered a cached plan it never releases")
  }

  test("packSequences never plans a single-partition global sort — " +
    "the prefix sum is bucketed") {
    val docs = spark.range(1000)
      .selectExpr("id AS doc_id", "'a b c d e' AS text")
    val plan = TextChunk.packSequences(docs, "doc_id", "text", 128)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("SinglePartition"), plan)
    assert(plan.contains("Window"), plan)
  }
}
