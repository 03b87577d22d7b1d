package graft.streaming

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.operators.SimHash

/** Streaming near-dup detection: streamed pair set equals the batch
  * pigeonhole join, including pairs that span micro-batches (the
  * stateful part). */
class DedupStreamSpec extends SparkTestBase {

  private lazy val docs = spark.read
    .parquet("/root/testdata/sf0.001/documents.parquet")

  test("batch-mode run equals SimHash.nearDupPairs exactly") {
    val want = SimHash.nearDupPairs(docs, "doc_id", "text", maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val got = DedupStream.nearDupPairs(docs, "doc_id", "text", maxHamming = 3)
      .collect().map(p => (p.id_a, p.id_b, p.hamming)).toSet
    assert(want.nonEmpty && got == want)
  }

  test("streamed micro-batches find the same pairs, including pairs " +
    "spanning batches") {
    val streamDir = java.nio.file.Files
      .createTempDirectory("graft-dedup-stream").toString
    // split so that known near-dup pairs land in DIFFERENT files: even
    // ids then odd ids (planted dups are id/id+N shaped — most split)
    docs.filter(col("doc_id") % 2 === 0).coalesce(1)
      .write.mode("overwrite").parquet(s"$streamDir/f0")
    docs.filter(col("doc_id") % 2 === 1).coalesce(1)
      .write.mode("append").parquet(s"$streamDir/f0")
    val src = spark.readStream
      .schema(docs.schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$streamDir/f0")
    val q = DedupStream.nearDupPairs(src, "doc_id", "text", maxHamming = 3)
      .writeStream.format("memory").queryName("dedup_stream")
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    val rows = spark.table("dedup_stream")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    val got = rows.toSet
    val want = SimHash.nearDupPairs(docs, "doc_id", "text", maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(got == want, s"streamed ${got.size} vs batch ${want.size}")
    // unique-emission contract: each pair appears EXACTLY once
    assert(rows.length == got.size,
      s"${rows.length - got.size} duplicate emissions")
    // the stateful path genuinely fired: some pair crosses the
    // even/odd file split
    assert(want.exists { case (a, b, _) => (a + b) % 2 == 1 },
      "test split must produce at least one cross-batch pair")
  }
}
