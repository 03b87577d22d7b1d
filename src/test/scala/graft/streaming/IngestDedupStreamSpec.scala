package graft.streaming

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.operators.SimHash

/** The stream-safe incremental-ingest gate: exact-fingerprint
  * left-anti against the static base, streamed == batch, with the
  * reshuffled-token catch the raw-text hash would miss. */
class IngestDedupStreamSpec extends SparkTestBase {
  import spark.implicits._

  private val base = Seq(
    (1L, "the quick brown fox jumps"),
    (2L, "some other base document text")).toDF("doc_id", "text")

  private val incoming = Seq(
    (10L, "the quick brown fox jumps"), // exact dup of base 1
    (11L, "jumps fox brown quick the"), // token-reshuffle of base 1
    (12L, "an entirely new document"),
    (13L, "")) // unfingerprintable: passes
    .toDF("doc_id", "text")

  test("batch: exact and reshuffled dups drop, novel and empty rows " +
    "pass, columns preserved") {
    val out = SimHash.filterAgainstExact(base, incoming, "doc_id", "text")
    assert(out.columns.toSeq == Seq("doc_id", "text"))
    assert(out.collect().map(_.getLong(0)).toSet == Set(12L, 13L))
  }

  test("the same call gates a structured stream (stream-static " +
    "left-anti, no state), streamed == batch") {
    val want = SimHash.filterAgainstExact(base, incoming, "doc_id", "text")
      .collect().map(_.getLong(0)).toSet
    val dir = java.nio.file.Files
      .createTempDirectory("graft-ingest-gate").toString
    incoming.coalesce(2).write.mode("overwrite").parquet(s"$dir/in")
    val src = spark.readStream.schema(incoming.schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$dir/in")
    val q = SimHash.filterAgainstExact(base, src, "doc_id", "text")
      .writeStream.format("memory").queryName("ingest_gate")
      .outputMode("append").start()
    q.processAllAvailable(); q.stop()
    val got = spark.table("ingest_gate")
      .collect().map(_.getLong(0)).toSet
    assert(got == want && got.nonEmpty)
  }
}
