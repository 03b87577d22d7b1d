package graft.streaming

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** The media decode expressions are stateless per-row kernels, so a
  * structured-streaming crawl ingest runs them UNCHANGED — the same
  * plan shape as batch, no state store, no watermark. These specs pin
  * streamed == batch for the round-7 codecs (audio windows, GIF frame
  * stats) the way DedupStreamSpec pins `cleanWithSet`. */
class MediaStreamSpec extends SparkTestBase {

  test("gif_frame_stats + wav_windows over a file stream == batch " +
    "(stateless expressions need no state store)") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft-media-stream").toString
    val src = spark.range(0, 40).selectExpr("id AS doc_id",
      "gif_media_for_id(id) AS gif", "wav_media_for_id(id) AS wav")
    src.repartition(4).write.mode("overwrite").parquet(dir)
    val batchSrc = spark.read.parquet(dir)

    def features(df: org.apache.spark.sql.DataFrame) = df.selectExpr(
      "doc_id",
      "aggregate(gif_frame_stats(gif), CAST(0 AS BIGINT), (a, x) -> a + x.pix_sum) AS gif_pix",
      "size(gif_frame_stats(gif)) AS gif_frames",
      "aggregate(wav_windows(wav, 64), CAST(0 AS BIGINT), (a, x) -> a + x.energy) AS wav_energy")

    val stream = spark.readStream.schema(batchSrc.schema)
      .option("maxFilesPerTrigger", "1").parquet(dir)
    val q = features(stream)
      .writeStream.format("memory").queryName("media_eq")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("media_eq").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getLong(3)))
        .toSet
      val batch = features(batchSrc).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getLong(3)))
        .toSet
      assert(streamed == batch && batch.size == 40)
      // and the values are the real decode, not a fallback: spot-check
      // doc 3 against the direct codec
      val d = graft.operators.Gif.decode(
        graft.operators.MediaFixtures.gifMediaFor(3L)).get
      val expected = d.frames.map(_.luma.map(_ & 0xff).map(_.toLong).sum).sum
      assert(batch.find(_._1 == 3L).get._2 == expected)
    } finally q.stop()
  }
}
