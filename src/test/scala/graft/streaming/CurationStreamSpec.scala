package graft.streaming

import graft.SparkTestBase

/** The round-9 curation kernels are stateless per-row maps, so a
  * structured-streaming ingest runs them UNCHANGED — streamed ==
  * batch, no state store. Pins charset decode + mojibake repair,
  * the code-quality gate, VAD, and CDC chunking the way
  * MediaStreamSpec pins the codecs. */
class CurationStreamSpec extends SparkTestBase {

  test("decode_charset + fix_mojibake + code gate + wav_vad + " +
    "cdc_chunks over a file stream == batch") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft-curation-stream").toString
    spark.range(0, 40).selectExpr("id AS doc_id",
        "enc_media_for_id(id) AS enc",
        "wavvad_media_for_id(id) AS wav",
        "cdc_media_for_id(id) AS blob")
      .repartition(4).write.mode("overwrite").parquet(dir)
    val batchSrc = spark.read.parquet(dir)

    def features(df: org.apache.spark.sql.DataFrame) = df.selectExpr(
      "doc_id",
      "sniff_charset(enc) AS cs",
      "length(fix_mojibake(decode_charset(enc))) AS n",
      "size(wav_vad(wav, 64, 10000)) AS segs",
      "aggregate(cdc_chunks(blob, 64, 256, 1024), CAST(0 AS BIGINT), " +
        "(a, x) -> a ^ x.hash) AS hsum")

    val stream = spark.readStream.schema(batchSrc.schema)
      .option("maxFilesPerTrigger", "1").parquet(dir)
    val q = features(stream)
      .writeStream.format("memory").queryName("curation_eq")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("curation_eq").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getInt(2),
          r.getInt(3), r.getLong(4))).toSet
      val batch = features(batchSrc).collect()
        .map(r => (r.getLong(0), r.getString(1), r.getInt(2),
          r.getInt(3), r.getLong(4))).toSet
      assert(streamed == batch && batch.size == 40)
      // spot-check one value against the direct kernel
      val direct = graft.operators.Charset.decode(
        graft.operators.MediaFixtures.encMediaFor(7L))
      assert(batch.find(_._1 == 7L).get._3 ==
        graft.operators.Charset.fixMojibake(direct).length)
    } finally q.stop()
  }
}
