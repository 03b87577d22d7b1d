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

  test("avi_frame_stats + avi_frame_diffs over a file stream == batch " +
    "— container-video decode streams like every other expression") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft-avi-stream").toString
    spark.range(0, 30).selectExpr("id AS doc_id",
        "avi_media_for_id(id) AS avi")
      .repartition(3).write.mode("overwrite").parquet(dir)
    val batchSrc = spark.read.parquet(dir)

    def features(df: org.apache.spark.sql.DataFrame) = df.selectExpr(
      "doc_id",
      "aggregate(avi_frame_stats(avi), CAST(0 AS BIGINT), (a, x) -> a + x.pix_sum) AS pix",
      "size(avi_frame_stats(avi)) AS frames",
      "aggregate(avi_frame_diffs(avi), CAST(0 AS BIGINT), (a, x) -> a + x.sad) AS sad")

    val stream = spark.readStream.schema(batchSrc.schema)
      .option("maxFilesPerTrigger", "1").parquet(dir)
    val q = features(stream)
      .writeStream.format("memory").queryName("avi_eq")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("avi_eq").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getLong(3)))
        .toSet
      val batch = features(batchSrc).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getLong(3)))
        .toSet
      assert(streamed == batch && batch.size == 30)
      // real decode spot-check: doc 5 against the direct codec
      val d = graft.operators.Avi.decode(
        graft.operators.MediaFixtures.aviMediaFor(5L)).get
      val expected = d.frames.map(_.pixels.map(_ & 0xff).map(_.toLong).sum).sum
      assert(batch.find(_._1 == 5L).get._2 == expected)
      assert(batch.find(_._1 == 5L).get._3 == d.frames.length)
    } finally q.stop()
  }

  test("redactPii over a file stream == batch — the PII scrub is a " +
    "stateless projection, so a streaming ingest cleans in place") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft-pii-stream").toString
    spark.range(0, 50).selectExpr("id AS doc_id",
        "concat('doc ', id, ' from u', id, '@ex.org at 10.0.0.', id % 250) AS text")
      .repartition(5).write.mode("overwrite").parquet(dir)
    val batchSrc = spark.read.parquet(dir)
    def clean(df: org.apache.spark.sql.DataFrame) =
      graft.operators.TextClean.redactPii(df, "text")
    val stream = spark.readStream.schema(batchSrc.schema)
      .option("maxFilesPerTrigger", "1").parquet(dir)
    val q = clean(stream)
      .writeStream.format("memory").queryName("pii_eq")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("pii_eq").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getInt(2), r.getInt(5)))
        .toSet
      val batch = clean(batchSrc).collect()
        .map(r => (r.getLong(0), r.getString(1), r.getInt(2), r.getInt(5)))
        .toSet
      assert(streamed == batch && batch.size == 50)
      val row7 = batch.find(_._1 == 7L).get
      assert(row7._2 == "doc 7 from <EMAIL> at <IP>")
      assert(row7._3 == 1 && row7._4 == 1) // n_email, n_ip
    } finally q.stop()
  }

  test("round-8 kernels over a file stream == batch: web-PNG decode, " +
    "dHash, spectral DFT, composited GIF") {
    graft.Graft.init(spark)
    val dir = java.nio.file.Files
      .createTempDirectory("graft-media-stream-r8").toString
    spark.range(1, 40).selectExpr("id AS doc_id",
        "web_pixel_media_for_id(id) AS png",
        "pixel_media_for_id(id) AS img",
        "wav_media_for_id(id) AS wav",
        "gif_delta_media_for_id(id) AS gif")
      .repartition(4).write.mode("overwrite").parquet(dir)
    val batchSrc = spark.read.parquet(dir)

    def features(df: org.apache.spark.sql.DataFrame) = df.selectExpr(
      "doc_id",
      "pixel_stats(png).pix_sum AS web_pix",
      "image_dhash(img).lo AS dhash_lo",
      "aggregate(wav_spectral(wav, 16), CAST(0 AS BIGINT), " +
        "(a, x) -> a + x.dom_bin) AS dom_sum",
      "aggregate(gif_composite_stats(gif), CAST(0 AS BIGINT), " +
        "(a, x) -> a + x.pix_sum) AS comp_pix")

    val stream = spark.readStream.schema(batchSrc.schema)
      .option("maxFilesPerTrigger", "1").parquet(dir)
    val q = features(stream)
      .writeStream.format("memory").queryName("media_eq_r8")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      def key(r: org.apache.spark.sql.Row) =
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4))
      val streamed = spark.table("media_eq_r8").collect().map(key).toSet
      val batch = features(batchSrc).collect().map(key).toSet
      assert(streamed == batch && batch.size == 39)
    } finally q.stop()
  }

  test("FLAC decode, MP4 demux, NFC normalize and URL kernels over a " +
    "file stream == batch — all pure map expressions, so a crawl " +
    "ingest stream runs them unchanged") {
    graft.Graft.init(spark)
    val dir = java.nio.file.Files
      .createTempDirectory("graft-media-stream-r8b").toString
    spark.range(1, 30).selectExpr("id AS doc_id",
        "flac_media_for_id(id) AS flac",
        "mp4_media_for_id(id) AS mp4",
        "mp4_multi_media_for_id(id) AS mp4m",
        "concat('HTTP://Host', id, '.COM:80/p?utm_s=1&q=', id) AS url")
      .repartition(3).write.mode("overwrite").parquet(dir)
    val batchSrc = spark.read.parquet(dir)

    def features(df: org.apache.spark.sql.DataFrame) = df.selectExpr(
      "doc_id",
      "wav_stats(flac_wav(flac)).samp_energy AS flac_energy",
      "aggregate(mp4_frame_stats(mp4), CAST(0 AS BIGINT), " +
        "(a, x) -> a + x.pix_sum) AS mp4_pix",
      "size(mp4_meta(mp4m)) AS n_tracks",
      "normalize_text(concat('  a', chr(9), 'b  ')) AS norm",
      "url_normalize(url) AS nurl",
      "url_domain(url) AS dom")

    val stream = spark.readStream.schema(batchSrc.schema)
      .option("maxFilesPerTrigger", "1").parquet(dir)
    val q = features(stream)
      .writeStream.format("memory").queryName("media_eq_r8b")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      def key(r: org.apache.spark.sql.Row) = r.toSeq
      val streamed = spark.table("media_eq_r8b").collect().map(key).toSet
      val batch = features(batchSrc).collect().map(key).toSet
      assert(streamed == batch && batch.size == 29)
      // sanity: the kernels actually decoded (3 tracks, energy > 0)
      val one = features(batchSrc).filter("doc_id = 5").head()
      assert(one.getInt(3) == 3 && one.getLong(1) > 0)
    } finally q.stop()
  }

  test("archive/document kernels (zip, tar.gz chain, pdf, tiff, exif) " +
    "over a file stream == batch — all pure map expressions") {
    graft.Graft.init(spark)
    val dir = java.nio.file.Files
      .createTempDirectory("graft-media-stream-r8c").toString
    spark.range(1, 25).selectExpr("id AS doc_id",
        "zip_media_for_id(id) AS z",
        "targz_media_for_id(id) AS tgz",
        "pdf_media_for_id(id) AS pdf",
        "tiff_media_for_id(id) AS tif",
        "jpeg_exif_media_for_id(id) AS jx")
      .repartition(3).write.mode("overwrite").parquet(dir)
    val batchSrc = spark.read.parquet(dir)

    def features(df: org.apache.spark.sql.DataFrame) = df.selectExpr(
      "doc_id",
      "size(zip_entries(z)) AS n_zip",
      "CAST(zip_extract(z, zip_entries(z)[0].name) AS STRING) AS zip0",
      "size(tar_entries(gunzip(tgz))) AS n_tar",
      "pdf_text(pdf).npages AS npages",
      "pdf_text(pdf).text AS ptext",
      "parse_media(tif).width AS tw",
      "jpeg_exif(jx).orientation AS orient")

    val stream = spark.readStream.schema(batchSrc.schema)
      .option("maxFilesPerTrigger", "1").parquet(dir)
    val q = features(stream)
      .writeStream.format("memory").queryName("archive_eq")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      def key(r: org.apache.spark.sql.Row) = r.toSeq
      val streamed = spark.table("archive_eq").collect().map(key).toSet
      val batch = features(batchSrc).collect().map(key).toSet
      assert(streamed == batch && batch.size == 24)
      // sanity: the kernels actually decoded
      val one = features(batchSrc).filter("doc_id = 5").head()
      assert(one.getInt(1) == 3 && one.getString(2).startsWith("file 0") &&
        one.getInt(3) == 3 && one.getInt(4) == 3 && one.getInt(6) == 65 &&
        one.getInt(7) == 6)
    } finally q.stop()
  }

  test("document/governance kernels (mime, subtitles, parquet triage, " +
    "ogg, robots, blocklist) over a file stream == batch — all pure " +
    "map expressions") {
    graft.Graft.init(spark)
    val dir = java.nio.file.Files
      .createTempDirectory("graft-media-stream-r8d").toString
    spark.range(1, 25).selectExpr("id AS doc_id",
        "eml_media_for_id(id) AS eml",
        "subtitle_media_for_id(id) AS sub",
        "parquet_media_for_id(id) AS pq",
        "ogg_media_for_id(id) AS ogg",
        "concat('/d', CAST(id % 5 AS STRING), '/p') AS path")
      .repartition(3).write.mode("overwrite").parquet(dir)
    val batchSrc = spark.read.parquet(dir)

    def features(df: org.apache.spark.sql.DataFrame) = df.selectExpr(
      "doc_id",
      "mime_message(eml).subject AS subj",
      "size(subtitle_cues(sub)) AS n_cues",
      "parquet_meta(pq).num_rows AS pq_rows",
      "ogg_meta(ogg).packets AS packets",
      "robots_allowed(concat('User-agent: *', chr(10), " +
        "'Disallow: /d1'), path) AS allowed",
      "contains_any(sub, array('cue 1', 'never-there')) AS hit")

    val stream = spark.readStream.schema(batchSrc.schema)
      .option("maxFilesPerTrigger", "1").parquet(dir)
    val q = features(stream)
      .writeStream.format("memory").queryName("doc_gov_eq")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      def key(r: org.apache.spark.sql.Row) = r.toSeq
      val streamed = spark.table("doc_gov_eq").collect().map(key).toSet
      val batch = features(batchSrc).collect().map(key).toSet
      assert(streamed == batch && batch.size == 24)
      val one = features(batchSrc).filter("doc_id = 4").head()
      assert(one.getString(1) == "part one 4" && one.getInt(2) == 1 &&
        one.getLong(3) == 104L && one.getInt(4) == 5 &&
        one.getBoolean(5) && !one.getBoolean(6))
    } finally q.stop()
  }

  test("the WARC crawl chain (gunzip -> record walk -> html_text) " +
    "over a file stream == batch — the CommonCrawl ingest is map-only") {
    graft.Graft.init(spark)
    val dir = java.nio.file.Files
      .createTempDirectory("graft-warc-stream").toString
    spark.range(1, 25).selectExpr("id AS doc_id",
        "warc_media_for_id(id) AS wz")
      .repartition(3).write.mode("overwrite").parquet(dir)
    val batchSrc = spark.read.parquet(dir)

    def features(df: org.apache.spark.sql.DataFrame) = df.selectExpr(
        "doc_id", "warc_records(gunzip(wz)) AS rs")
      .selectExpr("doc_id", "size(rs) AS n",
        "html_text(CAST(filter(rs, r -> r.rec_type = 'response')[0]" +
          ".payload AS STRING)) AS txt")

    val stream = spark.readStream.schema(batchSrc.schema)
      .option("maxFilesPerTrigger", "1").parquet(dir)
    val q = features(stream)
      .writeStream.format("memory").queryName("warc_eq")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      def key(r: org.apache.spark.sql.Row) = r.toSeq
      val streamed = spark.table("warc_eq").collect().map(key).toSet
      val batch = features(batchSrc).collect().map(key).toSet
      assert(streamed == batch && batch.size == 24)
      assert(batch.forall(_.toString.contains("Page")))
    } finally q.stop()
  }
}
