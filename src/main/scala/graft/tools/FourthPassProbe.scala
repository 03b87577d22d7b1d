package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators._

/** Scale probes for the round-8 fourth-pass operators (NB classifier,
  * DSIR, PageRank, SemDeDup, triplet mining, SQ8) at 1M rows on
  * local[32] — the numbers recorded in BASELINE.md. Synthetic inputs
  * are generated in-cluster (seeded rand), timed warm (second run). */
object FourthPassProbe {
  private def time[A](label: String)(f: => A): A = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[probe] $label%-58s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val which = args.headOption.getOrElse("all")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.driver.memory", "96g")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.Graft.init(spark)
    import spark.implicits._

    val n = 1000000L

    // 1M docs x ~60 tokens from a 5k vocabulary, 30% "target" rows
    // drawn from a narrower sub-vocabulary (so classifiers separate)
    lazy val docs: DataFrame = {
      val d = spark.range(n).select(col("id").as("doc_id"),
        (col("id") % 10 < 3).as("tgt"),
        concat_ws(" ", (0 until 60).map(i =>
          concat(lit("w"), when(col("id") % 10 < 3,
            pmod(hash(col("id") * 61 + i), lit(800)))
            .otherwise(pmod(hash(col("id") * 61 + i), lit(5000))))): _*)
          .as("text"))
        .localCheckpoint(true)
      d
    }

    lazy val vecs: DataFrame = {
      val v = spark.range(n).select(col("id").as("vec_id"),
        (col("id") % 1000).cast("int").as("label"),
        array((0 until 64).map(i => (sin(col("id") * (i + 1) * 0.37) +
          (pmod(hash(col("id") * 97 + i), lit(1000)).cast("double") / 1000.0))
          .cast("float")): _*).as("embedding"))
        .localCheckpoint(true)
      v
    }

    if (which == "all" || which == "nb") {
      docs.count()
      val m = time("nb: fit frozen model, 1M docs (64k vocab)") {
        NbClassifier.model(docs, "text", col("tgt"), 65536)
      }
      time("nb: frozen scoring, 1M docs (map-only), warm") {
        NbClassifier.scoreWithModel(docs, "doc_id", "text", m)
          .agg(sum("log_odds")).head()
      }
      time("nb: corpus-native score(), 1M docs") {
        NbClassifier.score(docs, "doc_id", "text", col("tgt"))
          .agg(sum("log_odds")).head()
      }
    }

    if (which == "all" || which == "dsir") {
      docs.count()
      val m = time("dsir: fit frozen model, 1M docs (10k buckets)") {
        Dsir.model(docs, "text", col("tgt"), buckets = 10000)
      }
      time("dsir: frozen weights, 1M docs (map-only), warm") {
        Dsir.scoreWithModel(docs, "doc_id", "text", m)
          .agg(sum("log_w")).head()
      }
      time("dsir: gumbel top-100k of 1M (TakeOrdered)") {
        Dsir.gumbelTopK(docs, "doc_id", "text", m, 100000).count()
      }
    }

    if (which == "all" || which == "pagerank") {
      // 5M-edge host graph over 100k hosts, power-law-ish in-degree
      val edges = spark.range(5000000L).select(
        concat(lit("h"), pmod(hash(col("id") * 13), lit(100000))).as("src"),
        concat(lit("h"), pmod(pmod(hash(col("id") * 29), lit(100000)),
          pmod(hash(col("id") * 31), lit(1000)) + 1)).as("dst"))
        .filter(col("src") =!= col("dst")).distinct()
        .localCheckpoint(true)
      println(s"[probe] pagerank edges: ${edges.count()}")
      time("pagerank: 10 iterations, ~5M edges / 100k hosts") {
        PageRank.hostRank(edges, "src", "dst").agg(sum("rank")).head()
      }
    }

    if (which == "all" || which == "sq8") {
      vecs.count()
      val m = time("sq8: train (exact min/max aggregate), 1M x dim64") {
        Sq8.train(vecs, "embedding")
      }
      val enc = time("sq8: encode 1M (pure map) + materialize") {
        Sq8.encode(vecs, "embedding", m).select("vec_id", "code")
          .localCheckpoint(true)
      }
      val q = vecs.filter(col("vec_id") === 0)
        .select("embedding").head().getSeq[Float](0).toArray
      time("sq8: ADC top-10 scan of 1M codes, warm") {
        Sq8.search(enc, "code", "vec_id", q, 10, m).collect()
      }
    }

    if (which == "all" || which == "semdedup") {
      vecs.count()
      val model = time("semdedup: k-means train k=1024 (16k sample)") {
        Ivf.train(vecs, "embedding", k = 1024)
      }
      val assigned = time("semdedup: assign 1M") {
        Ivf.assign(vecs, "embedding", model).localCheckpoint(true)
      }
      time("semdedup: verdicts 1M, k=1024 (cluster-blocked pairs)") {
        SemDedup.verdicts(assigned, "vec_id", "embedding", tau = 0.9)
          .filter(col("kept")).count()
      }
    }

    if (which == "all" || which == "incdedup") {
      // 1M-doc lake + 100k incoming, 20% of incoming near-dups of lake rows
      val lake = spark.range(1000000L).select(col("id").as("doc_id"),
        concat_ws(" ", (0 until 40).map(i =>
          concat(lit("w"), pmod(hash(col("id") * 53 + i), lit(50000)))): _*)
          .as("text"))
        .localCheckpoint(true)
      val incoming = spark.range(2000000L, 2100000L).select(
        col("id").as("doc_id"),
        when(col("id") % 5 === 0,
          // near-dup of lake doc (id%1M): same word stream, one token off
          concat_ws(" ", (0 until 40).map(i =>
            concat(lit(if (i == 39) "x" else "w"),
              pmod(hash(pmod(col("id"), lit(1000000L)) * 53 + i),
                lit(50000)))): _*))
        .otherwise(
          concat_ws(" ", (0 until 40).map(i =>
            concat(lit("n"), pmod(hash(col("id") * 59 + i), lit(50000)))): _*))
          .as("text"))
        .localCheckpoint(true)
      lake.count(); incoming.count()
      time("incdedup: 100k incoming vs 1M lake + intra-batch, t=0.5") {
        val n = TextDedup.incrementalSurvivors(lake, incoming,
          "doc_id", "text", n = 3, threshold = 0.5).count()
        println(s"[probe]   survivors: $n / 100000")
      }
      time("incdedup: stream-tier exact-fingerprint gate, 100k vs 1M") {
        val n = SimHash.filterAgainstExact(lake, incoming,
          "doc_id", "text").count()
        println(s"[probe]   fingerprint-gate survivors: $n / 100000")
      }
    }

    if (which == "all" || which == "shingleidx") {
      // same 1M lake / 100k crawl shape as incdedup, but the lake
      // lives ON DISK (as a 100 TB lake would) and its inverted
      // shingle index is a STORED artifact: the per-crawl comparison
      // is "scan the lake's text + re-shingle" (matchesAgainst)
      // versus "read the stored postings" (probe)
      val tmpRoot = java.nio.file.Files
        .createTempDirectory("graft-probe-shidx").toString
      spark.range(1000000L).select(col("id").as("doc_id"),
        concat_ws(" ", (0 until 40).map(i =>
          concat(lit("w"), pmod(hash(col("id") * 53 + i), lit(50000)))): _*)
          .as("text"))
        .write.parquet(s"$tmpRoot/lake")
      val lake = spark.read.parquet(s"$tmpRoot/lake")
      val incoming = spark.range(2000000L, 2100000L).select(
        col("id").as("doc_id"),
        when(col("id") % 5 === 0,
          concat_ws(" ", (0 until 40).map(i =>
            concat(lit(if (i == 39) "x" else "w"),
              pmod(hash(pmod(col("id"), lit(1000000L)) * 53 + i),
                lit(50000)))): _*))
        .otherwise(
          concat_ws(" ", (0 until 40).map(i =>
            concat(lit("n"), pmod(hash(col("id") * 59 + i), lit(50000)))): _*))
          .as("text"))
        .localCheckpoint(true)
      incoming.count()
      val idx = time("shingleidx: ONE-TIME lake index build, 1M docs") {
        ShingleIndex.build(lake, "doc_id", "text", s"$tmpRoot/idx",
          ngram = 3)
      }
      println(s"[probe]   buckets: ${idx.nBuckets}")
      time("shingleidx: probe 100k crawl vs STORED index (warm #2)") {
        idx.probe(incoming, "doc_id", "text", 0.5).count()
        val m = idx.probe(incoming, "doc_id", "text", 0.5).count()
        println(s"[probe]   cross matches: $m")
      }
      time("shingleidx: matchesAgainst 100k (lake text re-shingle, warm #2)") {
        TextDedup.matchesAgainst(lake, incoming, "doc_id", "text",
          n = 3, threshold = 0.5).count()
        TextDedup.matchesAgainst(lake, incoming, "doc_id", "text",
          n = 3, threshold = 0.5).count()
      }
      time("shingleidx: full per-crawl survivors via index (100k)") {
        val s = idx.survivors(incoming, "doc_id", "text", 0.5).count()
        println(s"[probe]   survivors: $s / 100000")
      }
      // the pruning floor: a 100-doc trickle batch opens only its
      // shingles' buckets of the stored index
      val small = incoming.limit(100).localCheckpoint(true)
      small.count()
      time("shingleidx: 100-doc trickle probe (bucket-pruned read)") {
        val m = idx.probe(small, "doc_id", "text", 0.5).count()
        println(s"[probe]   matches: $m")
      }
      time("shingleidx: matchesAgainst 100-doc trickle (full lake pass)") {
        TextDedup.matchesAgainst(lake, small, "doc_id", "text",
          n = 3, threshold = 0.5).count()
      }
    }

    if (which == "all" || which == "winnowidx") {
      // the r10 WinnowIndex earns its lake row: same 1M-lake / 100k-
      // crawl shape as shingleidx, lake fingerprints PERSISTED and
      // bucket-partitioned; the alternative per crawl is re-reading +
      // re-fingerprinting the whole lake text (the winnow_pairs shape)
      val tmpRoot = java.nio.file.Files
        .createTempDirectory("graft-probe-wnidx").toString
      spark.range(1000000L).select(col("id").as("doc_id"),
        concat_ws(" ", (0 until 40).map(i =>
          concat(lit("w"), pmod(hash(col("id") * 53 + i), lit(50000)))): _*)
          .as("text"))
        .write.parquet(s"$tmpRoot/lake")
      val lake = spark.read.parquet(s"$tmpRoot/lake")
      val incoming = spark.range(2000000L, 2100000L).select(
        col("id").as("doc_id"),
        when(col("id") % 5 === 0,
          concat_ws(" ", (0 until 40).map(i =>
            concat(lit(if (i == 0) "shift pad " else "w"),
              pmod(hash(pmod(col("id"), lit(1000000L)) * 53 + i),
                lit(50000)))): _*))
        .otherwise(
          concat_ws(" ", (0 until 40).map(i =>
            concat(lit("n"), pmod(hash(col("id") * 59 + i), lit(50000)))): _*))
          .as("text"))
        .localCheckpoint(true)
      incoming.count()
      val idx = time("winnowidx: ONE-TIME lake fingerprint build, 1M docs") {
        WinnowIndex.build(lake, "doc_id", "text", s"$tmpRoot/idx")
      }
      time("winnowidx: probe 100k crawl vs STORED index (warm #2)") {
        idx.probe(incoming, "doc_id", "text", 2).count()
        val m = idx.probe(incoming, "doc_id", "text", 2).count()
        println(s"[probe]   cross matches: $m")
      }
      time("winnowidx: full-pass alternative (lake re-fingerprint + join, warm #2)") {
        def full() = {
          val lk = lake.selectExpr("doc_id AS old_id",
              "posexplode(winnow(text, 4, 5))")
            .selectExpr("old_id", "col.hash AS hash").distinct()
          val rare = lk.groupBy("hash")
            .agg(count(lit(1)).as("df")).filter(col("df") <= 20)
            .select("hash")
          val inc = incoming.selectExpr("doc_id AS new_id",
              "posexplode(winnow(text, 4, 5))")
            .selectExpr("new_id", "col.hash AS hash").distinct()
          lk.join(rare, "hash").join(inc, "hash")
            .groupBy("new_id", "old_id")
            .agg(count(lit(1)).as("n_shared"))
            .filter(col("n_shared") >= 2).count()
        }
        full(); val m = full()
        println(s"[probe]   full-pass matches: $m")
      }
      val small = incoming.limit(100).localCheckpoint(true)
      small.count()
      time("winnowidx: 100-doc trickle probe (bucket-pruned read)") {
        val m = idx.probe(small, "doc_id", "text", 2).count()
        println(s"[probe]   matches: $m")
      }
      val app = time("winnowidx: appendBatch 100k (claim-first, partitioned)") {
        idx.appendBatch(incoming, "doc_id", "text")
      }
      time("winnowidx: compact after append") {
        app.compact()
      }
      time("winnowidx: probe 100k vs compacted appended lake (warm #2)") {
        val loaded = WinnowIndex.load(spark, s"$tmpRoot/idx")
        loaded.probe(small, "doc_id", "text", 2).count()
        val m = loaded.probe(small, "doc_id", "text", 2).count()
        println(s"[probe]   matches incl. self-appended: $m")
      }
    }

    if (which == "all" || which == "webpdecode") {
      // the pixel-decode-throughput probe shape: generate fixture
      // bytes only vs generate + decode — the delta is the decode cost
      graft.Graft.init(spark)
      val n2 = 1000000L
      def genOnly() = spark.range(n2)
        .selectExpr("length(webp_pixel_media_for_id(id)) AS l")
        .agg(sum("l")).head()
      def genDecode() = spark.range(n2)
        .selectExpr("pixel_stats(webp_pixel_media_for_id(id)) AS st")
        .agg(sum("st.pix_sum")).head()
      genOnly(); genDecode() // warm
      time("webp: gen-only, 1M VP8L images") { genOnly() }
      time("webp: gen+decode, 1M VP8L images") { genDecode() }
    }

    if (which == "all" || which == "zstddecode") {
      // decode throughput for the full RFC 8878 block layer: generate
      // fixture frames only vs generate + decompress — the delta is
      // the decode cost; variants cycle raw/multi-frame/skippable/
      // RLE-sequence/repeat-mode shapes (~0.5-1.5 KB each)
      graft.Graft.init(spark)
      val n2 = 1000000L
      def genOnly() = spark.range(n2)
        .selectExpr("length(zstfull_media_for_id(id)) AS l")
        .agg(sum("l")).head()
      def genDecode() = spark.range(n2)
        .selectExpr("length(unzstd(zstfull_media_for_id(id))) AS l")
        .agg(sum("l")).head()
      genOnly(); genDecode() // warm
      time("zstd: gen-only, 1M frames") { genOnly() }
      time("zstd: gen+decode, 1M frames") { genDecode() }
    }

    if (which == "all" || which == "tiffdecode") {
      // TIFF baseline pixel decode (strip walk + PackBits + inversion)
      graft.Graft.init(spark)
      val n2 = 1000000L
      def genOnly() = spark.range(n2)
        .selectExpr("length(tiffpx_media_for_id(id)) AS l")
        .agg(sum("l")).head()
      def genDecode() = spark.range(n2)
        .selectExpr("pixel_stats(tiffpx_media_for_id(id)) AS st")
        .agg(sum("st.pix_sum")).head()
      genOnly(); genDecode() // warm
      time("tiff: gen-only, 1M images") { genOnly() }
      time("tiff: gen+decode, 1M images") { genDecode() }
    }

    if (which == "all" || which == "wordvec") {
      // PPMI random-indexing training at 1M docs (~60M tokens, 5k+800
      // vocab): pair generation is a map-side zip (no self-join), the
      // corpus shuffles once into pair counts, everything after is
      // vocab-bounded. Encoding = broadcast join + one partial mean.
      docs.count()
      val model = time("wordvec: train dim=64 win=2, 1M docs (60M tok)") {
        WordVec.train(docs, "text", dim = 64, window = 2, minCount = 2)
          .localCheckpoint(true)
      }
      println(s"[probe]   vocab = ${model.count()}")
      time("wordvec: broadcast-join encode, 1M docs, warm") {
        WordVec.encodeJoin(docs, "doc_id", "text", model)
          .agg(sum(element_at(col("vec"), 1))).head()
      }
      val ref = WordVec.modelRef(model)
      time("wordvec: frozen codegen encode, 1M docs (zero-join map)") {
        docs.select(WordVec.embed(ref, col("text")).as("v"))
          .agg(sum(element_at(col("v"), 1))).head()
      }
    }

    if (which == "all" || which == "g4decode") {
      // CCITT G4 MMR decode throughput over the embedded external
      // fixtures (mixed sizes; ~34.9k px/5 files)
      graft.Graft.init(spark)
      val n2 = 1000000L
      def genOnly() = spark.range(n2)
        .selectExpr("length(g4_media_for_id(id)) AS l")
        .agg(sum("l")).head()
      def genDecode() = spark.range(n2)
        .selectExpr("pixel_stats(g4_media_for_id(id)) AS st")
        .agg(sum("st.pix_sum")).head()
      genOnly(); genDecode() // warm
      time("g4: gen-only, 1M images") { genOnly() }
      time("g4: gen+decode, 1M images") { genDecode() }
    }

    if (which == "all" || which == "mp3decode") {
      // MP3 Layer III full-payload decode throughput over the
      // conformance fixtures (mixed MPEG-1 content / MS stereo /
      // short+mixed blocks / LSF, plus the 45-frame LAME silence),
      // the per-row scan-riding shape of the mp3_* queries; the
      // side-info-only coverage triage is timed alongside to show
      // what a crawl census costs vs a full decode
      graft.Graft.init(spark)
      val n2 = 300000L
      def genOnly() = spark.range(n2)
        .selectExpr("length(mp3_pcm_media_for_id(id)) AS l")
        .agg(sum("l")).head()
      def genDecode() = spark.range(n2)
        .selectExpr("wav_stats(mp3_wav(mp3_pcm_media_for_id(id))) AS st")
        .agg(sum("st.samp_energy")).head()
      def genTriage() = spark.range(n2)
        .selectExpr("mp3_coverage(mp3_coverage_media_for_id(id)) AS c")
        .agg(sum("c.shipped")).head()
      genOnly(); genDecode(); genTriage() // warm
      time("mp3: gen-only, 300k files") { genOnly() }
      time("mp3: gen+full decode+stats, 300k files") { genDecode() }
      time("mp3: gen+coverage triage, 300k files") { genTriage() }
    }

    if (which == "all" || which == "vp8inter") {
      // VP8 IVF sequence decode throughput (keyframe + 2 pure-MC
      // interframes per file): the per-row scan-riding shape of
      // vp8_inter_frames — MC cost rides the same distribution story
      // as every codec (no exchange, executor-linear)
      graft.Graft.init(spark)
      val n2 = 100000L
      def genOnly() = spark.range(n2)
        .selectExpr("length(vp8_ivf_media_for_id(id)) AS l")
        .agg(sum("l")).head()
      def genDecode() = spark.range(n2)
        .selectExpr("explode(vp8_ivf_frames(vp8_ivf_media_for_id(id))) AS s")
        .agg(sum("s.v")).head()
      genOnly(); genDecode() // warm
      time("vp8inter: gen-only, 100k 3-frame sequences") { genOnly() }
      time("vp8inter: gen+decode+explode, 100k sequences") { genDecode() }
    }

    if (which == "all" || which == "webm") {
      // WebM demux cost on top of the same VP8 sequences (r13): the
      // EBML walk (webm_meta) should be scan-cost, and the full
      // demux+decode should track the IVF decode number — the
      // container adds a header walk, not a second decode
      graft.Graft.init(spark)
      val n2 = 100000L
      def genOnly() = spark.range(n2)
        .selectExpr("length(webm_media_for_id(id)) AS l")
        .agg(sum("l")).head()
      def genMeta() = spark.range(n2)
        .selectExpr("webm_meta(webm_media_for_id(id)) AS m")
        .agg(sum("m.blocks")).head()
      def genDecode() = spark.range(n2)
        .selectExpr("explode(webm_frames(webm_media_for_id(id))) AS s")
        .agg(sum("s.v")).head()
      genOnly(); genMeta(); genDecode() // warm
      time("webm: gen-only, 100k containers") { genOnly() }
      time("webm: gen+meta triage, 100k containers") { genMeta() }
      time("webm: gen+demux+decode+explode, 100k containers") { genDecode() }
    }

    if (which == "all" || which == "vp8decode") {
      // VP8 keyframe decode throughput over the embedded external
      // fixtures (5 files, 72B..3.4KB)
      graft.Graft.init(spark)
      val n2 = 300000L
      def genOnly() = spark.range(n2)
        .selectExpr("length(vp8_media_for_id(id)) AS l")
        .agg(sum("l")).head()
      def genDecode() = spark.range(n2)
        .selectExpr("explode(webp_yuv(vp8_media_for_id(id))) AS s")
        .agg(sum("s.v")).head()
      genOnly() // warm the gen
      time("vp8: gen-only, 300k images") { genOnly() }
      time("vp8: gen+decode+explode, 300k images") { genDecode() }
    }

    if (which == "all" || which == "suffixarray") {
      // 1M tokens: 20k docs x 50 tokens from a narrow vocabulary so
      // real repeats exist (every doc shares phrases with ~10 peers);
      // k=10 cap=50 is the Lee et al. production regime (depth 64:
      // 6 doubling rounds + 12 LCP-walk joins, all narrow integers)
      val saDocs = spark.range(20000).select(col("id").as("doc_id"),
        concat_ws(" ", (0 until 50).map(i =>
          concat(lit("t"), pmod(hash((col("id") % 2000) * 53 + i),
            lit(997)))): _*).as("text"))
        .localCheckpoint(true)
      saDocs.count()
      time("suffix array: maxRepeat k=10 cap=50, 1M tokens") {
        SuffixArray.maxRepeat(saDocs, "text", "doc_id", 10, 50).count()
      }
    }

    if (which == "all" || which == "kmeansdist") {
      vecs.count()
      time("kmeans distributed: k=1024, 10 rounds over the 1M corpus") {
        Ivf.trainDistributed(vecs, "embedding", k = 1024, iters = 10)
      }
    }

    if (which == "all" || which == "r9ops") {
      // the round-9 single-pass operators, throughput at probe scale
      val ids1m = spark.range(n).select(col("id")).localCheckpoint(true)
      ids1m.count()
      time("charset: sniff+decode 1M encoded docs (5 encodings)") {
        ids1m.selectExpr(
          "sniff_charset(enc_media_for_id(id)) AS cs",
          "length(decode_charset(enc_media_for_id(id))) AS n")
          .agg(count("cs"), sum("n")).head()
      }
      time("mojibake: fix 1M garbled strings (map-only)") {
        ids1m.selectExpr(
          "length(fix_mojibake(concat('doc ', id, ' cafÃ© " +
            "â€™x'))) AS n")
          .agg(sum("n")).head()
      }
      val ids200k = spark.range(200000L).select(col("id"))
        .localCheckpoint(true)
      ids200k.count()
      time("image_quality: 200k mixed JPEG/PNG decodes + moments") {
        ids200k.selectExpr(
          "image_quality(CASE WHEN id % 2 = 0 " +
            "THEN jpeg_pixel_media_for_id(id) " +
            "ELSE pixel_media_for_id(id) END) AS q")
          .agg(sum("q.lap_sq_sum")).head()
      }
      time("wav_vad: 200k clips (~1k frames each), segments + clips") {
        ids200k.selectExpr(
          "size(wav_vad(wavvad_media_for_id(id), 64, 10000)) AS s")
          .agg(sum("s")).head()
      }
      time("pdf_images: extract+decode images of 200k PDFs") {
        ids200k.selectExpr(
          "size(pdf_images(pdfimg_media_for_id(id))) AS s")
          .agg(sum("s")).head()
      }
      val blobs = spark.range(200000L)
        .selectExpr("id", "cdc_media_for_id(id) AS media")
        .localCheckpoint(true)
      println(s"[probe] cdc blobs: ${blobs.count()}")
      time("cdc: chunk 200k blobs (~460 MB) + hash-dedup stats") {
        val ch = blobs
          .selectExpr("id AS doc_id",
            "posexplode(cdc_chunks(media, 64, 256, 1024))")
          .selectExpr("doc_id", "pos AS idx", "col.length AS length",
            "col.hash AS hash")
        ch.groupBy("hash").agg(count(lit(1)).as("c"))
          .agg(count(lit(1)), sum("c")).head()
      }
      time("winnow: fingerprint 1M docs (k=4, w=5) + df-capped " +
        "pair join") {
        val fp = docs.selectExpr("doc_id",
            "posexplode(winnow(text, 4, 5))")
          .selectExpr("doc_id", "col.hash AS hash").distinct()
        val rare = fp.groupBy("hash").agg(count(lit(1)).as("df"))
          .filter(col("df") <= 20).select("hash")
        val kept = fp.join(rare, "hash")
        kept.as("a").join(kept.as("b"), "hash")
          .where(col("a.doc_id") < col("b.doc_id"))
          .groupBy(col("a.doc_id"), col("b.doc_id"))
          .agg(count(lit(1)).as("n")).filter(col("n") >= 2).count()
      }
      time("sentence_split: 1M docs (hazard-guarded punkt-lite)") {
        docs.selectExpr("size(sentence_split(text)) AS s")
          .agg(sum("s")).head()
      }
      time("wav_normalize: 200k clips decode+scale+rewrap+stats") {
        ids200k.selectExpr(
          "wav_stats(wav_normalize(wav_media_for_id(id), 30000)) AS st")
          .agg(sum("st.samp_energy")).head()
      }
      val snapA = docs.select(col("doc_id"), col("text"))
      val snapB = docs.filter("doc_id % 7 != 0")
        .selectExpr("doc_id",
          "CASE WHEN doc_id % 5 = 0 THEN concat(text, ' v2') " +
            "ELSE text END AS text")
      time("corpus_diff: 1M vs 1M snapshots (hash-below-join)") {
        CorpusDiff.diff(snapA, snapB, "doc_id", "text")
          .groupBy("status").count().collect()
      }
    }

    if (which == "all" || which == "triplets") {
      // 10k labels (bounded label blocks) + 4096 LSH buckets
      val v10k = vecs.withColumn("label",
        (col("vec_id") % 10000).cast("int")).localCheckpoint(true)
      v10k.count()
      val lsh = HyperplaneLsh(dim = 64, nbits = 12, seed = 42L)
      time("triplets: mine 1M anchors (10k labels, 4096 buckets)") {
        Triplets.mine(v10k, "vec_id", "embedding", "label", lsh).count()
      }
    }

    spark.stop()
  }
}
