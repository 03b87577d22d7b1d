// End-to-end user journey — what a weaviate-txtai user does today,
// expressed against this engine. Run with:
//   sbt package
//   /opt/spark/bin/spark-shell \
//     --jars target/scala-2.13/weaviatetxtaispark_2.13-0.1.0.jar \
//     -I examples/demo.scala
// (REPL-loaded: multi-line chains keep a paren open at line ends)
import org.apache.spark.sql.functions._
import graft.{Graft, Tables}
import graft.index.{VectorIndex, IndexConfig}
import graft.operators.{Knn, MinHashLsh, TextAnalysis}

Graft.init(spark)
val sf = "/root/testdata/sf0.001"

// 1. index build (reference: Embeddings.index -> Weaviate class).
//    encode is model-free here: hashed bag-of-words (swap in real
//    vectors from embeddings.parquet or any encoder output)
val docs = Tables.load(spark, sf, "documents").select(
  col("doc_id").cast("string").as("uid"),
  TextAnalysis.hashEmbed("text", 64).as("vector"),
  col("text"),
  lit(null).cast("string").as("tags"))
val dir = java.nio.file.Files.createTempDirectory("graft-demo").toString
val idx = VectorIndex.create(
  spark, dir, config = IndexConfig(packed = true)).index(docs)
println(s"indexed ${idx.count()} docs (packed layout)")

// 2. search (reference: embeddings.search / GraphQL nearVector)
val qVec = Tables.load(spark, sf, "documents").filter(
  col("doc_id") === 7).select(
  TextAnalysis.hashEmbed("text", 64)).head.getSeq[Float](0).toArray
println("top-5 neighbours of doc 7:")
idx.search(qVec, 5).select("uid", "score").show(false)

// 3. SQL surface (reference: txtai SQL dialect L1-L4)
idx.df.createOrReplaceTempView("txtai_idx")
spark.sql(
  "SELECT count(*) AS cnt, min(length(text)) AS min_len, " +
    "max(length(text)) AS max_len FROM txtai_idx").show()

// 3b. the dialect's verbatim text form (01_simple.ipynb:446): the
//     one-arg similar('...') encodes via the pluggable TextEncoder and
//     binds to the `vector` column of the registered txtai view
graft.Txtai.register(
  Tables.load(spark, sf, "documents"), Tables.load(spark, sf, "embeddings"))
spark.sql(
  "SELECT id, similar('feel good story') AS score FROM txtai " +
    "WHERE similar('feel good story') >= 0.0 " +
    "ORDER BY score DESC, id LIMIT 3").show()

// 3b'. the lexical twin: keyword_score('terms') is per-row BM25 with
//      corpus stats resolved once at analysis time — and the whole
//      txtai hybrid (BM25 + cosine, min-max blended) runs as ONE SQL
//      statement, no API call
spark.sql(
  "SELECT id, keyword_score('vector hash join') AS bm FROM txtai " +
    "WHERE keyword_score('vector hash join') > 0 " +
    "ORDER BY bm DESC, id LIMIT 3").show()
spark.sql(
  "WITH scored AS (SELECT id, keyword_score('vector hash') AS bm, similar('vector hash') AS cos FROM txtai WHERE keyword_score('vector hash') > 0), bounds AS (SELECT min(bm) AS bmin, max(bm) AS bmax, min(cos) AS cmin, max(cos) AS cmax FROM scored) SELECT id, round(0.5 * (CASE WHEN cmax = cmin THEN 1.0 ELSE (cos - cmin) / (cmax - cmin) END) + 0.5 * (CASE WHEN bmax = bmin THEN 1.0 ELSE (bm - bmin) / CAST(bmax - bmin AS DOUBLE) END), 4) AS hybrid FROM scored CROSS JOIN bounds ORDER BY hybrid DESC, id LIMIT 3").show()

// 3c. IVF ANN (faiss-style): sample-trained codebook, cluster-pruned
//     search — the second scale path next to hyperplane LSH
val emb = Tables.load(spark, sf, "embeddings")
val ivfModel = graft.operators.Ivf.train(emb, "embedding", 8)
val qv = emb.filter(col("vec_id") === 0).select(
  "embedding").head.getSeq[Float](0).toArray
graft.operators.Ivf.search(
  graft.operators.Ivf.assign(emb, "embedding", ivfModel),
  "embedding", "vec_id", qv, 3, ivfModel, 2).select(
  "vec_id", "score").show()

// 3d. IVF+PQ: the full faiss recipe — cluster-partitioned storage of
//     8-byte codes; search = partition pruning x column pruning + ADC
//     + exact re-rank of the shortlist
val pqModel = graft.operators.Pq.train(emb, "embedding", 8, 64)
val ivfpqDir = java.nio.file.Files.createTempDirectory("graft-demo-ivfpq").toString
graft.index.IvfVectorIndex.build(emb, "embedding", "vec_id", ivfpqDir, ivfModel, Some(pqModel))
graft.index.IvfVectorIndex.load(spark, ivfpqDir).searchAdc(qv, 3, 2).select("docid", "score").show()

// 3e. ANN auto-routing (opt-in optimizer rule): build the IVF index
//     once, then the PLAIN exact query — DataFrame or SQL text — gets
//     cluster pruning injected by the Catalyst rule; no index class in
//     user code
val ivfDir = java.nio.file.Files.createTempDirectory("graft-demo-ivf").toString
graft.index.IvfVectorIndex.build(emb, "embedding", "vec_id", ivfDir, ivfModel)
val ivfIdx = graft.index.IvfVectorIndex.load(spark, ivfDir)
spark.conf.set("spark.graft.ann.autoRoute", "true")
spark.conf.set("spark.graft.ann.nprobe", "3")
val autoRouted = graft.operators.Knn.search(ivfIdx.df, "vector", "docid", qv, 3)
println("auto-routed scan: " + autoRouted.queryExecution.executedPlan.toString.linesIterator.find(_.contains("PartitionFilters")).map(_.trim.take(120)).getOrElse("(not routed)"))
autoRouted.select("docid", "score").show()
spark.conf.set("spark.graft.ann.autoRoute", "false")

// 4. pipeline ops the reference never had: near-dup + quality filter
val dups = MinHashLsh.nearDupPairs(
  Tables.load(spark, sf, "documents"), "doc_id", "text", threshold = 0.5)
println(s"near-duplicate pairs: ${dups.count()}")
val quality = Tables.load(spark, sf, "documents").select(
  col("doc_id"), TextAnalysis.qualityScore(col("text")).as("q")).filter(
  col("q") >= 0.5)
println(s"docs passing quality gate: ${quality.count()}")

// 4b. the whole training-data pipeline: pair detection -> duplicate
//     CLUSTERS (connected components) -> keep one representative ->
//     deterministic train/valid/test split (pure function of the id)
val allDocs = Tables.load(spark, sf, "documents")
val pairs = graft.operators.TextDedup.ngramJaccardPairs(allDocs, "doc_id", "text", 3, 0.2)
val labeled = graft.operators.Components.labelCorpus(allDocs, "doc_id", pairs, "id_a", "id_b")
val kept = labeled.filter(col("keep"))
println(s"kept ${kept.count()} of ${allDocs.count()} after cluster dedup")
graft.operators.Sampling.withSplit(kept, "doc_id", Seq("train" -> 80, "valid" -> 10, "test" -> 10)).groupBy("split").count().orderBy("split").show()

// 4b'. eval decontamination (GPT-3 appx C): flag training docs leaking
//      a benchmark's 5-grams, then drop them — the eval-side twin of
//      dedup, test side broadcast so the train side never shuffles
val evalSet = allDocs.filter(col("doc_id") >= 450)
val trainSet = allDocs.filter(col("doc_id") < 450)
val leaks = graft.operators.Decontaminate.overlaps(trainSet, "doc_id", "text", evalSet, "doc_id", "text", 5, 2)
println(s"benchmark-leak pairs: ${leaks.count()}; clean train size: " + graft.operators.Decontaminate.clean(trainSet, "doc_id", "text", evalSet, "doc_id", "text", 5, 2).count())

// 4c. continuous ingestion: a stream of raw text lands in an index via
//     checkpointed micro-batches (upsert = idempotent under replay)
val streamSrc = java.nio.file.Files.createTempDirectory("graft-demo-stream").toString
allDocs.limit(50).select(col("doc_id").cast("string").as("uid"), col("text")).coalesce(1).write.mode("overwrite").parquet(streamSrc)
val streamIdx = VectorIndex.create(spark, java.nio.file.Files.createTempDirectory("graft-demo-sidx").toString)
val stream = spark.readStream.schema(spark.read.parquet(streamSrc).schema).parquet(streamSrc)
val sq = graft.streaming.IndexStream.ingestText(stream, "text", streamIdx, java.nio.file.Files.createTempDirectory("graft-demo-ck").toString)
sq.processAllAvailable(); sq.stop()
println(s"streamed into index: ${streamIdx.count()} docs")

// 4d. relational extensions Spark lacks: as-of join (attribution) and
//     exact per-group quantiles — both single-shuffle plans
val li = Tables.load(spark, sf, "lineitem")
graft.operators.Stats.groupedQuantiles(li, Seq("l_returnflag"), "l_extendedprice", Seq(0.5, 0.95)).orderBy("l_returnflag").show()

// 4e. multimodal: REAL pixel decodes — PNG via JDK zlib (all five
//     scanline filters), JPEG via the DC-only baseline entropy subset
val png = graft.operators.PngPixels.decode(graft.operators.MediaFixtures.pixelMediaFor(2L)).get
val jpg = graft.operators.JpegDc.decode(graft.operators.MediaFixtures.jpegPixelMediaFor(2L)).get
println(s"decoded png ${png.width}x${png.height}x${png.channels} (${png.pixels.length} bytes), jpeg ${jpg.width}x${jpg.height}x${jpg.channels} (${jpg.pixels.length} bytes)")

// 4f. multimodal, audio + video legs: REAL WAV/PCM16 decode (RIFF walk)
//     and REAL animated-GIF frame decode (full variable-width LZW) —
//     windowed VAD features and scene-cut SAD straight from SQL
spark.sql("SELECT w.win, w.energy, w.zcr FROM (SELECT explode(wav_windows(wav_media_for_id(CAST(7 AS BIGINT)), 64)) AS w)").show(3)
spark.sql("SELECT d.frame, d.sad FROM (SELECT explode(gif_frame_diffs(gif_media_for_id(CAST(7 AS BIGINT)))) AS d)").show(3)
val gifFrames = graft.operators.Multimodal.sampleFrames(spark.range(0, 5).selectExpr("id AS doc_id", "gif_media_for_id(id) AS media"), "media", 8)
println(s"sampled REAL gif frames: " + gifFrames.selectExpr("sum(size(frames))").head().getLong(0))

// 4g. multimodal, VIDEO leg (r13): WebM/Matroska demux — container
//     triage at scan cost, full VP8 inter-frame decode, scene-cut
//     SADs, and S_TEXT subtitle transcripts, all from SQL
spark.sql("SELECT media_kind(webm_media_for_id(CAST(0 AS BIGINT))) AS kind, webm_meta(webm_media_for_id(CAST(0 AS BIGINT))).keyframes AS keyframes, webm_meta(webm_media_for_id(CAST(0 AS BIGINT))).interframes AS interframes").show()
spark.sql("SELECT c.idx, c.start_ms, c.end_ms, c.text FROM (SELECT explode(webm_subtitles(webm_subs_media_for_id(CAST(3 AS BIGINT)))) AS c)").show(3, false)
println(s"webm decoded plane samples: " + spark.sql("SELECT size(webm_frames(webm_media_for_id(CAST(0 AS BIGINT)))) AS n").head().getInt(0))

// 4g2. multimodal, AUDIO-CODEC leg (r16): real Vorbis I packet decode
//     behind the Ogg page walk AND the same stream through a WebM
//     mux (CodecPrivate Xiph lacing) — identical PCM either way
println(s"vorbis decoded frames: " + spark.sql("SELECT sum(wav_stats(vorbis_wav(ogg_vorbis_media_for_id(CAST(id AS BIGINT)))).n_frames) AS f FROM range(4)").head().getLong(0))
println(s"webm==ogg vorbis pcm: " + spark.sql("SELECT bool_and(wav_stats(vorbis_wav(ogg_vorbis_media_for_id(CAST(id AS BIGINT)))).samp_energy = wav_stats(webm_vorbis_wav(webm_vorbis_media_for_id(CAST(id AS BIGINT)))).samp_energy) AS eq FROM range(3)").head().getBoolean(0))

// 4h. shard-parallel index build (r14): two BM25 shards over disjoint
//     docid halves merge by PURE FILE RENAMES — no posting read or
//     rewritten — and the merged lake scores identically to a
//     monolithic build (df computed from merged postings at query
//     time; n and sumdl sum through the crash-safe marker protocol)
val mroot = java.nio.file.Files.createTempDirectory("graft-demo-merge").toString
val halfId = allDocs.agg(max(col("doc_id"))).head().getLong(0) / 2
val shardA = graft.operators.Bm25Index.build(allDocs.filter(col("doc_id") <= halfId).select("doc_id", "text"), "text", "doc_id", s"$mroot/a", nBuckets = 16)
val shardB = graft.operators.Bm25Index.build(allDocs.filter(col("doc_id") > halfId).select("doc_id", "text"), "text", "doc_id", s"$mroot/b", nBuckets = 16)
val mergedIdx = shardA.merge(shardB)
println(s"merged bm25 shards: n=${mergedIdx.n}; top hit: " + mergedIdx.search(Seq("vector", "hash", "join"), 1).head())

// 4h'. the postings lakes share the manifest-snapshot discipline
//      (r17): a reader pinned before a concurrent compact reads its
//      exact snapshot — maintenance windows are not part of the
//      keyword lake's contract either
val pinnedPostings = graft.operators.Bm25Index.load(spark, s"$mroot/a").postings
graft.operators.Bm25Index.load(spark, s"$mroot/a").compact()
println(s"bm25 reader across a concurrent compact: ${pinnedPostings.count()} postings; post-compact top hit: " + graft.operators.Bm25Index.load(spark, s"$mroot/a").search(Seq("vector", "hash", "join"), 1).head())

// 4i. snapshot isolation (r17): the cluster-partitioned ANN index is
//     manifest-pinned — a reader opened BEFORE maintenance reads its
//     exact snapshot while a compact commits the next one beside it
val ivfRoot = java.nio.file.Files.createTempDirectory("graft-demo-ivf").toString + "/ivf"
val demoEmb = spark.read.parquet(s"$sf/embeddings.parquet")
val ivfModel = graft.operators.Ivf.train(demoEmb, "embedding", k = 8)
val ivfIdx = graft.index.IvfVectorIndex.build(demoEmb, "embedding", "vec_id", ivfRoot, ivfModel)
val pinnedReader = graft.index.IvfVectorIndex.load(spark, ivfRoot).df
graft.index.IvfVectorIndex.load(spark, ivfRoot).compact()
val qv = demoEmb.filter(col("vec_id") === 7).select("embedding").head().getSeq[Float](0).toArray
println(s"snapshot reader across a concurrent compact: ${pinnedReader.count()} rows; post-compact self-match: " + graft.index.IvfVectorIndex.load(spark, ivfRoot).search(qv, 1, nprobe = 2).select("docid", "score").head())

// 5. mutate: delete + upsert (reference: N+1 HTTP loop / uid remap)
idx.deleteUids(Seq("0", "1"))
println(s"after delete: ${idx.count()}")
sys.exit(0)
