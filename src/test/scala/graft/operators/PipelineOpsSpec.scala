package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkTestBase

class PipelineOpsSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val sf = "/root/testdata/sf0.001"
  private lazy val docs = spark.read.parquet(s"$sf/documents.parquet")

  // ---------- TextDedup ----------

  test("ngramJaccardPairs (inverted index) == brute-force cross join") {
    val fast = TextDedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.2)
      .select("id_a", "id_b", "jaccard").collect()
      .map(r => (r.getLong(0), r.getLong(1),
        math.round(r.getDouble(2) * 1e9))).toSet

    val sh = TextDedup.shingles(docs, "doc_id", "text", 3)
    val a = sh.select(col("id").as("id_a"), col("sh").as("sha"))
    val b = sh.select(col("id").as("id_b"), col("sh").as("shb"))
    val brute = a.crossJoin(b).filter(col("id_a") < col("id_b"))
      .withColumn("jaccard",
        size(array_intersect(col("sha"), col("shb"))).cast("double") /
          size(array_union(col("sha"), col("shb"))))
      .filter(col("jaccard") >= 0.2)
      .select("id_a", "id_b", "jaccard").collect()
      .map(r => (r.getLong(0), r.getLong(1),
        math.round(r.getDouble(2) * 1e9))).toSet

    assert(fast == brute && fast.nonEmpty)
  }

  test("ngramJaccardPairsKeyed over xxhash64'd shingles == the string " +
    "pairs (the ShingleIndex.survivors reuse path, r14)") {
    val want = TextDedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.2)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        math.round(r.getDouble(2) * 1e9))).toSet
    val keyed = TextDedup.shingles(docs, "doc_id", "text", 3)
      .select(col("id"), explode(col("sh")).as("__s"), col("nsh"))
      .select(xxhash64(col("__s")).as("key"), col("id"), col("nsh"))
    val got = TextDedup.ngramJaccardPairsKeyed(keyed, 0.2)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        math.round(r.getDouble(2) * 1e9))).toSet
    assert(got == want && want.nonEmpty)
    // and with RAW string keys (hashKeys=false lakes) — same again
    val strKeyed = TextDedup.shingles(docs, "doc_id", "text", 3)
      .select(col("id"), explode(col("sh")).as("key"), col("nsh"))
    val gotStr = TextDedup.ngramJaccardPairsKeyed(
      strKeyed.select(col("key"), col("id"), col("nsh")), 0.2)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        math.round(r.getDouble(2) * 1e9))).toSet
    assert(gotStr == want)
  }

  test("exactDupGroups finds planted duplicates; dedupExact keeps min id") {
    val d = Seq(
      (1L, "alpha beta"), (2L, "alpha beta"), (3L, "unique one"),
      (4L, "alpha beta"), (5L, "other text")).toDF("doc_id", "text")
    val groups = TextDedup.exactDupGroups(d, "doc_id", "text").collect()
    assert(groups.length == 1)
    assert(groups.head.getSeq[Long](groups.head.fieldIndex("ids")).toSeq ==
      Seq(1L, 2L, 4L))
    val kept = TextDedup.dedupExact(d, "doc_id", "text")
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(kept == Seq(1L, 3L, 5L))
  }

  // ---------- MinHashLsh ----------

  test("minhash LSH finds all high-jaccard pairs (verified, no false positives)") {
    val exact = TextDedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val lsh = MinHashLsh.nearDupPairs(docs, "doc_id", "text",
      n = 3, numHashes = 64, bands = 16, threshold = 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    // verification step guarantees lsh ⊆ exact; banding (r=4) makes
    // missing a j≥0.5 pair very unlikely, and our near-dups are j≈0.98
    assert(lsh.subsetOf(exact))
    assert(lsh == exact, s"missed: ${exact -- lsh}")
  }

  test("minhash signature length and determinism") {
    val s1 = MinHashLsh.signatures(docs.limit(20), "doc_id", "text", 3, 32)
      .orderBy("id").collect().map(_.getSeq[Long](1))
    val s2 = MinHashLsh.signatures(docs.limit(20), "doc_id", "text", 3, 32)
      .orderBy("id").collect().map(_.getSeq[Long](1))
    assert(s1.forall(_.length == 32))
    assert(s1.zip(s2).forall { case (x, y) => x == y })
  }

  // ---------- SimHash ----------

  test("simhash: identical docs collide, near-identical are close") {
    val d = Seq(
      (1L, "spark catalyst optimizer rewrites logical plans fast"),
      (2L, "spark catalyst optimizer rewrites logical plans fast"),
      (3L, "spark catalyst optimizer rewrites logical plans slowly"),
      (4L, "completely different words about bananas and weather")
    ).toDF("doc_id", "text")
    val fp = SimHash.fingerprints(d, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fp(1L) == fp(2L))
    assert(java.lang.Long.bitCount(fp(1L) ^ fp(3L)) <
      java.lang.Long.bitCount(fp(1L) ^ fp(4L)))
    val pairs = SimHash.nearDupPairs(d, "doc_id", "text", maxHamming = 3)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.contains((1L, 4L)))
  }

  test("simhash maxHamming=0 degenerates to exact-fingerprint equality " +
    "(not an all-pairs join)") {
    val d = Seq(
      (1L, "same words here"), (2L, "same words here"),
      (3L, "different content entirely")).toDF("doc_id", "text")
    val pairs = SimHash.nearDupPairs(d, "doc_id", "text", maxHamming = 0)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((1L, 2L)))
  }

  test("hot-shingle cap: a boilerplate shingle shared by every doc does " +
    "not generate all-pairs candidates (skew guard)") {
    // 60 docs that share ONE ubiquitous 3-gram ("terms of service") but
    // are otherwise unique — uncapped, that shingle alone contributes
    // 60*59/2 candidate pairs; with the cap it contributes none, and no
    // pair is similar enough to report
    val docs = (0 until 60).map { i =>
      (i.toLong, s"terms of service u$i v$i w$i x$i y$i z$i q$i r$i")
    }.toDF("doc_id", "text")
    val capped = TextDedup.ngramJaccardPairs(
      docs, "doc_id", "text", n = 3, threshold = 0.5, maxShingleDf = Some(10))
    assert(capped.count() == 0)
    // two real near-dups still surface through sub-cap shingles
    val withDup = docs.union(Seq(
      (100L, "alpha beta gamma delta epsilon zeta eta theta"),
      (101L, "alpha beta gamma delta epsilon zeta eta iota")
    ).toDF("doc_id", "text"))
    val pairs = TextDedup.ngramJaccardPairs(
      withDup, "doc_id", "text", n = 3, threshold = 0.5, maxShingleDf = Some(10))
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((100L, 101L)))
  }

  test("TextEncoder seam: batch encodeColumn matches the hash_embed " +
    "expression; a custom encoder drives indexTextWorkflow end-to-end") {
    val docs = Seq(
      ("u1", "spark shuffles wide joins"),
      ("u2", "catalyst prunes parquet columns")
    ).toDF("uid", "text")
    // distributed batch path == Catalyst expression, bit for bit
    val viaSeam = graft.TextEncoder
      .encodeColumn(docs, "text", "vector", graft.HashingEncoder(16))
      .select("uid", "vector").as[(String, Seq[Float])].collect().toMap
    val viaExpr = docs.select(col("uid"),
      TextAnalysis.hashEmbed("text", 16).as("v"))
      .as[(String, Seq[Float])].collect().toMap
    assert(viaSeam == viaExpr)
    // a swapped-in "model" flows through the index workflow
    val dir = java.nio.file.Files.createTempDirectory("graft-enc-wf").toString
    val constant = new (String => Array[Float]) with Serializable {
      override def apply(t: String): Array[Float] =
        if (t.contains("spark")) Array(1f, 0f) else Array(0f, 1f)
    }
    val idx = Workflows.indexTextWorkflow(docs, "text", dir, constant)
    val hit = idx.search(Array(1f, 0f), 1).head()
    assert(hit.getAs[String]("uid") == "u1")
  }

  test("ngram_shingles yields null (not a crash) for sub-n token counts " +
    "even on non-nullable input") {
    graft.Graft.init(spark)
    val r = spark.sql("SELECT ngram_shingles('a b', 3) AS sh").head()
    assert(r.isNullAt(0))
    // and through a non-nullable column (constant-folding would have
    // dropped the isNotNull filter when nullable was mis-declared)
    val sh2 = TextDedup.shingles(
      Seq(("x", "a b"), ("y", "a b c d")).toDF("id0", "text"), "id0", "text", 3)
      .collect()
    assert(sh2.length == 1) // short doc filtered, long doc kept
  }

  test("stopwordRatio respects the passed column and quoted words") {
    val d = Seq(("don't stop me now", "unused")).toDF("body", "text")
    val r = d.select(TextAnalysis.stopwordRatio(col("body"),
      Seq("don't", "me")).as("r")).head()
    assert(math.abs(r.getDouble(0) - 0.5) < 1e-9)
  }

  // ---------- TextAnalysis ----------

  test("fingerprint matches the reference fold and is null/empty safe") {
    val d = Seq(("abc"), ("")).toDF("text")
    val out = d.select(TextAnalysis.fingerprint("text").as("fp"))
      .as[Long].collect()
    // ((97*31)+98)*31+99 = 96354 (fold seeded with 'a')
    assert(out(0) == ((97L * 31 + 98) * 31 + 99) % 1000000007)
    assert(out(1) == -1L)
  }

  test("token counts: whitespace and regex") {
    val d = Seq("Hello world 42 foo-bar").toDF("text")
    val r = d.select(
      TextAnalysis.tokenCount(col("text")).as("ws"),
      TextAnalysis.regexTokenCount(col("text")).as("re")).head()
    assert(r.getInt(0) == 4)
    assert(r.getInt(1) == 5) // hello, world, 42, foo, bar
  }

  test("langId picks the profile with the highest marker overlap") {
    val profiles = Map(
      "en" -> Seq("the", "and", "of"),
      "de" -> Seq("der", "und", "das"),
      "fr" -> Seq("le", "et", "la"))
    val d = Seq(
      ("the cat and the dog of the house"),
      ("der hund und das haus"),
      ("le chat et la maison")).toDF("text")
    val out = d.select(TextAnalysis.langId("text", profiles).as("lang"))
      .as[String].collect().toSeq
    assert(out == Seq("en", "de", "fr"))
  }

  test("qualityScore in [0,1] over real docs") {
    val scores = docs.select(TextAnalysis.qualityScore(col("text")).as("q"))
      .as[Double].collect()
    assert(scores.forall(s => s >= 0.0 && s <= 1.0))
  }

  // ---------- AnnLsh ----------

  test("LSH with full probes == exact search; 1 probe is a fast subset") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val lsh = HyperplaneLsh(dim = 64, nbits = 6, seed = 42L)
    val bucketized = AnnLsh.bucketize(emb, "embedding", lsh).cache()
    val q = emb.filter(col("vec_id") === 7).select("embedding")
      .head().getSeq[Float](0).toArray
    val exact = Knn.search(emb, "embedding", "vec_id", q, 10)
      .select("vec_id").as[Long].collect().toSeq
    val full = AnnLsh.search(bucketized, "embedding", "vec_id", q, 10,
      lsh, probes = 6).select("vec_id").as[Long].collect().toSeq
    assert(full == exact) // probing all hamming-≤nbits buckets = whole space
    val approx = AnnLsh.search(bucketized, "embedding", "vec_id", q, 10,
      lsh, probes = 1).select("vec_id").as[Long].collect().toSeq
    assert(approx.nonEmpty && approx.head == 7L) // self-match survives
    bucketized.unpersist()
  }

  test("bucketize is deterministic across invocations") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet").limit(50)
    val lsh = HyperplaneLsh(dim = 64, nbits = 8)
    val b1 = AnnLsh.bucketize(emb, "embedding", lsh)
      .select("vec_id", "bucket").as[(Long, Int)].collect().toMap
    val b2 = AnnLsh.bucketize(emb, "embedding", HyperplaneLsh(64, 8))
      .select("vec_id", "bucket").as[(Long, Int)].collect().toMap
    assert(b1 == b2)
  }

  // ---------- Multimodal ----------

  test("multimodal pipeline composes: frames -> per-frame features") {
    val media = Seq(
      (1L, Array.tabulate(256)(_.toByte)),
      (2L, Array.tabulate(64)(i => (i * 3).toByte))).toDF("id", "media")
    val framed = Multimodal.sampleFrames(media, "media", n = 4, frameWidth = 16)
      .select(col("id"), posexplode(col("frames")).as(Seq("frame_idx", "frame")))
    val feats = Multimodal.extractFeatures(framed, "frame", dim = 4)
    val rows = feats.collect()
    assert(rows.length == 8) // 2 blobs x 4 frames
    rows.foreach { r =>
      val f = r.getSeq[Float](r.fieldIndex("features"))
      assert(f.length == 4)
    }
    // deterministic across runs (compare by value, not blob identity)
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getInt(1), r.getSeq[Float](r.fieldIndex("features")).toSeq)
    val again = Multimodal.extractFeatures(framed, "frame", dim = 4).collect()
    assert(rows.map(key).toSet == again.map(key).toSet)
  }

  test("multimodal: decodeMeta/extractFeatures/sampleFrames shapes + nulls") {
    val media = Seq(
      (1L, MediaFixtures.png(640, 480, 2)),
      (2L, MediaFixtures.jpeg(320, 200, 3)),
      (4L, "not an image at all".getBytes("UTF-8")),
      (5L, Array[Byte]()),
      (3L, null.asInstanceOf[Array[Byte]])).toDF("id", "media")
    val meta = Multimodal.decodeMeta(media, "media")
    assert(meta.schema("meta").dataType == Multimodal.metaSchema)
    val m1 = meta.filter(col("id") === 1)
      .select("meta.width", "meta.height", "meta.channels", "meta.format").head()
    assert(m1.getInt(0) == 640 && m1.getInt(1) == 480 &&
      m1.getInt(2) == 3 && m1.getString(3) == "png")
    val m2 = meta.filter(col("id") === 2)
      .select("meta.width", "meta.height", "meta.channels", "meta.format").head()
    assert(m2.getInt(0) == 320 && m2.getInt(1) == 200 &&
      m2.getInt(2) == 3 && m2.getString(3) == "jpeg")
    // non-image and empty bytes parse to null meta, never throw
    assert(meta.filter(col("id") === 4).select("meta").head().isNullAt(0))
    assert(meta.filter(col("id") === 5).select("meta").head().isNullAt(0))
    assert(meta.filter(col("id") === 3).select("meta").head().isNullAt(0))

    val feats = Multimodal.extractFeatures(media, "media", dim = 8)
      .filter(col("id") === 1).select("features").head().getSeq[Float](0)
    assert(feats.length == 8 && math.abs(feats.sum - 1.0f) < 1e-3)

    val frames = Multimodal.sampleFrames(media, "media", n = 3, frameWidth = 4)
      .filter(col("id") === 1).select("frames").head().getSeq[Array[Byte]](0)
    assert(frames.length == 3 && frames.forall(_.length <= 4))
  }

  test("RAG composition e2e: chunk -> encode -> index -> search returns " +
    "the right document AND the right passage within it") {
    val corpus = docs.filter(col("doc_id") < 60)
    // chunk to passages; uid identifies (doc, chunk)
    val chunks = TextChunk.chunk(corpus, "doc_id", "text",
        size = 25, overlap = 5)
      .select(concat(col("doc_id"), lit("#"), col("chunk_id")).as("uid"),
        col("doc_id"), col("chunk_id"), col("chunk").as("text"))
    assert(chunks.count() > corpus.count(), "long docs must multi-chunk")
    val dir = java.nio.file.Files.createTempDirectory("graft-rag").toString
    val idx = Workflows.indexTextWorkflow(chunks, "text", dir)
    assert(idx.count() == chunks.count())
    // query with the exact text of a KNOWN chunk: its uid must be top-1
    // with score 1.0 (hash encoding is deterministic)
    val probe = chunks.filter(col("doc_id") === 7 && col("chunk_id") === 1)
      .select("uid", "text").head()
    val hits = Workflows.searchWorkflow(
      idx, graft.HashingEncoder(64), probe.getString(1), 3)
    val top = hits.select("uid", "score").head()
    assert(top.getString(0) == probe.getString(0), s"got ${top.getString(0)}")
    assert(math.abs(top.getDouble(1) - 1.0) < 1e-6)
  }
}
