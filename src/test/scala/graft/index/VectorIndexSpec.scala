package graft.index

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkTestBase
import graft.operators.Ids

/** Ports the observable semantics of the reference's integration suite
  * (tests/ann/test_weaviate.py) onto the Parquet-backed VectorIndex. */
class VectorIndexSpec extends SparkTestBase {
  import spark.implicits._

  private def tmpDir(): String =
    Files.createTempDirectory("graft-idx").toString

  /** One-hot style deterministic vectors (FIXTURES.md: offline stand-in
    * for sentence-transformer embeddings; tests ranking machinery). */
  private def basis(dim: Int, i: Int, w: Float = 1f): Array[Float] = {
    val a = Array.fill(dim)(0f); a(i) = w; a
  }

  private def docsDF(rows: Seq[(String, Array[Float], String)]): DataFrame =
    rows.toDF("uid", "vector", "tags")

  // --- schema validation (test_weaviate.py:47-57,60-72,75-85,116-125) ---

  test("default schema validates") {
    IndexSchema.validate(IndexSchema.core, "cosine")
  }

  test("custom schema with extra properties validates (Post/content)") {
    val s = IndexSchema.core.add("content", StringType)
    IndexSchema.validate(s, "cosine")
  }

  test("non-cosine metric is rejected") {
    val e = intercept[SchemaValidationException] {
      IndexSchema.validate(IndexSchema.core, "dot")
    }
    assert(e.getMessage.contains("cosine"))
  }

  test("schema without docid is rejected") {
    val s = StructType(Seq(StructField("content", StringType)))
    val e = intercept[SchemaValidationException] {
      IndexSchema.validate(s, "cosine")
    }
    assert(e.getMessage.contains("docid"))
  }

  test("docid with non-integer type is rejected") {
    val s = StructType(Seq(StructField("docid", StringType)))
    intercept[SchemaValidationException] {
      IndexSchema.validate(s, "cosine")
    }
  }

  // --- index/count/offset (test_weaviate.py:128-148) ---

  test("index two docs: count=2, offset=2, vectors present") {
    val idx = VectorIndex.create(spark, tmpDir())
    idx.index(docsDF(Seq(
      ("0", basis(4, 0), null), ("1", basis(4, 1), null))))
    assert(idx.count() == 2)
    assert(idx.offset == 2)
    assert(idx.df.filter(col("vector").isNull).count() == 0)
    // docids dense from 0
    assert(idx.df.select("docid").as[Long].collect().sorted.toSeq == Seq(0L, 1L))
  }

  test("append continues docids from offset (weaviate.py:135-149)") {
    val idx = VectorIndex.create(spark, tmpDir())
    idx.index(docsDF(Seq(("a", basis(4, 0), null))))
    idx.append(docsDF(Seq(("b", basis(4, 1), null), ("c", basis(4, 2), null))))
    assert(idx.count() == 3)
    assert(idx.df.select("docid").as[Long].collect().sorted.toSeq == Seq(0L, 1L, 2L))
  }

  // --- overwrite/reuse (test_weaviate.py:88-113) ---

  test("create on existing path: overwrite=true drops, overwrite=false reuses") {
    val dir = tmpDir()
    VectorIndex.create(spark, dir)
      .index(docsDF(Seq(("0", basis(4, 0), null))))
    val reused = VectorIndex.create(spark, dir,
      config = IndexConfig(overwriteIndex = false))
    assert(reused.exists && reused.count() == 1)
    val overwritten = VectorIndex.create(spark, dir)
    assert(!overwritten.exists)
  }

  // --- relevance ranking (test_weaviate.py:151-170, string uids) ---

  test("search ranks by similarity: vixen→foo, puppy→bar, markets→baz") {
    val idx = VectorIndex.create(spark, tmpDir())
    idx.index(docsDF(Seq(
      ("foo", basis(4, 0), null),   // "the quick brown fox"
      ("bar", basis(4, 1), null),   // "jumps over the lazy dog"
      ("baz", basis(4, 2), null)))) // "Stock futures fall..."
    val queries = Map(
      "foo" -> Array(0.9f, 0.1f, 0f, 0f),  // vixen
      "bar" -> Array(0.1f, 0.9f, 0f, 0f),  // puppy
      "baz" -> Array(0f, 0.1f, 0.9f, 0.1f)) // financial markets
    queries.foreach { case (expected, qv) =>
      val top = idx.search(qv, 3).select("uid").head().getString(0)
      assert(top == expected)
      val scores = idx.search(qv, 3).select("score").as[Double].collect()
      assert(scores.forall(s => s >= -1.0 && s <= 1.0))
    }
  }

  // --- upsert/delete ranking stability (test_weaviate.py:254-317) ---

  test("upsert changes top hit; delete of upserted uid restores prior ranking") {
    val dim = 8
    val idx = VectorIndex.create(spark, tmpDir())
    idx.index(docsDF((0 to 5).map(i => (i.toString, basis(dim, i), null))))
    val feelGood = { val a = Array.fill(dim)(0f); a(4) = 0.8f; a(5) = 0.1f; a }
    assert(idx.search(feelGood, 1).select("uid").head().getString(0) == "4")
    // upsert doc 0 → "baby panda born" = vector equal to the query
    idx.upsert(docsDF(Seq(("0", feelGood, null))))
    assert(idx.count() == 6)
    assert(idx.search(feelGood, 1).select("uid").head().getString(0) == "0")
    // delete uid 0 → ranking reverts to doc 4
    idx.deleteUids(Seq("0"))
    assert(idx.count() == 5)
    assert(idx.search(feelGood, 1).select("uid").head().getString(0) == "4")
  }

  test("delete by docid is set-oriented and excludes from search") {
    val idx = VectorIndex.create(spark, tmpDir())
    idx.index(docsDF((0 to 9).map(i => (i.toString, basis(16, i), null))))
    idx.delete(Seq(0L, 1L, 2L, 3L))
    assert(idx.count() == 6)
    val hits = idx.search(basis(16, 0), 10).select("docid").as[Long].collect()
    assert(hits.forall(_ > 3))
  }

  // --- save/load are real (vs weaviate.py:208-224 no-ops) ---

  test("save then load preserves contents and search results") {
    val src = tmpDir(); val dst = tmpDir()
    val idx = VectorIndex.create(spark, src)
    idx.index(docsDF((0 to 4).map(i => (i.toString, basis(8, i), null))))
    idx.save(dst)
    val loaded = VectorIndex.load(spark, dst)
    assert(loaded.count() == 5)
    val a = idx.search(basis(8, 2), 3).select("uid").as[String].collect().toSeq
    val b = loaded.search(basis(8, 2), 3).select("uid").as[String].collect().toSeq
    assert(a == b)
  }

  test("load recovers persisted config (packed layout) from index metadata") {
    val dir = tmpDir()
    VectorIndex.create(spark, dir,
      config = IndexConfig(className = "Post", packed = true))
      .index(docsDF(Seq(("0", basis(4, 0), null))))
    val loaded = VectorIndex.load(spark, dir)
    assert(loaded.config.packed && loaded.config.className == "Post")
    // append through the recovered config keeps the packed layout
    loaded.append(docsDF(Seq(("1", basis(4, 1), null))))
    assert(loaded.df.schema("vector").dataType ==
      org.apache.spark.sql.types.BinaryType)
  }

  test("compact merges append-accumulated small files, data unchanged") {
    val dir = tmpDir()
    val idx = VectorIndex.create(spark, dir)
    idx.index(docsDF(Seq(("0", basis(4, 0), null))))
    (1 to 5).foreach(i => idx.append(docsDF(Seq((i.toString, basis(8, 2), null)))))
    def dataFiles() = new java.io.File(idx.dataDir)
      .listFiles().count(_.getName.endsWith(".parquet"))
    val before = dataFiles()
    val contents = idx.df.select("docid", "uid").as[(Long, String)]
      .collect().toSet
    idx.compact(rowsPerFile = 100)
    assert(dataFiles() < before)
    assert(idx.df.select("docid", "uid").as[(Long, String)]
      .collect().toSet == contents)
  }

  test("destructive ops create new versions; old versions stay readable " +
    "until vacuum (reader isolation)") {
    val idx = VectorIndex.create(spark, tmpDir())
    idx.index(docsDF((0 to 4).map(i => (i.toString, basis(4, i % 4), null))))
    assert(idx.currentVersion.contains(0L))
    // a reader planning against v0 keeps its files while we delete
    val v0Reader = idx.df
    idx.deleteUids(Seq("0"))
    assert(idx.currentVersion.contains(1L))
    assert(idx.count() == 4)
    assert(v0Reader.count() == 5)        // in-flight reader unbroken
    assert(idx.dfAt(0).count() == 5)     // time travel
    idx.vacuum(keepLast = 1)
    intercept[IndexNotFoundException] { idx.dfAt(0) }
    assert(idx.count() == 4)             // current version untouched
  }

  // --- packed storage layout ---

  test("packed index: append/upsert with mismatched config keep the " +
    "stored layout (no mixed-schema directory)") {
    val dir = tmpDir()
    val rnd = new scala.util.Random(3)
    def mk(ids: Range) = docsDF(ids.map(i =>
      (i.toString, Array.fill(8)(rnd.nextFloat()), null)))
    VectorIndex.create(spark, dir, config = IndexConfig(packed = true))
      .index(mk(0 until 10))
    // reopened with DEFAULT config (packed=false): must still pack
    val reopened = VectorIndex.load(spark, dir)
    reopened.append(mk(10 until 15))
    reopened.upsert(mk(0 until 3))
    assert(reopened.count() == 15)
    assert(reopened.df.schema("vector").dataType ==
      org.apache.spark.sql.types.BinaryType)
    val q = Array.fill(8)(rnd.nextFloat())
    assert(reopened.search(q, 5).count() == 5)
  }

  test("packed index: same search results as array layout, binary storage") {
    val rnd = new scala.util.Random(11)
    val docs = docsDF((0 until 50).map(i =>
      (i.toString, Array.fill(16)(rnd.nextFloat()), null)))
    val arrIdx = VectorIndex.create(spark, tmpDir()).index(docs)
    val packIdx = VectorIndex.create(spark, tmpDir(),
      config = IndexConfig(packed = true)).index(docs)
    assert(packIdx.df.schema("vector").dataType ==
      org.apache.spark.sql.types.BinaryType)
    val q = Array.fill(16)(rnd.nextFloat())
    val a = arrIdx.search(q, 5).select("uid", "score")
      .collect().map(r => (r.getString(0), r.getDouble(1))).toSeq
    val p = packIdx.search(q, 5).select("uid", "score")
      .collect().map(r => (r.getString(0), r.getDouble(1))).toSeq
    assert(a == p) // bitwise-identical scores, same ranking
  }

  test("upsert is idempotent: applying the same batch twice == once") {
    val idx = VectorIndex.create(spark, tmpDir())
    idx.index(docsDF((0 to 4).map(i => (i.toString, basis(8, i), null))))
    val batch = docsDF(Seq(("1", basis(8, 6), null), ("9", basis(8, 7), null)))
    idx.upsert(batch)
    val once = idx.df.select("uid", "vector").collect()
      .map(r => (r.getString(0), r.getSeq[Float](1).toSeq)).toSet
    idx.upsert(batch)
    val twice = idx.df.select("uid", "vector").collect()
      .map(r => (r.getString(0), r.getSeq[Float](1).toSeq)).toSet
    assert(once == twice && idx.count() == 6)
  }

  test("index-level batch search matches per-query single search") {
    val rnd = new scala.util.Random(5)
    val idx = VectorIndex.create(spark, tmpDir())
    idx.index(docsDF((0 until 40).map(i =>
      (f"u$i%03d", Array.fill(8)(rnd.nextFloat()), null))))
    val queries = idx.df.filter(col("docid") < 3)
      .select(col("docid").as("qid"), col("vector").as("qvec"))
    val batch = idx.searchBatch(queries, "qvec", "qid", 4)
      .collect()
      .groupBy(_.getAs[Long]("qid"))
      .view.mapValues(_.sortBy(_.getAs[Int]("rank"))
        .map(_.getAs[Long]("id")).toSeq).toMap
    idx.df.filter(col("docid") < 3)
      .select("docid", "vector").collect()
      .foreach { r =>
        val single = idx.search(r.getSeq[Float](1).toArray, 4)
          .select("docid").as[Long].collect().toSeq
        assert(batch(r.getLong(0)) == single, s"qid=${r.getLong(0)}")
      }
  }

  // --- guard (weaviate.py:41-52, test_weaviate.py:240-246) ---

  test("operations on a dropped index raise IndexNotFoundException") {
    val idx = VectorIndex.create(spark, tmpDir())
    idx.index(docsDF(Seq(("0", basis(4, 0), null))))
    idx.drop()
    intercept[IndexNotFoundException] { idx.count() }
    intercept[IndexNotFoundException] { idx.search(basis(4, 0), 1) }
    intercept[IndexNotFoundException] { idx.delete(Seq(0L)) }
    intercept[IndexNotFoundException] { VectorIndex.load(spark, idx.path) }
  }

  // --- client batch config (weaviate.py:29-38, test_weaviate.py:221-237) ---

  test("BatchConfig: partial override keeps the other knobs at defaults " +
    "(the reference's _configure_client merge semantics)") {
    val d = BatchConfig()
    assert(d.batchSize.isEmpty && !d.dynamic && d.numWorkers == 1 &&
      d.timeoutRetries == 3 && d.connectionErrorRetries == 3 &&
      d.weaviateErrorRetries == 3)
    val o = d.copy(batchSize = Some(64L), dynamic = true)
    assert(o.batchSize.contains(64L) && o.dynamic)
    assert(o.numWorkers == 1 && o.timeoutRetries == 3) // untouched knobs
  }

  test("BatchConfig.batchSize rolls index files every N rows " +
    "(the engine face of the reference's batch flush)") {
    val dir = tmpDir()
    val docs = docsDF((0 until 10).map(i => (f"u$i%02d", basis(4, i % 4), "t")))
    val idx = VectorIndex.create(spark, dir,
      config = IndexConfig(batch = BatchConfig(batchSize = Some(3L))))
      .index(docs.coalesce(1))
    val files = new java.io.File(idx.dataDir).listFiles()
      .count(_.getName.endsWith(".parquet"))
    assert(files >= 4, s"expected >=4 rolled files for 10 rows @ batch 3, got $files")
    assert(idx.count() == 10)
  }

  // --- dense id assignment (SURVEY §7.4 risk 1) ---

  test("withDenseId: dense, deterministic, offset-respecting, multi-partition") {
    val df = spark.range(1000).select(
      concat(lit("u"), format_string("%04d", col("id"))).as("uid"))
      .repartition(7)
    val ids = Ids.withDenseId(df, "docid", Seq(col("uid")), offset = 100L)
    val rows = ids.select("uid", "docid").as[(String, Long)].collect().sortBy(_._2)
    assert(rows.map(_._2).toSeq == (100L until 1100L))
    // deterministic: docid order == uid order
    assert(rows.map(_._1).toSeq == rows.map(_._1).sorted.toSeq)
  }
}
