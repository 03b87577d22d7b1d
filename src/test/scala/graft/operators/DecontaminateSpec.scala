package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Decontamination: the inverted shingle join must flag exactly the
  * pairs a brute-force cross-corpus intersection flags, and clean()
  * must drop exactly the flagged training docs. */
class DecontaminateSpec extends SparkTestBase {

  private lazy val docs =
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
  private lazy val train = docs.filter(col("doc_id") < 400)
  private lazy val evalSet = docs.filter(col("doc_id") >= 400)

  test("inverted join equals brute-force cross-pair intersection") {
    val got = Decontaminate.overlaps(train, "doc_id", "text",
        evalSet, "doc_id", "text", n = 5, minHits = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // brute force: distinct shingle sets per doc, intersect every pair
    def sh(df: org.apache.spark.sql.DataFrame): Map[Long, Set[String]] =
      df.select(col("doc_id"), col("text")).collect().map { r =>
        val toks = r.getString(1).split(" ", -1)
        r.getLong(0) -> toks.sliding(5).filter(_.length == 5)
          .map(_.mkString(" ")).toSet
      }.toMap
    val trSh = sh(train)
    val teSh = sh(evalSet)
    val want = (for {
      (a, sa) <- trSh; (b, sb) <- teSh
      n = (sa & sb).size if n >= 2
    } yield (a, b, n.toLong)).toSet
    assert(got == want)
    assert(got.nonEmpty, "fixture should contain at least one leak pair")
  }

  test("contaminationFraction equals brute-force per-doc counting, " +
    "and the benchmark side is broadcast") {
    val df = Decontaminate.contaminationFraction(train, "doc_id", "text",
      evalSet, "doc_id", "text", n = 5)
    val gotMap = df.collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    def sh(d: org.apache.spark.sql.DataFrame): Map[Long, Set[String]] =
      d.select(col("doc_id"), col("text")).collect().map { r =>
        val toks = r.getString(1).split(" ", -1)
        r.getLong(0) -> toks.sliding(5).filter(_.length == 5)
          .map(_.mkString(" ")).toSet
      }.toMap
    val bench = sh(evalSet).values.foldLeft(Set.empty[String])(_ ++ _)
    val want = sh(train).collect { case (id, ss) if ss.nonEmpty =>
      id -> (ss.size.toLong, ss.count(bench.contains).toLong)
    }
    assert(gotMap == want)
    assert(want.values.exists(_._2 > 0), "fixture should be contaminated")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
  }

  test("clean() drops exactly the flagged training docs") {
    val flagged = Decontaminate.overlaps(train, "doc_id", "text",
        evalSet, "doc_id", "text", n = 5, minHits = 2)
      .select("train_id").distinct()
      .collect().map(_.getLong(0)).toSet
    val kept = Decontaminate.clean(train, "doc_id", "text",
        evalSet, "doc_id", "text", n = 5, minHits = 2)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val all = train.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == all -- flagged)
    assert(flagged.nonEmpty && kept.nonEmpty)
  }

  test("cleanWithSet at minHits=1 equals the join-based clean, and " +
    "union semantics are a conservative superset at minHits>1") {
    val shingleSet = Decontaminate.benchmarkShingles(
      evalSet, "doc_id", "text", n = 5)
    val viaSet = Decontaminate.cleanWithSet(train, "text", shingleSet,
        n = 5, minHits = 1)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val viaJoin = Decontaminate.clean(train, "doc_id", "text",
        evalSet, "doc_id", "text", n = 5, minHits = 1, maxShingleDf = None)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(viaSet == viaJoin)
    // at minHits=2 union-counting can only drop MORE rows than
    // per-pair counting (hits may come from different eval docs)
    val set2 = Decontaminate.cleanWithSet(train, "text", shingleSet,
        n = 5, minHits = 2)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val join2 = Decontaminate.clean(train, "doc_id", "text",
        evalSet, "doc_id", "text", n = 5, minHits = 2, maxShingleDf = None)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(set2.subsetOf(join2))
  }

  test("cleanWithSet keeps null-text rows — set/join parity (a null " +
    "text can't collide, so both paths must keep it)") {
    import spark.implicits._
    val tr = Seq(
      (0L, "alpha leaked shingle text one two three four five"),
      (1L, null.asInstanceOf[String]),
      (2L, "totally different words with no overlap at all here"))
      .toDF("doc_id", "text")
    val te = Seq((9L, "leaked shingle text one two three four five six"))
      .toDF("doc_id", "text")
    val set = Decontaminate.benchmarkShingles(te, "doc_id", "text", n = 5)
    val viaSet = Decontaminate.cleanWithSet(tr, "text", set, n = 5,
        minHits = 1)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val viaJoin = Decontaminate.clean(tr, "doc_id", "text",
        te, "doc_id", "text", n = 5, minHits = 1, maxShingleDf = None)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(viaSet == Set(1L, 2L), "null-text row must be KEPT")
    assert(viaSet == viaJoin)
  }

  test("cleanWithSet filters a structured stream (stateless — no " +
    "watermark or state store), streamed == batch") {
    val shingleSet = Decontaminate.benchmarkShingles(
      evalSet, "doc_id", "text", n = 5)
    val want = Decontaminate.cleanWithSet(train, "text", shingleSet,
        n = 5, minHits = 1)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val dir = java.nio.file.Files
      .createTempDirectory("graft-decon-stream").toString
    train.coalesce(2).write.mode("overwrite").parquet(s"$dir/in")
    val src = spark.readStream.schema(train.schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$dir/in")
    val q = Decontaminate.cleanWithSet(src, "text", shingleSet,
        n = 5, minHits = 1)
      .select("doc_id")
      .writeStream.format("memory").queryName("decon_stream")
      .outputMode("append").start()
    q.processAllAvailable(); q.stop()
    val got = spark.table("decon_stream")
      .collect().map(_.getLong(0)).toSet
    assert(got == want && got.nonEmpty)
  }

  test("stop-shingle cap drops boilerplate evidence (shared becomes a " +
    "lower bound, pairs below minHits vanish)") {
    import spark.implicits._
    val boiler = "standard header line one two three four five"
    val tr = Seq((0L, s"$boiler alpha beta"), (1L, s"$boiler gamma delta"))
      .toDF("doc_id", "text")
    val te = Seq((100L, s"$boiler epsilon zeta")).toDF("doc_id", "text")
    val uncapped = Decontaminate.overlaps(tr, "doc_id", "text",
      te, "doc_id", "text", n = 5, minHits = 1, maxShingleDf = None)
    assert(uncapped.count() == 2) // both train docs share the boilerplate
    val capped = Decontaminate.overlaps(tr, "doc_id", "text",
      te, "doc_id", "text", n = 5, minHits = 1, maxShingleDf = Some(1))
    assert(capped.count() == 0) // the shared shingles exceed df cap 1
  }
}
