package graft.plans

import org.apache.spark.sql.functions._

import graft.{Graft, Keyword, SparkTestBase}
import graft.operators.Bm25Index

/** Keyword auto-routing: `keyword_score(...) > 0` SQL is rewritten
  * onto the registered Bm25Index's pruned postings — only with the
  * opt-in conf, only with a route-registered index, with results
  * bit-identical to the per-row kernel plan, and with the corpus text
  * column gone from the scan. */
class KeywordRouteRuleSpec extends SparkTestBase {

  private lazy val docs =
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet")

  private lazy val idx: Bm25Index = {
    val dir = java.nio.file.Files.createTempDirectory("kwroute").toString
    Bm25Index.build(docs, "text", "doc_id", s"$dir/idx", nBuckets = 8)
  }

  private val sql =
    """SELECT doc_id, keyword_score(text, 'vector hash join') AS bm
      |FROM docs_v
      |WHERE keyword_score(text, 'vector hash join') > 0
      |ORDER BY bm DESC, doc_id LIMIT 10""".stripMargin

  private def withRouting[T](f: => T): T = {
    Graft.init(spark)
    docs.createOrReplaceTempView("docs_v")
    Keyword.registerIndex(idx, routeIdCol = Some("doc_id"))
    spark.conf.set("spark.graft.ann.autoRoute", "true")
    try f finally spark.conf.set("spark.graft.ann.autoRoute", "false")
  }

  test("the guarded keyword query routes onto pruned postings: bucket " +
    "partition filters appear, the corpus scan drops the text column, " +
    "and results are bit-identical to the kernel plan") {
    Graft.init(spark)
    docs.createOrReplaceTempView("docs_v")
    Keyword.registerIndex(idx, routeIdCol = Some("doc_id"))
    val want = spark.sql(sql).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    val kernelPlan = spark.sql(sql).queryExecution.executedPlan.toString
    assert(!kernelPlan.contains("PartitionFilters: [bucket"), kernelPlan)
    withRouting {
      val routed = spark.sql(sql)
      routed.collect()
      val plan = routed.queryExecution.executedPlan.toString
      assert("PartitionFilters: \\[[^\\]]*bucket[^\\]]*IN".r
        .findFirstIn(plan).isDefined, plan)
      val docScan = plan.linesIterator
        .find(l => l.contains("FileScan parquet") &&
          l.contains("documents.parquet")).getOrElse("")
      assert(docScan.nonEmpty && !docScan.contains("text"), plan)
      val got = routed.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      assert(got == want)
      assert(got.nonEmpty)
    }
    // conf off again: back to the kernel plan
    val after = spark.sql(sql).queryExecution.executedPlan.toString
    assert(!after.contains("PartitionFilters: [bucket"), after)
  }

  test("no rewrite without the conf, without a routeIdCol, or for an " +
    "output-changing shape (SELECT *)") {
    Graft.init(spark)
    docs.createOrReplaceTempView("docs_v")
    // stats-only registration (no routeIdCol): even with the conf on,
    // the plan stays kernel-shaped
    Keyword.registerIndex(idx)
    spark.conf.set("spark.graft.ann.autoRoute", "true")
    try {
      val p1 = spark.sql(sql).queryExecution.executedPlan.toString
      assert(!p1.contains("PartitionFilters: [bucket"), p1)
      // route-registered but SELECT * would leak the joined column:
      // the rule must bail and keep the exact output schema
      Keyword.registerIndex(idx, routeIdCol = Some("doc_id"))
      val star = spark.sql(
        "SELECT * FROM docs_v WHERE keyword_score(text, 'vector') > 0")
      assert(star.columns.toSeq == docs.columns.toSeq)
      val p2 = star.queryExecution.executedPlan.toString
      assert(!p2.contains("__graft_routed_bm25"), p2)
    } finally spark.conf.set("spark.graft.ann.autoRoute", "false")
  }

  test("the full hybrid_pure_sql shape (keyword_score + similar + " +
    "bounds blend) routes its lexical half with identical results") {
    Graft.init(spark)
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    graft.Txtai.register(docs, emb)
    val hybridSql =
      """WITH scored AS (
        |  SELECT id, keyword_score('vector hash join') AS bm,
        |         similar('vector hash join') AS cos
        |  FROM txtai
        |  WHERE keyword_score('vector hash join') > 0),
        |bounds AS (
        |  SELECT min(bm) AS bmin, max(bm) AS bmax,
        |         min(cos) AS cmin, max(cos) AS cmax
        |  FROM scored)
        |SELECT id,
        |       CAST(round((0.5 * (CASE WHEN cmax = cmin THEN 1.0
        |                   ELSE (cos - cmin) / (cmax - cmin) END)
        |             + 0.5 * (CASE WHEN bmax = bmin THEN 1.0
        |                   ELSE CAST(bm - bmin AS DOUBLE)
        |                        / CAST(bmax - bmin AS DOUBLE) END))
        |             * 1000000.0, 0) AS BIGINT) AS hybrid_micros
        |FROM scored CROSS JOIN bounds
        |ORDER BY hybrid_micros DESC, id LIMIT 10""".stripMargin
    // index stats active for BOTH runs so the only variable is routing
    // (the keyword filter is pushed onto the raw documents relation by
    // the time the rule runs, so the route id column is doc_id even
    // though the view renames it to id)
    Keyword.registerIndex(idx, routeIdCol = Some("doc_id"))
    val want = spark.sql(hybridSql).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    spark.conf.set("spark.graft.ann.autoRoute", "true")
    try {
      val routed = spark.sql(hybridSql)
      routed.collect()
      val plan = routed.queryExecution.executedPlan.toString
      assert("PartitionFilters: \\[[^\\]]*bucket[^\\]]*IN".r
        .findFirstIn(plan).isDefined, plan)
      val got = routed.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      assert(got == want)
      assert(got.nonEmpty)
    } finally {
      spark.conf.set("spark.graft.ann.autoRoute", "false")
      graft.Txtai.register(docs, emb) // restore corpus-backed stats
    }
  }
}
