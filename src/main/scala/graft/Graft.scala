package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftshim.Shim

import graft.functions._

/** Session-level entry point: registers the engine's native Catalyst
  * functions (idempotent) and exposes them as `Column` helpers.
  *
  * Registration goes through the session FunctionRegistry (not
  * `spark.udf`) so the functions are real expressions — codegen'd,
  * null-propagating, usable from both the DataFrame API and SQL text.
  */
object Graft {

  /** Idempotent; call once per session (cheap enough to call per query).
    * Sessions built with `withExtensions(new GraftExtensions)` (or the
    * `spark.sql.extensions` conf) get the same functions without this. */
  def init(spark: SparkSession): SparkSession = {
    GraftExtensions.functions.foreach { case (name, builder) =>
      Shim.registerFunction(spark, name, builder)
    }
    // Let AQE re-optimize (coalesce) plans under .cache()d tables —
    // off by default, which pins every cached iteration table
    // (PageRank edges, Components labels) at the static
    // shuffle-partition count, so each per-iteration broadcast build
    // scans that many near-empty cached partitions regardless of the
    // table's actual bytes. AQE derives the count from data size — the
    // scale-adaptive choice at any corpus size (optimization guide
    // §2.2/§2.5), and no declared result can change (iteration tables
    // feed aggregates or totally-ordered outputs). Lived only in the
    // bench session in r17; moved HERE in r18 so the measured
    // configuration is the verified one and library consumers get the
    // same plans (the r17 verdict's ask). Unconditional: getOption
    // cannot distinguish "unset" from the registered default, and a
    // consumer who needs it false can set it after init.
    spark.conf.set(
      "spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
    // opt-in ANN routing (spark.graft.ann.autoRoute): same injection the
    // extensions path does, for sessions created without extensions
    val em = spark.sessionState.experimentalMethods
    if (!em.extraOptimizations.exists(_.isInstanceOf[graft.plans.AnnRouteRule]))
      em.extraOptimizations =
        em.extraOptimizations :+ graft.plans.AnnRouteRule(spark)
    if (!em.extraOptimizations
        .exists(_.isInstanceOf[graft.plans.KeywordRouteRule]))
      em.extraOptimizations =
        em.extraOptimizations :+ graft.plans.KeywordRouteRule(spark)
    spark
  }

  // ---- Column-API faces of the native expressions ----

  def cosineSim(a: Column, b: Column): Column =
    Shim.column(CosineSimilarity(Shim.expression(a), Shim.expression(b)))

  def dotProduct(a: Column, b: Column): Column =
    Shim.column(DotProduct(Shim.expression(a), Shim.expression(b)))

  def l2Norm(a: Column): Column =
    Shim.column(L2Norm(Shim.expression(a)))

  /** Aggregate: top-k (score desc, id asc) pairs per group as
    * array<struct<score,id>> — map-side bounded heap, no window sort. */
  def topKByScore(score: Column, id: Column, k: Int): Column =
    Shim.column(
      TopKByScore(Shim.expression(score), Shim.expression(id),
        Shim.expression(lit(k))).toAggregateExpression())

  /** Aggregate: elementwise mean of array<float|double> vectors per
    * group (map-side partial buffers — never explodes rows ×dim). */
  def vectorAvg(vec: Column): Column =
    Shim.column(VectorAvg(Shim.expression(vec)).toAggregateExpression())

  def packVector(a: Column): Column =
    Shim.column(PackVector(Shim.expression(a)))

  def unpackVector(a: Column): Column =
    Shim.column(UnpackVector(Shim.expression(a)))

  def cosineSimPacked(a: Column, b: Column): Column =
    Shim.column(CosineSimPacked(Shim.expression(a), Shim.expression(b)))

  /** Weaviate cosine distance -> txtai similarity (weaviate.py:17-20). */
  def normalizeCosineDistance(d: Column): Column = lit(1.0) - d
}

/** Loaders for the driver testdata tables (TESTDATA.md). */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  /** Register all tables as temp views for spark.sql use. */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    all.foreach(n => load(spark, sfDir, n).createOrReplaceTempView(n))
}

/** Format-generic source/sink helpers: the engine's tables round-trip
  * through any Spark DataSource format (parquet is the primary store;
  * CSV/JSON cover interchange).  Vector columns (`array<float>`) are
  * JSON-representable directly; for CSV they must be packed (binary →
  * base64) or exported without vectors. */
object Sources {

  def read(spark: SparkSession, path: String, format: String = "parquet",
      options: Map[String, String] = Map.empty): DataFrame = {
    val r = spark.read.options(options)
    format match {
      case "parquet" => r.parquet(path)
      case "json" => r.json(path)
      case "csv" => r.option("header", "true")
        .option("inferSchema", "true").csv(path)
      case "orc" => r.orc(path)
      case other => r.format(other).load(path)
    }
  }

  def write(df: DataFrame, path: String, format: String = "parquet",
      mode: String = "overwrite"): Unit = {
    val w = df.write.mode(mode)
    format match {
      case "parquet" => w.parquet(path)
      case "json" => w.json(path)
      case "csv" => w.option("header", "true").csv(path)
      case "orc" => w.orc(path)
      case other => w.format(other).save(path)
    }
  }

  /** Save as a BUCKETED catalog table: rows are hash-clustered into
    * `buckets` files by `keyCols` at WRITE time, so every later
    * equi-join or aggregation on those keys reads pre-partitioned data
    * and plans with NO shuffle of this table (SortMergeJoin over the
    * bucket layout — `Exchange`-free, spec-pinned). This is the
    * co-located-join story for fact tables that are joined on the same
    * key query after query: pay the shuffle once at ingest, never
    * again. Bucket counts should match between tables joined together
    * (Spark joins equal-bucketed tables shuffle-free; mismatched
    * counts fall back to a shuffle of one side). */
  def writeBucketed(
      df: DataFrame,
      table: String,
      keyCols: Seq[String],
      buckets: Int,
      mode: String = "overwrite"): Unit = {
    require(keyCols.nonEmpty && buckets > 0)
    df.write.mode(mode)
      .bucketBy(buckets, keyCols.head, keyCols.tail: _*)
      .sortBy(keyCols.head, keyCols.tail: _*)
      .saveAsTable(table)
  }
}
