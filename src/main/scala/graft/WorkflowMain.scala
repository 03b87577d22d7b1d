package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.index.VectorIndex
import graft.operators.Workflows

/** The reference's workflow entry point (F3) as a batch main — the
  * engine-side equivalent of `POST /workflow` (api.http:4-23), which
  * accepts `{"name": "index"|"search", "elements": [...]}`:
  *
  *  - `index`: encode every element with the [[TextEncoder]] seam and
  *    sink into the vector index at `indexPath` (the reference's
  *    `[nop, transform] → weaviate sink` task list, README.md:30-43);
  *  - `search`: encode each element and run top-k cosine search against
  *    the same index (the reference's `transform → search` task list) —
  *    all elements are served, not just `elements[0]`;
  *  - `hybrid`: each element scored lexically (BM25 over the indexed
  *    `text` column) AND semantically (encoded vector), blended by
  *    `alpha` (optional request field, default 0.5) — the txtai
  *    `hybrid: true` config served through the same POST /workflow
  *    surface ([[Workflows.hybridSearch]]).
  *
  * {{{ sbt "runMain graft.WorkflowMain <request.json> <indexPath> [k]" }}}
  *
  * Prints one JSON line (results to stdout, and to
  * `SPARK_GRAFT_WORKFLOW_OUT` when set).
  */
object WorkflowMain {

  /** Execute a workflow request; returns the response JSON line. */
  def run(spark: SparkSession, reqPath: String, indexPath: String,
      k: Int = 10): String =
    runReq(spark,
      spark.read.option("multiLine", "true").json(reqPath).head(),
      indexPath, k)

  /** The same contract over an in-memory request body — the form
    * [[WorkflowServer]] serves per POST. */
  def runJson(spark: SparkSession, body: String, indexPath: String,
      k: Int = 10): String = {
    import spark.implicits._
    runReq(spark, spark.read.json(spark.createDataset(Seq(body))).head(),
      indexPath, k)
  }

  private def runReq(spark: SparkSession,
      req: org.apache.spark.sql.Row, indexPath: String, k: Int): String = {
    Graft.init(spark)
    val name = req.getAs[String]("name")
    val elements = req.getSeq[String](req.fieldIndex("elements"))
    def esc(s: String) = s.replace("\\", "\\\\").replace("\"", "\\\"")
    name match {
      case "index" =>
        import spark.implicits._
        // uid = zero-padded element position, so engine-assigned dense
        // docids follow the input order like the reference's offset
        // counter (weaviate.py:132-149)
        val docs = elements.zipWithIndex
          .map { case (t, i) => (f"$i%09d", t) }.toDF("uid", "text")
        val idx = Workflows.indexTextWorkflow(docs, "text", indexPath)
        s"""{"name":"index","indexed":${idx.count()}}"""
      case "search" =>
        val idx = VectorIndex.load(spark, indexPath)
        val results = elements.map { q =>
          val hits = idx.search(TextEncoder.encode(q), k)
            .select(col("uid"), col("docid"), round(col("score"), 6).as("score"))
            .collect()
            .map(r => s"""{"uid":"${esc(r.getString(0))}","docid":${r.getLong(1)},""" +
              s""""score":${r.getDouble(2)}}""")
          hits.mkString("[", ",", "]")
        }
        s"""{"name":"search","results":${results.mkString("[", ",", "]")}}"""
      case "hybrid" =>
        val idx = VectorIndex.load(spark, indexPath)
        val data = idx.df // (docid, uid, text, vector, …props)
        require(data.schema.fieldNames.contains("text"),
          "hybrid workflow requires an index built over a 'text' column")
        // packed-binary indexes unpack for the cosine half (same floats)
        val emb =
          if (data.schema("vector").dataType ==
              org.apache.spark.sql.types.BinaryType)
            data.withColumn("vector", Graft.unpackVector(col("vector")))
          else data
        val alpha = scala.util.Try(req.getAs[Double]("alpha")).getOrElse(0.5)
        // the whole element list is served by ONE batch plan (shared
        // postings pass, per-qid bounds + heap top-k) instead of one
        // job per element; rankings are bit-identical per element
        val hits = Workflows.hybridSearchBatch(data, "text", "docid",
            emb, "docid", "vector", elements, k, alpha)
          .join(data.select(col("docid"), col("uid")), "docid")
          .select(col("qid"), col("rank"), col("uid"), col("docid"),
            round(col("hybrid_micros") / 1000000.0, 6).as("score"))
          .orderBy(col("qid"), col("rank"))
          .collect()
        val results = elements.indices.map { i =>
          hits.filter(_.getLong(0) == i.toLong)
            .map(r => s"""{"uid":"${esc(r.getString(2))}","docid":${r.getLong(3)},""" +
              s""""score":${r.getDouble(4)}}""")
            .mkString("[", ",", "]")
        }
        s"""{"name":"hybrid","results":${results.mkString("[", ",", "]")}}"""
      case "keyword" =>
        // keyword-only ranking (the txtai scoring="bm25" config without
        // the semantic half): BM25 over the indexed text column, scores
        // reported as micros/1e6 like the hybrid action
        val idx = VectorIndex.load(spark, indexPath)
        val data = idx.df
        require(data.schema.fieldNames.contains("text"),
          "keyword workflow requires an index built over a 'text' column")
        // one batch plan for the whole element list (shared postings
        // pass + per-qid heap top-k), like the hybrid action
        val queries = elements.zipWithIndex.map { case (q, i) =>
          val terms = operators.Bm25.TokenPattern.r
            .findAllIn(q.toLowerCase(java.util.Locale.ROOT)).toSeq.distinct
          require(terms.nonEmpty, s"keyword: no query terms in '$q'")
          (i.toLong, terms)
        }
        val hits = operators.Bm25
          .topKBatch(data, "text", "docid", queries, k)
          .join(data.select(col("docid"), col("uid")), "docid")
          .select(col("qid"), col("rank"), col("uid"), col("docid"),
            round(col("bm25_micros") / 1000000.0, 6).as("score"))
          .orderBy(col("qid"), col("rank"))
          .collect()
        val results = elements.indices.map { i =>
          hits.filter(_.getLong(0) == i.toLong)
            .map(r => s"""{"uid":"${esc(r.getString(2))}","docid":${r.getLong(3)},""" +
              s""""score":${r.getDouble(4)}}""")
            .mkString("[", ",", "]")
        }
        s"""{"name":"keyword","results":${results.mkString("[", ",", "]")}}"""
      case other => throw new IllegalArgumentException(
        s"unknown workflow '$other' (expected 'index', 'search', " +
        "'keyword' or 'hybrid')")
    }
  }

  def main(args: Array[String]): Unit = {
    require(args.length >= 2,
      "usage: WorkflowMain <request.json> <indexPath> [k]")
    val k = if (args.length > 2) args(2).toInt else 10
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val json = run(spark, args(0), args(1), k)
    println(json)
    sys.env.get("SPARK_GRAFT_WORKFLOW_OUT").foreach { out =>
      java.nio.file.Files.write(java.nio.file.Paths.get(out),
        (json + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    }
    spark.stop()
  }
}
