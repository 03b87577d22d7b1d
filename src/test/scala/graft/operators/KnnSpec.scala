package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkTestBase

class KnnSpec extends SparkTestBase {

  private lazy val sf = "/root/testdata/sf0.001"

  private lazy val emb: DataFrame =
    spark.read.parquet(s"$sf/embeddings.parquet")

  test("single-query search returns k rows ordered by score desc") {
    val q = emb.select("embedding").head().getSeq[Float](0).toArray
    val res = Knn.search(emb, "embedding", "vec_id", q, 5).collect()
    assert(res.length == 5)
    val scores = res.map(_.getAs[Double]("score"))
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
    // the query vector is row 0 of the corpus → self-match is top-1
    assert(res.head.getAs[Long]("vec_id") == emb.select("vec_id").head().getLong(0))
    assert(math.abs(scores.head - 1.0) < 1e-9)
  }

  test("knn(k) ⊆ knn(k+5) (monotone prefix property)") {
    val q = emb.select("embedding").head().getSeq[Float](0).toArray
    val k5 = Knn.search(emb, "embedding", "vec_id", q, 5)
      .collect().map(_.getAs[Long]("vec_id")).toSeq
    val k10 = Knn.search(emb, "embedding", "vec_id", q, 10)
      .collect().map(_.getAs[Long]("vec_id")).toSeq
    assert(k10.take(5) == k5)
  }

  test("batch search matches per-query single search") {
    val queries = emb.limit(3)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val batch = Knn.searchBatch(emb, "embedding", "vec_id", queries, "qvec", "qid", 4)
      .collect()
      .groupBy(_.getAs[Long]("qid"))
      .view.mapValues(_.sortBy(_.getAs[Int]("rank")).map(_.getAs[Long]("id")).toSeq)
      .toMap
    val qvecs = queries.collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray)
    qvecs.foreach { case (qid, vec) =>
      val single = Knn.search(emb, "embedding", "vec_id", vec, 4)
        .collect().map(_.getAs[Long]("vec_id")).toSeq
      assert(batch(qid) == single, s"qid=$qid")
    }
  }

  test("single-query plan is TakeOrderedAndProject (no global sort)") {
    val q = emb.select("embedding").head().getSeq[Float](0).toArray
    val plan = Knn.search(emb, "embedding", "vec_id", q, 5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }

  test("hash-agg threshold raise is scoped to need: small batches leave " +
    "the session conf untouched, large ones raise to the next pow2") {
    val key = "spark.sql.objectHashAggregate.sortBased.fallbackThreshold"
    val before = spark.conf.getOption(key)
    try {
      spark.conf.unset(key)
      Knn.ensureHashAggCapacity(spark, 100)   // fits the default 128
      assert(spark.conf.get(key) == "128")    // still the default
      Knn.ensureHashAggCapacity(spark, 1000)  // needs a raise: pow2 >= 2000
      assert(spark.conf.get(key) == "2048")
      Knn.ensureHashAggCapacity(spark, 500)   // already covered: no lowering
      assert(spark.conf.get(key) == "2048")
      Knn.ensureHashAggCapacity(spark, 1 << 20) // capped at 64K
      assert(spark.conf.get(key) == "65536")
      spark.conf.set(key, "131072")           // a user-raised value survives
      Knn.ensureHashAggCapacity(spark, 1000)
      assert(spark.conf.get(key) == "131072")
    } finally {
      before match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }

  test("null vectors rank last (null scores sort after real scores)") {
    import spark.implicits._
    val df = Seq(
      (1L, Some(Array(1f, 0f))),
      (2L, Option.empty[Array[Float]]),
      (3L, Some(Array(0.9f, 0.1f)))).toDF("vec_id", "embedding")
    val res = Knn.search(df, "embedding", "vec_id", Array(1f, 0f), 3)
      .select("vec_id").as[Long].collect().toSeq
    assert(res.take(2) == Seq(1L, 3L)) // null-scored row never outranks
  }

  test("similarity ranks the full corpus with scores in [-1,1]") {
    val q = emb.select("embedding").head().getSeq[Float](0).toArray
    val res = Knn.similarity(emb, "embedding", "vec_id", q).collect()
    assert(res.length == emb.count())
    assert(res.forall { r =>
      val s = r.getAs[Double]("score"); s >= -1.0 - 1e-9 && s <= 1.0 + 1e-9
    })
  }
}
