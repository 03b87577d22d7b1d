package graft.functions

import org.apache.spark.sql.functions._

import graft.{Graft, SparkTestBase}

class VectorExpressionsSpec extends SparkTestBase {
  import org.apache.spark.sql.Row

  private def cosineOf(a: Array[Float], b: Array[Float]): Double = {
    import spark.implicits._
    Seq((a, b)).toDF("a", "b")
      .select(Graft.cosineSim(col("a"), col("b")))
      .head().getDouble(0)
  }

  test("cosine of identical vectors is 1") {
    assert(math.abs(cosineOf(Array(1f, 2f, 3f), Array(1f, 2f, 3f)) - 1.0) < 1e-12)
  }

  test("cosine of orthogonal vectors is 0") {
    assert(cosineOf(Array(1f, 0f), Array(0f, 1f)) == 0.0)
  }

  test("cosine of opposite vectors is -1") {
    assert(math.abs(cosineOf(Array(1f, 2f), Array(-1f, -2f)) + 1.0) < 1e-12)
  }

  test("cosine with zero vector is 0 (no NaN)") {
    assert(cosineOf(Array(0f, 0f), Array(1f, 2f)) == 0.0)
  }

  test("cosine is null-propagating") {
    import spark.implicits._
    val df = Seq((Some(Array(1f, 2f)), Option.empty[Array[Float]]))
      .toDF("a", "b")
      .select(Graft.cosineSim(col("a"), col("b")).as("c"))
    assert(df.head().isNullAt(0))
  }

  test("cosine_sim ∈ [-1, 1] and self-similarity = 1 (seeded random property)") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val pairs = Seq.fill(50) {
      val d = 1 + rnd.nextInt(32)
      (Array.fill(d)(rnd.nextFloat() * 200f - 100f),
       Array.fill(d)(rnd.nextFloat() * 200f - 100f))
    }
    val rows = pairs.toDF("a", "b").select(
      Graft.cosineSim(col("a"), col("b")).as("c"),
      Graft.cosineSim(col("a"), col("a")).as("self")).collect()
    rows.foreach { r =>
      assert(r.getDouble(0) >= -1.0 - 1e-9 && r.getDouble(0) <= 1.0 + 1e-9)
      assert(math.abs(r.getDouble(1) - 1.0) < 1e-9)
    }
  }

  test("dot_product and l2_norm agree with cosine") {
    import spark.implicits._
    val a = Array(1f, 2f, 3f); val b = Array(4f, 5f, 6f)
    val row = Seq((a, b)).toDF("a", "b").select(
      Graft.dotProduct(col("a"), col("b")).as("dot"),
      Graft.l2Norm(col("a")).as("na"),
      Graft.l2Norm(col("b")).as("nb"),
      Graft.cosineSim(col("a"), col("b")).as("cos")).head()
    val expected = row.getDouble(0) / (row.getDouble(1) * row.getDouble(2))
    assert(math.abs(row.getDouble(3) - expected) < 1e-12)
  }

  test("SQL registration works: cosine_sim usable from spark.sql") {
    import spark.implicits._
    Seq((Array(1f, 0f), Array(1f, 0f))).toDF("a", "b")
      .createOrReplaceTempView("vex_t")
    val r = spark.sql("SELECT cosine_sim(a, b) AS c FROM vex_t").head()
    assert(r.getDouble(0) == 1.0)
  }

  test("normalizeCosineDistance maps [0,2] -> [1,-1] (weaviate.py:17-20)") {
    import spark.implicits._
    val df = Seq(0.0, 1.0, 2.0).toDF("d")
      .select(Graft.normalizeCosineDistance(col("d")).as("s"))
    assert(df.collect().map(_.getDouble(0)).toSeq == Seq(1.0, 0.0, -1.0))
  }

  test("pack/unpack roundtrip; packed cosine == array cosine bitwise") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val pairs = Seq.fill(30)(
      (Array.fill(64)(rnd.nextFloat() * 2 - 1), Array.fill(64)(rnd.nextFloat() * 2 - 1)))
    val df = pairs.toDF("a", "b")
    val rows = df.select(
      Graft.cosineSim(col("a"), col("b")).as("plain"),
      Graft.cosineSimPacked(
        Graft.packVector(col("a")), Graft.packVector(col("b"))).as("packed"),
      Graft.unpackVector(Graft.packVector(col("a"))).as("rt"),
      col("a")).collect()
    rows.foreach { r =>
      assert(r.getDouble(0) == r.getDouble(1)) // identical reduction
      assert(r.getSeq[Float](2) == r.getSeq[Float](3))
    }
  }

  test("dimension mismatch yields NULL, never a prefix score " +
    "(cosine_sim, dot_product, cosine_sim_packed)") {
    import spark.implicits._
    val df = Seq((Array(1f, 2f, 3f), Array(1f, 2f))).toDF("a", "b")
    val r = df.select(
      Graft.cosineSim(col("a"), col("b")).as("cos"),
      Graft.dotProduct(col("a"), col("b")).as("dot"),
      Graft.cosineSimPacked(
        Graft.packVector(col("a")), Graft.packVector(col("b"))).as("pk")).head()
    assert(r.isNullAt(0) && r.isNullAt(1) && r.isNullAt(2))
    // interpreted path too (eval, not codegen)
    val e = graft.functions.CosineSimilarity(
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Array(1f, 2f, 3f), org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.FloatType, false)),
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Array(1f, 2f), org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.FloatType, false)))
    assert(e.eval(null) == null)
  }

  test("vector_avg: elementwise mean per group, null vectors skipped, " +
    "matches the posexplode formulation") {
    import spark.implicits._
    val df = Seq(
      ("a", Some(Array(1f, 2f))), ("a", Some(Array(3f, 6f))),
      ("a", None), ("b", Some(Array(10f, 20f)))
    ).toDF("label", "vec")
    val out = df.groupBy("label")
      .agg(Graft.vectorAvg(col("vec")).as("c"))
      .orderBy("label").collect()
    assert(out(0).getSeq[Double](1) == Seq(2.0, 4.0))
    assert(out(1).getSeq[Double](1) == Seq(10.0, 20.0))
    // SQL registration
    Graft.init(spark)
    df.createOrReplaceTempView("vavg_t")
    val viaSql = spark.sql(
      "SELECT label, vector_avg(vec) AS c FROM vavg_t GROUP BY label ORDER BY label")
      .collect()
    assert(viaSql(0).getSeq[Double](1) == Seq(2.0, 4.0))
    // all-null group -> null
    val nul = Seq(("z", Option.empty[Array[Float]])).toDF("label", "vec")
      .groupBy("label").agg(Graft.vectorAvg(col("vec")).as("c")).head()
    assert(nul.isNullAt(1))
  }

  test("topk_by_score keeps k best, score desc, ties by id asc") {
    import spark.implicits._
    val df = Seq(
      (1L, 0.5, 10L), (1L, 0.9, 11L), (1L, 0.9, 12L), (1L, 0.1, 13L),
      (2L, 0.3, 20L), (2L, 0.7, 21L)
    ).toDF("qid", "score", "id")
    val out = df.groupBy("qid")
      .agg(Graft.topKByScore(col("score"), col("id"), 2).as("topk"))
      .orderBy("qid")
      .collect()
    val q1 = out(0).getSeq[Row](1).map(r => (r.getDouble(0), r.getLong(1)))
    assert(q1 == Seq((0.9, 11L), (0.9, 12L)))
    val q2 = out(1).getSeq[Row](1).map(r => (r.getDouble(0), r.getLong(1)))
    assert(q2 == Seq((0.7, 21L), (0.3, 20L)))
  }
}
