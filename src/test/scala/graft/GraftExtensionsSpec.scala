package graft

import org.apache.spark.sql.SparkSession

/** The SparkSessionExtensions deployment path + the SQL `similar()`
  * surface (txtai SQL dialect L1/L2, SURVEY §2.3). */
class GraftExtensionsSpec extends SparkTestBase {

  test("withExtensions(GraftExtensions) registers functions without init()") {
    // getOrCreate returns the shared test session unless cleared; build
    // a genuinely new SparkSession (same SparkContext) with extensions
    val prior = spark
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val spark2 = SparkSession.builder()
        .master("local[2]")
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      assert(spark2 ne prior)
      val r = spark2.sql(
        "SELECT similar(array(cast(1.0 as float), cast(0.0 as float)), " +
          "array(cast(1.0 as float), cast(0.0 as float))) AS score").head()
      assert(r.getDouble(0) == 1.0)
    } finally {
      SparkSession.setDefaultSession(prior)
      SparkSession.setActiveSession(prior)
    }
  }

  test("L1-style SQL: similar() + score filter + order + limit") {
    Graft.init(spark)
    spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .createOrReplaceTempView("docs_sql")
    val out = spark.sql(
      """WITH q AS (SELECT first(embedding) AS qv FROM docs_sql WHERE vec_id = 0)
        |SELECT vec_id, similar(embedding, (SELECT qv FROM q)) AS score
        |FROM docs_sql
        |WHERE similar(embedding, (SELECT qv FROM q)) >= 0.0
        |ORDER BY score DESC LIMIT 5""".stripMargin).collect()
    assert(out.length == 5)
    assert(out.head.getLong(0) == 0L && out.head.getDouble(1) == 1.0)
    val scores = out.map(_.getDouble(1))
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
    assert(scores.forall(_ >= 0.0))
  }
}
