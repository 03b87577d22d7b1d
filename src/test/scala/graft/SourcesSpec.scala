package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

class SourcesSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val docs = spark.read
    .parquet("/root/testdata/sf0.001/documents.parquet")

  test("documents round-trip through json and csv sources") {
    Seq("json", "csv", "orc").foreach { fmt =>
      val dir = Files.createTempDirectory(s"src-$fmt").toString
      Sources.write(docs, dir, fmt)
      val back = Sources.read(spark, dir, fmt)
      assert(back.count() == docs.count(), fmt)
      val origIds = docs.select("doc_id").as[Long].collect().sorted.toSeq
      val backIds = back.select(col("doc_id").cast("long")).as[Long]
        .collect().sorted.toSeq
      assert(backIds == origIds, fmt)
    }
  }

  test("embeddings (vector arrays) round-trip through json") {
    val emb = spark.read
      .parquet("/root/testdata/sf0.001/embeddings.parquet").limit(50)
    val dir = Files.createTempDirectory("src-emb").toString
    Sources.write(emb, dir, "json")
    val back = Sources.read(spark, dir, "json")
      .select(col("vec_id").cast("long").as("vec_id"),
        col("embedding").cast("array<float>").as("embedding"))
    // cosine of original vs round-tripped vector must be ~1
    val joined = emb.alias("a").join(back.alias("b"), "vec_id")
      .select(Graft.cosineSim(col("a.embedding"), col("b.embedding")).as("c"))
      .as[Double].collect()
    assert(joined.length == 50)
    assert(joined.forall(c => math.abs(c - 1.0) < 1e-6))
  }
}
