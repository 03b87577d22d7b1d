package graft.operators

import graft.SparkTestBase
import java.nio.file.{Files, Paths}

/** Thrift compact-protocol footer triage: round trips through our
  * writer, EXTERNAL conformance against real parquet files (the
  * testdata written by pyarrow and files written by Spark's
  * parquet-mr in this very test), and dirty-byte rejection. */
class ParquetMetaSpec extends SparkTestBase {

  test("round-trips the writer: version, rows, groups, byte sums, " +
    "writer string, field names in order") {
    val b = ParquetMeta.parquet(2, 1234L, Seq("alpha", "beta", "gamma"),
      Seq(1000L, 2000L, 3000L), "unit test writer 1.0")
    val m = ParquetMeta.parse(b).getOrElse(fail("did not parse"))
    assert(m.version == 2 && m.numRows == 1234L)
    assert(m.rowGroups == 3 && m.totalByteSize == 6000L)
    assert(m.createdBy == "unit test writer 1.0")
    assert(m.fields == Vector("alpha", "beta", "gamma"))
  }

  test("EXTERNAL conformance: footers written by pyarrow (testdata) " +
    "parse and agree with what the DataFrame reader reports") {
    for (name <- Seq("region", "documents", "lineitem")) {
      val path = s"/root/testdata/sf0.001/$name.parquet"
      val bytes = Files.readAllBytes(Paths.get(path))
      val m = ParquetMeta.parse(bytes).getOrElse(fail(s"$name no parse"))
      val df = spark.read.parquet(path)
      assert(m.numRows == df.count(), name)
      // flat schemas: our depth-first field names == the columns
      assert(m.fields == df.columns.toVector, name)
      assert(m.rowGroups >= 1 && m.totalByteSize > 0, name)
      assert(m.createdBy.nonEmpty, name)
    }
  }

  test("EXTERNAL conformance: a footer written by Spark's parquet-mr " +
    "in this test parses back") {
    val dir = Files.createTempDirectory("graft-pqmeta").toString
    spark.range(0, 777).selectExpr("id", "id * 2 AS dbl",
        "CAST(id AS STRING) AS s")
      .coalesce(1).write.mode("overwrite").parquet(dir)
    val file = Files.list(Paths.get(dir)).toArray.map(_.toString)
      .find(_.endsWith(".parquet")).getOrElse(fail("no part file"))
    val m = ParquetMeta.parse(Files.readAllBytes(Paths.get(file)))
      .getOrElse(fail("spark-written footer did not parse"))
    assert(m.numRows == 777L)
    assert(m.fields == Vector("id", "dbl", "s"))
    assert(m.createdBy.toLowerCase.contains("parquet"))
  }

  test("dirty bytes reject: magic, truncation, lying metadata length, " +
    "corrupt thrift") {
    val good = ParquetMeta.parquet(1, 10L, Seq("a"), Seq(100L), "w")
    assert(ParquetMeta.parse(null).isEmpty)
    assert(ParquetMeta.parse("PAR1PAR1".getBytes).isEmpty)
    assert(ParquetMeta.parse(good.dropRight(2)).isEmpty)
    val badMagic = good.clone(); badMagic(good.length - 1) = 'X'
    assert(ParquetMeta.parse(badMagic).isEmpty)
    // metadata length pointing past the file start
    val badLen = good.clone()
    badLen(good.length - 8) = -1; badLen(good.length - 7) = -1
    badLen(good.length - 6) = -1; badLen(good.length - 5) = 0x7f
    assert(ParquetMeta.parse(badLen).isEmpty)
    // corrupt a byte early in the thrift payload: struct walk derails
    val corrupt = good.clone(); corrupt(9) = -1
    assert(ParquetMeta.parse(corrupt).isEmpty ||
      ParquetMeta.parse(corrupt).get != ParquetMeta.parse(good).get)
  }

  test("fixtures follow the closed forms the oracle re-derives") {
    for (id <- 0L to 8L) {
      val m = ParquetMeta.parse(MediaFixtures.parquetMediaFor(id)).get
      assert(m.version == 1 + id % 2)
      assert(m.numRows == 100 + id % 50)
      assert(m.rowGroups == 1 + id % 2)
      assert(m.totalByteSize == (0 until (1 + id % 2).toInt)
        .map(g => 4096L * (1 + (id + g) % 5)).sum)
      assert(m.createdBy == s"graft-fixture $id")
      assert(m.fields ==
        (0 until (1 + id % 3).toInt).map(j => s"c${id}_$j").toVector)
    }
  }
}
