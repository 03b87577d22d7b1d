package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** BPE tokenizer: training must reproduce the reference algorithm
  * (most-frequent pair, weighted by word frequency, deterministic
  * ties), merge application must be canonical single-pass, and the
  * frozen encode must tokenize a stream exactly like a batch. */
class BpeSpec extends SparkTestBase {

  import spark.implicits._

  test("train reproduces the hand-derived Sennrich merges on a tiny " +
    "corpus") {
    // word freqs: low x5, lower x2, newest x6, widest x3  (the classic
    // example). Pair counts round 1: (l,o) 7, (o,w) 7, (w,e) 5+... —
    // hand-derive: es 9 (newest 6 + widest 3), st 9, ne 6, ew 6 ... the
    // max is (e,s)=9 tie (s,t)=9 → lexicographic: (e,s) first.
    val docs = Seq(
      (0L, Array.fill(5)("low").mkString(" ")),
      (1L, Array.fill(2)("lower").mkString(" ")),
      (2L, Array.fill(6)("newest").mkString(" ")),
      (3L, Array.fill(3)("widest").mkString(" "))).toDF("doc_id", "text")
    val m = Bpe.train(docs, "text", numMerges = 4)
    assert(m.merges(0) == ("e", "s"), m.merges.toString)
    assert(m.merges(1) == ("es", "t"), m.merges.toString)
    // after est: counts: (l,o)=7, (o,w)=7, (n,e)=6, (e,w)=6, (w,est)=6,
    // (w,i)=3, (i,d)=3, (d,est)=3, (l,o) ties (o,w) at 7 → (l,o) first
    assert(m.merges(2) == ("l", "o"), m.merges.toString)
    assert(m.merges(3) == ("lo", "w"), m.merges.toString)
  }

  test("canonical single-pass merge semantics: runs merge every other, " +
    "back-to-back pairs all merge, symbol boundaries never false-match") {
    assert(Bpe.applyMerge(Array("a", "a", "a"), "a", "a").toSeq ==
      Seq("aa", "a"))
    assert(Bpe.applyMerge(Array("a", "b", "a", "b"), "a", "b").toSeq ==
      Seq("ab", "ab"))
    // the boundary case a spaced-string replace gets wrong: symbols
    // [xa, b] contain the character sequence "a b" but NOT the pair
    assert(Bpe.applyMerge(Array("xa", "b"), "a", "b").toSeq ==
      Seq("xa", "b"))
    // merged symbols are not re-eligible within the same pass
    assert(Bpe.applyMerge(Array("a", "a", "a", "a"), "a", "a").toSeq ==
      Seq("aa", "aa"))
  }

  test("encodeWord applies merges in order; encode column matches a " +
    "driver-side re-encode of every doc") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "text")
    val m = Bpe.train(docs, "text", numMerges = 30, maxWords = 2000)
    assert(m.merges.size == 30)
    val got = docs.select(col("doc_id"),
        Bpe.encode(col("text"), m).as("e"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    docs.collect().foreach { r =>
      val want = r.getString(1).split(" ", -1)
        .map(w => Bpe.encodeWord(w, m.merges).mkString(" "))
        .mkString(" ")
      assert(got(r.getLong(0)) == want, s"doc ${r.getLong(0)}")
    }
  }

  test("frozen encode tokenizes a file stream row-for-row like batch " +
    "(pure map, no shuffle)") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft-bpe-stream").toString
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "text")
    docs.repartition(3).write.mode("overwrite").parquet(dir)
    val batchSrc = spark.read.parquet(dir)
    val m = Bpe.train(batchSrc, "text", numMerges = 20, maxWords = 2000)
    def enc(df: org.apache.spark.sql.DataFrame) =
      df.select(col("doc_id"), Bpe.encode(col("text"), m).as("e"))
    val want = enc(batchSrc).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    val stream = spark.readStream.schema(batchSrc.schema)
      .option("maxFilesPerTrigger", "1").parquet(dir)
    val q = enc(stream).writeStream.format("memory").queryName("bpe_eq")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val got = spark.table("bpe_eq").collect()
        .map(r => (r.getLong(0), r.getString(1))).toSet
      assert(got == want)
    } finally q.stop()
    // plan shape: batch encode is a pure projection over the scan
    val plan = enc(batchSrc).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan.take(300))
  }
}
