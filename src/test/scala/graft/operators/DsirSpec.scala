package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** DSIR importance resampling: hand-computed bucket ratios (via an
  * independent reimplementation of the documented portable hash),
  * frozen == corpus-native exactness, target-domain separation,
  * deterministic Gumbel selection, and streamed == batch for the
  * frozen map. */
class DsirSpec extends SparkTestBase {
  import spark.implicits._

  private def lg(x: Double) = math.log(x) / math.log(2.0)

  // independent re-derivation of portableHash61 from its documented
  // formula (HashingExpressions.scala) — NOT a call into the engine
  private def portable61(s: String): Long = {
    var h1 = 0L; var h2 = 0L; var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      h1 = (h1 * 31 + cp) % 1000000007L
      h2 = (h2 * 131 + cp) % 998244353L
      i += Character.charCount(cp)
    }
    h1 = ((h1 ^ (h1 >>> 16)) * 73244475L) % 1000000007L
    h1 = ((h1 ^ (h1 >>> 16)) * 73244475L) % 1000000007L
    h1 ^= h1 >>> 16
    h2 = ((h2 ^ (h2 >>> 16)) * 2654435761L) % 998244353L
    h2 = ((h2 ^ (h2 >>> 16)) * 2654435761L) % 998244353L
    h2 ^= h2 >>> 16
    (h1 << 31) + h2
  }

  private def bucket(s: String, b: Int) =
    java.lang.Math.floorMod(portable61(s), b.toLong).toInt

  test("log_w matches the hand-computed hashed-bigram model") {
    // B=8: re-derive every feature's bucket with the same hash the
    // engine uses, then the add-k ratio formula by hand
    val b = 8
    val docs = Seq((1L, "a a", true), (2L, "b c", false))
      .toDF("doc_id", "text", "tgt")
    // features: doc1 = [a, a, "a a"], doc2 = [b, c, "b c"]
    val f1 = Seq("a", "a", "a a").map(bucket(_, b))
    val f2 = Seq("b", "c", "b c").map(bucket(_, b))
    val cp = (f1.map(_ -> 1)).groupBy(_._1).view.mapValues(_.size).toMap
    val cr = (f1 ++ f2).map(_ -> 1).groupBy(_._1).view.mapValues(_.size).toMap
    val np = 3.0; val nr = 6.0; val k = 0.5
    def lw(fs: Seq[Int]) = fs.map { bb =>
      lg((cp.getOrElse(bb, 0) + k) / (np + k * b)) -
        lg((cr.getOrElse(bb, 0) + k) / (nr + k * b))
    }.sum
    val out = Dsir.logWeights(docs, "doc_id", "text", col("tgt"), b)
      .orderBy("doc_id").collect()
    assert(out(0).getLong(1) == 3L && out(1).getLong(1) == 3L)
    assert(math.abs(out(0).getDouble(2) - lw(f1)) < 1e-5, s"${out(0)}")
    assert(math.abs(out(1).getDouble(2) - lw(f2)) < 1e-5, s"${out(1)}")
  }

  test("the frozen model is EXACT, not truncated: frozen == " +
    "corpus-native on every document") {
    val docs = Seq((1L, "the quick fox", true), (2L, "lazy dog sat", false),
      (3L, "quick brown dog", true), (4L, "zzz qqq", false))
      .toDF("doc_id", "text", "tgt")
    val exact = Dsir.logWeights(docs, "doc_id", "text", col("tgt"), 32)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2)))
      .toMap
    val m = Dsir.model(docs, "text", col("tgt"), 32)
    val frozen = Dsir.scoreWithModel(docs, "doc_id", "text", m)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2)))
      .toMap
    assert(frozen.keySet == exact.keySet)
    frozen.foreach { case (id, (nf, lw)) =>
      assert(nf == exact(id)._1, s"doc $id feats")
      assert(math.abs(lw - exact(id)._2) < 1e-6,
        s"doc $id: $lw vs ${exact(id)._2}")
    }
  }

  test("null-text documents are dropped by BOTH paths (frozen == " +
    "corpus-native even on dirty corpora)") {
    val docs = Seq((1L, "the quick fox", true),
      (2L, null.asInstanceOf[String], false), (3L, "lazy dog sat", false))
      .toDF("doc_id", "text", "tgt")
    val exact = Dsir.logWeights(docs, "doc_id", "text", col("tgt"), 32)
      .select("doc_id").as[Long].collect().toSet
    val m = Dsir.model(docs, "text", col("tgt"), 32)
    val frozen = Dsir.scoreWithModel(docs, "doc_id", "text", m)
      .select("doc_id").as[Long].collect().toSet
    assert(exact == Set(1L, 3L))
    assert(frozen == exact)
  }

  test("target-like text gets positive weight, off-target negative — " +
    "the resampling signal, including on unseen documents") {
    val tgt = (1 to 20).map(i => (i.toLong, "the quick brown fox", true))
    val raw = (21 to 40).map(i => (i.toLong, "zzz qqq xxx vvv", false))
    val m = Dsir.model((tgt ++ raw).toDF("doc_id", "text", "tgt"),
      "text", col("tgt"), 1024)
    val unseen = Seq((98L, "quick brown fox"), (99L, "qqq xxx vvv"))
      .toDF("doc_id", "text")
    val s = Dsir.scoreWithModel(unseen, "doc_id", "text", m)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(s(98L) > 1.0 && s(99L) < -1.0, s"$s")
  }

  test("gumbel selection is deterministic, size-bounded, and biased " +
    "toward high-weight documents") {
    val tgt = (1 to 50).map(i => (i.toLong, "the quick brown fox", true))
    val raw = (51 to 100).map(i => (i.toLong, "zzz qqq xxx vvv", false))
    val docs = (tgt ++ raw).toDF("doc_id", "text", "tgt")
    val m = Dsir.model(docs, "text", col("tgt"), 1024)
    val sel1 = Dsir.gumbelTopK(docs, "doc_id", "text", m, 30)
      .collect().map(_.getLong(0)).toSeq
    val sel2 = Dsir.gumbelTopK(docs, "doc_id", "text", m, 30)
      .collect().map(_.getLong(0)).toSeq
    assert(sel1 == sel2 && sel1.size == 30) // pure function of inputs
    val nTarget = sel1.count(_ <= 50L)
    assert(nTarget >= 25, s"selected only $nTarget/30 target docs")
    // all 50 target docs share one log_w, so WITHIN that tier the
    // Gumbel term alone ranks them: the winners must be a shuffled
    // 30-subset of 1..50, not the id-ordered prefix
    val targetWinners = sel1.filter(_ <= 50L)
    assert(targetWinners.exists(_ > 30L),
      s"selection degenerated to the id prefix: $targetWinners")
  }

  test("parameter contract") {
    val docs = Seq((1L, "a", true)).toDF("doc_id", "text", "tgt")
    intercept[IllegalArgumentException] {
      Dsir.logWeights(docs, "doc_id", "text", col("tgt"), buckets = 0)
    }
    intercept[IllegalArgumentException] {
      Dsir.model(docs, "text", col("tgt"), 16, k = 0.0)
    }
    intercept[IllegalArgumentException] {
      Dsir.gumbelTopK(docs, "doc_id", "text",
        Dsir.model(docs, "text", col("tgt"), 16), 0)
    }
  }

  test("frozen scoring runs on a structured stream (pure map, no " +
    "state), streamed == batch") {
    val labeled = Seq((1L, "a a b", true), (2L, "b c", false),
      (3L, "c a b", true)).toDF("doc_id", "text", "tgt")
    val m = Dsir.model(labeled, "text", col("tgt"), 16)
    val docs = labeled.select("doc_id", "text")
    val want = Dsir.scoreWithModel(docs, "doc_id", "text", m)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val dir = java.nio.file.Files
      .createTempDirectory("graft-dsir-stream").toString
    docs.coalesce(2).write.mode("overwrite").parquet(s"$dir/in")
    val src = spark.readStream.schema(docs.schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$dir/in")
    val q = Dsir.scoreWithModel(src, "doc_id", "text", m)
      .writeStream.format("memory").queryName("dsir_stream")
      .outputMode("append").start()
    q.processAllAvailable(); q.stop()
    val got = spark.table("dsir_stream")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got == want && got.nonEmpty)
  }
}
