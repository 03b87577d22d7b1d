package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Supervised NB quality classifier: hand-computed log-odds, the
  * reference-vs-junk separation the filter exists for, frozen ==
  * corpus-native parity, OOV floor, and streamed == batch for the
  * frozen map. */
class NbClassifierSpec extends SparkTestBase {
  import spark.implicits._

  private def lg(x: Double) = math.log(x) / math.log(2.0)

  test("log_odds matches the hand-computed add-k two-class model") {
    // pos doc: "a a b"; neg doc: "b c".
    // counts: a=(2,0) b=(1,1) c=(0,1); N+=3 N-=2 V=3; D+=D-=1.
    val docs = Seq((1L, "a a b", true), (2L, "b c", false))
      .toDF("doc_id", "text", "good")
    val out = NbClassifier.score(docs, "doc_id", "text", col("good"))
      .orderBy("doc_id").collect()
    val dp = 3.0 + 0.5 * 3 // 4.5
    val dn = 2.0 + 0.5 * 3 // 3.5
    def d(cp: Double, cn: Double) = lg((cp + 0.5) / dp) - lg((cn + 0.5) / dn)
    val d1 = 2 * d(2, 0) + d(1, 1)
    val d2 = d(1, 1) + d(0, 1)
    assert(out(0).getLong(1) == 3L && out(1).getLong(1) == 2L)
    assert(math.abs(out(0).getDouble(2) - d1) < 1e-6, s"${out(0)} vs $d1")
    assert(math.abs(out(1).getDouble(2) - d2) < 1e-6, s"${out(1)} vs $d2")
  }

  test("the prior term follows the class document counts") {
    // same token in both classes, 3 pos docs vs 1 neg: prior log2(3)
    val docs = Seq((1L, "a", true), (2L, "a", true), (3L, "a", true),
      (4L, "a", false)).toDF("doc_id", "text", "good")
    val out = NbClassifier.score(docs, "doc_id", "text", col("good"))
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    // a=(3,1), N+=3 N-=1 V=1: token term lg(3.5/3.5)-lg(1.5/1.5)=0
    out.values.foreach(v => assert(math.abs(v - lg(3.0)) < 1e-6, s"$out"))
  }

  test("reference-like documents score above junk — the filterable " +
    "signal, including on UNLABELED text via the frozen model") {
    val ref = (1 to 20).map(i => (i.toLong, "the quick brown fox jumps", true))
    val junk = (21 to 40).map(i => (i.toLong, "zzz qqq xxx vvv kkk", false))
    val labeled = (ref ++ junk).toDF("doc_id", "text", "good")
    val m = NbClassifier.model(labeled, "text", col("good"), 100)
    val unseen = Seq((98L, "quick brown fox"), (99L, "qqq xxx zzz"))
      .toDF("doc_id", "text")
    val s = NbClassifier.scoreWithModel(unseen, "doc_id", "text", m)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(s(98L) > 1.0 && s(99L) < -1.0, s"$s")
  }

  test("a full-vocabulary frozen model reproduces score() on every " +
    "document") {
    val docs = Seq((1L, "a a b", true), (2L, "b c", false),
      (3L, "c a b", true), (4L, "d", false))
      .toDF("doc_id", "text", "good")
    val exact = NbClassifier.score(docs, "doc_id", "text", col("good"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2)))
      .toMap
    val m = NbClassifier.model(docs, "text", col("good"), 100)
    val frozen = NbClassifier.scoreWithModel(docs, "doc_id", "text", m)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2)))
      .toMap
    assert(frozen.keySet == exact.keySet)
    frozen.foreach { case (id, (nt, lo)) =>
      assert(nt == exact(id)._1)
      assert(math.abs(lo - exact(id)._2) < 1e-6,
        s"doc $id: $lo vs ${exact(id)._2}")
    }
  }

  test("null-text documents are dropped by BOTH paths (frozen == " +
    "corpus-native even on dirty corpora)") {
    val docs = Seq((1L, "a a b", true), (2L, null.asInstanceOf[String],
      false), (3L, "b c", false)).toDF("doc_id", "text", "good")
    val exact = NbClassifier.score(docs, "doc_id", "text", col("good"))
      .select("doc_id").as[Long].collect().toSet
    val m = NbClassifier.model(docs, "text", col("good"), 100)
    val frozen = NbClassifier.scoreWithModel(docs, "doc_id", "text", m)
      .select("doc_id").as[Long].collect().toSet
    assert(exact == Set(1L, 3L))
    assert(frozen == exact)
  }

  test("OOV tokens score at the two-class add-k floor (count 0 both " +
    "sides), a constant independent of the dropped counts") {
    val docs = Seq((1L, "a a a a", true), (2L, "b b", false),
      (3L, "c", true)).toDF("doc_id", "text", "good")
    // vocab {a} only: b and c are OOV
    val m = NbClassifier.model(docs, "text", col("good"), 1)
    assert(m.vocab.map(_._1) == Seq("a"))
    val s = NbClassifier.scoreWithModel(docs, "doc_id", "text", m)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    // N+=5 N-=2 V=3, prior lg(2/1); floor = lg(0.5/6.5)-lg(0.5/3.5)
    val floor = lg(0.5 / 6.5) - lg(0.5 / 3.5)
    assert(math.abs(s(2L) - (lg(2.0) + 2 * floor)) < 1e-6, s"$s")
    assert(math.abs(s(3L) - (lg(2.0) + floor)) < 1e-6, s"$s")
  }

  test("parameter contract") {
    val docs = Seq((1L, "a", true)).toDF("doc_id", "text", "good")
    intercept[IllegalArgumentException] {
      NbClassifier.score(docs, "doc_id", "text", col("good"), k = 0.0)
    }
    intercept[IllegalArgumentException] {
      NbClassifier.model(docs, "text", col("good"), 0)
    }
  }

  test("frozen scoring runs on a structured stream (pure map, no " +
    "state), streamed == batch") {
    val labeled = Seq((1L, "a a b", true), (2L, "b c", false),
      (3L, "c a b", true)).toDF("doc_id", "text", "good")
    val m = NbClassifier.model(labeled, "text", col("good"), 2)
    val docs = labeled.select("doc_id", "text")
    val want = NbClassifier.scoreWithModel(docs, "doc_id", "text", m)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val dir = java.nio.file.Files
      .createTempDirectory("graft-nb-stream").toString
    docs.coalesce(2).write.mode("overwrite").parquet(s"$dir/in")
    val src = spark.readStream.schema(docs.schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$dir/in")
    val q = NbClassifier.scoreWithModel(src, "doc_id", "text", m)
      .writeStream.format("memory").queryName("nb_stream")
      .outputMode("append").start()
    q.processAllAvailable(); q.stop()
    val got = spark.table("nb_stream")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got == want && got.nonEmpty)
  }
}
