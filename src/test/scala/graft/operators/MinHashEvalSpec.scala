package graft.operators

import graft.SparkTestBase

/** MinHash candidate-set evaluation: recall/precision accounting, the
  * banding s-curve direction (more rows per band → lower recall on
  * mid-similarity pairs), and ground-truth exactness. */
class MinHashEvalSpec extends SparkTestBase {
  import spark.implicits._

  // 3 exact-dup pairs, 3 mid-similarity pairs, noise docs — each pair
  // on its own vocabulary so only WITHIN-pair similarity exists
  private val docs = {
    def base(i: Int) = (0 until 10).map(w => s"p${i}w$w").mkString(" ")
    def midv(i: Int) =
      ((0 until 6).map(w => s"p${i}w$w") ++
        (0 until 4).map(w => s"p${i}x$w")).mkString(" ")
    val dups = (0 until 3).flatMap(i =>
      Seq((100L + i * 2, base(i)), (101L + i * 2, base(i))))
    val mids = (0 until 3).flatMap(i =>
      Seq((200L + i * 2, base(10 + i)), (201L + i * 2, midv(10 + i))))
    val noise = (300L until 320L).map(i =>
      (i, s"noise$i one${i * 7} two${i * 13} three${i * 29} four${i * 31} " +
        s"five${i * 37} six${i * 41} seven${i * 43} eight${i * 47}"))
    (dups ++ mids ++ noise).toDF("doc_id", "text")
  }

  test("one row per threshold with consistent counts; r=1 banding " +
    "catches everything (recall 1.0)") {
    val out = MinHashLsh.evaluate(docs, "doc_id", "text",
      n = 3, numHashes = 64, bands = 64,
      thresholds = Seq(0.2, 0.9)).collect()
      .map(r => r.getDouble(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getLong(4),
          r.getDouble(5))).toMap
    assert(out.keySet == Set(0.2, 0.9))
    val (t9true, t9caught, t9recall, _, _) = out(0.9)
    assert(t9true == 3L && t9caught == 3L && t9recall == 1.0, s"$out")
    val (t2true, t2caught, t2recall, nCand, prec) = out(0.2)
    assert(t2true == 6L && t2caught == 6L && t2recall == 1.0, s"$out")
    assert(nCand >= 6L)
    assert(math.abs(prec - 6.0 / nCand) < 1e-6)
  }

  test("one wide band (r = numHashes) only catches identical " +
    "signatures: exact dups survive, mid-similarity pairs drop — the " +
    "s-curve direction the eval exists to expose") {
    val out = MinHashLsh.evaluate(docs, "doc_id", "text",
      n = 3, numHashes = 64, bands = 1,
      thresholds = Seq(0.2, 0.9)).collect()
      .map(r => r.getDouble(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out(0.9) == ((3L, 3L)), s"$out") // identical docs: sig equal
    val (t2true, t2caught) = out(0.2)
    assert(t2true == 6L && t2caught < 6L, s"$out") // mid pairs lost
  }

  test("empty candidate set yields null precision, not NaN/Infinity " +
    "(a SQL oracle would disagree on 0/0)") {
    // disjoint-vocabulary noise docs only + one wide band: no two
    // signatures agree, so the candidate set is empty
    val lonely = (0 until 8).map(i =>
      (i.toLong, (0 until 8).map(w => s"d${i}v$w").mkString(" ")))
      .toDF("doc_id", "text")
    val out = MinHashLsh.evaluate(lonely, "doc_id", "text",
      n = 3, numHashes = 64, bands = 1, thresholds = Seq(0.1)).collect()
    // no true pairs either → zero rows survive the >= threshold filter,
    // which is fine; the contract under test is the guarded column, so
    // drive it with a corpus that HAS true pairs but no candidates
    val twins = ((0 until 8).map(i =>
      (i.toLong, (0 until 8).map(w => s"d${i}v$w").mkString(" "))) ++
      Seq((100L, "a b c d e f g h"), (101L, "a b c d e f g z")))
      .toDF("doc_id", "text")
    val rows = MinHashLsh.evaluate(twins, "doc_id", "text",
      n = 3, numHashes = 64, bands = 1, thresholds = Seq(0.1)).collect()
    rows.foreach { r =>
      if (r.getLong(4) == 0L) assert(r.isNullAt(5), s"$r")
      else assert(!r.getDouble(5).isNaN && !r.getDouble(5).isInfinite)
    }
    assert(out.forall(r => r.getLong(4) > 0L || r.isNullAt(5)))
  }
}
