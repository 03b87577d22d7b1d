package graft

import org.apache.spark.sql.functions._

import graft.operators.{Bm25, Bm25Index}

/** `keyword_score` — the SQL-dialect lexical scorer ([[Keyword]]):
  * analysis-time stats resolution, bit-parity with the declarative
  * [[Bm25.score]] plan, and the index-backed stats path. */
class KeywordScoreSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  private lazy val docs = spark.read.parquet(s"$sf/documents.parquet")
  private lazy val emb = spark.read.parquet(s"$sf/embeddings.parquet")

  test("keyword_score over txtai view is bit-identical to Bm25.score " +
    "over the view corpus") {
    Txtai.register(docs, emb)
    val got = spark.sql(
      """SELECT id, keyword_score('vector hash join') AS bm25_micros
        |FROM txtai WHERE keyword_score('vector hash join') > 0""".stripMargin)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val corpus = docs.join(emb, docs("doc_id") === emb("vec_id"))
      .select(docs("doc_id").as("id"), col("text"))
    val want = Bm25.score(corpus, "text", "id",
        Seq("vector", "hash", "join"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == want)
    assert(got.nonEmpty)
  }

  test("index-registered stats score identically to corpus-scan stats " +
    "(df from pruned buckets, n/avgdl from the sidecar)") {
    Txtai.register(docs, emb)
    val q = """SELECT id, keyword_score('vector hash') AS bm
              |FROM txtai WHERE keyword_score('vector hash') > 0""".stripMargin
    val fromCorpus = spark.sql(q).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val dir = java.nio.file.Files.createTempDirectory("kwidx").toString
    val corpus = docs.join(emb, docs("doc_id") === emb("vec_id"))
      .select(docs("doc_id").as("id"), col("text"))
    val idx = Bm25Index.build(corpus, "text", "id", s"$dir/idx", nBuckets = 8)
    Keyword.registerIndex(idx)
    try {
      val fromIndex = spark.sql(q).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(fromIndex == fromCorpus)
    } finally Txtai.register(docs, emb) // restore corpus-backed stats
  }

  test("two-argument form names the text column explicitly") {
    Txtai.register(docs, emb)
    val a = spark.sql(
      "SELECT id, keyword_score(text, 'vector') AS bm FROM txtai")
    val b = spark.sql(
      "SELECT id, keyword_score('vector') AS bm FROM txtai")
    assert(a.collect().toSeq == b.collect().toSeq)
  }

  test("query must be a string literal (per-row terms need per-row " +
    "corpus stats)") {
    Txtai.register(docs, emb)
    val e = intercept[Exception] {
      spark.sql("SELECT keyword_score(text, text) FROM txtai").collect()
    }
    assert(e.getMessage.contains("string literal"))
  }

  test("terms absent from the corpus contribute zero, never NULL") {
    Txtai.register(docs, emb)
    val r = spark.sql(
      """SELECT count(*) AS n
        |FROM txtai WHERE keyword_score('qqqzzzxyzzy') > 0""".stripMargin)
      .head().getLong(0)
    assert(r == 0L)
  }

  test("kernel tokenizer matches the regex tokenizer on adversarial " +
    "strings (unicode, case, digit/letter boundaries, empty)") {
    import graft.functions.Bm25QueryModel
    import org.apache.spark.unsafe.types.UTF8String
    val terms = Seq("abc", "123", "a", "0", "vector")
    // fixed stats so the score is a pure function of (tf per term, dl)
    val model = Bm25QueryModel(terms, terms.map(_ => 1.0), avgdl = 10.0)
    def reference(text: String): Long = {
      val s = UTF8String.fromString(text).toLowerCase.toString
      val toks = graft.operators.Bm25.TokenPattern.r.findAllIn(s).toVector
      val dl = toks.length.toLong
      terms.map { t =>
        val tf = toks.count(_ == t).toLong
        if (tf == 0) 0L
        else {
          val tfn = tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * dl / 10.0))
          java.math.BigDecimal.valueOf(1.0 * tfn * 1000000.0)
            .setScale(0, java.math.RoundingMode.HALF_UP).longValue
        }
      }.sum
    }
    val cases = Seq(
      "", " ", "abc", "ABC", "abc123", "123abc", "ABC123abc",
      "a b c", "a1b2c3", "0", "00", "a-b_c.d", "abc\tabc\nabc",
      "Ångström abc", "ÄBC", "naïve abc", "日本語 abc 123",
      "vector,vector;vector", "VeCtOr123VECTOR", "𝕍ector abc",
      "a" * 1000 + " abc", ("abc " * 50).trim)
    cases.foreach { c =>
      assert(model.score(UTF8String.fromString(c)) == reference(c),
        s"mismatch on: '$c'")
    }
  }

  test("keyword_score is codegen'd (no interpreted fallback in the plan)") {
    Txtai.register(docs, emb)
    val df = spark.sql(
      "SELECT id, keyword_score('vector hash') AS bm FROM txtai")
    df.collect()
    val generated = org.apache.spark.sql.execution.debug
      .codegenString(df.queryExecution.executedPlan)
    assert(generated.contains("bm25QueryModel"), generated.take(2000))
  }

  test("registrations are scoped per corpus: flipping between two " +
    "registered corpora resolves each one's own (cached) stats — no " +
    "global-slot clobbering") {
    import spark.implicits._
    val a = Seq((1L, "vector vector hash"), (2L, "join")).toDF("id", "text")
    val b = Seq((1L, "vector"), (2L, "vector"), (3L, "vector"))
      .toDF("id", "text")
    Keyword.registerCorpus(a, "text")
    val mA = Keyword.model("vector")
    Keyword.registerCorpus(b, "text")
    val mB = Keyword.model("vector")
    // different corpora → different stats (A: n=2 df=1; B: n=3 df=3)
    assert(mA != mB)
    // flipping back re-activates A's registration with identical stats
    Keyword.registerCorpus(a, "text")
    assert(Keyword.model("vector") == mA)
    // and B's registration survived the flip
    Keyword.registerCorpus(b, "text")
    assert(Keyword.model("vector") == mB)
  }

  test("registry overflow prefers non-active victims (a session " +
    "re-registering abandons its old key; nobody else breaks) and " +
    "under the hard all-active bound the broken session gets the " +
    "EVICTION message, never the misleading append one") {
    import org.apache.spark.sql.SparkSession
    val saved = SparkSession.getActiveSession
    try {
      // 64 sessions, one active corpus each: the registry is full and
      // every entry is some live session's current source
      val sessions = (0 until 64).map(_ => spark.newSession())
      sessions.foreach { s =>
        Keyword.registerCorpus(
          s.range(2).selectExpr("id", "'vector hash' AS text"), "text")
      }
      // sessions(1) re-registers: its OLD key is the garbage the
      // eviction should pick — sessions(0), the insertion-eldest,
      // must survive (insertion-eldest eviction broke exactly this)
      Keyword.registerCorpus(
        sessions(1).range(3).selectExpr("id", "'vector scan' AS text"),
        "text")
      SparkSession.setActiveSession(sessions(0))
      Keyword.model("vector") // still resolves — not evicted
      // a 65th session under the all-active bound: the eldest
      // (sessions(0)) is sacrificed, and its error names eviction
      Keyword.registerCorpus(
        spark.newSession().range(2)
          .selectExpr("id", "'vector join' AS text"), "text")
      SparkSession.setActiveSession(sessions(0))
      val e = intercept[IllegalStateException] { Keyword.model("vector") }
      assert(e.getMessage.contains("evicted"), e.getMessage)
      assert(!e.getMessage.contains("append"), e.getMessage)
      // everyone else still works
      SparkSession.setActiveSession(sessions(2))
      Keyword.model("vector")
    } finally saved.foreach(SparkSession.setActiveSession)
  }

  test("Bm25Index.append invalidates its keyword_score registration: " +
    "stale stats fail loudly, re-registering the appended index " +
    "resolves the GROWN corpus's stats") {
    import spark.implicits._
    import graft.operators.Bm25Index
    val a = Seq((1L, "vector hash"), (2L, "join scan")).toDF("id", "text")
    val dir = java.nio.file.Files.createTempDirectory("kwinv").toString
    val idx = Bm25Index.build(a, "text", "id", s"$dir/idx", nBuckets = 4)
    Keyword.registerIndex(idx)
    val before = Keyword.model("vector")
    val grown = idx.append(
      Seq((3L, "vector vector")).toDF("id", "text"), "text", "id")
    val e = intercept[IllegalStateException] { Keyword.model("vector") }
    assert(e.getMessage.contains("re-register"), e.getMessage)
    Keyword.registerIndex(grown)
    val after = Keyword.model("vector")
    assert(after != before, "post-append stats must reflect the growth")
  }

  test("Bm25Index.merge invalidates the DESTINATION's keyword_score " +
    "registration: a merged-under lake must not keep scoring with " +
    "pre-merge n/Σdl (r15)") {
    import spark.implicits._
    import graft.operators.Bm25Index
    val a = Seq((1L, "vector hash"), (2L, "join scan")).toDF("id", "text")
    val b = Seq((10L, "vector vector lake"), (11L, "merge files"))
      .toDF("id", "text")
    val dir = java.nio.file.Files.createTempDirectory("kwmerge").toString
    val idxA = Bm25Index.build(a, "text", "id", s"$dir/a", nBuckets = 4)
    val idxB = Bm25Index.build(b, "text", "id", s"$dir/b", nBuckets = 4)
    Keyword.registerIndex(idxA)
    Keyword.model("vector") // resolves against the pre-merge index
    val merged = idxA.merge(idxB)
    val e = intercept[IllegalStateException] { Keyword.model("vector") }
    assert(e.getMessage.contains("re-register"), e.getMessage)
    Keyword.registerIndex(merged)
    assert(Keyword.model("vector") != null)
  }
}
