package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for LLM-data pipelines (north-star extension
  * set; the reference's only text-derived signal is `len(text)` computed
  * client-side, 01_simple.ipynb:425).
  *
  * Everything here is pure `org.apache.spark.sql.functions` composition —
  * codegen'd, no UDFs — so the whole row pipeline stays inside one
  * WholeStageCodegen span over the scan.
  */
object TextAnalysis {

  /** Whitespace token count. */
  def tokenCount(text: Column): Column = size(split(text, " "))

  /** Per-document out-of-vocabulary rate against the corpus's own
    * top-`vocabSize` token vocabulary — the coverage read that sizes a
    * tokenizer (a vocab that leaves long OOV tails fragments every
    * downstream sequence). Vocabulary membership is deterministic:
    * top-K by count, ties broken by token, so the K-boundary is
    * engine-portable and the oracle re-derives the identical set.
    * Output: (idCol, n_tokens, n_oov, oov_rate).
    *
    * Shape at 100 TB: the vocabulary is a BOUNDED top-K (partial
    * count + TakeOrdered — never a full sort) broadcast to a map-side
    * left join against the token stream; the corpus shuffles once,
    * for the per-doc reduce. */
  def oovRate(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      vocabSize: Int): DataFrame = {
    require(vocabSize > 0, s"vocabSize must be positive, got $vocabSize")
    val toks = docs
      .select(col(idCol), explode(split(col(textCol), " ")).as("tok"))
    val vocab = toks.groupBy("tok").agg(count(lit(1)).as("__c"))
      .orderBy(desc("__c"), col("tok")).limit(vocabSize)
      .select(col("tok"), lit(1L).as("__in"))
    toks.join(broadcast(vocab), Seq("tok"), "left")
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).cast("long").as("n_tokens"),
        sum(when(col("__in").isNull, 1L).otherwise(0L))
          .cast("long").as("n_oov"))
      .withColumn("oov_rate",
        round(col("n_oov").cast("double") / col("n_tokens"), 6))
  }

  /** Regex token count — a BPE-ish word/number/punct tokenizer lower
    * bound. Keep the pattern RE2/Java-compatible (no lookarounds) so
    * oracles can reproduce it. */
  def regexTokenCount(text: Column, pattern: String = "[a-z]+|[0-9]+"): Column =
    size(regexp_extract_all(lower(text), lit(pattern), lit(0)))

  /** Ratio of tokens found in `stopwords` (quality / language signal).
    * Built from Column combinators (no SQL-string splicing — words may
    * contain quotes, and the scored column is exactly `text`). */
  def stopwordRatio(text: Column, stopwords: Seq[String]): Column = {
    val toks = split(text, " ")
    size(filter(toks, x => array_contains(typedlit(stopwords), x)))
      .cast("double") / size(toks)
  }

  /** Punctuation character ratio. */
  def punctRatio(text: Column): Column =
    (length(text) - length(regexp_replace(text, "[\\p{Punct}]", "")))
      .cast("double") / length(text)

  /** Heuristic quality score in [0,1]: favors mid-length documents with
    * low punctuation density and a sane mean token length — the standard
    * cheap pre-filter before expensive model-based scoring. */
  def qualityScore(text: Column): Column = {
    val nChars = length(text).cast("double")
    val nToks = tokenCount(text).cast("double")
    val meanTok = nChars / greatest(nToks, lit(1.0))
    val lenScore = least(nChars / lit(200.0), lit(1.0))
    val tokScore = when(meanTok.between(3.0, 10.0), 1.0).otherwise(0.5)
    val punctScore = lit(1.0) - least(punctRatio(text) * 5.0, lit(1.0))
    round((lenScore + tokScore + punctScore) / 3.0, 6)
  }

  /** Deterministic polynomial rolling-hash fingerprint of the document:
    * left fold `(acc * 31 + codepoint) mod 1e9+7` seeded with the first
    * codepoint — the DuckDB `list_reduce` fold shape, so oracles match
    * bit-for-bit. Null/empty-safe (returns -1). Native tight-loop
    * expression ([[graft.functions.Fingerprint]]); the interpreted
    * `aggregate(split(text, ''), ...)` HOF formulation evaluated two
    * lambda calls per character. */
  def fingerprint(textCol: String): Column =
    when(col(textCol).isNull, lit(-1L))
      .otherwise(org.apache.spark.sql.graftshim.Shim.column(
        graft.functions.Fingerprint(
          org.apache.spark.sql.graftshim.Shim.expression(col(textCol)))))

  /** Deterministic hashed bag-of-words embedding (HashingTF-style):
    * each token increments slot `xxhash64(token) mod dim`, then the
    * vector is L2-normalized. A model-free, engine-side stand-in for
    * the reference's sentence-transformer encode step (SURVEY S6) —
    * same trick as txtai's fallback hash vectorizers — that makes the
    * documents table directly searchable with the kNN operators. */
  def hashEmbed(textCol: String, dim: Int): Column =
    org.apache.spark.sql.graftshim.Shim.column(
      graft.functions.HashEmbed(
        org.apache.spark.sql.graftshim.Shim.expression(col(textCol)), dim))

  /** N-gram-profile language identification: scores the document's token
    * overlap against per-language marker-word sets and picks the argmax
    * (ties broken by language code order). `profiles` maps language code
    * to its marker words. This is the classic stopword-profile heuristic
    * (van Noord's textcat family) — cheap, no model, runs in codegen. */
  def langId(textCol: String, profiles: Map[String, Seq[String]]): Column = {
    val toks = split(col(textCol), " ")
    val scored = profiles.toSeq.sortBy(_._1).map { case (lang, words) =>
      struct(
        (size(filter(toks, x => array_contains(typedlit(words), x)))
          .cast("double") / greatest(size(toks), lit(1)))
          .as("score"),
        lit(lang).as("lang"))
    }
    // argmax: comparator-sorted (score desc, lang asc), take the head
    val arr = array(scored: _*)
    element_at(array_sort(arr, (a, b) =>
      when(a.getField("score") > b.getField("score"), -1)
        .when(a.getField("score") < b.getField("score"), 1)
        .when(a.getField("lang") < b.getField("lang"), -1)
        .when(a.getField("lang") > b.getField("lang"), 1)
        .otherwise(0)), 1).getField("lang")
  }
}
