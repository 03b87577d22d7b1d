package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.UnigramModelRef

/** Gopher-style document quality gate (Rae et al. 2021 §A1.1): the
  * composite keep/drop filter every pretraining pipeline actually
  * runs, combining the repo's individually-proven signals — token
  * count bounds, distinct-token ratio, stopword presence, mean word
  * length, top-bigram repetition fraction, and frozen-model LM
  * bits-per-token — into one boolean per document.
  *
  * Shape at 100 TB: a PURE MAP — one pass over the corpus, zero
  * shuffles, zero joins. Every signal that looks aggregate-shaped is
  * per-document and therefore computable inside a row: the bigram
  * repetition fraction (a groupBy(doc, bigram) in
  * [[graft.SparkEntry]]'s `doc_repetition` form) here sorts the
  * row's own bigram array and takes the longest equal run with an
  * `aggregate` higher-order function, and the LM score is the frozen
  * [[UnigramModelRef]] map ([[LmScore.bitsPerToken]]). The only jobs
  * beyond the scan are the model fit's bounded aggregates, which run
  * once BEFORE the query plan exists (CCNet's fit-once/score-forever
  * deployment shape). Streams score exactly like batches — no state.
  *
  * Thresholds compare against the ROUNDED (6-decimal) signal values,
  * so an oracle re-deriving the signals with the same rounding makes
  * the same keep/drop call on every document — boundary cases
  * included.
  */
object QualityGate {

  /** Gopher's §A1.1 stop list (must appear ≥ `minStopwords` times). */
  val GopherStopwords: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  private val SignalCols = Seq("n_tokens", "distinct_ratio",
    "n_stopwords", "mean_word_len", "top_bigram_frac", "bits_per_token",
    "keep")

  /** All six signals plus `keep` APPENDED to the input's columns (one
    * projection — the composition form: a pipeline stage that filters
    * on `keep` and passes the document through). See [[gate]] for
    * semantics. */
  def signals(
      docs: DataFrame,
      textCol: String,
      m: UnigramModelRef,
      minTokens: Long = 50,
      maxTokens: Long = 100000,
      minDistinctRatio: Double = 0.45,
      minStopwords: Long = 1,
      stopwords: Seq[String] = GopherStopwords,
      minMeanWordLen: Double = 3.0,
      maxMeanWordLen: Double = 10.0,
      maxTopBigramFrac: Double = 0.18,
      maxBitsPerToken: Double = 1e9): DataFrame =
    signalsWith(docs, textCol,
      graft.operators.LmScore.bitsPerToken(col(textCol), m),
      minTokens, maxTokens, minDistinctRatio, minStopwords, stopwords,
      minMeanWordLen, maxMeanWordLen, maxTopBigramFrac, maxBitsPerToken)

  /** [[signals]] with the ORDER-SENSITIVE LM term: bits-per-token
    * under a frozen BIGRAM model ([[LmScore.bitsPerTokenBigram]]) —
    * catches the scrambled-word-order junk a unigram perplexity is
    * blind to (spec-pinned in LmScoreSpec). Same pure-map shape,
    * same streaming story; only the reference object riding into
    * executors changes. */
  def signalsBigram(
      docs: DataFrame,
      textCol: String,
      m: graft.functions.BigramModelRef,
      minTokens: Long = 50,
      maxTokens: Long = 100000,
      minDistinctRatio: Double = 0.45,
      minStopwords: Long = 1,
      stopwords: Seq[String] = GopherStopwords,
      minMeanWordLen: Double = 3.0,
      maxMeanWordLen: Double = 10.0,
      maxTopBigramFrac: Double = 0.18,
      maxBitsPerToken: Double = 1e9): DataFrame =
    signalsWith(docs, textCol,
      graft.operators.LmScore.bitsPerTokenBigram(col(textCol), m),
      minTokens, maxTokens, minDistinctRatio, minStopwords, stopwords,
      minMeanWordLen, maxMeanWordLen, maxTopBigramFrac, maxBitsPerToken)

  private def signalsWith(
      docs: DataFrame,
      textCol: String,
      bits: org.apache.spark.sql.Column,
      minTokens: Long,
      maxTokens: Long,
      minDistinctRatio: Double,
      minStopwords: Long,
      stopwords: Seq[String],
      minMeanWordLen: Double,
      maxMeanWordLen: Double,
      maxTopBigramFrac: Double,
      maxBitsPerToken: Double): DataFrame = {
    require(minTokens >= 1 && maxTokens >= minTokens,
      s"token bounds [$minTokens, $maxTokens]")
    require(stopwords.nonEmpty && stopwords.forall(_.matches("[a-z]+")),
      s"stopwords must be plain lowercase words, got $stopwords")
    // all five integer signals in ONE codegen'd tokenization
    // ([[graft.functions.GateSignals]]); the higher-order-builtin
    // pipeline it replaced ran five interpreted lambdas per row and
    // dominated the ingest chain at 1M docs — see BASELINE.md
    val kernel = graft.functions.GateSignalsKernel(stopwords)
    docs
      .withColumn("__sig", org.apache.spark.sql.graftshim.Shim.column(
        graft.functions.GateSignals(
          org.apache.spark.sql.graftshim.Shim.expression(col(textCol)),
          kernel)))
      .withColumn("n_tokens", col("__sig.n_tokens"))
      .withColumn("__nd", col("__sig.n_distinct"))
      .withColumn("n_stopwords", col("__sig.n_stopwords"))
      .withColumn("__chars", col("__sig.n_chars"))
      .withColumn("__topbg", col("__sig.top_bigram"))
      .withColumn("bits_per_token", bits)
      .withColumn("distinct_ratio",
        round(col("__nd").cast("double") / col("n_tokens"), 6))
      .withColumn("mean_word_len",
        round(col("__chars").cast("double") / col("n_tokens"), 6))
      .withColumn("top_bigram_frac",
        when(col("n_tokens") < 2, lit(0.0)).otherwise(
          round(col("__topbg").cast("double") / (col("n_tokens") - 1), 6)))
      .withColumn("keep",
        col("n_tokens").between(minTokens, maxTokens) &&
          col("distinct_ratio") >= minDistinctRatio &&
          col("n_stopwords") >= minStopwords &&
          col("mean_word_len").between(minMeanWordLen, maxMeanWordLen) &&
          col("top_bigram_frac") <= maxTopBigramFrac &&
          col("bits_per_token") <= maxBitsPerToken)
      .drop("__sig", "__nd", "__chars", "__topbg")
  }

  /** Score and gate every document. Output: (idCol, n_tokens,
    * distinct_ratio, n_stopwords, mean_word_len, top_bigram_frac,
    * bits_per_token, keep) — all ratios rounded to 6 decimals, `keep`
    * the conjunction of the six threshold tests. `m` is a frozen
    * model from [[LmScore.model]] (fit it on the same corpus for the
    * self-scoring CCNet shape, or on a reference corpus to score
    * against external quality). */
  def gate(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      m: UnigramModelRef,
      minTokens: Long = 50,
      maxTokens: Long = 100000,
      minDistinctRatio: Double = 0.45,
      minStopwords: Long = 1,
      stopwords: Seq[String] = GopherStopwords,
      minMeanWordLen: Double = 3.0,
      maxMeanWordLen: Double = 10.0,
      maxTopBigramFrac: Double = 0.18,
      maxBitsPerToken: Double = 1e9): DataFrame =
    signals(docs, textCol, m, minTokens, maxTokens, minDistinctRatio,
      minStopwords, stopwords, minMeanWordLen, maxMeanWordLen,
      maxTopBigramFrac, maxBitsPerToken)
      .select(col(idCol) +: SignalCols.map(col): _*)

  /** [[gate]] under the frozen BIGRAM model — same output shape,
    * order-sensitive LM term (see [[signalsBigram]]). */
  def gateBigram(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      m: graft.functions.BigramModelRef,
      minTokens: Long = 50,
      maxTokens: Long = 100000,
      minDistinctRatio: Double = 0.45,
      minStopwords: Long = 1,
      stopwords: Seq[String] = GopherStopwords,
      minMeanWordLen: Double = 3.0,
      maxMeanWordLen: Double = 10.0,
      maxTopBigramFrac: Double = 0.18,
      maxBitsPerToken: Double = 1e9): DataFrame =
    signalsBigram(docs, textCol, m, minTokens, maxTokens,
      minDistinctRatio, minStopwords, stopwords, minMeanWordLen,
      maxMeanWordLen, maxTopBigramFrac, maxBitsPerToken)
      .select(col(idCol) +: SignalCols.map(col): _*)

  /** The FILTER form: documents surviving the gate, original columns
    * only (signals computed, tested, and dropped in one projection). */
  def filterKept(
      docs: DataFrame,
      textCol: String,
      m: UnigramModelRef,
      minTokens: Long = 50,
      maxTokens: Long = 100000,
      minDistinctRatio: Double = 0.45,
      minStopwords: Long = 1,
      stopwords: Seq[String] = GopherStopwords,
      minMeanWordLen: Double = 3.0,
      maxMeanWordLen: Double = 10.0,
      maxTopBigramFrac: Double = 0.18,
      maxBitsPerToken: Double = 1e9): DataFrame =
    signals(docs, textCol, m, minTokens, maxTokens, minDistinctRatio,
      minStopwords, stopwords, minMeanWordLen, maxMeanWordLen,
      maxTopBigramFrac, maxBitsPerToken)
      .filter(col("keep"))
      .drop(SignalCols: _*)
}
