package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftshim.Shim

import graft.functions.{NbLogOdds, NbModelRef}

/** Supervised quality classification — the reference-vs-crawl filter
  * behind every frontier corpus (GPT-3 §2.2 trains a classifier on
  * WebText positives vs raw-Common-Crawl negatives and keeps
  * high-scoring pages; LLaMA does the same with fastText; CCNet's
  * perplexity filter is the unsupervised cousin already shipped as
  * [[LmScore]]). The learned artifacts those pipelines deploy are
  * SGD weight vectors; this operator is the closed-form member of
  * the same linear-scorer family — multinomial Naive Bayes with
  * add-k smoothing, whose per-token weights are exact count ratios —
  * so the external DuckDB oracle re-derives every score to the bit
  * and the repo's correctness discipline covers the whole operator,
  * not just its plumbing.
  *
  * Score of document d: log2 P(+|d) − log2 P(−|d)
  *   = log2(D⁺/D⁻) + Σ_{tok ∈ d} [log2 p(tok|+) − log2 p(tok|−)],
  * p(t|c) = (c_{t,c} + k) / (N_c + k·V), V the union vocabulary.
  * Positive log-odds read "reference-like"; threshold to taste (the
  * GPT-3 recipe keeps a stochastic Pareto tail rather than a hard
  * cut — compose with [[Sampling]] for that).
  *
  * Shape at 100 TB: fitting is ONE token shuffle over the labeled
  * reference snapshot (word-count plan, map-side combiners absorb
  * skew; the per-class split is a conditional sum inside the same
  * aggregate, not a second pass), the (N⁺, N⁻, V) normalizer and the
  * doc-prior row are one-row broadcasts, and corpus-native scoring
  * joins the exploded corpus to the count table exactly like
  * [[LmScore.score]] — AQE picks broadcast vs sort-merge by
  * vocabulary size. The frozen form ([[model]] / [[scoreWithModel]])
  * is the deployment shape: a bounded TakeOrdered vocabulary rides
  * as a codegen reference object and scoring is a pure map — zero
  * joins, zero shuffles, zero state — that runs unchanged on a
  * structured stream. Nothing is single-partition; driver state is
  * bounded by `vocabSize`.
  */
object NbClassifier {

  /** Corpus-native two-class score: fit ON the labeled frame and
    * score every row of it. Output (idCol, n_tokens, log_odds),
    * log_odds rounded to 6 decimals (the repo's cross-engine float
    * convention). `positive` is any boolean column expression over
    * `docs`' columns (e.g. `col("lang") === "en"`); both classes
    * must be non-empty or the prior is ±∞. */
  def score(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      positive: Column,
      k: Double = 0.5): DataFrame = {
    require(k > 0, s"smoothing k must be positive, got $k")
    val labeled = docs.select(
      col(idCol), col(textCol), positive.cast("boolean").as("__pos"))
    val toks = labeled.select(col(idCol), col("__pos"),
      explode(split(col(textCol), " ")).as("tok"))
    val counts = toks.groupBy("tok").agg(
      sum(when(col("__pos"), 1L).otherwise(0L)).as("__cp"),
      sum(when(col("__pos"), 0L).otherwise(1L)).as("__cn"))
    val totals = counts.agg(
      sum("__cp").cast("double").as("__np"),
      sum("__cn").cast("double").as("__nn"),
      count(lit(1)).cast("double").as("__v"))
    val priors = labeled.agg(
      sum(when(col("__pos"), 1L).otherwise(0L)).cast("double").as("__dp"),
      sum(when(col("__pos"), 0L).otherwise(1L)).cast("double").as("__dn"))
    toks
      .join(counts, "tok")
      .crossJoin(broadcast(totals))
      .withColumn("__lo",
        log2((col("__cp") + lit(k)) / (col("__np") + lit(k) * col("__v"))) -
          log2((col("__cn") + lit(k)) / (col("__nn") + lit(k) * col("__v"))))
      .groupBy(col(idCol))
      .agg(count(lit(1)).cast("long").as("n_tokens"),
        sum("__lo").as("__s"))
      .crossJoin(broadcast(priors))
      .select(col(idCol), col("n_tokens"),
        round(log2(col("__dp") / col("__dn")) + col("__s"), 6).as("log_odds"))
  }

  /** Fit a FROZEN bounded model on a labeled reference snapshot: the
    * top `vocabSize` tokens by TOTAL count (ties broken by token —
    * the same deterministic K-boundary as [[LmScore.model]]) with
    * their per-class counts, the full (N⁺, N⁻, V) normalizer, and
    * the document-prior bits. Both collects are bounded (TakeOrdered
    * vocabulary; one-row totals). */
  def model(
      docs: DataFrame,
      textCol: String,
      positive: Column,
      vocabSize: Int,
      k: Double = 0.5): NbModelRef = {
    require(vocabSize > 0, s"vocabSize must be positive, got $vocabSize")
    require(k > 0, s"smoothing k must be positive, got $k")
    val labeled = docs.select(
      col(textCol), positive.cast("boolean").as("__pos"))
    // counts is consumed by TWO actions (normalizer + top-K vocab) —
    // materialized once (r17 optimization round) so the corpus
    // scan+explode+aggregate runs a single time; the materialization
    // is vocabulary-sized, not corpus-sized
    val counts = labeled
      .select(col("__pos"), explode(split(col(textCol), " ")).as("tok"))
      .groupBy("tok").agg(
        sum(when(col("__pos"), 1L).otherwise(0L)).as("__cp"),
        sum(when(col("__pos"), 0L).otherwise(1L)).as("__cn"))
      .localCheckpoint()
    val nv = counts.agg(
      sum("__cp").cast("double"), sum("__cn").cast("double"),
      count(lit(1)).cast("double")).head()
    val pri = labeled.agg(
      sum(when(col("__pos"), 1L).otherwise(0L)).cast("double"),
      sum(when(col("__pos"), 0L).otherwise(1L)).cast("double")).head()
    val topRows = counts
      .withColumn("__ct", col("__cp") + col("__cn"))
      .orderBy(desc("__ct"), col("tok")).limit(vocabSize)
      .select("tok", "__cp", "__cn")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    NbModelRef(topRows, nv.getDouble(0), nv.getDouble(1), nv.getDouble(2),
      math.log(pri.getDouble(0) / pri.getDouble(1)) / math.log(2.0), k)
  }

  /** The per-row frozen log-odds as a bare Column (rounded to 6
    * decimals — the same value [[scoreWithModel]] emits), for gating
    * compositions that keep the rest of the row: map-only, no join. */
  def logOddsCol(text: Column, m: NbModelRef): Column =
    round(Shim.column(NbLogOdds(Shim.expression(text), m)), 6)

  /** [[score]]'s output shape under a frozen model — a pure map (no
    * join, no shuffle, no state) that scores a structured stream
    * exactly as it scores a batch table. With `m` covering the
    * labeled corpus vocabulary this matches [[score]] on every
    * document (spec-pinned). */
  def scoreWithModel(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      m: NbModelRef): DataFrame =
    // null-text documents are dropped, matching the corpus-native
    // [[score]] path (which loses them in the token explode) — so
    // "frozen == corpus-native on every document" holds even on
    // corpora containing null text
    docs.filter(col(textCol).isNotNull).select(col(idCol),
      size(split(col(textCol), " ")).cast("long").as("n_tokens"),
      round(Shim.column(NbLogOdds(Shim.expression(col(textCol)), m)), 6)
        .as("log_odds"))
}
