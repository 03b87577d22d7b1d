package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftshim.Shim

import graft.functions.{BigramBits, BigramModelRef, TokenBigrams, UnigramBits, UnigramModelRef}

/** Language-model quality scoring — the perplexity-style filter every
  * public web-scale pipeline runs (CCNet buckets documents by LM
  * perplexity; Gopher and FineWeb keep/drop on the same signal). A
  * full KenLM is a model artifact; the self-contained corpus-native
  * form is an add-k-smoothed unigram model estimated FROM the corpus
  * being scored: documents whose token distribution diverges from the
  * corpus read as high bits-per-token and land in the filter tails.
  *
  * Shape at 100 TB: one token shuffle for the count table (partial
  * map-side aggregation first — the classic word-count plan, skew
  * absorbed by the combiner), the (N, V) normalizer as a ONE-ROW
  * broadcast (never a driver collect), and a token-keyed join of the
  * exploded corpus against the counts that AQE picks as broadcast
  * when the vocabulary is small and sort-merge when it is not. The
  * per-doc reduce is an ordinary partial aggregate. Nothing is
  * single-partition; driver state is zero.
  */
object LmScore {

  /** Per-document add-k unigram score against the corpus itself:
    * output (idCol, n_tokens, bits_per_token) where `bits_per_token` =
    * −Σ log2 p(tok) / n, p(t) = (c_t + k) / (N + k·V), rounded to 6
    * decimals (the repo's cross-engine float convention). Higher =
    * less corpus-typical; filter tails to taste. */
  def score(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      k: Double = 0.5): DataFrame = {
    require(k > 0, s"smoothing k must be positive, got $k")
    val toks = docs
      .select(col(idCol), explode(split(col(textCol), " ")).as("tok"))
    val counts = toks.groupBy("tok").agg(count(lit(1)).as("c"))
    val totals = counts.agg(
      sum("c").cast("double").as("__N"),
      count(lit(1)).cast("double").as("__V"))
    toks
      .join(counts, "tok")
      .crossJoin(broadcast(totals))
      .withColumn("__lp",
        -log2((col("c") + lit(k)) / (col("__N") + lit(k) * col("__V"))))
      .groupBy(col(idCol))
      .agg(count(lit(1)).cast("long").as("n_tokens"),
        round(sum("__lp") / count(lit(1)), 6).as("bits_per_token"))
  }

  /** Per-document add-k BIGRAM score against the corpus itself — the
    * order-sensitive generalization of [[score]] (a unigram model
    * cannot see "the the the" as atypical when "the" is common; a
    * bigram model can). Token 0 scores under the add-k unigram
    * (exactly [[score]]'s formula); token i ≥ 1 under the add-k
    * conditional p(tᵢ | tᵢ₋₁) = (c(tᵢ₋₁,tᵢ) + k) / (c(tᵢ₋₁) + k·V)
    * with V the UNIGRAM vocabulary size — an unseen continuation
    * backs off to the add-k floor k / (c(prev) + k·V). Output shape
    * identical to [[score]]: (idCol, n_tokens, bits_per_token).
    *
    * Shape at 100 TB: the same word-count plan as [[score]] run
    * twice — one token shuffle for the unigram table, one pair
    * shuffle for the bigram table (both with map-side partial
    * aggregation; the pair table is built per-row from the token
    * array, no self-join on position) — then token-keyed joins that
    * AQE broadcasts when the vocabularies are small. Nothing is
    * single-partition; driver state is zero. */
  def scoreBigram(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      k: Double = 0.5): DataFrame = {
    require(k > 0, s"smoothing k must be positive, got $k")
    val uni = docs
      .select(explode(split(col(textCol), " ")).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("__cu"))
    val totals = uni.agg(
      sum("__cu").cast("double").as("__N"),
      count(lit(1)).cast("double").as("__V"))
    // (prev, tok) pairs straight from the row — one codegen'd kernel
    // ([[TokenBigrams]]; a transform(slice(...)) higher-order pipeline
    // measured 7× slower interpreted, and this explode runs twice).
    // The positional self-join a naive plan would run is a second
    // corpus shuffle for nothing. Under-2-token docs contribute only
    // the unigram leg.
    val pairs = docs.select(col(idCol),
      explode(Shim.column(TokenBigrams(Shim.expression(col(textCol)))))
        .as("bg"))
    val bg = pairs.groupBy("bg").agg(count(lit(1)).as("__cb"))
    val leg1 = docs
      .select(col(idCol), substring_index(col(textCol), " ", 1).as("tok"))
      .join(uni, "tok")
      .crossJoin(broadcast(totals))
      .select(col(idCol),
        (-log2((col("__cu") + lit(k)) / (col("__N") + lit(k) * col("__V"))))
          .as("__lp"))
    val leg2 = pairs
      .join(bg, "bg")
      .withColumn("prev", substring_index(col("bg"), " ", 1))
      .join(uni.withColumnRenamed("tok", "prev")
        .withColumnRenamed("__cu", "__cp"), "prev")
      .crossJoin(broadcast(totals))
      .select(col(idCol),
        (-log2((col("__cb") + lit(k)) / (col("__cp") + lit(k) * col("__V"))))
          .as("__lp"))
    leg1.unionByName(leg2)
      .groupBy(col(idCol))
      .agg(count(lit(1)).cast("long").as("n_tokens"),
        round(sum("__lp") / count(lit(1)), 6).as("bits_per_token"))
  }

  /** Fit a FROZEN bounded model on a reference corpus: the top
    * `vocabSize` tokens by count (ties broken by token — the same
    * deterministic K-boundary as [[TextAnalysis.oovRate]]) with the
    * full-corpus (N, V) normalizer. The vocabulary collect is bounded
    * by `vocabSize` (TakeOrdered, the codebook-training pattern) —
    * never the whole vocabulary. */
  def model(
      docs: DataFrame,
      textCol: String,
      vocabSize: Int,
      k: Double = 0.5): UnigramModelRef = {
    require(vocabSize > 0, s"vocabSize must be positive, got $vocabSize")
    require(k > 0, s"smoothing k must be positive, got $k")
    // counts is consumed by TWO actions (the (N, V) normalizer and the
    // top-K vocabulary) — materialized once (r17 optimization round) so
    // the corpus scan+explode+aggregate runs a single time instead of
    // once per action. The materialization is vocabulary-sized
    // ((token, count) rows), orders of magnitude under the corpus pass
    // it replaces; lineage is released when the model ref is built.
    val counts = docs
      .select(explode(split(col(textCol), " ")).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("__c"))
      .localCheckpoint()
    val nv = counts.agg(
      sum("__c").cast("double"), count(lit(1)).cast("double")).head()
    val top = counts.orderBy(desc("__c"), col("tok")).limit(vocabSize)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toSeq
    UnigramModelRef(top, nv.getDouble(0), nv.getDouble(1), k)
  }

  /** Per-row bits-per-token under a frozen model — a pure map (no
    * join, no shuffle, no state): scores a structured stream exactly
    * as it scores a batch table. In-vocab tokens use true counts;
    * OOV tokens the add-k floor (see [[UnigramModelRef]]). */
  def bitsPerToken(text: Column, m: UnigramModelRef): Column = {
    val total = Shim.column(UnigramBits(Shim.expression(text), m))
    round(total / size(split(text, " ")), 6)
  }

  /** Fit a FROZEN bounded BIGRAM model on a reference corpus: the top
    * `vocabSize` unigrams (exactly [[model]]'s boundary rule) plus the
    * top `bigramBudget` (prev, tok) pairs by count — ties broken by
    * (prev, tok), the same deterministic K-boundary convention — with
    * the full-corpus (N, V) normalizer. Both collects are bounded by
    * their budgets (TakeOrdered), never the whole table. */
  def bigramModel(
      docs: DataFrame,
      textCol: String,
      vocabSize: Int,
      bigramBudget: Int,
      k: Double = 0.5): BigramModelRef = {
    require(vocabSize > 0, s"vocabSize must be positive, got $vocabSize")
    require(bigramBudget > 0, s"bigramBudget must be positive, got $bigramBudget")
    require(k > 0, s"smoothing k must be positive, got $k")
    // same two-actions-one-pass materialization as [[model]] (r17)
    val counts = docs
      .select(explode(split(col(textCol), " ")).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("__c"))
      .localCheckpoint()
    val nv = counts.agg(
      sum("__c").cast("double"), count(lit(1)).cast("double")).head()
    val top = counts.orderBy(desc("__c"), col("tok")).limit(vocabSize)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toSeq
    val bg = docs
      .select(explode(
        Shim.column(TokenBigrams(Shim.expression(col(textCol))))).as("bg"))
      .groupBy("bg").agg(count(lit(1)).as("__c"))
      // one space per pair string, so the two substring_index calls
      // split it back exactly; ordering on (prev, tok) keeps the
      // oracle's deterministic K-boundary
      .select(substring_index(col("bg"), " ", 1).as("prev"),
        substring_index(col("bg"), " ", -1).as("tok"), col("__c"))
      .orderBy(desc("__c"), col("prev"), col("tok")).limit(bigramBudget)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toSeq
    BigramModelRef(top, bg, nv.getDouble(0), nv.getDouble(1), k)
  }

  /** Per-row bits-per-token under a frozen bigram model — the same
    * pure map as [[bitsPerToken]] (no join, no shuffle, no state). */
  def bitsPerTokenBigram(text: Column, m: BigramModelRef): Column = {
    val total = Shim.column(BigramBits(Shim.expression(text), m))
    round(total / size(split(text, " ")), 6)
  }

  /** [[scoreBigram]]'s output shape under a frozen bigram model —
    * with budgets covering the corpus the two paths agree on every
    * document (spec-pinned). */
  def scoreWithBigramModel(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      m: BigramModelRef): DataFrame =
    docs.select(col(idCol),
      size(split(col(textCol), " ")).cast("long").as("n_tokens"),
      bitsPerTokenBigram(col(textCol), m).as("bits_per_token"))

  /** [[score]]'s output shape under a frozen model: (idCol, n_tokens,
    * bits_per_token) — with `m` covering the full vocabulary this
    * matches [[score]] on every document. */
  def scoreWithModel(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      m: UnigramModelRef): DataFrame =
    docs.select(col(idCol),
      size(split(col(textCol), " ")).cast("long").as("n_tokens"),
      bitsPerToken(col(textCol), m).as("bits_per_token"))
}
