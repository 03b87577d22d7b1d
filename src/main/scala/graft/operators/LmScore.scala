package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

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
}
